"""Prometheus-style metrics registry + text exposition.

Reference parity: the reference instruments its CLI watch loop
(ice/src/main/java/com/altinity/ice/cli/internal/metrics/InsertWatchMetrics.java),
its REST catalog (ice-rest-catalog/.../metrics/{HttpMetrics,
CatalogMetrics,MaintenanceMetrics,PrometheusMetricsReporter}.java) and
documents the full metric surface in examples/grafana/METRICS.md. This
module reproduces the same metric names/labels over a dependency-free
registry (the sandbox has no prometheus_client) and renders the
standard text exposition format (version 0.0.4) for `/metrics`.

Counters and gauges are exact; histograms are rendered as a single
+Inf bucket plus _sum/_count (enough for rate() and mean-duration
dashboards; bucketed latency quantiles are a client-library concern).

Everything is process-local and thread-safe. Components take an
optional registry and default to the module-level one, so tests can
isolate and servers can share.
"""

from __future__ import annotations

import threading


def _fmt_labels(labels: dict[str, str] | None) -> str:
    if not labels:
        return ""
    inner = ",".join(
        f'{k}="{str(v).replace(chr(92), chr(92) * 2).replace(chr(34), chr(92) + chr(34))}"'
        for k, v in sorted(labels.items())
    )
    return "{" + inner + "}"


class MetricsRegistry:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        # name -> (type, help)
        self._meta: dict[str, tuple[str, str]] = {}
        # (name, label_items) -> value
        self._values: dict[tuple[str, tuple], float] = {}
        # gauges computed at scrape time: name -> (labels, fn)
        self._collectors: list = []

    # ---------- declaration ----------

    def _declare(self, name: str, typ: str, help_: str) -> None:
        self._meta.setdefault(name, (typ, help_))

    # ---------- mutation ----------

    def inc(
        self,
        name: str,
        labels: dict[str, str] | None = None,
        value: float = 1,
        help_: str = "",
    ) -> None:
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            self._declare(name, "counter", help_)
            self._values[key] = self._values.get(key, 0) + value

    def set_gauge(
        self, name: str, labels: dict[str, str] | None = None, value: float = 0, help_: str = ""
    ) -> None:
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            self._declare(name, "gauge", help_)
            self._values[key] = value

    def add_gauge(
        self, name: str, labels: dict[str, str] | None = None, delta: float = 1, help_: str = ""
    ) -> None:
        """Additive gauge (e.g. in-flight request tracking)."""
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            self._declare(name, "gauge", help_)
            self._values[key] = self._values.get(key, 0) + delta

    def observe(
        self, name: str, value: float, labels: dict[str, str] | None = None, help_: str = ""
    ) -> None:
        """Histogram-lite: +Inf bucket, _sum, _count."""
        base = tuple(sorted((labels or {}).items()))
        with self._lock:
            self._declare(name, "histogram", help_)
            for suffix, inc in ((("_bucket", (("le", "+Inf"),)), 1), (("_sum", ()), value), (("_count", ()), 1)):
                (sfx, extra) = suffix
                key = (name + sfx, base + tuple(extra))
                self._values[key] = self._values.get(key, 0) + inc

    def register_collector(self, fn) -> None:
        """fn() -> list[(name, labels_dict, value, help)] evaluated at
        scrape time (for live gauges like catalog table counts)."""
        with self._lock:
            self._collectors.append(fn)

    # ---------- exposition ----------

    def render(self) -> str:
        with self._lock:
            meta = dict(self._meta)
            values = dict(self._values)
            collectors = list(self._collectors)
        live: list[tuple[str, dict, float, str]] = []
        for fn in collectors:
            try:
                live.extend(fn())
            except Exception:  # noqa: BLE001 — a scrape must never 500
                continue
        lines: list[str] = []
        for name, labels, value, help_ in live:
            meta.setdefault(name, ("gauge", help_))
            values[(name, tuple(sorted(labels.items())))] = value
        emitted_help = set()
        for (name, label_items), value in sorted(values.items()):
            base = name
            for sfx in ("_bucket", "_sum", "_count"):
                if name.endswith(sfx) and name[: -len(sfx)] in meta:
                    base = name[: -len(sfx)]
                    break
            if base not in emitted_help and base in meta:
                typ, help_ = meta[base]
                lines.append(f"# HELP {base} {help_ or base}")
                lines.append(f"# TYPE {base} {typ}")
                emitted_help.add(base)
            v = int(value) if float(value).is_integer() else value
            lines.append(f"{name}{_fmt_labels(dict(label_items))} {v}")
        return "\n".join(lines) + "\n"


DEFAULT = MetricsRegistry()


def default_registry() -> MetricsRegistry:
    return DEFAULT
