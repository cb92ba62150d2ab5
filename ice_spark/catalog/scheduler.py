"""Maintenance scheduling (MaintenanceScheduler parity).

The reference schedules the four maintenance jobs per table with a
cron-like expression (`skedule`), a jittered initial delay, and a
run-if-missed catch-up
(/root/reference/ice-rest-catalog/src/main/java/com/altinity/ice/rest/
catalog/internal/maintenance/MaintenanceScheduler.java:34-115; config
`maintenanceSchedule`, Config.java).

Re-expression: a deterministic 5-field cron parser plus a
`MaintenanceSchedule` that computes next-fire times and runs due jobs
when polled. There is deliberately NO daemon thread here — the engine
exposes `run_pending(now)` and the host (driver loop, Airflow tick,
cron itself) supplies the clock. That keeps every code path testable
with an explicit clock and leaves process supervision to
infrastructure, per the driver north star on server orchestration.

Cron subset: minute hour day-of-month month day-of-week, each field
`*`, a number, a list `a,b`, a range `a-b`, or a step `*/n` —
the forms the reference's docs use (e.g. "0 3 * * *").
"""

from __future__ import annotations

import datetime
import hashlib
from dataclasses import dataclass, field

from ice_spark.catalog.maintenance import perform_maintenance

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]  # dow: 0/7=Sunday (cron standard)


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"bad cron step: {step}")
        if part == "*":
            lo2, hi2 = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo2, hi2 = int(a), int(b)
        else:
            lo2 = hi2 = int(part)
        if not (lo <= lo2 <= hi and lo <= hi2 <= hi and lo2 <= hi2):
            raise ValueError(f"cron field out of range [{lo},{hi}]: {part!r}")
        out.update(range(lo2, hi2 + 1, step))
    return out


@dataclass(frozen=True)
class Cron:
    """Parsed 5-field cron expression, standard semantics:
    day-of-week 0 or 7 = Sunday, and when BOTH day-of-month and
    day-of-week are restricted the date matches if EITHER does
    (POSIX crontab behavior)."""

    minutes: frozenset
    hours: frozenset
    days: frozenset
    months: frozenset
    weekdays: frozenset
    dom_star: bool
    dow_star: bool
    expr: str

    @staticmethod
    def parse(expr: str) -> "Cron":
        parts = expr.split()
        if len(parts) != 5:
            raise ValueError(f"cron needs 5 fields: {expr!r}")
        sets = [
            frozenset(_parse_field(p, lo, hi))
            for p, (lo, hi) in zip(parts, _FIELD_RANGES)
        ]
        # normalize 7 (also Sunday) onto 0
        weekdays = frozenset(0 if d == 7 else d for d in sets[4])
        return Cron(
            sets[0],
            sets[1],
            sets[2],
            sets[3],
            weekdays,
            dom_star=parts[2] == "*",
            dow_star=parts[4] == "*",
            expr=expr,
        )

    def matches(self, dt: datetime.datetime) -> bool:
        if not (
            dt.minute in self.minutes
            and dt.hour in self.hours
            and dt.month in self.months
        ):
            return False
        cron_dow = (dt.weekday() + 1) % 7  # python Mon=0 -> cron Sun=0
        dom_ok = dt.day in self.days
        dow_ok = cron_dow in self.weekdays
        if not self.dom_star and not self.dow_star:
            return dom_ok or dow_ok  # POSIX: both restricted => OR
        return dom_ok and dow_ok

    def next_fire(self, after: datetime.datetime) -> datetime.datetime:
        """First matching minute strictly after `after`. Bounded scan
        (4 years covers any valid 5-field expression incl. Feb 29)."""
        dt = after.replace(second=0, microsecond=0) + datetime.timedelta(minutes=1)
        for _ in range(4 * 366 * 24 * 60):
            if self.matches(dt):
                return dt
            dt += datetime.timedelta(minutes=1)
        raise ValueError(f"cron never fires: {self.expr!r}")


@dataclass
class ScheduledJob:
    name: str
    cron: Cron
    fn: object  # callable(now) -> result
    next_fire: datetime.datetime | None = None
    last_result: object = None
    last_error: str | None = None
    runs: int = 0
    failures: int = 0


@dataclass
class MaintenanceSchedule:
    """Poll-driven scheduler: `run_pending(now)` executes every job
    whose fire time has passed (missed ticks collapse into ONE run —
    the reference's run-if-missed catch-up, not a replay storm)."""

    jobs: list[ScheduledJob] = field(default_factory=list)

    def add(
        self,
        name: str,
        cron_expr: str,
        fn,
        now: datetime.datetime,
        jitter_minutes: int = 0,
    ) -> ScheduledJob:
        """`jitter_minutes` > 0 delays the FIRST fire by a
        deterministic per-job offset in [0, jitter_minutes), derived
        from the job name — the reference's jittered initial delay
        (MaintenanceScheduler.java:34-115), there so a fleet of tables
        sharing one cron doesn't thundering-herd the object store.
        Deterministic (hash of name, no RNG) so schedules are
        reproducible and testable; subsequent fires follow the cron
        exactly."""
        job = ScheduledJob(name=name, cron=Cron.parse(cron_expr), fn=fn)
        job.next_fire = job.cron.next_fire(now)
        if jitter_minutes > 0:
            digest = hashlib.sha256(name.encode()).digest()
            offset = int.from_bytes(digest[:4], "big") % jitter_minutes
            job.next_fire += datetime.timedelta(minutes=offset)
        self.jobs.append(job)
        return job

    def add_table_maintenance(
        self,
        catalog,
        ident: str,
        cron_expr: str,
        now: datetime.datetime,
        dry_run: bool = False,
        jitter_minutes: int = 0,
    ) -> ScheduledJob:
        """The reference's per-table schedule: all four jobs in
        MaintenanceRunner order on each fire."""

        def fn(_now):
            return perform_maintenance(catalog.load_table(ident), dry_run=dry_run)

        return self.add(
            f"maintenance:{ident}", cron_expr, fn, now, jitter_minutes=jitter_minutes
        )

    def add_matview_refresh(
        self,
        catalog,
        ident: str,
        cron_expr: str,
        now: datetime.datetime,
        jitter_minutes: int = 0,
    ) -> ScheduledJob:
        """Periodic incremental refresh of a materialized view
        (operators/matview.py) — the natural companion of per-table
        maintenance: refresh cost is O(rows appended since last fire),
        so a frequent cron stays cheap."""

        def fn(_now):
            from ice_spark.operators.matview import refresh_matview

            return refresh_matview(catalog, ident)

        return self.add(
            f"matview:{ident}", cron_expr, fn, now, jitter_minutes=jitter_minutes
        )

    def run_pending(self, now: datetime.datetime) -> dict[str, object]:
        """Per-job error ISOLATION: one failing table's maintenance
        (commit conflict, missing path) must not starve the jobs after
        it or wedge the poll loop — the failure is recorded, the job's
        next fire advances to its next scheduled slot (no immediate
        hot-retry), and the loop continues."""
        ran: dict[str, object] = {}
        for job in self.jobs:
            if job.next_fire is not None and job.next_fire <= now:
                try:
                    job.last_result = job.fn(now)
                    job.last_error = None
                    job.runs += 1
                    ran[job.name] = job.last_result
                except Exception as exc:
                    job.last_error = f"{type(exc).__name__}: {exc}"
                    job.failures += 1
                    ran[job.name] = {"error": job.last_error}
                # collapse missed intervals: schedule from NOW
                job.next_fire = job.cron.next_fire(now)
        return ran

    def due(self, now: datetime.datetime) -> list[str]:
        return [j.name for j in self.jobs if j.next_fire is not None and j.next_fire <= now]


def run_daemon(
    schedule: MaintenanceSchedule,
    *,
    now_fn=None,
    sleep_fn=None,
    poll_sec: float = 30.0,
    max_cycles: int | None = None,
) -> dict:
    """Long-lived scheduler loop — the reference runs maintenance as a
    server-side daemon (MaintenanceScheduler.java:34-115); this is the
    CLI analog (`perform-maintenance --schedule '<cron>'`).

    The loop is the only place with a real clock: each cycle reads
    now_fn(), runs every due job through `run_pending` (which already
    isolates per-job failures and collapses missed ticks), records
    Prometheus counters, then sleeps until the earliest next fire
    (capped at poll_sec so schedule edits/new tables are picked up on
    redeploy). `now_fn`/`sleep_fn` are injectable so tests drive two
    full cycles with a fake clock and zero wall-time; `max_cycles`
    bounds the loop (None = run until interrupted, the daemon mode).

    Returns {"cycles", "runs", "failures"} when the loop ends
    (max_cycles reached or KeyboardInterrupt).
    """
    import time as _time

    from ice_spark.metrics import default_registry

    now_fn = now_fn or datetime.datetime.now
    sleep_fn = sleep_fn or _time.sleep
    reg = default_registry()
    cycles = runs = failures = 0
    try:
        while max_cycles is None or cycles < max_cycles:
            now = now_fn()
            ran = schedule.run_pending(now)
            cycles += 1
            reg.inc(
                "ice_maintenance_scheduler_cycles_total",
                help_="scheduler poll cycles",
            )
            for name, result in ran.items():
                failed = isinstance(result, dict) and "error" in result
                runs += 0 if failed else 1
                failures += 1 if failed else 0
                reg.inc(
                    "ice_maintenance_scheduler_fires_total",
                    {"job": name, "status": "failure" if failed else "success"},
                    help_="scheduled job fires",
                )
            upcoming = [
                j.next_fire for j in schedule.jobs if j.next_fire is not None
            ]
            if max_cycles is not None and cycles >= max_cycles:
                break
            wait = poll_sec
            if upcoming:
                now2 = now_fn()
                wait = min(
                    poll_sec,
                    max(0.0, (min(upcoming) - now2).total_seconds()),
                )
            sleep_fn(wait)
    except KeyboardInterrupt:
        pass
    return {"cycles": cycles, "runs": runs, "failures": failures}
