"""Iceberg-REST-protocol catalog server over `ice_spark.catalog`.

Reference parity: `ice-rest-catalog` serves the Iceberg REST route
surface (Route.java:50-116) from an etcd-backed catalog
(EtcdCatalog.java), dispatching in RESTCatalogAdapter.handle
(RESTCatalogAdapter.java:102-380). This module serves the same route
surface from this engine's snapshot-versioned catalog, on the stdlib
HTTP server (ThreadingHTTPServer — one thread per request; table
mutations funnel through the table-level CAS, namespace-property
updates through a per-Catalog lock + atomic replace, and directory-
level namespace/table create/drop rely on the filesystem's own
atomicity).

Reproduced server behaviors (SURVEY §2.6):

- **Optimistic CAS commits** — the commit route validates the
  client's requirements against freshly loaded metadata, applies the
  updates, and writes through `Table._write_metadata` (the same
  create-exclusive linearization point in-process writers use; the
  filesystem analog of etcd `If(version==v).Then(put)`,
  EtcdCatalog.java:588-640). CAS losers retry up to a budget;
  requirement-validation failures are NOT retried and return 409
  CommitFailedException immediately (RESTCatalogAdapter.commit
  511-567).
- **Auth** — bearer tokens with a per-token read-only flag, plus an
  anonymous-access option (ice-rest-catalog Main.java:353-418,
  Config.java:132-173). Credential *vending* (STS assume-role) is
  AWS-bound and out of sandbox scope; the config carries the flag so
  the surface is visible.
- **Multi-table commit-transaction** — the reference gets atomicity
  from one etcd transaction; a filesystem catalog cannot, so this
  route runs the same validate → apply → compensate saga as
  `catalog/transaction.py` and reports partial failure loudly
  instead of pretending atomicity.
- **Views** — Route.java lists the view routes but EtcdCatalog does
  not implement ViewCatalog, so the reference 400s them. This catalog
  DOES store views, so the view routes are live here (beyond-ref).

Wire format follows the public Iceberg REST OpenAPI: multi-level
namespaces are joined with the 0x1F unit separator in paths, errors
are `{"error": {"message", "type", "code"}}`, table loads return
`{"metadata-location", "metadata"}`.
"""

from __future__ import annotations

import json
import re
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ice_spark.catalog.catalog import Catalog, NamespaceError
from ice_spark.catalog.table import CommitConflictError, NoSuchTableError, Table

UNIT_SEP = "\x1f"
MAX_BODY_BYTES = 8 * 1024 * 1024  # metadata plane: 8 MB is generous


class ServerConfig:
    """tokens: {token_string: {"read_only": bool}}; anonymous allows
    unauthenticated requests (read-write, like the reference's
    anonymous access option)."""

    def __init__(
        self,
        tokens: dict[str, dict] | None = None,
        anonymous: bool = False,
        prefix: str = "ice",
        commit_retries: int = 5,
        storage_credentials: dict[str, str] | None = None,
        commit_lock: "CommitLock | None" = None,
        sts_client=None,
        anonymous_assume_role_arn: str = "",
    ):
        self.tokens = tokens or {}
        self.anonymous = anonymous
        self.prefix = prefix
        self.commit_retries = commit_retries
        # Credential vending: static storage creds returned in
        # LoadTableResult `config` to clients that request access
        # delegation and whose token opts in; tokens carrying an
        # `aws_assume_role_arn` get per-token short-lived STS session
        # credentials instead, assumed through the injectable
        # `sts_client` with cached refresh-before-expiry (reference
        # middlewares: ice-rest-catalog Main.java:297-397,
        # CredentialsProvider.java:21-31,
        # ice/.../aws/s3/VendedCredentialsProvider.java).
        self.storage_credentials = storage_credentials
        from ice_spark.rest.credentials import build_token_providers

        self.token_providers = build_token_providers(
            self.tokens, sts_client, anonymous, anonymous_assume_role_arn
        )
        # Optional per-table commit lock (reference
        # ice-rest-catalog/.../etcd/CommitLock.java:69-146): off by
        # default; CAS alone is correct, the lock serializes commit
        # storms for fairness.
        self.commit_lock = commit_lock


class _ApiError(Exception):
    def __init__(self, code: int, err_type: str, message: str):
        super().__init__(message)
        self.code = code
        self.err_type = err_type
        self.message = message


def _ns_from_path(segment: str) -> str:
    """Decode a namespace path segment: %1F-separated levels per the
    Iceberg REST spec; '.' accepted as a convenience."""
    seg = urllib.parse.unquote(segment)
    return ".".join(p for p in seg.replace(UNIT_SEP, ".").split(".") if p)


def _ns_parts(ns: str) -> list[str]:
    return [p for p in ns.split(".") if p]


def check_requirements(meta: dict, requirements: list[dict]) -> str | None:
    """Validate Iceberg-REST commit requirements against metadata.
    Returns an error string (→ 409, no retry) or None."""
    for req in requirements or []:
        typ = req.get("type")
        if typ == "assert-create":
            # table must not exist — meaningful only pre-create; a
            # loaded table always fails it
            return "assert-create failed: table already exists"
        elif typ == "assert-table-uuid":
            want = req.get("uuid")
            have = meta.get("table_uuid")
            if want != have:
                return f"assert-table-uuid failed: expected {want}, found {have}"
        elif typ == "assert-ref-snapshot-id":
            ref = req.get("ref", "main")
            want = req.get("snapshot-id")  # None = ref must not exist / no snapshot
            if ref == "main":
                have = meta.get("current_snapshot_id")
            else:
                have = meta.get("refs", {}).get(ref)
            if want != have:
                return (
                    f"assert-ref-snapshot-id failed for {ref!r}: "
                    f"expected {want}, found {have}"
                )
        else:
            raise _ApiError(400, "BadRequestException", f"unsupported requirement: {typ}")
    return None


def apply_updates(meta: dict, updates: list[dict]) -> dict:
    """Apply Iceberg-REST metadata updates to this engine's metadata
    dict. Unsupported actions 400 loudly rather than silently no-op."""
    for upd in updates or []:
        action = upd.get("action")
        if action == "set-properties":
            meta.setdefault("properties", {}).update(upd.get("updates", {}))
        elif action == "remove-properties":
            props = meta.setdefault("properties", {})
            for k in upd.get("removals", []):
                props.pop(k, None)
        elif action == "add-snapshot":
            snap = upd.get("snapshot")
            if not isinstance(snap, dict) or "snapshot_id" not in snap:
                raise _ApiError(
                    400, "BadRequestException", "add-snapshot needs a snapshot dict with snapshot_id"
                )
            if any(s["snapshot_id"] == snap["snapshot_id"] for s in meta.get("snapshots", [])):
                raise _ApiError(
                    400, "BadRequestException", f"duplicate snapshot id {snap['snapshot_id']}"
                )
            meta.setdefault("snapshots", []).append(snap)
        elif action == "set-snapshot-ref" or action == "set-ref":
            name = upd.get("ref-name") or upd.get("name")
            sid = upd.get("snapshot-id")
            if name is None:
                raise _ApiError(400, "BadRequestException", "set-ref needs ref-name")
            if sid is not None and not any(
                s["snapshot_id"] == sid for s in meta.get("snapshots", [])
            ):
                raise _ApiError(400, "BadRequestException", f"no snapshot {sid}")
            if name == "main":
                meta["current_snapshot_id"] = sid
            else:
                meta.setdefault("refs", {})[name] = sid
        elif action == "remove-snapshot-ref" or action == "remove-ref":
            name = upd.get("ref-name") or upd.get("name")
            meta.get("refs", {}).pop(name, None)
        else:
            raise _ApiError(400, "BadRequestException", f"unsupported update action: {action}")
    return meta


class RestCatalogServer:
    """Own a Catalog + HTTP listener. `start()` binds and serves on a
    daemon thread; `url` is the base endpoint."""

    def __init__(self, catalog: Catalog, config: ServerConfig | None = None, port: int = 0):
        self.catalog = catalog
        self.config = config or ServerConfig(anonymous=True)
        self._port = port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # report-metrics sink, bounded so a chatty (or hostile) client
        # can't grow server memory without limit
        from collections import deque

        self.metrics_reports: deque = deque(maxlen=1000)
        # Prometheus exposition (reference: PrometheusMetricsReporter
        # .java + examples/grafana/METRICS.md). Per-server registry so
        # parallel test servers don't cross-contaminate counters.
        from ice_spark.metrics import MetricsRegistry

        self.metrics = MetricsRegistry()
        self.metrics.register_collector(self._catalog_gauges)
        self._tls = threading.local()  # per-request headers (vending)

    def _catalog_gauges(self):
        """Live catalog-size gauges, evaluated at scrape time
        (CatalogMetrics.java: iceberg_catalog_tables/namespaces)."""
        n_tables = 0
        n_ns = 0
        stack = [None]
        while stack:
            parent = stack.pop()
            for ns in self.catalog.list_namespaces(parent):
                n_ns += 1
                stack.append(ns)
                try:
                    n_tables += len(self.catalog.list_tables(ns))
                except NamespaceError:
                    pass
        cat = {"catalog": self.config.prefix}
        return [
            ("iceberg_catalog_tables", cat, n_tables, "tables in the catalog"),
            ("iceberg_catalog_namespaces", cat, n_ns, "namespaces in the catalog"),
        ]

    # ---------- lifecycle ----------

    def start(self) -> "RestCatalogServer":
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer(("127.0.0.1", self._port), handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    @property
    def url(self) -> str:
        assert self._httpd, "server not started"
        return f"http://127.0.0.1:{self._httpd.server_address[1]}"

    # ---------- auth ----------

    def authorize(self, headers, write: bool) -> None:
        auth = headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            token = auth[len("Bearer "):]
            info = self.config.tokens.get(token)
            if info is None:
                raise _ApiError(401, "NotAuthorizedException", "invalid token")
            if write and info.get("read_only"):
                raise _ApiError(403, "ForbiddenException", "token is read-only")
            return
        if not self.config.anonymous:
            raise _ApiError(401, "NotAuthorizedException", "missing bearer token")

    def _count_op(self, operation: str) -> None:
        # CatalogMetrics.java: iceberg_catalog_operations_total
        self.metrics.inc(
            "iceberg_catalog_operations_total",
            {"catalog": self.config.prefix, "operation": operation},
            help_="catalog operations",
        )

    # ---------- route implementations (each returns (code, body|None)) ----------

    def rt_token(self, body: dict):
        # OAuth client-credentials stub (reference tokens route)
        return 200, {
            "access_token": "anonymous" if self.config.anonymous else "",
            "token_type": "bearer",
            "expires_in": 3600,
        }

    def rt_config(self, params: dict):
        return 200, {
            "defaults": {},
            "overrides": {"prefix": self.config.prefix},
            "endpoints": [],
        }

    @staticmethod
    def _paginate(items: list, params: dict, key: str) -> dict:
        """Iceberg REST list pagination: opaque pageToken (an index
        here), pageSize caps the page, next-page-token present iff
        more remain. No pageSize → whole list, no token."""
        out = {key: items}
        size = params.get("pageSize", [None])[0]
        token = params.get("pageToken", ["0"])[0]
        if size is None:
            return out
        try:
            start, n = int(token), int(size)
        except ValueError:
            raise _ApiError(400, "BadRequestException", "bad pageToken/pageSize")
        if n <= 0 or start < 0:
            raise _ApiError(
                400, "BadRequestException", "pageSize must be positive, pageToken non-negative"
            )
        page = items[start : start + n]
        out[key] = page
        if start + n < len(items):
            out["next-page-token"] = str(start + n)
        return out

    def rt_list_namespaces(self, params: dict):
        parent = _ns_from_path(params.get("parent", [""])[0]) if "parent" in params else None
        try:
            names = self.catalog.list_namespaces(parent or None)
        except NamespaceError as e:
            raise _ApiError(404, "NoSuchNamespaceException", str(e))
        return 200, self._paginate([_ns_parts(n) for n in names], params, "namespaces")

    def rt_create_namespace(self, body: dict):
        ns = ".".join(body.get("namespace", []))
        if not ns:
            raise _ApiError(400, "BadRequestException", "namespace is required")
        try:
            self.catalog.create_namespace(ns)
        except NamespaceError as e:
            msg = str(e)
            if "exists" in msg:
                raise _ApiError(409, "AlreadyExistsException", msg)
            raise _ApiError(404, "NoSuchNamespaceException", msg)
        self._count_op("create_namespace")
        return 200, {"namespace": _ns_parts(ns), "properties": body.get("properties", {})}

    def _require_ns(self, ns: str) -> str:
        if not self.catalog.namespace_exists(ns):
            raise _ApiError(404, "NoSuchNamespaceException", f"no such namespace: {ns}")
        return ns

    def rt_load_namespace(self, ns: str):
        self._require_ns(ns)
        return 200, {
            "namespace": _ns_parts(ns),
            "properties": self.catalog.namespace_properties(ns),
        }

    def rt_update_namespace_properties(self, ns: str, body: dict):
        try:
            out = self.catalog.update_namespace_properties(
                ns, removals=body.get("removals"), updates=body.get("updates")
            )
        except NamespaceError as e:
            raise _ApiError(404, "NoSuchNamespaceException", str(e))
        return 200, out

    def rt_namespace_exists(self, ns: str):
        self._require_ns(ns)
        return 204, None

    def rt_drop_namespace(self, ns: str):
        try:
            self.catalog.delete_namespace(ns)
        except NamespaceError as e:
            msg = str(e)
            if "not empty" in msg:
                raise _ApiError(409, "NamespaceNotEmptyException", msg)
            raise _ApiError(404, "NoSuchNamespaceException", msg)
        self._count_op("drop_namespace")
        return 204, None

    def rt_list_tables(self, ns: str, params: dict):
        try:
            names = self.catalog.list_tables(ns)
        except NamespaceError as e:
            raise _ApiError(404, "NoSuchNamespaceException", str(e))
        idents = [{"namespace": _ns_parts(ns), "name": t} for t in names]
        return 200, self._paginate(idents, params, "identifiers")

    def _vended_config(self) -> dict:
        """Storage credentials for LoadTableResult `config`, when (a)
        the server is configured to vend, (b) the client asked via the
        Iceberg REST `X-Iceberg-Access-Delegation: vended-credentials`
        header, and (c) the request's token opts in (anonymous servers
        vend to everyone, like the reference's anonymous mode).
        Tokens with an assume-role provider get fresh STS session
        credentials layered over the static config
        (Main.java:374-396)."""
        if not self.config.storage_credentials and not self.config.token_providers:
            return {}
        headers = getattr(self._tls, "headers", None)
        if headers is None:
            return {}
        delegation = headers.get("X-Iceberg-Access-Delegation", "")
        if "vended-credentials" not in delegation:
            return {}
        auth = headers.get("Authorization", "")
        token = auth[len("Bearer "):] if auth.startswith("Bearer ") else ""
        if token:
            info = self.config.tokens.get(token, {})
            if not info.get("vend_credentials"):
                return {}
        provider = self.config.token_providers.get(token)
        out = dict(self.config.storage_credentials or {})
        if provider is not None:
            out.update(provider.storage_config())
        return out

    def _load_table_result(self, table: Table):
        # pair location and body from the SAME refreshed in-memory
        # state (table._version/_meta) — re-scanning the filesystem
        # here could pair a newer location with an older body under a
        # concurrent commit
        return {
            "metadata-location": table.metadata_path(table._version),
            "metadata": table.meta,
            "config": self._vended_config(),
        }

    def rt_create_table(self, ns: str, body: dict):
        self._require_ns(ns)
        name = body.get("name")
        if not name:
            raise _ApiError(400, "BadRequestException", "table name is required")
        schema_json = body.get("schema")
        if not schema_json:
            raise _ApiError(400, "BadRequestException", "schema is required")
        from pyspark.sql.types import StructType

        try:
            schema = StructType.fromJson(schema_json)
        except Exception as e:
            raise _ApiError(400, "BadRequestException", f"bad schema: {e}")
        ident = f"{ns}.{name}"
        try:
            t = self.catalog.create_table(
                ident,
                schema=schema,
                partition_spec=body.get("partition-spec"),
                sort_order=body.get("write-order"),
                properties=body.get("properties"),
                location=body.get("location"),
            )
        except ValueError as e:
            msg = str(e)
            if "exists" in msg:
                raise _ApiError(409, "AlreadyExistsException", msg)
            raise _ApiError(400, "BadRequestException", msg)
        self._count_op("create_table")
        return 200, self._load_table_result(t)

    def _load(self, ns: str, name: str) -> Table:
        try:
            return self.catalog.load_table(f"{ns}.{name}")
        except (NoSuchTableError, NamespaceError) as e:
            raise _ApiError(404, "NoSuchTableException", str(e))

    def rt_load_table(self, ns: str, name: str):
        return 200, self._load_table_result(self._load(ns, name))

    def rt_table_exists(self, ns: str, name: str):
        self._load(ns, name)
        return 204, None

    def rt_drop_table(self, ns: str, name: str, params: dict):
        purge = params.get("purgeRequested", ["false"])[0].lower() == "true"
        try:
            self.catalog.drop_table(f"{ns}.{name}", purge=purge)
        except (NoSuchTableError, NamespaceError) as e:
            raise _ApiError(404, "NoSuchTableException", str(e))
        self._count_op("drop_table")
        return 204, None

    def rt_rename_table(self, body: dict):
        src = body.get("source", {})
        dst = body.get("destination", {})
        s_ident = ".".join(src.get("namespace", []) + [src.get("name", "")])
        d_ident = ".".join(dst.get("namespace", []) + [dst.get("name", "")])
        try:
            self.catalog.rename_table(s_ident, d_ident)
        except (NoSuchTableError, NamespaceError) as e:
            raise _ApiError(404, "NoSuchTableException", str(e))
        except ValueError as e:
            raise _ApiError(409, "AlreadyExistsException", str(e))
        return 204, None

    def rt_register_table(self, ns: str, body: dict):
        self._require_ns(ns)
        name = body.get("name")
        loc = body.get("metadata-location")
        if not name or not loc:
            raise _ApiError(400, "BadRequestException", "need name and metadata-location")
        try:
            t = self.catalog.register_table(f"{ns}.{name}", loc)
        except ValueError as e:
            msg = str(e)
            if "exists" in msg:
                raise _ApiError(409, "AlreadyExistsException", msg)
            raise _ApiError(400, "BadRequestException", msg)
        return 200, self._load_table_result(t)

    def commit_to_table(self, table: Table, requirements: list[dict], updates: list[dict]) -> Table:
        """Requirement-checked CAS commit with retry budget. CAS
        conflicts retry against fresh metadata; requirement failures
        abort immediately (RESTCatalogAdapter.commit 511-567)."""
        retries = self.config.commit_retries
        ident = table.identifier or table.location
        ns, _, name = ident.rpartition(".")
        commit_labels = {"catalog": self.config.prefix, "namespace": ns, "table": name}
        t0 = time.monotonic()
        if self.config.commit_lock is not None:
            from ice_spark.rest.commit_lock import LockTimeout

            lock_t0 = time.monotonic()
            try:
                cm = self.config.commit_lock.acquire(ident)
                cm.__enter__()
            except LockTimeout as e:
                self.metrics.inc(
                    "iceberg_commit_lock_acquire_timeouts_total",
                    {"catalog": self.config.prefix},
                    help_="commit-lock acquire timeouts (503s)",
                )
                raise _ApiError(503, "ServiceUnavailableException", str(e))
            self.metrics.observe(
                "iceberg_commit_lock_acquire_seconds",
                time.monotonic() - lock_t0,
                {"catalog": self.config.prefix},
                help_="time to acquire the per-table commit lock",
            )
            held_t0 = time.monotonic()
            try:
                return self._commit_cas(table, requirements, updates, commit_labels, t0, retries)
            finally:
                self.metrics.observe(
                    "iceberg_commit_lock_held_seconds",
                    time.monotonic() - held_t0,
                    {"catalog": self.config.prefix},
                    help_="time the commit lock was held",
                )
                cm.__exit__(None, None, None)
        return self._commit_cas(table, requirements, updates, commit_labels, t0, retries)

    def _commit_cas(
        self,
        table: Table,
        requirements: list[dict],
        updates: list[dict],
        commit_labels: dict,
        t0: float,
        retries: int,
    ) -> Table:
        for attempt in range(retries + 1):
            table.refresh()
            meta = json.loads(json.dumps(table.meta))
            fail = check_requirements(meta, requirements)
            if fail:
                raise _ApiError(409, "CommitFailedException", fail)
            meta = apply_updates(meta, updates)
            try:
                table._write_metadata(meta, expected_version=table._version)
                # CatalogMetrics.java commit counters
                self.metrics.inc(
                    "iceberg_commits_total", commit_labels, help_="table commits"
                )
                self.metrics.observe(
                    "iceberg_commit_duration_seconds",
                    time.monotonic() - t0,
                    commit_labels,
                    help_="commit duration",
                )
                return table.refresh()
            except CommitConflictError:
                self.metrics.inc(
                    "iceberg_commit_retries_total",
                    commit_labels,
                    help_="server-side retries after a commit CAS conflict",
                )
                if attempt == retries:
                    raise _ApiError(
                        409, "CommitFailedException", "CAS retry budget exhausted"
                    )
                time.sleep(min(0.02 * (2**attempt), 1.0))
        raise AssertionError("unreachable")

    def rt_update_table(self, ns: str, name: str, body: dict):
        table = self._load(ns, name)
        t = self.commit_to_table(
            table, body.get("requirements", []), body.get("updates", [])
        )
        return 200, {
            "metadata-location": t.metadata_path(t._version),
            "metadata": t.meta,
        }

    def rt_commit_transaction(self, body: dict):
        """Multi-table commit. On the etcd backend this is truly
        atomic: ONE etcd transaction compares every table's pointer
        version and puts every new pointer (EtcdCatalog.
        commit_transaction — the reference's actual atomicity model,
        EtcdCatalog.java:588-640 generalized to N keys). Filesystem/
        SQLite catalogs can't express a multi-key CAS, so they keep
        the honest validate→apply→compensate saga (restoring the
        pre-commit metadata content as a NEW version on failure — the
        shape of catalog/transaction.py, surfaced over REST)."""
        changes = body.get("table-changes", [])
        plan = []
        seen: set[str] = set()
        for ch in changes:
            ident_obj = ch.get("identifier", {})
            ident = ".".join(ident_obj.get("namespace", []) + [ident_obj.get("name", "")])
            if ident in seen:
                raise _ApiError(
                    400, "BadRequestException", f"duplicate table in transaction: {ident}"
                )
            seen.add(ident)
            try:
                t = self.catalog.load_table(ident)
            except (NoSuchTableError, NamespaceError) as e:
                raise _ApiError(404, "NoSuchTableException", str(e))
            fail = check_requirements(t.meta, ch.get("requirements", []))
            if fail:
                raise _ApiError(409, "CommitFailedException", f"{ident}: {fail}")
            plan.append((ident, t, ch))

        if hasattr(self.catalog, "commit_transaction"):
            return self._commit_transaction_atomic(plan)

        committed: list[tuple[str, Table, dict, int]] = []
        for ident, t, ch in plan:
            pre_meta = json.loads(json.dumps(t.meta))
            try:
                self.commit_to_table(t, ch.get("requirements", []), ch.get("updates", []))
                committed.append((ident, t, pre_meta, t._version))
            except _ApiError as e:
                stuck = []
                for done_ident, done_t, done_pre, done_ver in reversed(committed):
                    # Compensation must not clobber a writer that
                    # landed AFTER our member commit: CAS directly
                    # against the exact version our commit produced.
                    # A conflict means someone built on our state —
                    # rolling back would be a lost update for them,
                    # so that table is honestly reported 'stuck'
                    # (same contract as catalog/transaction.py).
                    try:
                        done_t.refresh()
                        meta = json.loads(json.dumps(done_t.meta))
                        done_t._write_metadata(
                            _restore(meta, done_pre), expected_version=done_ver
                        )
                    except Exception:
                        stuck.append(done_ident)
                detail = {
                    "failed": ident,
                    "message": e.message,
                    "rolled_back": [i for i, _, _, _ in committed if i not in stuck],
                    "stuck": stuck,
                }
                raise _ApiError(
                    e.code, "CommitFailedException", json.dumps(detail)
                )
        return 204, None

    def _commit_transaction_atomic(self, plan: list[tuple[str, Table, dict]]):
        """All-or-nothing multi-table commit for catalogs exposing a
        multi-key CAS (EtcdCatalog.commit_transaction). Per-attempt:
        refresh every member, re-check every requirement against
        fresh metadata, apply updates, then ONE registry transaction.
        A lost CAS retries the whole cycle (same budget as the
        single-table path); requirement failures abort immediately
        with no state change anywhere. Per-table commit locks, when
        configured, are acquired in sorted identifier order — the
        reference's multi-table ordering (etcd/CommitLock.java:69-146)
        — so two transactions over overlapping table sets can't
        deadlock."""
        from contextlib import ExitStack

        retries = self.config.commit_retries
        t0 = time.monotonic()
        with ExitStack() as stack:
            if self.config.commit_lock is not None:
                from ice_spark.rest.commit_lock import LockTimeout

                for ident, _, _ in sorted(plan, key=lambda p: p[0]):
                    try:
                        stack.enter_context(self.config.commit_lock.acquire(ident))
                    except LockTimeout as e:
                        raise _ApiError(503, "ServiceUnavailableException", str(e))
            for attempt in range(retries + 1):
                items = []
                for ident, t, ch in plan:
                    t.refresh()
                    meta = json.loads(json.dumps(t.meta))
                    fail = check_requirements(meta, ch.get("requirements", []))
                    if fail:
                        raise _ApiError(
                            409, "CommitFailedException", f"{ident}: {fail}"
                        )
                    meta = apply_updates(meta, ch.get("updates", []))
                    items.append((t, meta, t._version))
                try:
                    self.catalog.commit_transaction(items)
                except CommitConflictError:
                    self.metrics.inc(
                        "iceberg_commit_retries_total",
                        {"catalog": self.config.prefix},
                        help_="server-side retries after a commit CAS conflict",
                    )
                    if attempt == retries:
                        raise _ApiError(
                            409, "CommitFailedException", "CAS retry budget exhausted"
                        )
                    time.sleep(min(0.02 * (2**attempt), 1.0))
                    continue
                for ident, t, _ in plan:
                    ns, _, name = ident.rpartition(".")
                    self.metrics.inc(
                        "iceberg_commits_total",
                        {"catalog": self.config.prefix, "namespace": ns, "table": name},
                        help_="table commits",
                    )
                self.metrics.observe(
                    "iceberg_commit_duration_seconds",
                    time.monotonic() - t0,
                    {"catalog": self.config.prefix},
                    help_="commit duration",
                )
                return 204, None
        raise AssertionError("unreachable")

    def rt_report_metrics(self, ns: str, name: str, body: dict):
        """Store the raw report AND convert it into Prometheus
        counters, the reference's PrometheusMetricsReporter role
        (scan-report → iceberg_scan_*, commit-report →
        iceberg_commit_* / iceberg_table_snapshots_total)."""
        self._load(ns, name)
        self.metrics_reports.append({"table": f"{ns}.{name}", "report": body})
        tl = {"catalog": self.config.prefix, "namespace": ns, "table": name}
        try:
            rtype = body.get("report-type", "")
            metrics = body.get("metrics", {}) or {}

            def _counter_val(key: str) -> int:
                m = metrics.get(key)
                if isinstance(m, dict):
                    return int(m.get("value", m.get("count", 0)) or 0)
                return int(m or 0)

            if rtype == "scan-report":
                self.metrics.inc("iceberg_scans_total", tl, help_="table scans")
                for rep_key, prom in (
                    ("result-data-files", "iceberg_scan_result_data_files_total"),
                    ("result-delete-files", "iceberg_scan_result_delete_files_total"),
                    ("scanned-data-manifests", "iceberg_scan_scanned_data_manifests"),
                    ("skipped-data-manifests", "iceberg_scan_skipped_data_manifests"),
                    ("total-file-size-in-bytes", "iceberg_scan_total_file_size_bytes"),
                ):
                    v = _counter_val(rep_key)
                    if v:
                        self.metrics.inc(prom, tl, v, help_=rep_key)
            elif rtype == "commit-report":
                op = body.get("operation", "")
                cl = {**tl, "operation": op}
                self.metrics.inc(
                    "iceberg_table_snapshots_total", tl, help_="snapshots via commit reports"
                )
                for rep_key, prom in (
                    ("added-data-files", "iceberg_commit_added_data_files_total"),
                    ("removed-data-files", "iceberg_commit_removed_data_files_total"),
                    ("added-records", "iceberg_commit_added_records_total"),
                    ("removed-records", "iceberg_commit_removed_records_total"),
                    ("total-files-size-in-bytes", "iceberg_commit_total_files_size_bytes"),
                ):
                    v = _counter_val(rep_key)
                    if v:
                        self.metrics.inc(prom, cl, v, help_=rep_key)
            self.metrics.set_gauge(
                "iceberg_metrics_reporter_active", None, 1, help_="reporter liveness"
            )
        except Exception:  # noqa: BLE001 — a malformed report must still 204
            self.metrics.inc(
                "iceberg_metrics_report_errors_total",
                {"type": "parse"},
                help_="metrics report processing errors",
            )
        return 204, None

    # ---------- views (beyond-ref: EtcdCatalog lacks ViewCatalog) ----------

    def rt_list_views(self, ns: str, params: dict):
        try:
            names = self.catalog.list_views(ns)
        except NamespaceError as e:
            raise _ApiError(404, "NoSuchNamespaceException", str(e))
        idents = [{"namespace": _ns_parts(ns), "name": v} for v in names]
        return 200, self._paginate(idents, params, "identifiers")

    def rt_create_view(self, ns: str, body: dict):
        self._require_ns(ns)
        name = body.get("name")
        sql = (body.get("view-version") or {}).get("sql") or body.get("sql")
        if not name or not sql:
            raise _ApiError(400, "BadRequestException", "need name and sql")
        try:
            view = self.catalog.create_view(f"{ns}.{name}", sql, comment=body.get("comment", ""))
        except ValueError as e:
            raise _ApiError(409, "AlreadyExistsException", str(e))
        return 200, {"view": view}

    def rt_load_view(self, ns: str, name: str):
        try:
            return 200, {"view": self.catalog.load_view(f"{ns}.{name}")}
        except (ValueError, NamespaceError) as e:
            raise _ApiError(404, "NoSuchViewException", str(e))

    def rt_drop_view(self, ns: str, name: str):
        try:
            self.catalog.drop_view(f"{ns}.{name}")
        except (ValueError, NamespaceError) as e:
            raise _ApiError(404, "NoSuchViewException", str(e))
        return 204, None


def _restore(meta: dict, pre: dict) -> dict:
    """Compensation mutate: restore the pre-transaction content while
    keeping the metadata_log history the commit loop appends."""
    keep_log = meta.get("metadata_log", [])
    out = json.loads(json.dumps(pre))
    out["metadata_log"] = keep_log
    return out


# ---------- HTTP plumbing ----------

# (method, regex on path) → (handler attr, needs_write, arg builder)
# mirrors the Route enum table (Route.java:50-116)
_ROUTES: list[tuple[str, re.Pattern, str, bool]] = [
    ("POST", re.compile(r"^/v1/oauth/tokens$"), "token", False),
    ("GET", re.compile(r"^/v1/config$"), "config", False),
    ("GET", re.compile(r"^/v1(?:/[^/]+)?/namespaces$"), "list_namespaces", False),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces$"), "create_namespace", True),
    ("GET", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)$"), "load_namespace", False),
    ("HEAD", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)$"), "namespace_exists", False),
    ("DELETE", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)$"), "drop_namespace", True),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/properties$"), "update_namespace_properties", True),
    ("GET", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables$"), "list_tables", False),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables$"), "create_table", True),
    ("GET", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables/(?P<t>[^/]+)$"), "load_table", False),
    ("HEAD", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables/(?P<t>[^/]+)$"), "table_exists", False),
    ("DELETE", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables/(?P<t>[^/]+)$"), "drop_table", True),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables/(?P<t>[^/]+)$"), "update_table", True),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/tables/rename$"), "rename_table", True),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/register$"), "register_table", True),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/tables/(?P<t>[^/]+)/metrics$"), "report_metrics", False),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/transactions/commit$"), "commit_transaction", True),
    ("GET", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/views$"), "list_views", False),
    ("POST", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/views$"), "create_view", True),
    ("GET", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/views/(?P<t>[^/]+)$"), "load_view", False),
    ("DELETE", re.compile(r"^/v1(?:/[^/]+)?/namespaces/(?P<ns>[^/]+)/views/(?P<t>[^/]+)$"), "drop_view", True),
]


def _make_handler(server: RestCatalogServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _dispatch(self, method: str):
            parsed = urllib.parse.urlsplit(self.path)
            if method == "GET" and parsed.path == "/metrics":
                # Scrape endpoint. The reference isolates Prometheus on
                # a dedicated port (Main.java); here it shares the API
                # port, and metric labels carry namespace/table names —
                # so on a token-protected server the scrape requires a
                # valid bearer token too (read-only tokens suffice:
                # scraping is a read). Anonymous servers stay open, and
                # the server binds 127.0.0.1 either way. (ADVICE r6)
                if not server.config.anonymous:
                    try:
                        server.authorize(self.headers, write=False)
                    except _ApiError as e:
                        return self._send_error(e)
                data = server.metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            params = urllib.parse.parse_qs(parsed.query)
            body = {}
            length = int(self.headers.get("Content-Length") or 0)
            if length > MAX_BODY_BYTES:
                # drain in bounded chunks (never buffering the whole
                # body) so the client can finish writing and read the
                # 413 instead of hitting a broken pipe
                remaining = length
                while remaining > 0:
                    chunk = self.rfile.read(min(65536, remaining))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                return self._send_error(
                    _ApiError(
                        413,
                        "PayloadTooLargeException",
                        f"body {length} bytes exceeds {MAX_BODY_BYTES}",
                    )
                )
            if length:
                raw = self.rfile.read(length)
                if raw:
                    try:
                        body = json.loads(raw)
                    except json.JSONDecodeError:
                        return self._send_error(
                            _ApiError(400, "BadRequestException", "invalid JSON body")
                        )
            for m, pat, name, needs_write in _ROUTES:
                if m != method:
                    continue
                match = pat.match(parsed.path)
                if not match:
                    continue
                # HttpMetrics.java: iceberg_http_requests_total /
                # iceberg_http_responses_total / request duration.
                http_labels = {"method": method, "route": name.upper()}
                self._http_labels = http_labels
                server._tls.headers = self.headers
                server.metrics.inc(
                    "iceberg_http_requests_total", http_labels, help_="HTTP requests"
                )
                server.metrics.add_gauge(
                    "iceberg_http_requests_in_flight", None, 1,
                    help_="requests currently being processed",
                )
                t0 = time.monotonic()

                def _resp(code: int) -> None:
                    server.metrics.add_gauge(
                        "iceberg_http_requests_in_flight", None, -1,
                        help_="requests currently being processed",
                    )
                    server.metrics.inc(
                        "iceberg_http_responses_total",
                        {**http_labels, "status_class": str(code)},
                        help_="HTTP responses by status",
                    )
                    server.metrics.observe(
                        "iceberg_http_request_duration_seconds",
                        time.monotonic() - t0,
                        http_labels,
                        help_="HTTP request duration",
                    )

                try:
                    # the oauth token endpoint is pre-auth by nature:
                    # it's how a client WOULD obtain credentials
                    if name != "token":
                        server.authorize(self.headers, write=needs_write)
                    groups = match.groupdict()
                    args = []
                    if "ns" in groups:
                        args.append(_ns_from_path(groups["ns"]))
                    if "t" in groups:
                        args.append(urllib.parse.unquote(groups["t"]))
                    fn = getattr(server, f"rt_{name}")
                    # pass params/body per route arity
                    if name in ("config", "list_namespaces"):
                        code, payload = fn(params)
                    elif name in ("drop_table", "list_tables", "list_views"):
                        code, payload = fn(*args, params)
                    elif method in ("POST",):
                        code, payload = fn(*args, body) if args else fn(body)
                    else:
                        code, payload = fn(*args)
                except _ApiError as e:
                    _resp(e.code)
                    return self._send_error(e)
                except Exception as e:  # noqa: BLE001 — server must not crash
                    _resp(500)
                    return self._send_error(
                        _ApiError(500, "InternalServerError", f"{type(e).__name__}: {e}")
                    )
                _resp(code)
                return self._send_json(code, payload, head_only=(method == "HEAD"))
            self._send_error(
                _ApiError(404, "NotFoundException", f"no route: {method} {parsed.path}")
            )

        def _send_json(self, code: int, payload, head_only: bool = False):
            data = b"" if payload is None else json.dumps(payload).encode()
            labels = getattr(self, "_http_labels", None)
            if labels is not None and data:
                server.metrics.inc(
                    "iceberg_http_response_size_bytes_total", labels, len(data),
                    help_="response bytes",
                )
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if data and not head_only:
                self.wfile.write(data)

        def _send_error(self, e: _ApiError):
            payload = {"error": {"message": e.message, "type": e.err_type, "code": e.code}}
            data = json.dumps(payload).encode()
            self.send_response(e.code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(data)

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

        def do_HEAD(self):
            self._dispatch("HEAD")

    return Handler
