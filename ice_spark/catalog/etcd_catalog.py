"""etcd-backed catalog registry (the reference's production backend).

Reference parity: ice-rest-catalog's primary deployment stores the
catalog registry in etcd (ice-rest-catalog/.../etcd/EtcdCatalog.java,
docs/etcd-backend-schema.md). Key layout — reproduced here exactly:

    n/<ns-path>            namespace entry, value = JSON properties map
    t/<ns-path>/<table>    table entry, value = {"table_type": "ICEBERG",
                           "metadata_location": ...,
                           "previous_metadata_location": ...}

with dots in namespace identifiers becoming ``/`` in keys, and a
``<catalogName>/`` key prefix for non-"default" catalogs
(EtcdCatalog.java:224-229,477-482).

The defining behavior of the etcd backend — unlike the filesystem and
SQLite registries, where the metadata version file's O_EXCL create is
the commit linearization point — is that **the etcd transaction is the
linearization point** (EtcdCatalog.java:588-640): a commit writes the
new metadata JSON to storage first, then swaps the ``metadata_location``
pointer with a version-CAS transaction
(``If(version==v).Then(put)``); a failed transaction deletes the
orphaned metadata file and surfaces a commit conflict
(EtcdCatalog.java:624-639). `EtcdTable` reproduces that protocol,
including uuid-suffixed metadata file names so racing committers never
overwrite each other's attempt files (the reference inherits
`%05d-<uuid>.metadata.json` naming from BaseMetastoreTableOperations).

Namespace mutations use the same version-CAS pattern: create compares
version==0 (EtcdCatalog.java:203-211), property updates compare the
read version (EtcdCatalog.java:379-388,411-419), rename is a single
transaction comparing both keys (EtcdCatalog.java:537-548).

etcd access goes through the injectable `EtcdKV` seam, mirroring the
S3/GCS/Azure/SQS pattern elsewhere in this repo: `InMemoryEtcd`
reproduces etcd's per-key version semantics for tests (version =
modification count since creation, reset on delete/recreate, 0 ≡
absent — jetcd ``CmpTarget.version``); `Etcd3KV` binds the same
interface to the real ``etcd3`` client when that package is installed.

Public API is identical to `catalog.Catalog` / `SqliteCatalog`, so the
CLI and REST server take any of the three interchangeably.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import uuid as _uuid

from pyspark.sql import SparkSession
from pyspark.sql import types as SPT

from ice_spark.catalog.catalog import NamespaceError, _split_ident
from ice_spark.catalog.fileio import DEFAULT_IO, FileIO
from ice_spark.catalog.table import (
    CommitConflictError,
    NoSuchTableError,
    Table,
    _now_ms,
)

# ---------------------------------------------------------------------------
# KV seam


class KVEntry:
    """One etcd key-value: `version` is etcd's per-key modification
    counter (1 on create, +1 per put, resets on delete+recreate)."""

    __slots__ = ("key", "value", "version")

    def __init__(self, key: str, value: str, version: int):
        self.key = key
        self.value = value
        self.version = version


class EtcdKV:
    """Minimal etcd KV surface the catalog needs. `txn` is etcd's
    If(compares).Then(ops) transaction: compares are
    (key, expected_version) pairs (0 = key absent), ops are
    ("put", key, value) / ("delete", key). Returns txn success."""

    def get(self, key: str) -> KVEntry | None:
        raise NotImplementedError

    def get_prefix(self, prefix: str) -> list[KVEntry]:
        raise NotImplementedError

    def put(self, key: str, value: str) -> None:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def txn(self, compares: list[tuple[str, int]], ops: list[tuple]) -> bool:
        raise NotImplementedError


class InMemoryEtcd(EtcdKV):
    """In-process etcd double with real etcd version semantics, used
    by tests and as the zero-dependency default. Thread-safe: the lock
    makes every txn atomic, which is exactly the serializability the
    real etcd provides."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._data: dict[str, tuple[str, int]] = {}
        self.txn_count = 0
        self.failed_txn_count = 0

    def get(self, key: str) -> KVEntry | None:
        with self._lock:
            ent = self._data.get(key)
            return KVEntry(key, ent[0], ent[1]) if ent else None

    def get_prefix(self, prefix: str) -> list[KVEntry]:
        with self._lock:
            return [
                KVEntry(k, v[0], v[1])
                for k, v in sorted(self._data.items())
                if k.startswith(prefix)
            ]

    def put(self, key: str, value: str) -> None:
        with self._lock:
            self._put_locked(key, value)

    def _put_locked(self, key: str, value: str) -> None:
        old = self._data.get(key)
        self._data[key] = (value, (old[1] if old else 0) + 1)

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)

    def txn(self, compares: list[tuple[str, int]], ops: list[tuple]) -> bool:
        with self._lock:
            self.txn_count += 1
            for key, expected in compares:
                ent = self._data.get(key)
                version = ent[1] if ent else 0
                if version != expected:
                    self.failed_txn_count += 1
                    return False
            for op in ops:
                if op[0] == "put":
                    self._put_locked(op[1], op[2])
                elif op[0] == "delete":
                    self._data.pop(op[1], None)
                else:  # pragma: no cover - programming error
                    raise ValueError(f"unknown txn op: {op[0]}")
            return True


class Etcd3KV(EtcdKV):
    """Binding to the real `etcd3` (gRPC) client. Call shapes follow
    python-etcd3's transaction API, which maps 1:1 onto the jetcd
    calls the reference makes (EtcdCatalog.java:203-211,618-623).
    Import-gated: the package isn't available in this sandbox, so this
    binding is exercised against the interface contract only."""

    def __init__(self, endpoints: str):
        try:
            import etcd3  # noqa: F401
        except ImportError as e:  # pragma: no cover - sandbox has no etcd3
            raise RuntimeError(
                "etcd registry requires the 'etcd3' package (pip install etcd3); "
                "endpoints given: " + endpoints
            ) from e
        host, port, secure = self._parse_endpoint(endpoints)
        kwargs = {"host": host, "port": port}
        if secure:
            # https scheme → TLS gRPC channel. With ETCD_CA_CERT /
            # ETCDCTL_CACERT set, that CA bundle pins the channel
            # (self-signed cluster certs, the common k8s deployment);
            # without it, fall back to the certifi / system trust
            # store so endpoints with publicly-trusted certs work
            # with zero configuration (ADVICE r8) — python-etcd3
            # only builds a secure channel when ca_cert is given, so
            # the default store is passed explicitly.
            ca = os.environ.get("ETCD_CA_CERT") or os.environ.get("ETCDCTL_CACERT")
            if not ca:
                try:
                    import certifi

                    ca = certifi.where()
                except ImportError:
                    import ssl

                    ca = ssl.get_default_verify_paths().cafile
            if not ca:
                raise ValueError(
                    "https etcd endpoint: no CA bundle found — set "
                    "ETCD_CA_CERT (or install certifi)"
                )
            kwargs["ca_cert"] = ca
        self._client = etcd3.client(**kwargs)

    @staticmethod
    def _parse_endpoint(endpoints: str) -> tuple[str, int, bool]:
        """Parse the FIRST endpoint with urlsplit (http:// and
        https:// both work; bare host:port too). Extra endpoints are
        rejected loudly: python-etcd3 connects to a single endpoint,
        and silently ignoring the rest would hide a failover
        misconfiguration (ADVICE r7)."""
        import urllib.parse

        eps = [e.strip() for e in endpoints.split(",") if e.strip()]
        if len(eps) != 1:
            raise ValueError(
                "Etcd3KV supports exactly one endpoint (python-etcd3 is "
                f"single-endpoint); got {len(eps)}: {eps}. Point at a "
                "load-balanced/VIP address for multi-node clusters."
            )
        ep = eps[0]
        if "//" not in ep:
            ep = "//" + ep  # bare host:port → netloc form
        parts = urllib.parse.urlsplit(ep)
        if parts.scheme not in ("", "http", "https"):
            raise ValueError(f"unsupported etcd endpoint scheme: {parts.scheme!r}")
        if not parts.hostname:
            raise ValueError(f"cannot parse etcd endpoint: {endpoints!r}")
        return parts.hostname, parts.port or 2379, parts.scheme == "https"

    def get(self, key: str) -> KVEntry | None:  # pragma: no cover - needs etcd
        value, meta = self._client.get(key)
        if value is None:
            return None
        return KVEntry(key, value.decode("utf-8"), meta.version)

    def get_prefix(self, prefix: str) -> list[KVEntry]:  # pragma: no cover
        out = [
            KVEntry(meta.key.decode("utf-8"), value.decode("utf-8"), meta.version)
            for value, meta in self._client.get_prefix(prefix)
        ]
        return sorted(out, key=lambda e: e.key)

    def put(self, key: str, value: str) -> None:  # pragma: no cover
        self._client.put(key, value)

    def delete(self, key: str) -> None:  # pragma: no cover
        self._client.delete(key)

    def txn(self, compares, ops) -> bool:  # pragma: no cover
        tx = self._client.transactions
        cmp_list = [tx.version(key) == expected for key, expected in compares]
        op_list = [
            tx.put(op[1], op[2]) if op[0] == "put" else tx.delete(op[1]) for op in ops
        ]
        ok, _ = self._client.transaction(compare=cmp_list, success=op_list, failure=[])
        return ok


# ---------------------------------------------------------------------------
# Table with etcd-pointer commits

_META_NAME = re.compile(r"^v(\d+)(?:-[0-9a-f]+)?\.metadata\.json$")


def _version_of(metadata_location: str) -> int:
    m = _META_NAME.match(os.path.basename(metadata_location))
    if not m:
        raise ValueError(f"not a metadata file: {metadata_location}")
    return int(m.group(1))


class EtcdTable(Table):
    """Table whose current-version pointer lives in etcd. The commit
    protocol is the reference's EtcdCatalogTableOperations.doCommit
    (EtcdCatalog.java:588-640): write metadata JSON → version-CAS the
    pointer → on lost race, delete the orphan file and report a
    conflict. There is no version-hint file; the pointer is
    authoritative and readers never self-heal past it."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        identifier: str,
        kv: EtcdKV,
        key: str,
        io: FileIO | None = None,
    ):
        super().__init__(spark, location, identifier, io=io)
        self.kv = kv
        self.key = key
        self._pointer: str | None = None

    # -- pointer plumbing --

    def _entry(self) -> KVEntry:
        ent = self.kv.get(self.key)
        if ent is None:
            raise NoSuchTableError(f"no such table: {self.identifier or self.key}")
        return ent

    def current_version(self) -> int:
        return _version_of(json.loads(self._entry().value)["metadata_location"])

    def refresh(self) -> "EtcdTable":
        ent = self._entry()
        pointer = json.loads(ent.value)["metadata_location"]
        self._pointer = pointer
        self._version = _version_of(pointer)
        self._meta = json.loads(self.io.read_text(pointer))
        return self

    def metadata_path(self, version: int) -> str:
        """Resolve a version to its metadata file. The current version
        comes from the pointer; older versions resolve through the
        metadata_log (each commit appends its own file name), exactly
        how Iceberg proper resolves previous metadata. Plain
        ``vN.metadata.json`` names (tables registered from the
        filesystem catalog) resolve too."""
        if self._pointer is not None and self._version == version:
            return self._pointer
        for entry in (self._meta or {}).get("metadata_log", []):
            name = entry.get("metadata_file", "")
            m = _META_NAME.match(name)
            if m and int(m.group(1)) == version:
                return os.path.join(self.metadata_dir, name)
        # fall back to the filesystem-catalog name (pre-registration
        # history, or metadata not yet loaded)
        return os.path.join(self.metadata_dir, f"v{version}.metadata.json")

    # -- commit --

    def _write_metadata(
        self,
        meta: dict,
        expected_version: int,
        extra_compares: list[tuple[str, int]] = (),
        extra_ops: list[tuple] = (),
    ) -> int:
        ent = self.kv.get(self.key)
        kv_version = ent.version if ent else 0
        current = 0
        prev_location = ""
        if ent is not None:
            prev_location = json.loads(ent.value)["metadata_location"]
            current = _version_of(prev_location)
        if current != expected_version:
            raise CommitConflictError(
                f"expected v{expected_version}, found v{current} at {self.key}"
            )
        new_version = expected_version + 1
        fname = f"v{new_version}-{_uuid.uuid4().hex[:12]}.metadata.json"
        meta.setdefault("metadata_log", []).append(
            {"timestamp_ms": _now_ms(), "metadata_file": fname}
        )
        path = os.path.join(self.metadata_dir, fname)
        # attempt files are uuid-unique, so racing committers can all
        # write safely; only the txn winner's file becomes reachable
        self.io.write_atomic(path, json.dumps(meta, indent=1))
        value = json.dumps(
            {
                "table_type": "ICEBERG",
                "metadata_location": path,
                "previous_metadata_location": prev_location,
            }
        )
        if not self.kv.txn(
            [(self.key, kv_version), *extra_compares],
            [("put", self.key, value), *extra_ops],
        ):
            # lost the race: remove the orphaned attempt file
            # (EtcdCatalog.java:631-639's finally-cleanup)
            try:
                self.io.delete(path)
            except OSError:  # pragma: no cover - cleanup is best-effort
                pass
            raise CommitConflictError(f"lost pointer CAS for v{new_version} at {self.key}")
        self._pointer = path
        self._version = new_version
        self._meta = meta
        return new_version


# ---------------------------------------------------------------------------
# Catalog


class EtcdCatalog:
    """Catalog with the registry in etcd and table trees on storage.
    Same public API as `catalog.Catalog` / `SqliteCatalog` (the CLI
    and REST server duck-type over all three)."""

    NAMESPACE_PREFIX = "n/"
    TABLE_PREFIX = "t/"
    VIEW_PREFIX = "v/"  # ours: the reference keeps views in the REST layer

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        kv: EtcdKV | None = None,
        catalog_name: str = "default",
        io: FileIO | None = None,
    ):
        if not catalog_name or "/" in catalog_name:
            raise ValueError(f"invalid catalog name: {catalog_name!r}")
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        os.makedirs(self.warehouse, exist_ok=True)
        self.kv = kv or InMemoryEtcd()
        self.catalog_name = catalog_name
        self.io = io or DEFAULT_IO

    # -- key layout (EtcdCatalog.java:224-229,477-482) --

    def _prefix(self, kind: str) -> str:
        if self.catalog_name == "default":  # backward-compat bare prefixes
            return kind
        return f"{self.catalog_name}/{kind}"

    def _ns_key(self, ns: str) -> str:
        return self._prefix(self.NAMESPACE_PREFIX) + "/".join(_split_ident(ns))

    def _table_key(self, ident: str) -> str:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise NamespaceError(f"table identifier needs a namespace: {ident}")
        return self._prefix(self.TABLE_PREFIX) + "/".join(parts)

    def _view_key(self, ident: str) -> str:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise NamespaceError(f"view identifier needs a namespace: {ident}")
        return self._prefix(self.VIEW_PREFIX) + "/".join(parts)

    # ---------- namespaces ----------

    def check(self) -> bool:
        # connectivity probe = a get, like the reference's startup
        # kv.get("/") (EtcdCatalog.java:87-89)
        self.kv.get("/")
        return True

    def namespace_exists(self, ns: str) -> bool:
        _split_ident(ns)
        return self.kv.get(self._ns_key(ns)) is not None

    def create_namespace(
        self, ns: str, parents: bool = False, exist_ok: bool = False
    ) -> None:
        parts = _split_ident(ns)
        if self.namespace_exists(ns):
            if exist_ok:
                return
            raise NamespaceError(f"namespace exists: {ns}")
        chain = [".".join(parts[: i + 1]) for i in range(len(parts))]
        missing = [c for c in chain[:-1] if not self.namespace_exists(c)]
        if missing and not parents:
            raise NamespaceError(f"no such namespace: {missing[0]}")
        for c in chain:
            # version==0 CAS create (EtcdCatalog.java:203-211); a
            # concurrent create of the same level is benign here when
            # exist_ok-like chains race, but the leaf must win its txn
            won = self.kv.txn([(self._ns_key(c), 0)], [("put", self._ns_key(c), "{}")])
            if not won and c == ns:
                if exist_ok:
                    return
                raise NamespaceError(f"namespace exists: {ns}")

    def namespace_properties(self, ns: str) -> dict:
        ent = self.kv.get(self._ns_key(ns))
        if ent is None:
            raise NamespaceError(f"no such namespace: {ns}")
        return json.loads(ent.value)

    def update_namespace_properties(
        self, ns: str, updates: dict | None = None, removals: list[str] | None = None
    ) -> dict:
        # read version → CAS put (EtcdCatalog.java:358-421); retry on
        # lost race against concurrent property writers
        for _ in range(10):
            ent = self.kv.get(self._ns_key(ns))
            if ent is None:
                raise NamespaceError(f"no such namespace: {ns}")
            props = json.loads(ent.value)
            removed = [k for k in (removals or []) if k in props]
            for k in removed:
                del props[k]
            props.update(updates or {})
            if self.kv.txn(
                [(self._ns_key(ns), ent.version)],
                [("put", self._ns_key(ns), json.dumps(props))],
            ):
                return {"updated": sorted((updates or {}).keys()), "removed": removed}
        raise CommitConflictError(f"namespace property CAS kept losing: {ns}")

    def delete_namespace(self, ns: str) -> None:
        # Check-then-delete via a version-CAS txn: create_table's
        # registration txn bumps the namespace key version, so a
        # table committed between our emptiness check and the delete
        # fails the CAS here instead of being orphaned under a
        # deleted namespace (the reference guards this with the same
        # etcd transaction). CAS failure → re-observe and retry; the
        # re-check then sees the new table and reports not-empty.
        ns_path = "/".join(_split_ident(ns))
        for attempt in range(5):
            ent = self.kv.get(self._ns_key(ns))
            if ent is None:
                raise NamespaceError(f"no such namespace: {ns}")
            children = self.kv.get_prefix(
                self._prefix(self.NAMESPACE_PREFIX) + ns_path + "/"
            )
            tables = self.kv.get_prefix(self._prefix(self.TABLE_PREFIX) + ns_path + "/")
            views = self.kv.get_prefix(self._prefix(self.VIEW_PREFIX) + ns_path + "/")
            if children or tables or views:
                raise NamespaceError(f"namespace not empty: {ns}")
            if self.kv.txn(
                [(self._ns_key(ns), ent.version)], [("delete", self._ns_key(ns))]
            ):
                return
        raise CommitConflictError(f"delete_namespace {ns}: namespace key kept moving")

    def list_namespaces(self, parent: str | None = None) -> list[str]:
        prefix = self._prefix(self.NAMESPACE_PREFIX)
        depth = 1
        if parent is not None:
            if not self.namespace_exists(parent):
                raise NamespaceError(f"no such namespace: {parent}")
            prefix += "/".join(_split_ident(parent)) + "/"
            depth = len(_split_ident(parent)) + 1
        bare = self._prefix(self.NAMESPACE_PREFIX)
        out = []
        for ent in self.kv.get_prefix(prefix):
            parts = ent.key[len(bare):].split("/")
            if len(parts) == depth:
                out.append(".".join(parts))
        return sorted(out)

    # ---------- tables ----------

    def _default_location(self, ident: str) -> str:
        # defaultWarehouseLocation (EtcdCatalog.java:424-430)
        return os.path.join(self.warehouse, *_split_ident(ident))

    def list_tables(self, ns: str) -> list[str]:
        if not self.namespace_exists(ns):
            raise NamespaceError(f"no such namespace: {ns}")
        ns_path = "/".join(_split_ident(ns))
        prefix = self._prefix(self.TABLE_PREFIX) + ns_path + "/"
        # exact-namespace children only: nested-namespace tables have a
        # further '/' (the reference's prefix scan returns the whole
        # subtree, EtcdCatalog.java:439-456; our duck-typed API, like
        # SqliteCatalog, lists one level)
        return sorted(
            ent.key[len(prefix):]
            for ent in self.kv.get_prefix(prefix)
            if "/" not in ent.key[len(prefix):]
        )

    def table_exists(self, ident: str) -> bool:
        return self.kv.get(self._table_key(ident)) is not None

    def _table(self, ident: str, location: str) -> EtcdTable:
        return EtcdTable(
            self.spark, location, ident, self.kv, self._table_key(ident), io=self.io
        )

    def load_table(self, ident: str) -> EtcdTable:
        ent = self.kv.get(self._table_key(ident))
        if ent is None:
            raise NoSuchTableError(f"no such table: {ident}")
        pointer = json.loads(ent.value)["metadata_location"]
        location = os.path.dirname(os.path.dirname(pointer))
        return self._table(ident, location).refresh()

    def create_table(
        self,
        ident: str,
        schema: SPT.StructType | None = None,
        schema_from_parquet: str | None = None,
        partition_spec: list[dict] | None = None,
        sort_order: list[dict] | None = None,
        properties: dict | None = None,
        location: str | None = None,
        exist_ok: bool = False,
    ) -> EtcdTable:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise NamespaceError(f"table identifier needs a namespace: {ident}")
        ns = ".".join(parts[:-1])
        if not self.namespace_exists(ns):
            raise NamespaceError(f"no such namespace: {ns}")
        if self.table_exists(ident):
            if exist_ok:
                return self.load_table(ident)
            raise ValueError(f"table exists: {ident}")
        if schema is None:
            if not schema_from_parquet:
                raise ValueError("need schema or schema_from_parquet")
            schema = self.spark.read.parquet(schema_from_parquet).schema
        loc = location or self._default_location(ident)
        t = self._table(ident, loc)
        t.io.mkdirs(t.metadata_dir)
        t.io.mkdirs(t.data_dir)
        meta = Table.new_table_metadata(
            loc, schema, partition_spec, sort_order, properties
        )
        # creation is linearized by the pointer's version==0 CAS
        # (EtcdCatalog.java:598-600,618-623), and the SAME txn
        # re-puts the namespace key: it both proves the namespace
        # still exists at commit time (a racing delete-namespace
        # empties the compare) and bumps the namespace version so a
        # racing delete-namespace's own ns-version CAS fails — the
        # reference closes this window with the equivalent etcd
        # transaction. A sibling create bumping the ns version is the
        # one benign conflict, hence the short retry loop.
        for attempt in range(5):
            ns_ent = self.kv.get(self._ns_key(ns))
            if ns_ent is None:
                raise NamespaceError(f"no such namespace: {ns}")
            try:
                t._write_metadata(
                    # fresh copy per attempt: _write_metadata appends
                    # the metadata_log entry in place
                    json.loads(json.dumps(meta)),
                    expected_version=0,
                    extra_compares=[(ns_ent.key, ns_ent.version)],
                    extra_ops=[("put", ns_ent.key, ns_ent.value)],
                )
                return t
            except CommitConflictError:
                if self.table_exists(ident):
                    if exist_ok:
                        return self.load_table(ident)
                    raise ValueError(f"table exists: {ident}")
                # ns key moved (sibling create / property update /
                # delete) — re-observe and retry
                continue
        raise CommitConflictError(
            f"create_table {ident}: namespace key kept moving"
        )

    def drop_table(self, ident: str, purge: bool = False) -> None:
        ent = self.kv.get(self._table_key(ident))
        if ent is None:
            raise NoSuchTableError(f"no such table: {ident}")
        pointer = json.loads(ent.value)["metadata_location"]
        location = os.path.dirname(os.path.dirname(pointer))
        self.kv.delete(self._table_key(ident))
        if purge and os.path.isdir(location):
            shutil.rmtree(location)

    def rename_table(self, ident: str, new_ident: str) -> None:
        new_parts = _split_ident(new_ident)
        if len(new_parts) < 2:
            raise NamespaceError(f"table identifier needs a namespace: {new_ident}")
        if not self.namespace_exists(".".join(new_parts[:-1])):
            raise NamespaceError(f"no such namespace: {'.'.join(new_parts[:-1])}")
        ent = self.kv.get(self._table_key(ident))
        if ent is None:
            raise NoSuchTableError(f"no such table: {ident}")
        if self.table_exists(new_ident):
            raise ValueError(f"target exists: {new_ident}")
        # single txn: from-key unchanged AND to-key absent → delete+put
        # (EtcdCatalog.java:537-548); a pure registry move, storage
        # location doesn't change
        ok = self.kv.txn(
            [(self._table_key(ident), ent.version), (self._table_key(new_ident), 0)],
            [
                ("delete", self._table_key(ident)),
                ("put", self._table_key(new_ident), ent.value),
            ],
        )
        if not ok:
            raise CommitConflictError(f"rename lost race: {ident} -> {new_ident}")

    def commit_transaction(
        self, items: list[tuple["EtcdTable", dict, int]]
    ) -> list[int]:
        """Atomically commit N tables in ONE etcd transaction.

        `items` is a list of (table, new_metadata, expected_version).
        This is the reference's actual multi-table atomicity model —
        the single-table version-CAS of EtcdCatalog.java:588-640
        generalized to N pointer keys in one If(ver_a==x, ver_b==y)
        .Then(put_a, put_b) transaction — which a filesystem/SQLite
        catalog cannot express (those keep the validate→apply→
        compensate saga in rest/server.py). The reference's
        multi-table lock ordering (etcd/CommitLock.java:69-146 orders
        acquisition by key to avoid deadlock) reduces here to a
        deterministic sort of the compare list: with one txn there is
        nothing to deadlock on.

        Either every pointer swings or none does; attempt metadata
        files are uuid-unique and deleted on a lost race, so a failed
        transaction leaves no observable state anywhere.
        """
        items = sorted(items, key=lambda it: it[0].key)
        keys = [t.key for t, _, _ in items]
        if len(set(keys)) != len(keys):
            raise ValueError("duplicate table in transaction")
        compares: list[tuple[str, int]] = []
        ops: list[tuple] = []
        written: list[tuple[EtcdTable, str, dict, int]] = []
        try:
            for t, meta, expected in items:
                ent = self.kv.get(t.key)
                kv_version = ent.version if ent else 0
                current = 0
                prev_location = ""
                if ent is not None:
                    prev_location = json.loads(ent.value)["metadata_location"]
                    current = _version_of(prev_location)
                if current != expected:
                    raise CommitConflictError(
                        f"expected v{expected}, found v{current} at {t.key}"
                    )
                new_version = expected + 1
                fname = f"v{new_version}-{_uuid.uuid4().hex[:12]}.metadata.json"
                meta.setdefault("metadata_log", []).append(
                    {"timestamp_ms": _now_ms(), "metadata_file": fname}
                )
                path = os.path.join(t.metadata_dir, fname)
                t.io.write_atomic(path, json.dumps(meta, indent=1))
                written.append((t, path, meta, new_version))
                compares.append((t.key, kv_version))
                ops.append(
                    (
                        "put",
                        t.key,
                        json.dumps(
                            {
                                "table_type": "ICEBERG",
                                "metadata_location": path,
                                "previous_metadata_location": prev_location,
                            }
                        ),
                    )
                )
            if not self.kv.txn(compares, ops):
                raise CommitConflictError(
                    f"lost multi-table pointer CAS over {keys}"
                )
        except Exception:
            # no pointer moved — clean up every attempt file
            for t, path, _, _ in written:
                try:
                    t.io.delete(path)
                except OSError:  # pragma: no cover - cleanup best-effort
                    pass
            raise
        for t, path, meta, new_version in written:
            t._pointer = path
            t._version = new_version
            t._meta = meta
        return [v for _, _, _, v in written]

    def register_table(
        self, ident: str, metadata_file: str, overwrite: bool = False
    ) -> EtcdTable:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise NamespaceError(f"table identifier needs a namespace: {ident}")
        ns = ".".join(parts[:-1])
        if not self.namespace_exists(ns):
            raise NamespaceError(f"no such namespace: {ns}")
        path = os.path.abspath(metadata_file)
        _version_of(path)  # validates the name
        value = json.dumps(
            {
                "table_type": "ICEBERG",
                "metadata_location": path,
                "previous_metadata_location": "",
            }
        )
        if overwrite:
            self.kv.put(self._table_key(ident), value)
            return self.load_table(ident)
        # same ns-guarded registration txn as create_table: proves the
        # namespace survives to commit time and bumps its version so a
        # racing delete-namespace CAS-fails
        for attempt in range(5):
            ns_ent = self.kv.get(self._ns_key(ns))
            if ns_ent is None:
                raise NamespaceError(f"no such namespace: {ns}")
            if self.kv.txn(
                [(self._table_key(ident), 0), (ns_ent.key, ns_ent.version)],
                [
                    ("put", self._table_key(ident), value),
                    ("put", ns_ent.key, ns_ent.value),
                ],
            ):
                return self.load_table(ident)
            if self.kv.get(self._table_key(ident)) is not None:
                raise ValueError(f"table exists: {ident}")
        raise CommitConflictError(f"register_table {ident}: namespace key kept moving")

    def register_views(self, ns: str, prefix: str = "") -> list[str]:
        out = []
        for t in self.list_tables(ns):
            out += self.load_table(f"{ns}.{t}").create_views(prefix)
        return out

    # ---------- export / import ----------

    def export_registry(self) -> dict:
        """Same JSON shape as Catalog/SqliteCatalog (portable across
        backends)."""
        namespaces = sorted(
            ".".join(e.key[len(self._prefix(self.NAMESPACE_PREFIX)):].split("/"))
            for e in self.kv.get_prefix(self._prefix(self.NAMESPACE_PREFIX))
        )
        tables = {}
        for e in self.kv.get_prefix(self._prefix(self.TABLE_PREFIX)):
            ident = ".".join(e.key[len(self._prefix(self.TABLE_PREFIX)):].split("/"))
            tables[ident] = json.loads(e.value)["metadata_location"]
        return {"namespaces": namespaces, "tables": tables}

    def import_registry(
        self, registry: dict, overwrite: bool = False, dry_run: bool = False
    ) -> list[str]:
        actions = []
        for ns in registry.get("namespaces", []):
            if not self.namespace_exists(ns):
                actions.append(f"create-namespace {ns}")
                if not dry_run:
                    self.create_namespace(ns, parents=True, exist_ok=True)
        for ident, meta_path in registry.get("tables", {}).items():
            if self.table_exists(ident) and not overwrite:
                actions.append(f"skip {ident}")
                continue
            actions.append(f"register {ident} <- {meta_path}")
            if not dry_run:
                self.register_table(ident, meta_path, overwrite=overwrite)
        return actions

    # ---------- registry snapshot / restore ----------

    def registry_snapshot(self) -> dict:
        """Raw registry snapshot: every namespace/table/view KV with
        its value AND etcd version — the seam-level analog of the
        reference's ``etcdctl snapshot save`` registry backup
        (docs/etcd-backup-restore-upgrade-3-node.md; only n/ and t/
        keys matter there too because table data lives on object
        storage). Versions are recorded so a restore can prove the
        source state and so operators can audit drift between backup
        and restore time."""
        keys = []
        for kind in (self.NAMESPACE_PREFIX, self.TABLE_PREFIX, self.VIEW_PREFIX):
            for e in self.kv.get_prefix(self._prefix(kind)):
                keys.append({"key": e.key, "value": e.value, "version": e.version})
        return {
            "format": "ice-etcd-registry/1",
            "catalog": self.catalog_name,
            "taken_ms": _now_ms(),
            "keys": sorted(keys, key=lambda k: k["key"]),
        }

    def registry_restore(
        self, snapshot: dict, overwrite: bool = False, dry_run: bool = False
    ) -> list[str]:
        """Restore a registry snapshot in ONE CAS-guarded etcd
        transaction — all-or-nothing, like the rest of the backend.

        Fresh mode (default): every key must be ABSENT (version
        compare 0); any pre-existing key — including one a concurrent
        writer just created — fails the whole transaction with the
        conflicting keys listed. Overwrite mode: each existing key is
        CAS'd against the version observed NOW, so a writer that
        lands between the read and the transaction still fails the
        restore instead of being silently clobbered (the lost-update
        guard the reference gets from stopping ice-rest-catalog
        during migration; we get it transactionally instead).

        Restored keys restart etcd's per-key version counter at 1 —
        version history is a server-side counter that cannot be
        forged through puts; the snapshot's recorded versions are for
        audit. Real etcd caps a transaction at --max-txn-ops
        (128 default); registries beyond that need the server-side
        limit raised, exactly like the reference's etcdutl path."""
        fmt = snapshot.get("format")
        if fmt != "ice-etcd-registry/1":
            raise ValueError(f"not a registry snapshot: format={fmt!r}")
        entries = snapshot.get("keys", [])
        actions = []
        compares: list[tuple[str, int]] = []
        ops: list[tuple] = []
        conflicts = []
        for ent in entries:
            key = ent["key"]
            cur = self.kv.get(key)
            if cur is None:
                compares.append((key, 0))
                actions.append(f"create {key}")
            elif overwrite:
                compares.append((key, cur.version))
                actions.append(f"overwrite {key} (was version {cur.version})")
            else:
                conflicts.append(key)
                continue
            ops.append(("put", key, ent["value"]))
        if conflicts:
            raise CommitConflictError(
                f"registry keys already exist (use overwrite): {conflicts}"
            )
        if dry_run or not ops:
            return actions
        if not self.kv.txn(compares, ops):
            raise CommitConflictError(
                "registry restore lost a CAS race (a writer changed the "
                "registry between snapshot validation and the transaction); "
                "re-run the restore"
            )
        return actions

    # -- raw KV admin surface (reference admin API parity:
    #    EtcdCatalog.listAllNamespaceKvs/listAllTableKvs/putCatalogKv,
    #    EtcdCatalog.java:121-173) --

    def list_all_namespace_kvs(self) -> list[tuple[str, str]]:
        return [
            (e.key, e.value)
            for e in self.kv.get_prefix(self._prefix(self.NAMESPACE_PREFIX))
        ]

    def list_all_table_kvs(self, namespace_path: str | None = None) -> list[tuple[str, str]]:
        prefix = self._prefix(self.TABLE_PREFIX)
        if namespace_path:
            prefix += namespace_path + "/"
        return [(e.key, e.value) for e in self.kv.get_prefix(prefix)]

    def put_catalog_kv(
        self, key: str, json_value: str, overwrite: bool = False, dry_run: bool = False
    ) -> str:
        """CREATED / SKIPPED / OVERWRITTEN, exactly the reference's
        PutCatalogKvResult (EtcdCatalog.java:149-173)."""
        exists = self.kv.get(key) is not None
        if exists and not overwrite:
            return "SKIPPED"
        if not dry_run:
            self.kv.put(key, json_value)
        return "OVERWRITTEN" if exists else "CREATED"

    # ---------- views (REST-server duck-typing; v/ prefix is ours) ----------

    def create_view(
        self, ident: str, sql: str, comment: str = "", replace: bool = False
    ) -> dict:
        parts = _split_ident(ident)
        ns = ".".join(parts[:-1])
        view = {
            "name": parts[-1],
            "sql": sql,
            "comment": comment,
            "created_ms": _now_ms(),
        }
        key = self._view_key(ident)
        # Same commit-time namespace guard as create_table: the txn
        # compares the observed ns-key version and re-puts its value,
        # so a view created between delete_namespace's emptiness check
        # and its delete txn fails THAT txn's ns-version CAS instead
        # of being orphaned under a deleted namespace. Benign ns-key
        # bumps (sibling creates) retry.
        for attempt in range(5):
            ns_ent = self.kv.get(self._ns_key(ns))
            if ns_ent is None:
                raise NamespaceError(f"no such namespace: {ns}")
            cur = self.kv.get(key)
            if cur is not None and not replace:
                raise ValueError(f"view exists: {ident}")
            if self.kv.txn(
                [
                    (key, 0 if cur is None else cur.version),
                    (ns_ent.key, ns_ent.version),
                ],
                [
                    ("put", key, json.dumps(view)),
                    ("put", ns_ent.key, ns_ent.value),
                ],
            ):
                return view
            if not replace and self.kv.get(key) is not None:
                raise ValueError(f"view exists: {ident}")
        raise CommitConflictError(f"create_view {ident}: namespace key kept moving")

    def load_view(self, ident: str) -> dict:
        ent = self.kv.get(self._view_key(ident))
        if ent is None:
            raise ValueError(f"no such view: {ident}")
        return json.loads(ent.value)

    def list_views(self, ns: str) -> list[str]:
        if not self.namespace_exists(ns):
            raise NamespaceError(f"no such namespace: {ns}")
        ns_path = "/".join(_split_ident(ns))
        prefix = self._prefix(self.VIEW_PREFIX) + ns_path + "/"
        return sorted(
            e.key[len(prefix):]
            for e in self.kv.get_prefix(prefix)
            if "/" not in e.key[len(prefix):]
        )

    def drop_view(self, ident: str) -> None:
        if self.kv.get(self._view_key(ident)) is None:
            raise ValueError(f"no such view: {ident}")
        self.kv.delete(self._view_key(ident))

    def register_sql_context(self) -> list[str]:
        """Same contract as Catalog.register_sql_context: every table
        and view becomes a `<ns>_<name>` temp view, views oldest-first
        so they may reference tables and earlier views."""
        registered: list[str] = []
        table_prefix = self._prefix(self.TABLE_PREFIX)
        for e in self.kv.get_prefix(table_prefix):
            ident = ".".join(e.key[len(table_prefix):].split("/"))
            alias = ident.replace(".", "_")
            self.load_table(ident).read().createOrReplaceTempView(alias)
            registered.append(alias)
        view_prefix = self._prefix(self.VIEW_PREFIX)
        views = [
            (e.key, json.loads(e.value)) for e in self.kv.get_prefix(view_prefix)
        ]
        for key, v in sorted(views, key=lambda kv_: kv_[1].get("created_ms", 0)):
            alias = ".".join(key[len(view_prefix):].split("/")).replace(".", "_")
            self.spark.sql(f"CREATE OR REPLACE TEMP VIEW {alias} AS {v['sql']}")
            registered.append(alias)
        return registered
