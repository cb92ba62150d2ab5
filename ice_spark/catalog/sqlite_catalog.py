"""SQLite-backed catalog registry (the reference's JDBC backend path).

Reference parity: ice-rest-catalog supports `jdbc:sqlite:...` /
etcd / S3Tables as catalog backends
(ice-rest-catalog/.../config/Config.java:262-298) — the DATABASE holds
the registry (which namespaces exist, which table identifiers map to
which storage locations, namespace properties), while table metadata
JSON and parquet data live on object storage. This class reproduces
that split with stdlib sqlite3: the registry rows live in one .db
file, tables keep the exact same on-disk layout (`Table` is reused
unchanged, including its O_EXCL commit CAS — the same linearization
the filesystem Catalog uses; in the reference the JDBC row is the CAS
point, here the version file is, both serialize commits correctly).

Multiple processes pointing at the same .db share the registry; SQLite
`BEGIN IMMEDIATE` transactions serialize registry writers. The public
API is identical to `catalog.Catalog`, so the CLI and REST server take
either interchangeably (duck-typed).
"""

from __future__ import annotations

import json
import os
import shutil
import sqlite3
import time

from pyspark.sql import SparkSession
from pyspark.sql import types as SPT

from ice_spark.catalog.catalog import NamespaceError, _split_ident
from ice_spark.catalog.table import NoSuchTableError, Table

_SCHEMA = """
CREATE TABLE IF NOT EXISTS namespaces (
  ns TEXT PRIMARY KEY,
  properties TEXT NOT NULL DEFAULT '{}'
);
CREATE TABLE IF NOT EXISTS tables (
  ident TEXT PRIMARY KEY,
  ns TEXT NOT NULL,
  location TEXT NOT NULL,
  claimed_at REAL
);
CREATE TABLE IF NOT EXISTS views (
  ident TEXT PRIMARY KEY,
  ns TEXT NOT NULL,
  definition TEXT NOT NULL
);
"""


class SqliteCatalog:
    # A claim row (create_table's short registration txn) whose
    # storage never materialized is reclaimable after this grace —
    # long enough that no live Table.create is still in flight.
    STALE_CLAIM_GRACE_SEC = 300.0

    def __init__(self, spark: SparkSession, warehouse: str, db_path: str | None = None):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        os.makedirs(self.warehouse, exist_ok=True)
        self.db_path = db_path or os.path.join(self.warehouse, "catalog.db")
        with self._conn() as con:
            con.executescript(_SCHEMA)
            try:
                # migration for pre-claim-timestamp registries; NULL
                # claimed_at means "old enough to reclaim"
                con.execute("ALTER TABLE tables ADD COLUMN claimed_at REAL")
            except sqlite3.OperationalError:
                pass  # column already present

    def _conn(self) -> sqlite3.Connection:
        # fresh connection per operation: thread-safe by construction,
        # and cross-process sharing works through SQLite's own locking
        con = sqlite3.connect(self.db_path, timeout=30.0)
        con.execute("PRAGMA busy_timeout = 30000")
        return con

    # ---------- namespaces ----------

    def check(self) -> bool:
        with self._conn() as con:
            con.execute("SELECT 1")
        return True

    def namespace_exists(self, ns: str) -> bool:
        _split_ident(ns)
        with self._conn() as con:
            return (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is not None
            )

    def create_namespace(
        self, ns: str, parents: bool = False, exist_ok: bool = False
    ) -> None:
        parts = _split_ident(ns)
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            have = {
                r[0] for r in con.execute("SELECT ns FROM namespaces").fetchall()
            }
            if ns in have:
                if exist_ok:
                    return
                raise NamespaceError(f"namespace exists: {ns}")
            chain = [".".join(parts[: i + 1]) for i in range(len(parts))]
            missing_parents = [c for c in chain[:-1] if c not in have]
            if missing_parents and not parents:
                raise NamespaceError(f"no such namespace: {missing_parents[0]}")
            for c in chain:
                if c not in have:
                    con.execute(
                        "INSERT INTO namespaces (ns, properties) VALUES (?, '{}')", (c,)
                    )

    def namespace_properties(self, ns: str) -> dict:
        with self._conn() as con:
            row = con.execute(
                "SELECT properties FROM namespaces WHERE ns = ?", (ns,)
            ).fetchone()
        if row is None:
            raise NamespaceError(f"no such namespace: {ns}")
        return json.loads(row[0])

    def update_namespace_properties(
        self, ns: str, updates: dict | None = None, removals: list[str] | None = None
    ) -> dict:
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            row = con.execute(
                "SELECT properties FROM namespaces WHERE ns = ?", (ns,)
            ).fetchone()
            if row is None:
                raise NamespaceError(f"no such namespace: {ns}")
            props = json.loads(row[0])
            removed = [k for k in (removals or []) if k in props]
            for k in removed:
                del props[k]
            props.update(updates or {})
            con.execute(
                "UPDATE namespaces SET properties = ? WHERE ns = ?",
                (json.dumps(props), ns),
            )
        return {"updated": sorted((updates or {}).keys()), "removed": removed}

    def delete_namespace(self, ns: str) -> None:
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            if (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {ns}")
            child = con.execute(
                "SELECT ns FROM namespaces WHERE ns LIKE ? LIMIT 1", (ns + ".%",)
            ).fetchone()
            n_tables = con.execute(
                "SELECT COUNT(*) FROM tables WHERE ns = ?", (ns,)
            ).fetchone()[0]
            n_views = con.execute(
                "SELECT COUNT(*) FROM views WHERE ns = ?", (ns,)
            ).fetchone()[0]
            if child or n_tables or n_views:
                raise NamespaceError(f"namespace not empty: {ns}")
            con.execute("DELETE FROM namespaces WHERE ns = ?", (ns,))

    def list_namespaces(self, parent: str | None = None) -> list[str]:
        with self._conn() as con:
            if parent is not None:
                if (
                    con.execute(
                        "SELECT 1 FROM namespaces WHERE ns = ?", (parent,)
                    ).fetchone()
                    is None
                ):
                    raise NamespaceError(f"no such namespace: {parent}")
                rows = con.execute(
                    "SELECT ns FROM namespaces WHERE ns LIKE ?", (parent + ".%",)
                ).fetchall()
                depth = parent.count(".") + 2
            else:
                rows = con.execute("SELECT ns FROM namespaces").fetchall()
                depth = 1
            return sorted(r[0] for r in rows if r[0].count(".") == depth - 1)

    # ---------- tables ----------

    def _default_location(self, ident: str) -> str:
        return os.path.join(self.warehouse, *_split_ident(ident))

    def _table_row(self, ident: str):
        with self._conn() as con:
            return con.execute(
                "SELECT location FROM tables WHERE ident = ?", (ident,)
            ).fetchone()

    def _split_table_ident(self, ident: str) -> str:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise NamespaceError(f"table identifier needs a namespace: {ident}")
        return ".".join(parts[:-1])

    def list_tables(self, ns: str) -> list[str]:
        with self._conn() as con:
            if (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {ns}")
            rows = con.execute("SELECT ident FROM tables WHERE ns = ?", (ns,)).fetchall()
        return sorted(r[0].rsplit(".", 1)[1] for r in rows)

    def table_exists(self, ident: str) -> bool:
        return self._table_row(ident) is not None

    def _is_stale_claim(self, location: str, claimed_at: float | None) -> bool:
        """True when a registry row points at storage that was never
        created and the claim is old enough that no Table.create can
        still be in flight (a crash between the claim COMMIT and
        Table.create orphans exactly this shape; NULL claimed_at =
        pre-migration row = old)."""
        if os.path.isdir(os.path.join(location, "metadata")):
            return False
        return claimed_at is None or time.time() - claimed_at > self.STALE_CLAIM_GRACE_SEC

    def load_table(self, ident: str) -> Table:
        with self._conn() as con:
            row = con.execute(
                "SELECT location, claimed_at FROM tables WHERE ident = ?", (ident,)
            ).fetchone()
        if row is None:
            raise NoSuchTableError(f"no such table: {ident}")
        try:
            return Table(self.spark, row[0], ident).refresh()
        except (NoSuchTableError, OSError, ValueError):
            if self._is_stale_claim(row[0], row[1]):
                # crashed create: reclaim the orphan row so the
                # identifier becomes usable again (ADVICE r7)
                with self._conn() as con:
                    con.execute(
                        "DELETE FROM tables WHERE ident = ? AND location = ?",
                        (ident, row[0]),
                    )
                raise NoSuchTableError(
                    f"no such table: {ident} (reclaimed stale claim at {row[0]})"
                )
            raise

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
    ) -> Table:
        ns = self._split_table_ident(ident)
        loc = location or self._default_location(ident)
        # Schema inference is a Spark job — never run it (or any other
        # slow work) while holding the registry write transaction.
        if schema is None:
            if not schema_from_parquet:
                raise ValueError("need schema or schema_from_parquet")
            schema = self.spark.read.parquet(schema_from_parquet).schema
        # Short claim transaction (ADVICE r6): validate + insert the
        # registry row and COMMIT before the slow storage write, so
        # unrelated registry writers aren't serialized behind
        # Table.create (seconds of Spark/filesystem work) and can't hit
        # the 30s busy timeout. The committed row claims the identifier:
        # a concurrent create_table sees "table exists".
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            if (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {ns}")
            existing = con.execute(
                "SELECT location, claimed_at FROM tables WHERE ident = ?", (ident,)
            ).fetchone()
            if existing is not None:
                if self._is_stale_claim(existing[0], existing[1]):
                    # a crashed create left a claim row with no
                    # storage behind it — reclaim inside this same
                    # write txn so the identifier is usable again
                    con.execute(
                        "DELETE FROM tables WHERE ident = ?", (ident,)
                    )
                elif exist_ok:
                    return self.load_table(ident)
                else:
                    raise ValueError(f"table exists: {ident}")
            con.execute(
                "INSERT INTO tables (ident, ns, location, claimed_at) "
                "VALUES (?, ?, ?, ?)",
                (ident, ns, loc, time.time()),
            )
        loc_existed_before = os.path.isdir(loc)
        try:
            t = Table.create(
                self.spark,
                loc,
                schema,
                partition_spec=partition_spec,
                sort_order=sort_order,
                properties=properties,
                identifier=ident,
            )
        except BaseException:
            # Failed storage create: release the claim and remove the
            # partial directory (only if WE created it — never delete a
            # pre-existing user-supplied location).
            with self._conn() as con:
                con.execute(
                    "DELETE FROM tables WHERE ident = ? AND location = ?",
                    (ident, loc),
                )
            if not loc_existed_before:
                shutil.rmtree(loc, ignore_errors=True)
            raise
        return t

    def drop_table(self, ident: str, purge: bool = False) -> None:
        row = self._table_row(ident)
        if row is None:
            raise NoSuchTableError(f"no such table: {ident}")
        with self._conn() as con:
            con.execute("DELETE FROM tables WHERE ident = ?", (ident,))
        if purge and os.path.isdir(row[0]):
            shutil.rmtree(row[0])

    def rename_table(self, ident: str, new_ident: str) -> None:
        new_ns = self._split_table_ident(new_ident)
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            if (
                con.execute("SELECT 1 FROM tables WHERE ident = ?", (ident,)).fetchone()
                is None
            ):
                raise NoSuchTableError(f"no such table: {ident}")
            if (
                con.execute(
                    "SELECT 1 FROM tables WHERE ident = ?", (new_ident,)
                ).fetchone()
                is not None
            ):
                raise ValueError(f"target exists: {new_ident}")
            if (
                con.execute(
                    "SELECT 1 FROM namespaces WHERE ns = ?", (new_ns,)
                ).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {new_ns}")
            # a pure registry move: the storage location doesn't change
            # (exactly the JDBC-catalog rename semantics)
            con.execute(
                "UPDATE tables SET ident = ?, ns = ? WHERE ident = ?",
                (new_ident, new_ns, ident),
            )

    def register_table(
        self, ident: str, metadata_file: str, overwrite: bool = False
    ) -> Table:
        if self.table_exists(ident) and not overwrite:
            raise ValueError(f"table exists: {ident}")
        ns = self._split_table_ident(ident)
        base = os.path.basename(metadata_file)
        if not (base.startswith("v") and base.endswith(".metadata.json")):
            raise ValueError(f"not a metadata file: {metadata_file}")
        version = int(base[1:].split(".")[0])
        loc = os.path.dirname(os.path.dirname(os.path.abspath(metadata_file)))
        hint = os.path.join(loc, "metadata", "version-hint.text")
        tmp = hint + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, hint)
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            if (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {ns}")
            con.execute(
                "INSERT OR REPLACE INTO tables (ident, ns, location) VALUES (?, ?, ?)",
                (ident, ns, loc),
            )
        return self.load_table(ident)

    def register_views(self, ns: str, prefix: str = "") -> list[str]:
        out = []
        for t in self.list_tables(ns):
            out += self.load_table(f"{ns}.{t}").create_views(prefix)
        return out

    # ---------- export / import (same JSON shape as Catalog) ----------

    def export_registry(self) -> dict:
        with self._conn() as con:
            namespaces = sorted(
                r[0] for r in con.execute("SELECT ns FROM namespaces").fetchall()
            )
            idents = sorted(
                r[0] for r in con.execute("SELECT ident FROM tables").fetchall()
            )
        tables = {}
        for ident in idents:
            tbl = self.load_table(ident)
            tables[ident] = tbl.metadata_path(tbl.current_version())
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

    # ---------- views ----------

    def create_view(
        self, ident: str, sql: str, comment: str = "", replace: bool = False
    ) -> dict:
        import time as _time

        ns = self._split_table_ident(ident)
        name = ident.rsplit(".", 1)[1]
        view = {
            "name": name,
            "sql": sql,
            "comment": comment,
            "created_ms": int(_time.time() * 1000),
        }
        with self._conn() as con:
            con.execute("BEGIN IMMEDIATE")
            if (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {ns}")
            exists = (
                con.execute("SELECT 1 FROM views WHERE ident = ?", (ident,)).fetchone()
                is not None
            )
            if exists and not replace:
                raise ValueError(f"view exists: {ident}")
            con.execute(
                "INSERT OR REPLACE INTO views (ident, ns, definition) VALUES (?, ?, ?)",
                (ident, ns, json.dumps(view)),
            )
        return view

    def load_view(self, ident: str) -> dict:
        with self._conn() as con:
            row = con.execute(
                "SELECT definition FROM views WHERE ident = ?", (ident,)
            ).fetchone()
        if row is None:
            raise ValueError(f"no such view: {ident}")
        return json.loads(row[0])

    def list_views(self, ns: str) -> list[str]:
        with self._conn() as con:
            if (
                con.execute("SELECT 1 FROM namespaces WHERE ns = ?", (ns,)).fetchone()
                is None
            ):
                raise NamespaceError(f"no such namespace: {ns}")
            rows = con.execute("SELECT ident FROM views WHERE ns = ?", (ns,)).fetchall()
        return sorted(r[0].rsplit(".", 1)[1] for r in rows)

    def drop_view(self, ident: str) -> None:
        with self._conn() as con:
            cur = con.execute("DELETE FROM views WHERE ident = ?", (ident,))
            if cur.rowcount == 0:
                raise ValueError(f"no such view: {ident}")

    def register_sql_context(self) -> list[str]:
        """Same contract as Catalog.register_sql_context: every table
        and view becomes a `<ns>_<name>` temp view, views oldest-first
        so they may reference tables and earlier views."""
        registered: list[str] = []
        with self._conn() as con:
            idents = sorted(
                r[0] for r in con.execute("SELECT ident FROM tables").fetchall()
            )
            view_rows = con.execute("SELECT ident, definition FROM views").fetchall()
        for ident in idents:
            alias = ident.replace(".", "_")
            self.load_table(ident).read().createOrReplaceTempView(alias)
            registered.append(alias)
        for ident, definition in sorted(
            view_rows, key=lambda r: json.loads(r[1]).get("created_ms", 0)
        ):
            v = json.loads(definition)
            alias = ident.replace(".", "_")
            self.spark.sql(f"CREATE OR REPLACE TEMP VIEW {alias} AS {v['sql']}")
            registered.append(alias)
        return registered
