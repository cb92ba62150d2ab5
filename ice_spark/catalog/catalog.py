"""Warehouse catalog: namespaces + tables on a filesystem.

Mirrors the reference's catalog verbs
(/root/reference/ice/src/main/java/com/altinity/ice/cli/Main.java:79-86):
check, create/delete/list namespaces, create/delete/list tables,
catalog export/import. Namespaces are directories carrying a
`.ns.json` marker (multi-level, like the reference's etcd `/`-joined
keys, EtcdCatalog.java:69,220-229); tables are directories with a
metadata/version-hint.text.

The filesystem is the metadata store here (the reference offers
etcd/SQLite/S3Tables backends; those are infrastructure choices, not
engine semantics — see SURVEY.md §2.6 note).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as SPT

from ice_spark.catalog.table import NoSuchTableError, Table


class NamespaceError(ValueError):
    pass


def _split_ident(ident: str) -> list[str]:
    parts = ident.split(".")
    if any(not p for p in parts):
        # reference validates empty levels (CreateNamespace)
        raise NamespaceError(f"empty level in identifier: {ident!r}")
    return parts


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        os.makedirs(self.warehouse, exist_ok=True)
        # serializes namespace-property read-modify-writes within this
        # process (see update_namespace_properties)
        import threading

        self._ns_props_lock = threading.Lock()

    # ---------- namespaces ----------

    def _ns_dir(self, ns: str) -> str:
        return os.path.join(self.warehouse, *_split_ident(ns))

    def _is_namespace(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, ".ns.json"))

    def _is_table(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", "version-hint.text"))

    def namespace_exists(self, ns: str) -> bool:
        try:
            return self._is_namespace(self._ns_dir(ns))
        except NamespaceError:
            return False

    def check(self) -> bool:
        """Connectivity probe = listNamespaces (Check.java:19-22)."""
        self.list_namespaces()
        return True

    def create_namespace(self, ns: str, parents: bool = False, exist_ok: bool = False) -> None:
        levels = _split_ident(ns)
        # parent must exist unless -p (EtcdCatalog.java:192-198)
        for i in range(1, len(levels)):
            parent = os.path.join(self.warehouse, *levels[:i])
            if not self._is_namespace(parent):
                if not parents:
                    raise NamespaceError(f"parent namespace missing: {'.'.join(levels[:i])}")
                os.makedirs(parent, exist_ok=True)
                self._mark_ns(parent)
        path = self._ns_dir(ns)
        if self._is_namespace(path):
            if exist_ok:
                return
            raise NamespaceError(f"namespace exists: {ns}")
        os.makedirs(path, exist_ok=True)
        self._mark_ns(path)

    def _mark_ns(self, path: str) -> None:
        with open(os.path.join(path, ".ns.json"), "w") as f:
            json.dump({"properties": {}}, f)

    def namespace_properties(self, ns: str) -> dict:
        path = self._ns_dir(ns)
        if not self._is_namespace(path):
            raise NamespaceError(f"no such namespace: {ns}")
        with open(os.path.join(path, ".ns.json")) as f:
            return json.load(f).get("properties", {})

    def update_namespace_properties(
        self, ns: str, removals: list[str] | None = None, updates: dict | None = None
    ) -> dict:
        """updateProperties parity (EtcdCatalog namespace properties;
        REST POST /namespaces/{ns}/properties). Returns the REST
        response shape: which keys were removed / updated / missing.

        Concurrency: the read-modify-write is serialized by a
        per-Catalog lock (covers the threaded REST server, which owns
        one Catalog) and made torn-read-free by writing a temp file +
        os.replace (readers see old or new, never a partial file).
        Cross-PROCESS writers are not serialized — namespace
        properties are not CAS-versioned like table metadata; the
        reference gets this from etcd transactions."""
        path = self._ns_dir(ns)
        if not self._is_namespace(path):
            raise NamespaceError(f"no such namespace: {ns}")
        with self._ns_props_lock:
            props = self.namespace_properties(ns)
            removed, missing = [], []
            for k in removals or []:
                if k in props:
                    props.pop(k)
                    removed.append(k)
                else:
                    missing.append(k)
            updated = sorted((updates or {}).keys())
            props.update(updates or {})
            target = os.path.join(path, ".ns.json")
            tmp = target + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"properties": props}, f)
            os.replace(tmp, target)
        return {"removed": removed, "updated": updated, "missing": missing}

    def delete_namespace(self, ns: str) -> None:
        path = self._ns_dir(ns)
        if not self._is_namespace(path):
            raise NamespaceError(f"no such namespace: {ns}")
        children = [
            e
            for e in os.listdir(path)
            if self._is_namespace(os.path.join(path, e)) or self._is_table(os.path.join(path, e))
        ]
        if children:
            # must be empty (EtcdCatalog.java:344-355)
            raise NamespaceError(f"namespace not empty: {ns} ({sorted(children)})")
        shutil.rmtree(path)

    def list_namespaces(self, parent: str | None = None) -> list[str]:
        base = self._ns_dir(parent) if parent else self.warehouse
        if parent and not self._is_namespace(base):
            raise NamespaceError(f"no such namespace: {parent}")
        out = []
        if os.path.isdir(base):
            for e in sorted(os.listdir(base)):
                if self._is_namespace(os.path.join(base, e)):
                    out.append(f"{parent}.{e}" if parent else e)
        return out

    # ---------- tables ----------

    def _table_path(self, ident: str) -> tuple[str, str]:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise NamespaceError(f"table identifier needs a namespace: {ident}")
        ns = ".".join(parts[:-1])
        ns_dir = self._ns_dir(ns)
        if not self._is_namespace(ns_dir):
            raise NamespaceError(f"no such namespace: {ns}")
        return os.path.join(ns_dir, parts[-1]), ns

    def list_tables(self, ns: str) -> list[str]:
        ns_dir = self._ns_dir(ns)
        if not self._is_namespace(ns_dir):
            raise NamespaceError(f"no such namespace: {ns}")
        return sorted(
            e for e in os.listdir(ns_dir) if self._is_table(os.path.join(ns_dir, e))
        )

    def table_exists(self, ident: str) -> bool:
        try:
            path, _ = self._table_path(ident)
        except NamespaceError:
            return False
        return self._is_table(path)

    def load_table(self, ident: str) -> Table:
        path, _ = self._table_path(ident)
        if not self._is_table(path):
            raise NoSuchTableError(f"no such table: {ident}")
        return Table(self.spark, path, ident).refresh()

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
        """CreateTable.run parity (CreateTable.java:59-141): schema may
        be inferred from a Parquet file; name-based resolution is
        inherent here (no field ids), matching the reference's
        name-mapping property intent (CreateTable.java:104-108)."""
        path, _ = self._table_path(ident)
        if self._is_table(path):
            if exist_ok:
                return self.load_table(ident)
            raise ValueError(f"table exists: {ident}")
        if schema is None:
            if not schema_from_parquet:
                raise ValueError("need schema or schema_from_parquet")
            schema = self.spark.read.parquet(schema_from_parquet).schema
        return Table.create(
            self.spark,
            location or path,
            schema,
            partition_spec=partition_spec,
            sort_order=sort_order,
            properties=properties,
            identifier=ident,
        )

    def drop_table(self, ident: str, purge: bool = False) -> None:
        """DeleteTable parity; purge removes data too
        (EtcdCatalog.java:489-515)."""
        path, _ = self._table_path(ident)
        if not self._is_table(path):
            raise NoSuchTableError(f"no such table: {ident}")
        if purge:
            shutil.rmtree(path)
        else:
            # de-register only: drop metadata pointer, keep data files
            os.remove(os.path.join(path, "metadata", "version-hint.text"))

    def rename_table(self, ident: str, new_ident: str) -> None:
        src, _ = self._table_path(ident)
        dst, _ = self._table_path(new_ident)
        if not self._is_table(src):
            raise NoSuchTableError(f"no such table: {ident}")
        if os.path.exists(dst):
            raise ValueError(f"target exists: {new_ident}")
        os.rename(src, dst)

    def register_views(self, ns: str, prefix: str = "") -> list[str]:
        """Register every table of a namespace as Spark temp views, so
        users run plain spark.sql over catalog tables."""
        out = []
        for t in self.list_tables(ns):
            out += self.load_table(f"{ns}.{t}").create_views(prefix)
        return out

    # ---------- export / import ----------

    def export_registry(self) -> dict:
        """catalog-export parity (CatalogExport.java:27-40): dump
        namespaces + table metadata locations as JSON."""
        namespaces: list[str] = []

        def walk(ns: str | None):
            for child in self.list_namespaces(ns):
                namespaces.append(child)
                walk(child)

        walk(None)
        tables = {}
        for ns in namespaces:
            for t in self.list_tables(ns):
                ident = f"{ns}.{t}"
                tbl = self.load_table(ident)
                tables[ident] = tbl.metadata_path(tbl.current_version())
        return {"namespaces": namespaces, "tables": tables}

    def import_registry(
        self, registry: dict, overwrite: bool = False, dry_run: bool = False
    ) -> list[str]:
        """catalog-import parity (CatalogImport.java:23-33): restore
        namespaces and register tables from metadata files."""
        actions = []
        for ns in registry.get("namespaces", []):
            exists = True
            try:
                exists = self._is_namespace(self._ns_dir(ns))
            except NamespaceError:
                exists = False
            if not exists:
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

    def register_table(self, ident: str, metadata_file: str, overwrite: bool = False) -> Table:
        """register_table procedure analog: point a (new) table dir at
        an existing metadata tree."""
        path, _ = self._table_path(ident)
        if self._is_table(path) and not overwrite:
            raise ValueError(f"table exists: {ident}")
        src_meta_dir = os.path.dirname(os.path.abspath(metadata_file))
        src_table_dir = os.path.dirname(src_meta_dir)
        if os.path.abspath(src_table_dir) != os.path.abspath(path):
            # copy the metadata tree into place; data files are
            # referenced by the manifests via relative path, so they
            # must live with the table — same-location registration
            # is the supported fast path.
            os.makedirs(path, exist_ok=True)
            dst_meta = os.path.join(path, "metadata")
            if os.path.exists(dst_meta):
                shutil.rmtree(dst_meta)
            shutil.copytree(src_meta_dir, dst_meta)
        # (re)point the version hint at the registered metadata file —
        # a dropped-without-purge table has no hint anymore.
        base = os.path.basename(metadata_file)
        if not (base.startswith("v") and base.endswith(".metadata.json")):
            raise ValueError(f"not a metadata file: {metadata_file}")
        version = int(base[1:].split(".")[0])
        hint = os.path.join(path, "metadata", "version-hint.text")
        tmp = hint + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, hint)
        return self.load_table(ident)

    # ---------- views ----------
    #
    # The reference's REST route set includes the full view protocol
    # (list/create/load/update/rename/drop — Route.java:50-116) but its
    # etcd backend implements none of it (no ViewCatalog). Here views
    # are first-class: a named SQL definition stored in the namespace
    # (<ns>/<name>.view.json), resolvable by the `sql` verb alongside
    # tables. Views are logical only — no data, no snapshots.

    def _view_path(self, ident: str) -> tuple[str, str]:
        parts = _split_ident(ident)
        if len(parts) < 2:
            raise ValueError(f"view identifier needs a namespace: {ident!r}")
        ns, name = ".".join(parts[:-1]), parts[-1]
        ns_dir = self._ns_dir(ns)
        if not self._is_namespace(ns_dir):
            raise NamespaceError(f"no such namespace: {ns}")
        return os.path.join(ns_dir, f"{name}.view.json"), name

    def create_view(
        self, ident: str, sql: str, comment: str = "", replace: bool = False
    ) -> dict:
        import json as _json
        import time as _time

        path, name = self._view_path(ident)
        if os.path.exists(path) and not replace:
            raise ValueError(f"view exists: {ident}")
        view = {
            "name": name,
            "sql": sql,
            "comment": comment,
            "created_ms": int(_time.time() * 1000),
        }
        with open(path, "w") as f:
            _json.dump(view, f, indent=1)
        return view

    def load_view(self, ident: str) -> dict:
        import json as _json

        path, _ = self._view_path(ident)
        if not os.path.exists(path):
            raise ValueError(f"no such view: {ident}")
        with open(path) as f:
            return _json.load(f)

    def list_views(self, ns: str) -> list[str]:
        ns_dir = self._ns_dir(ns)
        if not self._is_namespace(ns_dir):
            raise NamespaceError(f"no such namespace: {ns}")
        return sorted(
            e[: -len(".view.json")]
            for e in os.listdir(ns_dir)
            if e.endswith(".view.json")
        )

    def drop_view(self, ident: str) -> None:
        path, _ = self._view_path(ident)
        if not os.path.exists(path):
            raise ValueError(f"no such view: {ident}")
        os.remove(path)

    def register_sql_context(self) -> list[str]:
        """Register every table AND view as `<ns>_<name>` temp views
        for spark.sql. Views register after tables, oldest first, so a
        view may reference tables and previously-created views."""
        registered = []
        for ns in self.list_namespaces():
            for tb in self.list_tables(ns):
                alias = f"{ns.replace('.', '_')}_{tb}"
                self.load_table(f"{ns}.{tb}").read().createOrReplaceTempView(alias)
                registered.append(alias)
        views = []
        for ns in self.list_namespaces():
            for v in self.list_views(ns):
                views.append((ns, self.load_view(f"{ns}.{v}")))
        for ns, view in sorted(views, key=lambda x: x[1].get("created_ms", 0)):
            alias = f"{ns.replace('.', '_')}_{view['name']}"
            self.spark.sql(
                f"CREATE OR REPLACE TEMP VIEW {alias} AS {view['sql']}"
            )
            registered.append(alias)
        return registered
