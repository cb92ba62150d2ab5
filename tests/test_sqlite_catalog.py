"""SQLite-backed catalog registry (reference JDBC backend parity).

The reference's catalog backends are etcd / JDBC(sqlite) / S3Tables
(ice-rest-catalog/.../config/Config.java:262-298) — the DB holds the
registry rows, storage holds the table trees. These tests prove the
SqliteCatalog exposes the same public API as the filesystem Catalog
(shared-registry across instances, must-be-empty deletes, registry-
only renames), and that the REST server runs over it unchanged.

Metadata plane only — no SparkSession needed (Table.create writes
metadata JSON without Spark).
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.catalog import NamespaceError
from ice_spark.catalog.sqlite_catalog import SqliteCatalog
from ice_spark.catalog.table import NoSuchTableError
from ice_spark.rest import RestCatalogClient, RestCatalogServer, ServerConfig

SCHEMA = T.StructType([T.StructField("id", T.LongType())])


@pytest.fixture()
def cat(tmp_path):
    return SqliteCatalog(None, str(tmp_path / "wh"))


class TestNamespaces:
    def test_crud_and_nesting(self, cat):
        assert cat.check()
        cat.create_namespace("a")
        cat.create_namespace("a.b")
        with pytest.raises(NamespaceError):
            cat.create_namespace("a.b")  # exists
        with pytest.raises(NamespaceError):
            cat.create_namespace("x.y")  # parent missing
        cat.create_namespace("x.y", parents=True)
        assert cat.list_namespaces() == ["a", "x"]
        assert cat.list_namespaces("a") == ["a.b"]
        with pytest.raises(NamespaceError):
            cat.delete_namespace("a")  # not empty (has a.b)
        cat.delete_namespace("a.b")
        cat.delete_namespace("a")
        assert cat.list_namespaces() == ["x"]

    def test_properties_roundtrip(self, cat):
        cat.create_namespace("ns")
        cat.update_namespace_properties("ns", updates={"k": "v", "d": "x"})
        cat.update_namespace_properties("ns", removals=["d"])
        assert cat.namespace_properties("ns") == {"k": "v"}

    def test_empty_level_rejected(self, cat):
        with pytest.raises(NamespaceError):
            cat.create_namespace("a..b")


class TestTables:
    def test_create_load_list_drop(self, cat):
        cat.create_namespace("ns")
        t = cat.create_table("ns.t1", schema=SCHEMA)
        assert t.identifier == "ns.t1"
        assert cat.table_exists("ns.t1")
        assert cat.list_tables("ns") == ["t1"]
        loaded = cat.load_table("ns.t1")
        assert loaded.meta["schema"]["fields"][0]["name"] == "id"
        cat.drop_table("ns.t1")
        assert not cat.table_exists("ns.t1")
        with pytest.raises(NoSuchTableError):
            cat.load_table("ns.t1")

    def test_stale_claim_reclaimed(self, cat, tmp_path):
        """A crash between the claim COMMIT and Table.create leaves a
        registry row whose storage doesn't exist. Once past the grace
        period the row is a stale claim: load_table reclaims it
        (NoSuchTableError, row gone) and create_table can re-use the
        identifier (ADVICE r7)."""
        import sqlite3 as _sq

        cat.create_namespace("ns")
        with _sq.connect(cat.db_path) as con:
            con.execute(
                "INSERT INTO tables (ident, ns, location, claimed_at) "
                "VALUES ('ns.ghost', 'ns', ?, 1.0)",  # claimed long ago
                (str(tmp_path / "wh" / "ns" / "ghost"),),
            )
        with pytest.raises(NoSuchTableError, match="reclaimed stale claim"):
            cat.load_table("ns.ghost")
        # the row is gone; the identifier is creatable again
        t = cat.create_table("ns.ghost", schema=SCHEMA)
        assert cat.load_table("ns.ghost").meta == t.meta

    def test_stale_claim_reclaimed_by_create_directly(self, cat, tmp_path):
        import sqlite3 as _sq

        cat.create_namespace("ns")
        with _sq.connect(cat.db_path) as con:
            con.execute(
                "INSERT INTO tables (ident, ns, location, claimed_at) "
                "VALUES ('ns.ghost', 'ns', ?, 1.0)",
                (str(tmp_path / "wh" / "ns" / "ghost"),),
            )
        t = cat.create_table("ns.ghost", schema=SCHEMA)
        assert t.identifier == "ns.ghost"

    def test_fresh_claim_is_not_reclaimed(self, cat, tmp_path):
        """A claim inside the grace window may belong to an in-flight
        Table.create in another process — it must NOT be stolen."""
        import sqlite3 as _sq
        import time as _t

        cat.create_namespace("ns")
        with _sq.connect(cat.db_path) as con:
            con.execute(
                "INSERT INTO tables (ident, ns, location, claimed_at) "
                "VALUES ('ns.busy', 'ns', ?, ?)",
                (str(tmp_path / "wh" / "ns" / "busy"), _t.time()),
            )
        with pytest.raises(ValueError, match="table exists"):
            cat.create_table("ns.busy", schema=SCHEMA)
        with pytest.raises(NoSuchTableError):
            cat.load_table("ns.busy")
        # the row survived (no reclaim message, still registered)
        assert cat.table_exists("ns.busy")

    def test_duplicate_create_rejected(self, cat):
        cat.create_namespace("ns")
        cat.create_table("ns.t1", schema=SCHEMA)
        with pytest.raises(ValueError):
            cat.create_table("ns.t1", schema=SCHEMA)
        assert cat.create_table("ns.t1", schema=SCHEMA, exist_ok=True) is not None

    def test_failed_storage_create_rolls_back_claim(self, cat, monkeypatch):
        """ADVICE r6: Table.create now runs OUTSIDE the registry write
        transaction (short claim-row insert, commit, then storage). A
        failing storage create must release the claim and remove the
        partial directory so the identifier is immediately reusable."""
        import os

        from ice_spark.catalog import sqlite_catalog as mod

        cat.create_namespace("ns")

        def boom(*a, **kw):
            raise RuntimeError("storage create failed")

        monkeypatch.setattr(mod.Table, "create", staticmethod(boom))
        with pytest.raises(RuntimeError):
            cat.create_table("ns.broken", schema=SCHEMA)
        assert not cat.table_exists("ns.broken")  # claim rolled back
        assert not os.path.isdir(
            os.path.join(cat.warehouse, "ns", "broken")
        )  # no partial directory left
        monkeypatch.undo()
        cat.create_table("ns.broken", schema=SCHEMA)  # ident reusable
        assert cat.table_exists("ns.broken")

    def test_rename_is_registry_only(self, cat):
        cat.create_namespace("ns")
        cat.create_namespace("ns2")
        t = cat.create_table("ns.t1", schema=SCHEMA)
        loc = t.location
        cat.rename_table("ns.t1", "ns2.renamed")
        assert not cat.table_exists("ns.t1")
        t2 = cat.load_table("ns2.renamed")
        assert t2.location == loc  # storage untouched, pointer moved

    def test_namespace_with_tables_not_deletable(self, cat):
        cat.create_namespace("ns")
        cat.create_table("ns.t1", schema=SCHEMA)
        with pytest.raises(NamespaceError):
            cat.delete_namespace("ns")

    def test_shared_registry_across_instances(self, cat, tmp_path):
        cat.create_namespace("ns")
        cat.create_table("ns.t1", schema=SCHEMA)
        other = SqliteCatalog(None, str(tmp_path / "wh"))
        assert other.table_exists("ns.t1")
        assert other.list_tables("ns") == ["t1"]
        other.drop_table("ns.t1")
        assert not cat.table_exists("ns.t1")

    def test_concurrent_creates_one_winner_per_name(self, cat):
        cat.create_namespace("ns")
        wins, errs = [], []

        def worker(i):
            try:
                cat.create_table("ns.same", schema=SCHEMA)
                wins.append(i)
            except ValueError:
                errs.append(i)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1 and len(errs) == 5

    def test_export_import_roundtrip(self, cat, tmp_path):
        cat.create_namespace("ns")
        cat.create_table("ns.t1", schema=SCHEMA)
        reg = cat.export_registry()
        assert reg["namespaces"] == ["ns"]
        assert "ns.t1" in reg["tables"]
        fresh = SqliteCatalog(None, str(tmp_path / "wh"), db_path=str(tmp_path / "other.db"))
        actions = fresh.import_registry(reg)
        assert fresh.table_exists("ns.t1")
        assert any(a.startswith("register ns.t1") for a in actions)


class TestViews:
    def test_view_crud(self, cat):
        cat.create_namespace("ns")
        cat.create_view("ns.v1", "SELECT 1 AS one")
        assert cat.list_views("ns") == ["v1"]
        assert cat.load_view("ns.v1")["sql"] == "SELECT 1 AS one"
        with pytest.raises(ValueError):
            cat.create_view("ns.v1", "SELECT 2")
        cat.create_view("ns.v1", "SELECT 2 AS two", replace=True)
        assert cat.load_view("ns.v1")["sql"] == "SELECT 2 AS two"
        cat.drop_view("ns.v1")
        with pytest.raises(ValueError):
            cat.load_view("ns.v1")


class TestRestOverSqlite:
    def test_rest_server_duck_types(self, tmp_path):
        cat = SqliteCatalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, ServerConfig(anonymous=True)).start()
        try:
            client = RestCatalogClient(srv.url)
            client.create_namespace("ns1")
            client.create_table("ns1.t1", SCHEMA.jsonValue())
            assert client.list_tables("ns1") == ["t1"]
            client.commit_table(
                "ns1.t1",
                requirements=[],
                updates=[{"action": "set-properties", "updates": {"k": "v"}}],
            )
            meta = client.load_table("ns1.t1")["metadata"]
            assert meta["properties"]["k"] == "v"
            client.drop_table("ns1.t1")
            assert client.list_tables("ns1") == []
        finally:
            srv.stop()


class TestShellCompletion:
    def test_verb_and_identifier_completion(self, tmp_path, monkeypatch):
        """Shell tab-completion (reference jline completers,
        Main.java:1106-1181): first word -> verbs, later words ->
        catalog identifiers."""
        readline = pytest.importorskip("readline")
        from ice_spark.catalog.catalog import Catalog
        from ice_spark.cli import _install_completion, _shell_verbs

        verbs = _shell_verbs()
        assert "create-table" in verbs and "scan" in verbs
        wh = str(tmp_path / "wh")
        cat = Catalog(None, wh)
        cat.create_namespace("nsx")
        _install_completion(wh)
        comp = readline.get_completer()
        monkeypatch.setattr(readline, "get_line_buffer", lambda: "cre")
        assert comp("cre", 0).startswith("create")
        monkeypatch.setattr(readline, "get_line_buffer", lambda: "scan ns")
        assert comp("ns", 0) == "nsx"
