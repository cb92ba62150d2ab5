"""etcd-backed catalog registry (reference production backend parity).

The reference's primary catalog backend is etcd
(ice-rest-catalog/.../etcd/EtcdCatalog.java, docs/etcd-backend-schema.md):
the KV store holds namespace/table entries and the table entry's
``metadata_location`` pointer is swapped with a version-CAS transaction
— THAT transaction, not a file create, is the commit linearization
point. These tests prove the EtcdCatalog reproduces the key/value
schema exactly, the txn-CAS commit protocol (including orphan-file
cleanup on lost races and concurrent-committer safety), the raw-KV
admin surface, and that the REST server runs over it unchanged.

Metadata plane only — no SparkSession needed. etcd access is through
the injectable EtcdKV seam (InMemoryEtcd reproduces etcd's per-key
version counter semantics).
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.catalog import Catalog, NamespaceError
from ice_spark.catalog.etcd_catalog import (
    EtcdCatalog,
    InMemoryEtcd,
    KVEntry,
    _version_of,
)
from ice_spark.catalog.table import CommitConflictError, NoSuchTableError
from ice_spark.rest import RestCatalogClient, RestCatalogServer, ServerConfig

SCHEMA = T.StructType([T.StructField("id", T.LongType())])


@pytest.fixture()
def kv():
    return InMemoryEtcd()


@pytest.fixture()
def cat(tmp_path, kv):
    return EtcdCatalog(None, str(tmp_path / "wh"), kv=kv)


class TestKvSemantics:
    """InMemoryEtcd must model real etcd versions: 0 = absent, 1 on
    create, +1 per put, reset on delete+recreate (jetcd
    CmpTarget.version semantics the reference CASes against)."""

    def test_version_counter(self, kv):
        assert kv.get("k") is None
        kv.put("k", "a")
        assert kv.get("k").version == 1
        kv.put("k", "b")
        assert kv.get("k").version == 2
        kv.delete("k")
        assert kv.get("k") is None
        kv.put("k", "c")
        assert kv.get("k").version == 1  # version resets on recreate

    def test_txn_compare_and_ops(self, kv):
        assert kv.txn([("k", 0)], [("put", "k", "v1")])  # create CAS
        assert not kv.txn([("k", 0)], [("put", "k", "v2")])  # lost create
        assert kv.get("k").value == "v1"
        assert kv.txn([("k", 1)], [("put", "k", "v2"), ("put", "k2", "x")])
        assert kv.get("k").value == "v2" and kv.get("k2").value == "x"
        # multi-compare: all must hold
        assert not kv.txn([("k", 2), ("k2", 0)], [("delete", "k")])
        assert kv.txn([("k", 2), ("k2", 1)], [("delete", "k")])
        assert kv.get("k") is None

    def test_prefix_scan_sorted(self, kv):
        for k in ["n/b", "n/a", "n/a/c", "t/a/t1"]:
            kv.put(k, "{}")
        assert [e.key for e in kv.get_prefix("n/")] == ["n/a", "n/a/c", "n/b"]


class TestSchemaParity:
    """Key/value layout must match docs/etcd-backend-schema.md."""

    def test_key_layout_and_values(self, cat, kv, tmp_path):
        cat.create_namespace("flowers")
        cat.create_namespace("flowers.sub")
        cat.create_table("flowers.iris2", schema=SCHEMA)
        keys = [e.key for e in kv.get_prefix("")]
        assert "n/flowers" in keys
        assert "n/flowers/sub" in keys  # levels joined by '/'
        assert "t/flowers/iris2" in keys
        val = json.loads(kv.get("t/flowers/iris2").value)
        assert val["table_type"] == "ICEBERG"
        assert val["metadata_location"].endswith(".metadata.json")
        assert val["previous_metadata_location"] == ""
        # after a commit, previous_metadata_location points at v1
        t = cat.load_table("flowers.iris2")
        first = val["metadata_location"]
        t.commit(lambda m: {**m, "properties": {**m["properties"], "k": "v"}})
        val2 = json.loads(kv.get("t/flowers/iris2").value)
        assert val2["previous_metadata_location"] == first
        assert _version_of(val2["metadata_location"]) == 2

    def test_non_default_catalog_prefix(self, tmp_path, kv):
        cat = EtcdCatalog(None, str(tmp_path / "wh"), kv=kv, catalog_name="prod")
        cat.create_namespace("ns")
        cat.create_table("ns.t", schema=SCHEMA)
        keys = [e.key for e in kv.get_prefix("")]
        assert "prod/n/ns" in keys and "prod/t/ns/t" in keys
        # prefixed catalogs are invisible to the default catalog
        other = EtcdCatalog(None, str(tmp_path / "wh2"), kv=kv)
        assert other.list_namespaces() == []

    def test_invalid_catalog_name(self, tmp_path):
        with pytest.raises(ValueError):
            EtcdCatalog(None, str(tmp_path), catalog_name="a/b")


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

    def test_properties_cas_roundtrip(self, cat):
        cat.create_namespace("ns")
        cat.update_namespace_properties("ns", updates={"k": "v", "d": "x"})
        out = cat.update_namespace_properties("ns", removals=["d", "absent"])
        assert out["removed"] == ["d"]
        assert cat.namespace_properties("ns") == {"k": "v"}

    def test_empty_level_rejected(self, cat):
        with pytest.raises(NamespaceError):
            cat.create_namespace("a..b")

    def test_ns_must_exist_for_tables(self, cat):
        with pytest.raises(NamespaceError):
            cat.create_table("nope.t", schema=SCHEMA)
        with pytest.raises(NamespaceError):
            cat.list_tables("nope")

    def test_delete_namespace_loses_race_to_create_table(self, cat, kv):
        """A table committed BETWEEN delete_namespace's emptiness
        check and its delete must fail the delete, not end up
        registered under a deleted namespace: create_table's txn
        bumps the ns key version, so the delete's version-CAS fails
        and the retry's re-check reports not-empty (the reference
        closes this window with the same etcd transaction)."""
        cat.create_namespace("ns")

        class RacingKV:
            def __init__(self, inner, fire):
                self.inner = inner
                self.fire = fire
                self.fired = False

            def __getattr__(self, n):
                return getattr(self.inner, n)

            def txn(self, compares, ops):
                if not self.fired and any(op[0] == "delete" for op in ops):
                    self.fired = True
                    self.fire()  # racer lands between check and CAS
                return self.inner.txn(compares, ops)

        cat.kv = RacingKV(kv, lambda: cat.create_table("ns.sneaky", schema=SCHEMA))
        with pytest.raises(NamespaceError, match="not empty"):
            cat.delete_namespace("ns")
        # nothing orphaned: namespace still present, table loadable
        assert cat.namespace_exists("ns")
        assert cat.load_table("ns.sneaky").current_version() == 1

    def test_create_table_loses_race_to_delete_namespace(self, cat, kv):
        """The mirror race: delete_namespace lands between
        create_table's namespace check and its registration txn — the
        txn's ns-version compare sees the deleted key and create
        fails with no orphan key."""
        cat.create_namespace("ns")

        class RacingKV:
            def __init__(self, inner):
                self.inner = inner
                self.fired = False

            def __getattr__(self, n):
                return getattr(self.inner, n)

            def txn(self, compares, ops):
                if not self.fired and any(op[0] == "put" for op in ops):
                    self.fired = True
                    self.inner.delete("n/ns")
                return self.inner.txn(compares, ops)

        cat.kv = RacingKV(kv)
        with pytest.raises(NamespaceError, match="no such namespace"):
            cat.create_table("ns.t", schema=SCHEMA)
        assert kv.get("t/ns/t") is None


class TestTables:
    def test_create_load_drop(self, cat, tmp_path):
        cat.create_namespace("ns")
        t = cat.create_table("ns.t1", schema=SCHEMA)
        assert cat.table_exists("ns.t1")
        assert cat.list_tables("ns") == ["t1"]
        loaded = cat.load_table("ns.t1")
        assert loaded.schema == SCHEMA
        assert loaded.current_version() == 1
        with pytest.raises(ValueError):
            cat.create_table("ns.t1", schema=SCHEMA)
        assert cat.create_table("ns.t1", schema=SCHEMA, exist_ok=True) is not None
        # purge removes the table tree
        loc = t.location
        assert os.path.isdir(loc)
        cat.drop_table("ns.t1", purge=True)
        assert not os.path.isdir(loc)
        with pytest.raises(NoSuchTableError):
            cat.load_table("ns.t1")

    def test_rename_registry_only(self, cat, kv):
        cat.create_namespace("a")
        cat.create_namespace("b")
        t = cat.create_table("a.t", schema=SCHEMA)
        loc = t.location
        cat.rename_table("a.t", "b.t2")
        assert not cat.table_exists("a.t")
        t2 = cat.load_table("b.t2")
        assert t2.location == loc  # storage untouched
        # rename txn removes old key atomically
        assert kv.get("t/a/t") is None and kv.get("t/b/t2") is not None
        with pytest.raises(NoSuchTableError):
            cat.rename_table("a.t", "b.t3")
        cat.create_table("a.t", schema=SCHEMA)
        with pytest.raises(ValueError):
            cat.rename_table("a.t", "b.t2")  # target exists

    def test_nested_ns_tables_listed_one_level(self, cat):
        cat.create_namespace("a")
        cat.create_namespace("a.b")
        cat.create_table("a.t", schema=SCHEMA)
        cat.create_table("a.b.t2", schema=SCHEMA)
        assert cat.list_tables("a") == ["t"]
        assert cat.list_tables("a.b") == ["t2"]


class TestCommitProtocol:
    """The etcd txn is the linearization point (EtcdCatalog.java:588-640)."""

    def test_conflict_detected_and_orphan_cleaned(self, cat):
        cat.create_namespace("ns")
        cat.create_table("ns.t", schema=SCHEMA)
        a = cat.load_table("ns.t")
        b = cat.load_table("ns.t")
        a.commit(lambda m: {**m, "properties": {**m["properties"], "who": "a"}})
        # b holds stale v1; a raw CAS write must fail and clean up
        meta = json.loads(json.dumps(b.meta))
        with pytest.raises(CommitConflictError):
            b._write_metadata(meta, expected_version=1)
        files = os.listdir(a.metadata_dir)
        # exactly v1 + v2 metadata remain; the loser's attempt file is gone
        assert sorted(_version_of(f) for f in files if f.endswith(".metadata.json")) == [1, 2]
        # the retrying commit loop resolves the conflict
        b.commit(lambda m: {**m, "properties": {**m["properties"], "who2": "b"}})
        final = cat.load_table("ns.t")
        assert final.properties["who"] == "a" and final.properties["who2"] == "b"
        assert final.current_version() == 3

    def test_concurrent_committers_all_land(self, cat, kv):
        cat.create_namespace("ns")
        cat.create_table("ns.t", schema=SCHEMA)
        n = 8
        errs = []

        def work(i):
            try:
                t = cat.load_table("ns.t")
                t.commit(
                    lambda m: {
                        **m,
                        "properties": {**m["properties"], f"w{i}": "1"},
                    },
                    retries=50,
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert errs == []
        final = cat.load_table("ns.t")
        assert final.current_version() == n + 1
        for i in range(n):
            assert final.properties[f"w{i}"] == "1"
        # some txns must have failed (real contention) and every loser
        # cleaned its attempt file: exactly n+1 metadata files remain
        assert kv.failed_txn_count > 0
        files = [f for f in os.listdir(final.metadata_dir) if f.endswith(".metadata.json")]
        assert len(files) == n + 1

    def test_create_race_linearized_by_version0_cas(self, cat, kv):
        cat.create_namespace("ns")
        # simulate a racer that claimed the key between our exists
        # check and the CAS: pre-seed the key out-of-band
        t = cat.create_table("ns.t", schema=SCHEMA)
        assert json.loads(kv.get("t/ns/t").value)["metadata_location"] == t._pointer

    def test_time_travel_resolves_old_versions(self, cat):
        cat.create_namespace("ns")
        cat.create_table("ns.t", schema=SCHEMA)
        t = cat.load_table("ns.t")
        t.commit(lambda m: {**m, "properties": {**m["properties"], "gen": "2"}})
        t.commit(lambda m: {**m, "properties": {**m["properties"], "gen": "3"}})
        t.refresh()
        # metadata_path resolves every historical version via the log
        for v in (1, 2, 3):
            meta = json.loads(t.io.read_text(t.metadata_path(v)))
            assert isinstance(meta["schema"], dict)
        assert t.schema_at(1) == SCHEMA


class TestAdminSurface:
    def test_raw_kv_export_and_put(self, cat):
        cat.create_namespace("a")
        cat.create_namespace("a.b")
        cat.create_table("a.t1", schema=SCHEMA)
        cat.create_table("a.b.t2", schema=SCHEMA)
        ns_kvs = cat.list_all_namespace_kvs()
        assert [k for k, _ in ns_kvs] == ["n/a", "n/a/b"]
        all_tables = cat.list_all_table_kvs()
        assert [k for k, _ in all_tables] == ["t/a/b/t2", "t/a/t1"]
        # namespace-scoped listing includes the subtree (reference
        # listAllTableKvs semantics, EtcdCatalog.java:129-135)
        scoped = cat.list_all_table_kvs("a/b")
        assert [k for k, _ in scoped] == ["t/a/b/t2"]
        # putCatalogKv result states (EtcdCatalog.java:149-173)
        assert cat.put_catalog_kv("n/zz", "{}") == "CREATED"
        assert cat.put_catalog_kv("n/zz", "{}") == "SKIPPED"
        assert cat.put_catalog_kv("n/zz", '{"x":"1"}', overwrite=True) == "OVERWRITTEN"
        assert cat.put_catalog_kv("n/qq", "{}", dry_run=True) == "CREATED"
        assert not cat.namespace_exists("qq")

    def test_registry_export_import_roundtrip(self, cat, tmp_path, kv):
        cat.create_namespace("ns")
        cat.create_table("ns.t", schema=SCHEMA)
        reg = cat.export_registry()
        assert reg["namespaces"] == ["ns"]
        assert list(reg["tables"]) == ["ns.t"]
        # import into a SECOND etcd catalog (fresh KV): dry-run first
        cat2 = EtcdCatalog(None, str(tmp_path / "wh2"), kv=InMemoryEtcd())
        plan = cat2.import_registry(reg, dry_run=True)
        assert any(a.startswith("register ns.t") for a in plan)
        assert not cat2.table_exists("ns.t")
        cat2.import_registry(reg)
        assert cat2.load_table("ns.t").schema == SCHEMA

    def test_import_filesystem_catalog_tables(self, cat, tmp_path):
        """A filesystem-catalog registry (plain vN.metadata.json names)
        imports cleanly — the etcd pointer accepts both name shapes."""
        fs = Catalog(None, str(tmp_path / "fswh"))
        fs.create_namespace("ns")
        fs.create_table("ns.t", schema=SCHEMA)
        cat.import_registry(fs.export_registry())
        t = cat.load_table("ns.t")
        assert t.schema == SCHEMA and t.current_version() == 1
        # commits after adoption switch to uuid-named files via the
        # etcd pointer without disturbing the original file
        t.commit(lambda m: {**m, "properties": {**m["properties"], "x": "1"}})
        assert t.current_version() == 2
        assert os.path.exists(os.path.join(t.metadata_dir, "v1.metadata.json"))


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

    def test_delete_namespace_loses_race_to_create_view(self, cat, kv):
        """ADVICE r8: create_view's txn now compares AND bumps the ns
        key exactly like create_table, so a view created between
        delete_namespace's emptiness check and its delete txn fails
        the delete's ns-version CAS instead of being orphaned under a
        deleted namespace."""
        cat.create_namespace("ns")

        class RacingKV:
            def __init__(self, inner, fire):
                self.inner = inner
                self.fire = fire
                self.fired = False

            def __getattr__(self, n):
                return getattr(self.inner, n)

            def txn(self, compares, ops):
                if not self.fired and any(op[0] == "delete" for op in ops):
                    self.fired = True
                    self.fire()
                return self.inner.txn(compares, ops)

        cat.kv = RacingKV(kv, lambda: cat.create_view("ns.sneaky", "SELECT 1 AS o"))
        with pytest.raises(NamespaceError, match="not empty"):
            cat.delete_namespace("ns")
        assert cat.namespace_exists("ns")
        assert cat.load_view("ns.sneaky")["sql"] == "SELECT 1 AS o"

    def test_create_view_loses_race_to_delete_namespace(self, cat, kv):
        """The mirror race: delete_namespace lands between
        create_view's namespace check and its txn — the ns-version
        compare sees the deleted key and create fails, no orphan."""
        cat.create_namespace("ns")

        class RacingKV:
            def __init__(self, inner):
                self.inner = inner
                self.fired = False

            def __getattr__(self, n):
                return getattr(self.inner, n)

            def txn(self, compares, ops):
                if not self.fired and any(op[0] == "put" for op in ops):
                    self.fired = True
                    self.inner.delete("n/ns")
                return self.inner.txn(compares, ops)

        cat.kv = RacingKV(kv)
        with pytest.raises(NamespaceError, match="no such namespace"):
            cat.create_view("ns.v", "SELECT 1 AS o")
        assert kv.get("v/ns/v") is None


class TestRestOverEtcd:
    def test_rest_server_duck_types(self, tmp_path):
        cat = EtcdCatalog(None, str(tmp_path / "wh"), kv=InMemoryEtcd())
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


class TestEtcd3Binding:
    def test_requires_package(self):
        """The real binding must fail loudly when etcd3 is absent
        (sandbox) instead of silently degrading."""
        try:
            import etcd3  # noqa: F401

            pytest.skip("etcd3 installed; binding is live")
        except ImportError:
            pass
        from ice_spark.catalog.etcd_catalog import Etcd3KV

        with pytest.raises(RuntimeError, match="etcd3"):
            Etcd3KV("http://127.0.0.1:2379")

    def test_kventry_shape(self):
        e = KVEntry("k", "v", 3)
        assert (e.key, e.value, e.version) == ("k", "v", 3)

    def test_endpoint_parsing(self):
        """ADVICE r7: 'https://host:2379' used to parse to
        host='https://host' (never connects); extra endpoints were
        silently dropped. urlsplit-based parsing handles both schemes
        and bare host:port, and rejects multi-endpoint lists loudly."""
        from ice_spark.catalog.etcd_catalog import Etcd3KV

        p = Etcd3KV._parse_endpoint
        assert p("http://h1:2379") == ("h1", 2379, False)
        assert p("https://h1:2379") == ("h1", 2379, True)
        assert p("h1:2380") == ("h1", 2380, False)
        assert p("h1") == ("h1", 2379, False)
        with pytest.raises(ValueError, match="exactly one endpoint"):
            p("http://h1:2379,http://h2:2379")
        with pytest.raises(ValueError, match="scheme"):
            p("grpc://h1:2379")
