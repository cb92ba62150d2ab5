"""etcd registry snapshot/restore (backup-migration workflow parity).

The reference documents a snapshot-based registry backup/restore for
the etcd backend (docs/etcd-backup-restore-upgrade-3-node.md —
etcdctl snapshot save → etcdutl restore, with the catalog stopped to
fence writers). Over the injectable EtcdKV seam the analog is
`registry_snapshot` (dump every n/ t/ v/ key with value AND version)
and `registry_restore` (ONE CAS-guarded etcd transaction: fresh mode
compares every key against version 0, overwrite mode against the
version observed at validation) — so instead of fencing writers by
stopping the server, a concurrent writer FAILS the transaction and
nothing is clobbered or partially restored.

CLI verbs `registry-snapshot` / `registry-restore` are thin wrappers
over these (they require --registry-etcd; Etcd3KV needs a real etcd,
so CLI-level coverage is the same-shaped catalog-import path).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.etcd_catalog import EtcdCatalog, InMemoryEtcd
from ice_spark.catalog.table import CommitConflictError

SCHEMA = T.StructType([T.StructField("id", T.LongType())])


@pytest.fixture()
def cat(tmp_path):
    c = EtcdCatalog(None, str(tmp_path / "wh"), kv=InMemoryEtcd())
    c.create_namespace("ns")
    c.create_table("ns.t1", schema=SCHEMA)
    c.create_table("ns.t2", schema=SCHEMA)
    c.create_view("ns.v1", "SELECT 1 AS one")
    return c


class TestSnapshot:
    def test_snapshot_records_values_and_versions(self, cat):
        t = cat.load_table("ns.t1")
        t.commit(lambda m: {**m, "properties": {**m["properties"], "x": "1"}})
        snap = cat.registry_snapshot()
        assert snap["format"] == "ice-etcd-registry/1"
        by_key = {k["key"]: k for k in snap["keys"]}
        assert set(by_key) == {"n/ns", "t/ns/t1", "t/ns/t2", "v/ns/v1"}
        # t1 was committed twice (create + property commit) → etcd
        # per-key version 2, recorded for audit
        assert by_key["t/ns/t1"]["version"] == 2
        assert by_key["t/ns/t2"]["version"] == 1
        assert "metadata_location" in by_key["t/ns/t1"]["value"]

    def test_round_trip_into_fresh_registry(self, cat, tmp_path):
        snap = cat.registry_snapshot()
        # same warehouse (pointers are absolute), fresh etcd
        cat2 = EtcdCatalog(None, cat.warehouse, kv=InMemoryEtcd())
        actions = cat2.registry_restore(snap)
        assert len(actions) == 4 and all(a.startswith("create ") for a in actions)
        assert cat2.list_tables("ns") == ["t1", "t2"]
        assert cat2.load_table("ns.t1").meta == cat.load_table("ns.t1").meta
        assert cat2.load_view("ns.v1")["sql"] == "SELECT 1 AS one"

    def test_dry_run_writes_nothing(self, cat):
        snap = cat.registry_snapshot()
        cat2 = EtcdCatalog(None, cat.warehouse, kv=InMemoryEtcd())
        actions = cat2.registry_restore(snap, dry_run=True)
        assert len(actions) == 4
        assert cat2.kv.get_prefix("") == []

    def test_format_guard(self, cat):
        with pytest.raises(ValueError):
            cat.registry_restore({"format": "nope", "keys": []})


class TestRestoreConflicts:
    def test_fresh_mode_is_all_or_nothing(self, cat):
        """A single pre-existing key fails the restore and NOTHING
        else lands — no partial registry."""
        snap = cat.registry_snapshot()
        cat2 = EtcdCatalog(None, cat.warehouse, kv=InMemoryEtcd())
        cat2.create_namespace("ns")  # n/ns now exists
        with pytest.raises(CommitConflictError) as e:
            cat2.registry_restore(snap)
        assert "n/ns" in str(e.value)
        assert cat2.list_tables("ns") == []

    def test_overwrite_mode_replaces_at_observed_version(self, cat):
        snap = cat.registry_snapshot()
        # mutate t1 after the snapshot, then restore over it
        t = cat.load_table("ns.t1")
        t.commit(lambda m: {**m, "properties": {**m["properties"], "drift": "1"}})
        actions = cat.registry_restore(snap, overwrite=True)
        assert any(a.startswith("overwrite t/ns/t1") for a in actions)
        assert "drift" not in cat.load_table("ns.t1").meta["properties"]

    def test_concurrent_writer_fails_restore_not_clobbered(self, cat):
        """A writer landing BETWEEN restore validation and the etcd
        transaction bumps a key's version → the multi-key CAS fails,
        the writer's value survives, and nothing else moved."""
        snap = cat.registry_snapshot()
        kv = cat.kv

        class RacingKV:
            def __init__(self, inner):
                self.inner = inner
                self.raced = False

            def __getattr__(self, n):
                return getattr(self.inner, n)

            def txn(self, compares, ops):
                if not self.raced:
                    self.raced = True
                    ent = self.inner.get("t/ns/t2")
                    self.inner.put("t/ns/t2", ent.value.replace("}", "}") )
                return self.inner.txn(compares, ops)

        before_t1 = kv.get("t/ns/t1").value
        cat.kv = RacingKV(kv)
        with pytest.raises(CommitConflictError):
            cat.registry_restore(snap, overwrite=True)
        assert kv.get("t/ns/t1").value == before_t1
        # versions prove nothing was restored: t2 at 2 (writer's put),
        # t1 still at its pre-restore version
        assert kv.get("t/ns/t2").version == 2
