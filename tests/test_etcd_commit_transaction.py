"""Atomic multi-table commit-transaction on the etcd backend.

The reference's commit-transaction is genuinely atomic on etcd: one
transaction compares every member table's pointer version and swaps
every pointer (EtcdCatalog.java:588-640's version-CAS generalized to
N keys; multi-table lock ordering etcd/CommitLock.java:69-146). The
filesystem/SQLite catalogs keep the validate→apply→compensate saga in
rest/server.py because a file create can't CAS two files at once —
but `EtcdCatalog.commit_transaction` can, and the REST route
dispatches to it whenever the catalog exposes it.

The contract proven here: concurrent 2-table transactions either
both-commit or both-fail; no partial state is EVER observable — a
failed member leaves every table at its exact prior version (the saga
instead rolls forward a compensating version), and lost-CAS attempt
files are cleaned up.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.etcd_catalog import EtcdCatalog, InMemoryEtcd
from ice_spark.catalog.table import CommitConflictError
from ice_spark.rest import RestCatalogClient, RestCatalogServer, ServerConfig
from ice_spark.rest.client import RestError

SCHEMA = T.StructType([T.StructField("id", T.LongType())])


@pytest.fixture()
def cat(tmp_path):
    return EtcdCatalog(None, str(tmp_path / "wh"), kv=InMemoryEtcd())


@pytest.fixture()
def server(cat):
    srv = RestCatalogServer(cat, ServerConfig(anonymous=True)).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server, cat):
    c = RestCatalogClient(server.url)
    c.create_namespace("ns")
    c.create_table("ns.a", SCHEMA.jsonValue())
    c.create_table("ns.b", SCHEMA.jsonValue())
    return c


def _change(name, props=None, updates=None, requirements=None):
    return {
        "identifier": {"namespace": ["ns"], "name": name},
        "requirements": requirements or [],
        "updates": updates
        or [{"action": "set-properties", "updates": props or {}}],
    }


def _meta_files(cat, ident):
    t = cat.load_table(ident)
    return sorted(os.listdir(t.metadata_dir))


class TestAtomicCommit:
    def test_both_tables_commit_in_one_txn(self, client, cat):
        client.commit_transaction(
            [_change("a", {"tx": "1"}), _change("b", {"tx": "1"})]
        )
        for n in ("a", "b"):
            t = cat.load_table(f"ns.{n}")
            assert t.meta["properties"]["tx"] == "1"
            assert t.current_version() == 2

    def test_failed_member_leaves_exact_prior_versions(self, client, cat):
        """The atomic guarantee the saga can't give: after a failed
        member, the other tables are at their EXACT prior version —
        not a compensated new one — and no attempt file survives."""
        files_before = {n: _meta_files(cat, f"ns.{n}") for n in ("a", "b")}
        with pytest.raises(RestError):
            client.commit_transaction(
                [
                    _change("a", {"tx": "1"}),
                    # invalid ref target → apply_updates 400s
                    _change(
                        "b",
                        updates=[
                            {
                                "action": "set-snapshot-ref",
                                "ref-name": "x",
                                "snapshot-id": 99,
                            }
                        ],
                    ),
                ]
            )
        for n in ("a", "b"):
            t = cat.load_table(f"ns.{n}")
            assert t.current_version() == 1
            assert "tx" not in t.meta["properties"]
            assert _meta_files(cat, f"ns.{n}") == files_before[n]

    def test_requirement_failure_is_409_no_state(self, client, cat):
        with pytest.raises(RestError) as e:
            client.commit_transaction(
                [
                    _change("a", {"tx": "1"}),
                    _change(
                        "b",
                        props={"tx": "1"},
                        requirements=[{"type": "assert-table-uuid", "uuid": "nope"}],
                    ),
                ]
            )
        assert e.value.code == 409
        for n in ("a", "b"):
            assert cat.load_table(f"ns.{n}").current_version() == 1

    def test_duplicate_member_rejected(self, client):
        with pytest.raises(RestError) as e:
            client.commit_transaction(
                [_change("a", {"x": "1"}), _change("a", {"y": "2"})]
            )
        assert e.value.code == 400

    def test_concurrent_transactions_both_or_nothing(self, client, server, cat):
        """Two racing 2-table transactions over the SAME tables: with
        the retry budget both eventually land, and at the end both
        tables carry BOTH property sets at the SAME version — i.e.
        each transaction moved both pointers together."""
        errs = []

        def run(key):
            try:
                c = RestCatalogClient(server.url)
                c.commit_transaction(
                    [_change("a", {key: "1"}), _change("b", {key: "1"})]
                )
            except Exception as ex:  # pragma: no cover - failure path
                errs.append(ex)

        ts = [threading.Thread(target=run, args=(k,)) for k in ("t1", "t2")]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        va = cat.load_table("ns.a")
        vb = cat.load_table("ns.b")
        assert va.current_version() == vb.current_version() == 3
        for t in (va, vb):
            assert t.meta["properties"]["t1"] == "1"
            assert t.meta["properties"]["t2"] == "1"


class TestCatalogLevelTxn:
    def test_stale_expected_version_cleans_attempt_files(self, cat):
        cat.create_namespace("ns")
        a = cat.create_table("ns.a", schema=SCHEMA)
        b = cat.create_table("ns.b", schema=SCHEMA)
        files_a = _meta_files(cat, "ns.a")
        files_b = _meta_files(cat, "ns.b")
        meta_a = json.loads(json.dumps(a.meta))
        meta_b = json.loads(json.dumps(b.meta))
        with pytest.raises(CommitConflictError):
            # b's expected version is stale → whole txn refused,
            # a's already-written attempt file must be removed
            cat.commit_transaction([(a, meta_a, 1), (b, meta_b, 7)])
        assert _meta_files(cat, "ns.a") == files_a
        assert _meta_files(cat, "ns.b") == files_b
        assert a.refresh().current_version() == 1
        assert b.refresh().current_version() == 1

    def test_lost_kv_cas_cleans_attempt_files(self, cat):
        """Simulate a racer landing BETWEEN the version read and the
        txn: the multi-key CAS fails, files are cleaned, nothing
        moved."""
        cat.create_namespace("ns")
        a = cat.create_table("ns.a", schema=SCHEMA)
        b = cat.create_table("ns.b", schema=SCHEMA)

        class RacingKV:
            def __init__(self, inner):
                self.inner = inner
                self.raced = False

            def __getattr__(self, n):
                return getattr(self.inner, n)

            def txn(self, compares, ops):
                if not self.raced:
                    self.raced = True
                    # racer bumps b's pointer KV version out from
                    # under the transaction
                    ent = self.inner.get(b.key)
                    self.inner.put(b.key, ent.value)
                return self.inner.txn(compares, ops)

        cat.kv = RacingKV(cat.kv)
        files_a = _meta_files(cat, "ns.a")
        meta_a = json.loads(json.dumps(a.meta))
        meta_b = json.loads(json.dumps(b.meta))
        with pytest.raises(CommitConflictError):
            cat.commit_transaction([(a, meta_a, 1), (b, meta_b, 1)])
        assert _meta_files(cat, "ns.a") == files_a
        assert a.refresh().current_version() == 1
        assert b.refresh().current_version() == 1
