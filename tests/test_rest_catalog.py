"""REST catalog server/client tests (SURVEY §2.6).

Covers the reference server's distinctive behaviors: route surface
(Route.java:50-116), optimistic CAS commits with no-retry on
requirement failures (RESTCatalogAdapter.commit:511-567,
EtcdCatalog.java:588-640), bearer auth with read-only tokens
(Main.java:353-418), multi-table commit-transaction, and error
shapes. Pure metadata plane — no SparkSession needed."""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.catalog import Catalog
from ice_spark.rest import RestCatalogClient, RestCatalogServer, RestError, ServerConfig

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def server(tmp_path):
    cat = Catalog(None, str(tmp_path / "wh"))
    srv = RestCatalogServer(cat, ServerConfig(anonymous=True)).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    return RestCatalogClient(server.url)


def _mk_table(client, ident="ns1.t1"):
    ns = ident.rsplit(".", 1)[0]
    if not client.namespace_exists(ns):
        client.create_namespace(ns)
    return client.create_table(ident, SCHEMA.jsonValue())


class TestNamespaces:
    def test_check_and_crud(self, client):
        assert client.check() is True
        client.create_namespace("a")
        client.create_namespace("a.b")
        assert client.list_namespaces() == ["a"]
        assert client.list_namespaces("a") == ["a.b"]
        assert client.namespace_exists("a.b")
        client.delete_namespace("a.b")
        assert not client.namespace_exists("a.b")

    def test_create_duplicate_409(self, client):
        client.create_namespace("a")
        with pytest.raises(RestError) as e:
            client.create_namespace("a")
        assert e.value.code == 409
        assert e.value.err_type == "AlreadyExistsException"

    def test_delete_nonempty_409(self, client):
        _mk_table(client, "a.t")
        with pytest.raises(RestError) as e:
            client.delete_namespace("a")
        assert e.value.code == 409
        assert e.value.err_type == "NamespaceNotEmptyException"

    def test_missing_parent_404(self, client):
        with pytest.raises(RestError) as e:
            client.list_namespaces("nope")
        assert e.value.code == 404


class TestNamespaceProperties:
    def test_update_and_load_roundtrip(self, client):
        client.create_namespace("a")
        out = client.update_namespace_properties(
            "a", updates={"owner": "etl", "tier": "gold"}
        )
        assert out["updated"] == ["owner", "tier"]
        assert client.load_namespace("a")["properties"] == {"owner": "etl", "tier": "gold"}
        out = client.update_namespace_properties("a", removals=["tier", "ghost"])
        assert out["removed"] == ["tier"] and out["missing"] == ["ghost"]
        assert client.load_namespace("a")["properties"] == {"owner": "etl"}

    def test_missing_namespace_404(self, client):
        with pytest.raises(RestError) as e:
            client.update_namespace_properties("nope", updates={"a": "b"})
        assert e.value.code == 404


class TestSparkRead:
    def test_read_table_via_rest_metadata(self, server, client, spark):
        """Spark read seeded from the server's LoadTableResult only:
        time travel included, no local version-hint consulted."""
        from ice_spark.rest.client import read_table

        _mk_table(client, "ns1.t1")
        t = server.catalog.load_table("ns1.t1")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], schema=SCHEMA)
        path = f"{t.data_dir}/f1.parquet"
        df1.coalesce(1).write.mode("overwrite").parquet(path)
        t.append_snapshot(
            [{"path": "data/f1.parquet", "partition": {}, "records": 2,
              "size_bytes": 1, "schema_version": 1}]
        )
        first_sid = t.meta["current_snapshot_id"]
        df2 = spark.createDataFrame([(3, "c")], schema=SCHEMA)
        df2.coalesce(1).write.mode("overwrite").parquet(f"{t.data_dir}/f2.parquet")
        t.append_snapshot(
            [{"path": "data/f2.parquet", "partition": {}, "records": 1,
              "size_bytes": 1, "schema_version": 1}]
        )
        assert read_table(spark, client, "ns1.t1").count() == 3
        assert read_table(spark, client, "ns1.t1", snapshot_id=first_sid).count() == 2


class TestTables:
    def test_create_load_list_drop(self, client):
        res = _mk_table(client, "ns1.t1")
        assert res["metadata"]["format_version"] == 2
        assert res["metadata-location"].endswith("v1.metadata.json")
        assert client.list_tables("ns1") == ["t1"]
        loaded = client.load_table("ns1.t1")
        assert loaded["metadata"]["table_uuid"] == res["metadata"]["table_uuid"]
        assert client.table_exists("ns1.t1")
        client.drop_table("ns1.t1", purge=True)
        assert not client.table_exists("ns1.t1")

    def test_load_missing_404(self, client):
        client.create_namespace("ns1")
        with pytest.raises(RestError) as e:
            client.load_table("ns1.ghost")
        assert e.value.code == 404
        assert e.value.err_type == "NoSuchTableException"

    def test_rename(self, client):
        _mk_table(client, "ns1.t1")
        client.rename_table("ns1.t1", "ns1.t2")
        assert client.list_tables("ns1") == ["t2"]

    def test_rename_onto_existing_409(self, client):
        _mk_table(client, "ns1.t1")
        _mk_table(client, "ns1.t2")
        with pytest.raises(RestError) as e:
            client.rename_table("ns1.t1", "ns1.t2")
        assert e.value.code == 409

    def test_register_table(self, server, client, tmp_path):
        res = _mk_table(client, "ns1.src")
        reg = client.register_table("ns1.copy", res["metadata-location"])
        assert reg["metadata"]["table_uuid"] == res["metadata"]["table_uuid"]
        assert sorted(client.list_tables("ns1")) == ["copy", "src"]

    def test_report_metrics(self, server, client):
        _mk_table(client, "ns1.t1")
        client.report_metrics("ns1.t1", {"report-type": "scan-report", "filters": []})
        assert server.metrics_reports[0]["table"] == "ns1.t1"


class TestCommits:
    def test_set_properties_roundtrip(self, client):
        _mk_table(client)
        out = client.commit_table(
            "ns1.t1",
            requirements=[],
            updates=[{"action": "set-properties", "updates": {"k": "v"}}],
        )
        assert out["metadata"]["properties"]["k"] == "v"
        assert out["metadata-location"].endswith("v2.metadata.json")
        out = client.commit_table(
            "ns1.t1", [], [{"action": "remove-properties", "removals": ["k"]}]
        )
        assert "k" not in out["metadata"]["properties"]

    def test_requirement_uuid_mismatch_409_no_retry(self, client):
        _mk_table(client)
        with pytest.raises(RestError) as e:
            client.commit_table(
                "ns1.t1",
                [{"type": "assert-table-uuid", "uuid": "wrong"}],
                [{"action": "set-properties", "updates": {"k": "v"}}],
            )
        assert e.value.code == 409
        assert e.value.err_type == "CommitFailedException"
        # no partial write happened
        assert "k" not in client.load_table("ns1.t1")["metadata"]["properties"]

    def test_ref_snapshot_requirement(self, client):
        _mk_table(client)
        # table has no snapshots → main is None → passing None succeeds
        client.commit_table(
            "ns1.t1",
            [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": None}],
            [{"action": "set-properties", "updates": {"ok": "1"}}],
        )
        with pytest.raises(RestError) as e:
            client.commit_table(
                "ns1.t1",
                [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 42}],
                [],
            )
        assert e.value.code == 409

    def test_add_snapshot_and_set_ref(self, client):
        _mk_table(client)
        snap = {
            "snapshot_id": 7,
            "parent_snapshot_id": None,
            "timestamp_ms": 1,
            "operation": "append",
            "manifest_list": None,
            "manifests": [],
            "summary": {},
        }
        out = client.commit_table(
            "ns1.t1",
            [],
            [
                {"action": "add-snapshot", "snapshot": snap},
                {"action": "set-snapshot-ref", "ref-name": "main", "snapshot-id": 7},
                {"action": "set-snapshot-ref", "ref-name": "audit", "snapshot-id": 7},
            ],
        )
        assert out["metadata"]["current_snapshot_id"] == 7
        assert out["metadata"]["refs"]["audit"] == 7
        with pytest.raises(RestError):  # ref to a snapshot that doesn't exist
            client.commit_table(
                "ns1.t1",
                [],
                [{"action": "set-snapshot-ref", "ref-name": "bad", "snapshot-id": 99}],
            )

    def test_unsupported_update_400(self, client):
        _mk_table(client)
        with pytest.raises(RestError) as e:
            client.commit_table("ns1.t1", [], [{"action": "warp-drive"}])
        assert e.value.code == 400

    def test_concurrent_commits_all_land(self, client):
        """N racing HTTP writers: CAS retry makes all commits land,
        exactly-once each (the etcd If(version).Then(put) analog)."""
        _mk_table(client)
        errs = []

        def worker(i):
            try:
                client.commit_table(
                    "ns1.t1",
                    [],
                    [{"action": "set-properties", "updates": {f"w{i}": str(i)}}],
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        props = client.load_table("ns1.t1")["metadata"]["properties"]
        assert all(props[f"w{i}"] == str(i) for i in range(6))

    def test_http_and_inprocess_writers_conflict_correctly(self, server, client, tmp_path):
        """An in-process Table writer and an HTTP writer share the
        same CAS file — both land, versions strictly increase."""
        res = _mk_table(client)
        t = server.catalog.load_table("ns1.t1")
        t.commit(lambda m: {**m, "properties": {**m["properties"], "local": "1"}})
        out = client.commit_table(
            "ns1.t1", [], [{"action": "set-properties", "updates": {"http": "1"}}]
        )
        props = out["metadata"]["properties"]
        assert props["local"] == "1" and props["http"] == "1"


class TestTransaction:
    def test_multi_table_commit(self, client):
        _mk_table(client, "ns1.a")
        _mk_table(client, "ns1.b")
        client.commit_transaction(
            [
                {
                    "identifier": {"namespace": ["ns1"], "name": "a"},
                    "requirements": [],
                    "updates": [{"action": "set-properties", "updates": {"tx": "1"}}],
                },
                {
                    "identifier": {"namespace": ["ns1"], "name": "b"},
                    "requirements": [],
                    "updates": [{"action": "set-properties", "updates": {"tx": "1"}}],
                },
            ]
        )
        assert client.load_table("ns1.a")["metadata"]["properties"]["tx"] == "1"
        assert client.load_table("ns1.b")["metadata"]["properties"]["tx"] == "1"

    def test_failed_member_rolls_back_committed(self, client):
        _mk_table(client, "ns1.a")
        _mk_table(client, "ns1.b")
        with pytest.raises(RestError) as e:
            client.commit_transaction(
                [
                    {
                        "identifier": {"namespace": ["ns1"], "name": "a"},
                        "requirements": [],
                        "updates": [{"action": "set-properties", "updates": {"tx": "1"}}],
                    },
                    {
                        "identifier": {"namespace": ["ns1"], "name": "b"},
                        "requirements": [],
                        # invalid ref target → fails after a committed
                        "updates": [
                            {"action": "set-snapshot-ref", "ref-name": "x", "snapshot-id": 99}
                        ],
                    },
                ]
            )
        detail = json.loads(e.value.message)
        assert detail["failed"] == "ns1.b"
        assert detail["rolled_back"] == ["ns1.a"]
        # a's property write was compensated away
        assert "tx" not in client.load_table("ns1.a")["metadata"]["properties"]

    def test_upfront_requirement_failure_commits_nothing(self, client):
        _mk_table(client, "ns1.a")
        _mk_table(client, "ns1.b")
        with pytest.raises(RestError):
            client.commit_transaction(
                [
                    {
                        "identifier": {"namespace": ["ns1"], "name": "a"},
                        "requirements": [],
                        "updates": [{"action": "set-properties", "updates": {"tx": "1"}}],
                    },
                    {
                        "identifier": {"namespace": ["ns1"], "name": "b"},
                        "requirements": [{"type": "assert-table-uuid", "uuid": "nope"}],
                        "updates": [],
                    },
                ]
            )
        assert "tx" not in client.load_table("ns1.a")["metadata"]["properties"]


class TestAuth:
    @pytest.fixture()
    def auth_server(self, tmp_path):
        cat = Catalog(None, str(tmp_path / "wh"))
        cfg = ServerConfig(
            tokens={"rw-secret": {"read_only": False}, "ro-secret": {"read_only": True}},
            anonymous=False,
        )
        srv = RestCatalogServer(cat, cfg).start()
        yield srv
        srv.stop()

    def test_no_token_401(self, auth_server):
        with pytest.raises(RestError) as e:
            RestCatalogClient(auth_server.url).check()
        assert e.value.code == 401

    def test_bad_token_401(self, auth_server):
        with pytest.raises(RestError) as e:
            RestCatalogClient(auth_server.url, token="wrong")
        assert e.value.code == 401

    def test_rw_token_full_access(self, auth_server):
        c = RestCatalogClient(auth_server.url, token="rw-secret")
        c.create_namespace("a")
        assert c.list_namespaces() == ["a"]

    def test_ro_token_reads_but_403_on_write(self, auth_server):
        rw = RestCatalogClient(auth_server.url, token="rw-secret")
        rw.create_namespace("a")
        ro = RestCatalogClient(auth_server.url, token="ro-secret")
        assert ro.list_namespaces() == ["a"]  # reads fine
        with pytest.raises(RestError) as e:
            ro.create_namespace("b")
        assert e.value.code == 403
        assert e.value.err_type == "ForbiddenException"


class TestViews:
    def test_view_crud_over_rest(self, client):
        client.create_namespace("ns1")
        client.create_view("ns1.rev", "SELECT 1 AS one", comment="c")
        assert client.list_views("ns1") == ["rev"]
        v = client.load_view("ns1.rev")
        assert v["sql"] == "SELECT 1 AS one"
        client.drop_view("ns1.rev")
        with pytest.raises(RestError) as e:
            client.load_view("ns1.rev")
        assert e.value.code == 404


class TestPagination:
    def test_paged_table_listing_drains_all(self, client):
        client.create_namespace("big")
        for i in range(7):
            _mk_table(client, f"big.t{i}")
        # page size 3 → 3 requests, same total as unpaginated
        assert client.list_tables("big", page_size=3) == client.list_tables("big")
        assert len(client.list_tables("big", page_size=3)) == 7

    def test_page_token_shape(self, client):
        client.create_namespace("big")
        for i in range(5):
            _mk_table(client, f"big.t{i}")
        out = client._req(
            "GET",
            client._p(f"/namespaces/big/tables"),
            query={"pageSize": "2"},
        )
        assert len(out["identifiers"]) == 2
        assert out["next-page-token"] == "2"
        out2 = client._req(
            "GET",
            client._p(f"/namespaces/big/tables"),
            query={"pageSize": "4", "pageToken": out["next-page-token"]},
        )
        assert len(out2["identifiers"]) == 3
        assert "next-page-token" not in out2

    def test_bad_page_size_400(self, client):
        client.create_namespace("big")
        with pytest.raises(RestError) as e:
            client._req(
                "GET",
                client._p("/namespaces/big/tables"),
                query={"pageSize": "0"},
            )
        assert e.value.code == 400

    def test_namespace_paging(self, client):
        for n in ("a", "b", "c"):
            client.create_namespace(n)
        assert client.list_namespaces(page_size=2) == ["a", "b", "c"]


class TestProtocol:
    def test_oauth_token_stub(self, server):
        import urllib.request

        req = urllib.request.Request(
            server.url + "/v1/oauth/tokens", data=b"{}", method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["token_type"] == "bearer"

    def test_config_prefix_handshake(self, server):
        c = RestCatalogClient(server.url)
        assert c.prefix == "ice"
        # prefixed and unprefixed paths both resolve
        c.create_namespace("a")
        bare = RestCatalogClient(server.url, prefix="")
        assert bare.list_namespaces() == ["a"]

    def test_unknown_route_404(self, server):
        c = RestCatalogClient(server.url)
        with pytest.raises(RestError) as e:
            c._req("GET", "/v1/warp")
        assert e.value.code == 404

    def test_multilevel_namespace_unit_separator(self, client):
        client.create_namespace("a")
        client.create_namespace("a.b")
        _mk_table(client, "a.b.t")
        assert client.list_tables("a.b") == ["t"]
        assert client.table_exists("a.b.t")


class TestTransactionRaces:
    def test_racing_transactions_serialize_via_cas(self, client):
        """Two multi-table transactions racing on the same tables:
        with no requirements both must land (CAS retry), and the
        final state contains BOTH property sets — no lost update."""
        import threading

        _mk_table(client, "ns1.a")
        _mk_table(client, "ns1.b")
        errs = []

        def tx(tag):
            try:
                client.commit_transaction(
                    [
                        {
                            "identifier": {"namespace": ["ns1"], "name": n},
                            "requirements": [],
                            "updates": [
                                {"action": "set-properties", "updates": {tag: "1"}}
                            ],
                        }
                        for n in ("a", "b")
                    ]
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=tx, args=(f"tx{i}",)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        for n in ("a", "b"):
            props = client.load_table(f"ns1.{n}")["metadata"]["properties"]
            assert all(props.get(f"tx{i}") == "1" for i in range(4)), props

    def test_requirement_guarded_race_admits_exactly_one(self, client):
        """Compare-and-swap at the transaction level: each racer
        requires main to still be at None and then tags it; exactly
        one wins, the rest fail their requirement with 409."""
        import threading

        _mk_table(client, "ns1.t")
        snap = {
            "snapshot_id": 1,
            "parent_snapshot_id": None,
            "timestamp_ms": 1,
            "operation": "append",
            "manifest_list": None,
            "manifests": [],
            "summary": {},
        }
        client.commit_table("ns1.t", [], [{"action": "add-snapshot", "snapshot": snap}])
        wins, losses = [], []

        def racer(i):
            try:
                client.commit_transaction(
                    [
                        {
                            "identifier": {"namespace": ["ns1"], "name": "t"},
                            "requirements": [
                                {
                                    "type": "assert-ref-snapshot-id",
                                    "ref": "main",
                                    "snapshot-id": None,
                                }
                            ],
                            "updates": [
                                {
                                    "action": "set-snapshot-ref",
                                    "ref-name": "main",
                                    "snapshot-id": 1,
                                },
                                {
                                    "action": "set-properties",
                                    "updates": {"winner": str(i)},
                                },
                            ],
                        }
                    ]
                )
                wins.append(i)
            except RestError as e:
                assert e.code == 409
                losses.append(i)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(wins) == 1, (wins, losses)
        meta = client.load_table("ns1.t")["metadata"]
        assert meta["current_snapshot_id"] == 1
        assert meta["properties"]["winner"] == str(wins[0])


class TestCompensationSafety:
    def test_compensation_respects_interleaved_writer(self, server, client):
        """A writer that lands on table A AFTER the transaction's
        A-commit but BEFORE compensation must NOT be rolled over:
        compensation CASes against the exact version the transaction
        produced, conflicts, and reports A as 'stuck' — the writer's
        acknowledged commit survives."""
        _mk_table(client, "ns1.a")
        _mk_table(client, "ns1.b")
        orig = server.commit_to_table

        def hooked(table, reqs, updates):
            if table.identifier.endswith(".b"):
                # interleaved writer on a, then the member fails
                client.commit_table(
                    "ns1.a", [], [{"action": "set-properties", "updates": {"w": "1"}}]
                )
                from ice_spark.rest.server import _ApiError

                raise _ApiError(409, "CommitFailedException", "boom")
            return orig(table, reqs, updates)

        server.commit_to_table = hooked
        try:
            with pytest.raises(RestError) as e:
                client.commit_transaction(
                    [
                        {
                            "identifier": {"namespace": ["ns1"], "name": n},
                            "requirements": [],
                            "updates": [
                                {"action": "set-properties", "updates": {"tx": "1"}}
                            ],
                        }
                        for n in ("a", "b")
                    ]
                )
        finally:
            server.commit_to_table = orig
        detail = json.loads(e.value.message)
        assert detail["stuck"] == ["ns1.a"]
        assert detail["rolled_back"] == []
        props = client.load_table("ns1.a")["metadata"]["properties"]
        # the interleaved writer's acknowledged commit survives, and
        # the transaction's A-write remains too (stuck, not reverted)
        assert props["w"] == "1"
        assert props["tx"] == "1"

    def test_compensation_still_rolls_back_when_unobstructed(self, client):
        """Sanity: with no interleaved writer the compensation path
        still reverts committed members (same as before the CAS fix)."""
        _mk_table(client, "ns1.a")
        _mk_table(client, "ns1.b")
        with pytest.raises(RestError) as e:
            client.commit_transaction(
                [
                    {
                        "identifier": {"namespace": ["ns1"], "name": "a"},
                        "requirements": [],
                        "updates": [{"action": "set-properties", "updates": {"tx": "1"}}],
                    },
                    {
                        "identifier": {"namespace": ["ns1"], "name": "b"},
                        "requirements": [],
                        "updates": [
                            {"action": "set-snapshot-ref", "ref-name": "x", "snapshot-id": 99}
                        ],
                    },
                ]
            )
        detail = json.loads(e.value.message)
        assert detail["rolled_back"] == ["ns1.a"]
        assert "tx" not in client.load_table("ns1.a")["metadata"]["properties"]


class TestAuthBootstrap:
    def test_token_endpoint_is_pre_auth(self, tmp_path):
        """POST /v1/oauth/tokens must work WITHOUT credentials even on
        a token-gated server — it's how a client would obtain them."""
        import urllib.request

        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(
            cat, ServerConfig(tokens={"s": {"read_only": False}}, anonymous=False)
        ).start()
        try:
            req = urllib.request.Request(
                srv.url + "/v1/oauth/tokens", data=b"{}", method="POST"
            )
            with urllib.request.urlopen(req) as r:
                assert json.loads(r.read())["token_type"] == "bearer"
            # everything else still requires auth
            with pytest.raises(RestError) as e:
                RestCatalogClient(srv.url).check()
            assert e.value.code == 401
        finally:
            srv.stop()


def test_oversize_body_413(server):
    import urllib.error
    import urllib.request

    big = b"{" + b" " * (9 * 1024 * 1024) + b"}"
    req = urllib.request.Request(
        server.url + "/v1/ice/namespaces", data=big, method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 413
