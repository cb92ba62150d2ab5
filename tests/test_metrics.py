"""Prometheus metrics exposition, credential vending, commit lock.

Reference parity surfaces (round-6 additions):
- /metrics text exposition + HTTP/catalog/commit counters
  (ice-rest-catalog/.../metrics/*.java, examples/grafana/METRICS.md)
- credential-vending protocol stub (Main.java:297-325 shape)
- per-table commit lock with TTL lease (etcd/CommitLock.java:69-146)

Pure metadata plane — no SparkSession needed.
"""

from __future__ import annotations

import threading
import time
import urllib.request

import pytest
from pyspark.sql import types as T

from ice_spark.catalog.catalog import Catalog
from ice_spark.metrics import MetricsRegistry, default_registry
from ice_spark.rest import (
    CommitLock,
    LockTimeout,
    RestCatalogClient,
    RestCatalogServer,
    ServerConfig,
)

SCHEMA = T.StructType([T.StructField("id", T.LongType())])


def _scrape(url: str) -> str:
    with urllib.request.urlopen(url + "/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        return r.read().decode()


class TestRegistry:
    def test_counter_gauge_histogram_exposition(self):
        reg = MetricsRegistry()
        reg.inc("a_total", {"x": "1"}, help_="a")
        reg.inc("a_total", {"x": "1"}, 2)
        reg.set_gauge("g", None, 7.5, help_="g")
        reg.observe("h_seconds", 0.25, None, help_="h")
        text = reg.render()
        assert 'a_total{x="1"} 3' in text
        assert "# TYPE a_total counter" in text
        assert "g 7.5" in text
        assert 'h_seconds_bucket{le="+Inf"} 1' in text
        assert "h_seconds_sum 0.25" in text
        assert "h_seconds_count 1" in text

    def test_collector_gauges_evaluated_at_scrape(self):
        reg = MetricsRegistry()
        state = {"v": 1}
        reg.register_collector(lambda: [("live", {}, state["v"], "live")])
        assert "live 1" in reg.render()
        state["v"] = 9
        assert "live 9" in reg.render()


class TestRestMetrics:
    @pytest.fixture()
    def server(self, tmp_path):
        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, ServerConfig(anonymous=True)).start()
        yield srv
        srv.stop()

    def test_scrape_after_operations(self, server):
        client = RestCatalogClient(server.url)
        client.create_namespace("ns1")
        client.create_table("ns1.t1", SCHEMA.jsonValue())
        client.load_table("ns1.t1")
        text = _scrape(server.url)
        assert "iceberg_http_requests_total" in text
        assert 'route="CREATE_TABLE"' in text
        assert 'iceberg_catalog_operations_total{catalog="ice",operation="create_table"} 1' in text
        assert 'status_class="200"' in text
        # live gauges reflect catalog contents at scrape time
        assert 'iceberg_catalog_tables{catalog="ice"} 1' in text
        assert 'iceberg_catalog_namespaces{catalog="ice"} 1' in text

    def test_commit_counters(self, server):
        client = RestCatalogClient(server.url)
        client.create_namespace("ns1")
        client.create_table("ns1.t1", SCHEMA.jsonValue())
        client.commit_table(
            "ns1.t1", requirements=[], updates=[
                {"action": "set-properties", "updates": {"k": "v"}}
            ]
        )
        text = _scrape(server.url)
        assert "iceberg_commits_total" in text
        assert "iceberg_commit_duration_seconds_count" in text

    def test_error_responses_counted(self, server):
        client = RestCatalogClient(server.url)
        try:
            client.load_table("nope.missing")
        except Exception:
            pass
        assert 'status_class="404"' in _scrape(server.url)


class TestCredentialVending:
    CREDS = {
        "s3.access-key-id": "AKIA_TEST",
        "s3.secret-access-key": "SECRET_TEST",
        "s3.session-token": "TOKEN_TEST",
    }

    @pytest.fixture()
    def server(self, tmp_path):
        cfg = ServerConfig(
            tokens={
                "vendme": {"vend_credentials": True},
                "novend": {},
            },
            storage_credentials=self.CREDS,
        )
        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, cfg).start()
        c = RestCatalogClient(srv.url, token="vendme")
        c.create_namespace("ns1")
        c.create_table("ns1.t1", SCHEMA.jsonValue())
        yield srv
        srv.stop()

    def test_opted_in_token_receives_config(self, server):
        c = RestCatalogClient(server.url, token="vendme")
        cfg = c.vended_storage_config("ns1.t1")
        assert cfg == self.CREDS

    def test_token_without_flag_gets_empty_config(self, server):
        c = RestCatalogClient(server.url, token="novend")
        assert c.vended_storage_config("ns1.t1") == {}

    def test_client_not_requesting_delegation_gets_empty(self, server):
        c = RestCatalogClient(server.url, token="vendme", access_delegation=False)
        assert c.vended_storage_config("ns1.t1") == {}


class TestMetricsAuth:
    """ADVICE r6: on a token-protected server /metrics leaks catalog
    structure (namespace/table labels) — it must require a bearer
    token; read-only tokens suffice (a scrape is a read)."""

    def test_protected_server_requires_token_for_metrics(self, tmp_path):
        cfg = ServerConfig(
            anonymous=False,
            tokens={"rw": {}, "ro": {"read_only": True}},
        )
        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, cfg).start()
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _scrape(srv.url)
            assert ei.value.code == 401
            for tok in ("rw", "ro"):
                req = urllib.request.Request(
                    srv.url + "/metrics", headers={"Authorization": f"Bearer {tok}"}
                )
                with urllib.request.urlopen(req) as r:
                    assert r.status == 200
                    assert "text/plain" in r.headers["Content-Type"]
            req = urllib.request.Request(
                srv.url + "/metrics", headers={"Authorization": "Bearer nope"}
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 401
        finally:
            srv.stop()

    def test_anonymous_server_scrapes_open(self, tmp_path):
        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, ServerConfig(anonymous=True)).start()
        try:
            assert "# TYPE" in _scrape(srv.url)
        finally:
            srv.stop()


class TestCommitLock:
    def test_serializes_concurrent_commits(self, tmp_path):
        lock = CommitLock(str(tmp_path / "locks"), ttl_sec=5, acquire_timeout_sec=5)
        cfg = ServerConfig(anonymous=True, commit_lock=lock)
        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, cfg).start()
        try:
            client = RestCatalogClient(srv.url)
            client.create_namespace("ns1")
            client.create_table("ns1.t1", SCHEMA.jsonValue())
            errs: list = []

            def worker(i):
                c = RestCatalogClient(srv.url)
                for j in range(5):
                    try:
                        c.commit_table(
                            "ns1.t1",
                            requirements=[],
                            updates=[
                                {"action": "set-properties", "updates": {f"k{i}_{j}": "v"}}
                            ],
                        )
                    except Exception as e:  # noqa: BLE001
                        errs.append(e)

            threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert not errs, errs
            meta = client.load_table("ns1.t1")["metadata"]
            assert len([k for k in meta["properties"] if k.startswith("k")]) == 20
            text = _scrape(srv.url)
            # lock metrics observed; no CAS retries burnt under the lock
            assert "iceberg_commit_lock_acquire_seconds_count" in text
            assert "iceberg_commit_lock_held_seconds_count" in text
        finally:
            srv.stop()

    def test_lease_expiry_breaks_crashed_holder(self, tmp_path):
        import json as _json

        lock = CommitLock(str(tmp_path), ttl_sec=0.2, acquire_timeout_sec=2)
        # A crashed holder leaves a lease file with nothing renewing it
        # (the renewal thread dies with its process) — write the file
        # directly rather than entering acquire(), which since r7 keeps
        # the lease alive with a keepAlive thread.
        with open(lock._path("ns.t"), "w") as f:
            _json.dump({"token": "dead-holder", "expiry": time.time() + 0.2}, f)
        t0 = time.monotonic()
        with lock.acquire("ns.t"):
            pass  # acquired after the lease expired
        assert time.monotonic() - t0 >= 0.1

    def test_long_hold_renews_lease_and_keeps_exclusion(self, tmp_path):
        """ADVICE r6: a commit longer than ttl_sec must not silently
        lose mutual exclusion — the keepAlive thread renews at ttl/3."""
        lock = CommitLock(str(tmp_path), ttl_sec=0.2, acquire_timeout_sec=0.5)
        with lock.acquire("ns.t"):
            time.sleep(0.7)  # 3.5x the TTL — lease would expire unrenewed
            with pytest.raises(LockTimeout):
                with lock.acquire("ns.t"):
                    pass

    def test_failed_renewal_does_not_leak_tmp_file(self, tmp_path, monkeypatch):
        """ADVICE r7: an OSError during the lease renewal's os.replace
        must not leave the .renew-<token> temp file behind."""
        import glob
        import os as _os

        from ice_spark.rest import commit_lock as cl

        def boom(src, dst):
            raise OSError("disk says no")

        lock = CommitLock(str(tmp_path), ttl_sec=0.15, acquire_timeout_sec=1)
        with lock.acquire("ns.t"):
            monkeypatch.setattr(cl.os, "replace", boom)
            time.sleep(0.3)  # let at least one renewal cycle fire
            assert glob.glob(str(tmp_path / "*.renew-*")) == []
            monkeypatch.undo()

    def test_release_does_not_unlink_foreign_lease(self, tmp_path):
        """ADVICE r6 TOCTOU: if the holder's lease was lost and re-taken
        by another writer, exiting the context must NOT unlink the new
        holder's lock file."""
        import json as _json

        lock = CommitLock(str(tmp_path), ttl_sec=30, acquire_timeout_sec=1)
        path = lock._path("ns.t")
        with lock.acquire("ns.t"):
            # simulate lease loss + retake by a foreign writer
            with open(path, "w") as f:
                _json.dump({"token": "foreign", "expiry": time.time() + 30}, f)
        with open(path) as f:
            lease = _json.load(f)
        assert lease["token"] == "foreign"  # foreign lease untouched

    def test_acquire_timeout_raises(self, tmp_path):
        lock = CommitLock(str(tmp_path), ttl_sec=30, acquire_timeout_sec=0.3)
        cm = lock.acquire("ns.t")
        cm.__enter__()
        with pytest.raises(LockTimeout):
            with lock.acquire("ns.t"):
                pass


class TestWatchAndMaintenanceCounters:
    def test_queue_watch_counts_without_matches(self):
        from ice_spark.streaming.queue_watch import FakeQueue, s3_event_body, watch_queue

        reg = default_registry()
        before = reg.render()
        q = FakeQueue()
        q.send(s3_event_body("b", ["x.txt"]))  # filtered out by pattern

        class _T:  # table placeholder; never touched (no matches)
            identifier = "ns.t"

        stats = watch_queue(_T(), q, patterns=["*.parquet"], fire_once=True)
        assert stats["messages_ignored"] == 1
        after = reg.render()
        assert "ice_watch_poll_requests_total" in after
        assert "ice_watch_events_not_matched_total" in after


class TestReporterConversion:
    """rt_report_metrics converts client scan/commit reports into the
    reference's iceberg_scan_* / iceberg_commit_* counters
    (PrometheusMetricsReporter.java role)."""

    @pytest.fixture()
    def server(self, tmp_path):
        cat = Catalog(None, str(tmp_path / "wh"))
        srv = RestCatalogServer(cat, ServerConfig(anonymous=True)).start()
        c = RestCatalogClient(srv.url)
        c.create_namespace("ns1")
        c.create_table("ns1.t1", SCHEMA.jsonValue())
        yield srv
        srv.stop()

    def test_scan_report_counters(self, server):
        c = RestCatalogClient(server.url)
        c.report_metrics(
            "ns1.t1",
            {
                "report-type": "scan-report",
                "metrics": {
                    "result-data-files": {"value": 7},
                    "total-file-size-in-bytes": {"value": 4096},
                },
            },
        )
        text = _scrape(server.url)
        assert "iceberg_scans_total" in text
        assert "iceberg_scan_result_data_files_total" in text and " 7" in text
        assert "iceberg_scan_total_file_size_bytes" in text
        assert "iceberg_metrics_reporter_active 1" in text

    def test_commit_report_counters(self, server):
        c = RestCatalogClient(server.url)
        c.report_metrics(
            "ns1.t1",
            {
                "report-type": "commit-report",
                "operation": "append",
                "metrics": {
                    "added-data-files": {"value": 3},
                    "added-records": {"value": 1200},
                },
            },
        )
        text = _scrape(server.url)
        assert "iceberg_table_snapshots_total" in text
        assert 'operation="append"' in text
        assert "iceberg_commit_added_records_total" in text

    def test_http_in_flight_and_response_size(self, server):
        c = RestCatalogClient(server.url)
        c.load_table("ns1.t1")
        text = _scrape(server.url)
        assert "iceberg_http_requests_in_flight 0" in text
        assert "iceberg_http_response_size_bytes_total" in text
