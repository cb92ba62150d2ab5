"""Cron parser + maintenance scheduler tests
(MaintenanceScheduler.java:34-115 parity; explicit clock, no daemon)."""

from __future__ import annotations

import datetime

import pytest

from ice_spark.catalog.scheduler import Cron, MaintenanceSchedule

DT = datetime.datetime


class TestCron:
    def test_every_minute(self):
        c = Cron.parse("* * * * *")
        assert c.next_fire(DT(2026, 1, 1, 0, 0)) == DT(2026, 1, 1, 0, 1)

    def test_daily_at_3(self):
        c = Cron.parse("0 3 * * *")
        assert c.next_fire(DT(2026, 1, 1, 2, 59)) == DT(2026, 1, 1, 3, 0)
        assert c.next_fire(DT(2026, 1, 1, 3, 0)) == DT(2026, 1, 2, 3, 0)

    def test_step_and_list(self):
        c = Cron.parse("*/15 0,12 * * *")
        assert c.next_fire(DT(2026, 1, 1, 0, 16)) == DT(2026, 1, 1, 0, 30)
        assert c.next_fire(DT(2026, 1, 1, 0, 46)) == DT(2026, 1, 1, 12, 0)

    def test_range(self):
        c = Cron.parse("0 9-17 * * *")
        assert c.next_fire(DT(2026, 1, 1, 17, 1)) == DT(2026, 1, 2, 9, 0)

    def test_weekday_standard_numbering(self):
        # cron standard: 0=Sunday, 5=Friday. 2026-01-02 is a Friday.
        c = Cron.parse("0 0 * * 5")
        assert c.next_fire(DT(2026, 1, 1, 0, 0)) == DT(2026, 1, 2, 0, 0)
        # both 0 and 7 mean Sunday (2026-01-04)
        for dow in ("0", "7"):
            c = Cron.parse(f"0 0 * * {dow}")
            assert c.next_fire(DT(2026, 1, 1, 0, 0)) == DT(2026, 1, 4, 0, 0)

    def test_dom_dow_both_restricted_is_or(self):
        # POSIX: '0 0 1 * 1' fires on the 1st OR on Mondays.
        c = Cron.parse("0 0 1 * 1")
        # 2026-01-05 is a Monday; the 1st (Thursday) also fires
        assert c.matches(DT(2026, 1, 1, 0, 0))
        assert c.matches(DT(2026, 1, 5, 0, 0))
        assert not c.matches(DT(2026, 1, 2, 0, 0))  # Friday the 2nd: neither

    def test_month_and_dom(self):
        c = Cron.parse("30 6 29 2 *")  # Feb 29 — only leap years
        assert c.next_fire(DT(2026, 1, 1)) == DT(2028, 2, 29, 6, 30)

    def test_invalid(self):
        with pytest.raises(ValueError):
            Cron.parse("* * * *")
        with pytest.raises(ValueError):
            Cron.parse("61 * * * *")
        with pytest.raises(ValueError):
            Cron.parse("* 25 * * *")


class TestSchedule:
    def test_fires_once_per_interval(self):
        sched = MaintenanceSchedule()
        calls = []
        sched.add("job", "0 * * * *", lambda now: calls.append(now), DT(2026, 1, 1, 0, 30))
        assert sched.run_pending(DT(2026, 1, 1, 0, 45)) == {}
        ran = sched.run_pending(DT(2026, 1, 1, 1, 0))
        assert "job" in ran and len(calls) == 1
        # same tick again: not due
        assert sched.run_pending(DT(2026, 1, 1, 1, 0)) == {}

    def test_missed_ticks_collapse_to_one_run(self):
        """Host was down for 5 hours: ONE catch-up run, not 5."""
        sched = MaintenanceSchedule()
        calls = []
        sched.add("job", "0 * * * *", lambda now: calls.append(now), DT(2026, 1, 1, 0, 0))
        sched.run_pending(DT(2026, 1, 1, 6, 10))
        assert len(calls) == 1
        # next fire is relative to NOW, not the missed backlog
        assert sched.jobs[0].next_fire == DT(2026, 1, 1, 7, 0)

    def test_table_maintenance_job(self, spark, tmp_path):
        from pyspark.sql import types as T

        from ice_spark.catalog import Catalog

        cat = Catalog(spark, str(tmp_path / "wh"))
        cat.create_namespace("ns")
        cat.create_table(
            "ns.t", schema=T.StructType([T.StructField("id", T.LongType())])
        )
        sched = MaintenanceSchedule()
        sched.add_table_maintenance(
            cat, "ns.t", "0 3 * * *", DT(2026, 1, 1, 0, 0), dry_run=True
        )
        ran = sched.run_pending(DT(2026, 1, 1, 3, 0))
        result = ran["maintenance:ns.t"]
        # all four reference jobs ran (MaintenanceRunner order)
        assert set(result) == {
            "data_compaction",
            "manifest_compaction",
            "snapshot_cleanup",
            "orphan_cleanup",
        }
        assert sched.jobs[0].runs == 1

    def test_job_error_isolation(self):
        """A failing job must not starve later jobs or hot-retry: the
        error is recorded and the job waits for its next slot."""
        sched = MaintenanceSchedule()
        ok_calls = []

        def boom(now):
            raise RuntimeError("warehouse gone")

        sched.add("bad", "0 * * * *", boom, DT(2026, 1, 1, 0, 0))
        sched.add("good", "0 * * * *", lambda now: ok_calls.append(now), DT(2026, 1, 1, 0, 0))
        ran = sched.run_pending(DT(2026, 1, 1, 1, 0))
        assert "error" in ran["bad"] and "warehouse gone" in ran["bad"]["error"]
        assert len(ok_calls) == 1  # good ran despite bad failing first
        bad = sched.jobs[0]
        assert bad.failures == 1 and bad.runs == 0
        # no immediate hot-retry: not due again until the next slot
        assert sched.run_pending(DT(2026, 1, 1, 1, 1)) == {}
        assert sched.run_pending(DT(2026, 1, 1, 2, 0)).keys() == {"bad", "good"}


class TestInitialJitter:
    def test_same_cron_distinct_first_fires(self):
        """Two tables with the same cron get distinct, deterministic
        first-fire times under jitter (reference's initial-delay
        jitter, MaintenanceScheduler.java:34-115) so a fleet doesn't
        hit the object store simultaneously."""
        now = DT(2026, 1, 1, 0, 0)
        sched = MaintenanceSchedule()
        a = sched.add("maintenance:ns.a", "0 3 * * *", lambda n: "a", now, jitter_minutes=60)
        b = sched.add("maintenance:ns.b", "0 3 * * *", lambda n: "b", now, jitter_minutes=60)
        assert a.next_fire != b.next_fire
        base = DT(2026, 1, 1, 3, 0)
        for j in (a, b):
            assert base <= j.next_fire < base + datetime.timedelta(minutes=60)
        # deterministic: rebuilding the schedule reproduces the offsets
        sched2 = MaintenanceSchedule()
        a2 = sched2.add("maintenance:ns.a", "0 3 * * *", lambda n: "a", now, jitter_minutes=60)
        assert a2.next_fire == a.next_fire

    def test_jitter_only_on_first_fire(self):
        now = DT(2026, 1, 1, 0, 0)
        sched = MaintenanceSchedule()
        j = sched.add("t", "0 * * * *", lambda n: "x", now, jitter_minutes=30)
        first = j.next_fire
        assert first > DT(2026, 1, 1, 1, 0) or first == DT(2026, 1, 1, 1, 0)
        sched.run_pending(first)
        # after the first run the cron is followed exactly (top of hour)
        assert j.next_fire.minute == 0

    def test_zero_jitter_default_unchanged(self):
        now = DT(2026, 1, 1, 0, 0)
        sched = MaintenanceSchedule()
        j = sched.add("t", "0 3 * * *", lambda n: "x", now)
        assert j.next_fire == DT(2026, 1, 1, 3, 0)


def test_scheduled_matview_refresh(spark, tmp_path):
    from pyspark.sql import types as T

    from ice_spark.catalog import Catalog
    from ice_spark.ingest.insert import append_dataframe
    from ice_spark.operators.matview import create_matview

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("x", T.LongType())]
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table("ns.base", schema=schema)
    append_dataframe(t, spark.createDataFrame([("a", 1)], schema))
    create_matview(
        cat, "ns.mv", "ns.base", ["k"], [{"op": "sum", "col": "x", "alias": "sum_x"}]
    )

    sched = MaintenanceSchedule()
    sched.add_matview_refresh(cat, "ns.mv", "0 * * * *", DT(2026, 1, 1, 0, 0))
    append_dataframe(t.refresh(), spark.createDataFrame([("a", 9)], schema))
    ran = sched.run_pending(DT(2026, 1, 1, 1, 0))
    assert ran["matview:ns.mv"]["mode"] == "incremental"
    got = {r.k: r.sum_x for r in cat.load_table("ns.mv").read().collect()}
    assert got == {"a": 10}
    # caught-up fire is a noop, not an error
    ran = sched.run_pending(DT(2026, 1, 1, 2, 0))
    assert ran["matview:ns.mv"]["mode"] == "noop"


class TestDaemon:
    """run_daemon — the reference's long-lived scheduler loop
    (MaintenanceScheduler.java:34-115) driven here by an injectable
    clock: two fire cycles with zero wall time, Prometheus counters
    advancing."""

    def _counter(self, text: str, name: str) -> float:
        total = 0.0
        for line in text.splitlines():
            if line.startswith(name) and not line.startswith("#"):
                total += float(line.rsplit(" ", 1)[1])
        return total

    def test_two_cycles_fake_clock_counters_advance(self):
        from ice_spark.catalog.scheduler import run_daemon
        from ice_spark.metrics import default_registry

        clock = [DT(2026, 1, 1, 0, 0, 30)]
        fired: list = []
        sched = MaintenanceSchedule()
        sched.add("maintenance:ns.ok", "* * * * *", lambda n: fired.append(n) or "ok", clock[0])
        sched.add(
            "maintenance:ns.bad",
            "* * * * *",
            lambda n: (_ for _ in ()).throw(RuntimeError("boom")),
            clock[0],
        )

        slept: list = []

        def sleep_fn(s):
            slept.append(s)
            clock[0] += datetime.timedelta(minutes=1)

        reg = default_registry()
        before_cycles = self._counter(
            reg.render(), "ice_maintenance_scheduler_cycles_total"
        )
        before_fires = self._counter(
            reg.render(), "ice_maintenance_scheduler_fires_total"
        )
        res = run_daemon(
            sched,
            now_fn=lambda: clock[0],
            sleep_fn=sleep_fn,
            poll_sec=60.0,
            max_cycles=3,
        )
        # cycle 1 (00:00:30): nothing due; sleeps 30s to the next fire
        # cycles 2+3 (01:30, 02:30): both jobs fire each time
        assert res == {"cycles": 3, "runs": 2, "failures": 2}
        assert len(fired) == 2
        assert slept[0] == 30.0  # sleeps TO the fire, not the full poll
        text = reg.render()
        assert (
            self._counter(text, "ice_maintenance_scheduler_cycles_total")
            == before_cycles + 3
        )
        assert (
            self._counter(text, "ice_maintenance_scheduler_fires_total")
            == before_fires + 4
        )
        assert 'job="maintenance:ns.bad",status="failure"' in text
        assert 'job="maintenance:ns.ok",status="success"' in text
        # failing job never starved the healthy one
        ok = next(j for j in sched.jobs if j.name == "maintenance:ns.ok")
        bad = next(j for j in sched.jobs if j.name == "maintenance:ns.bad")
        assert ok.runs == 2 and bad.failures == 2

    def test_cli_daemon_wiring_empty_warehouse(self, tmp_path, capsys):
        """--schedule turns the verb into the daemon loop; an empty
        warehouse schedules zero jobs but the loop still cycles."""
        import json

        from ice_spark.cli import main

        rc = main(
            [
                "--warehouse",
                str(tmp_path / "wh"),
                "perform-maintenance",
                "--schedule",
                "* * * * *",
                "--cycles",
                "2",
                "--poll-sec",
                "0",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["cycles"] == 2 and out["runs"] == 0
