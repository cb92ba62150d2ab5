"""Table relocation (rewrite-paths verb).

Reference parity: docs/rewrite-table-path.md — the reference's
documented migration workflow is Iceberg's `rewrite_table_path`
procedure: rewrite every absolute path under source_prefix to
target_prefix across metadata.json / manifest-list / manifest files,
stage the rewritten metadata, copy the data files with the same
relative structure. These tests move a multi-snapshot table (with a
partition spec and an --no-copy absolute registration) across
directories and prove the scan — including time travel to an older
snapshot — is row-identical before and after.
"""

from __future__ import annotations

import json
import os

import pytest

from ice_spark.catalog.catalog import Catalog
from ice_spark.catalog.rewrite_paths import rewrite_table_path
from ice_spark.catalog.table import Table
from ice_spark.ingest.insert import insert

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def src_table(spark, tmp_path):
    """Multi-snapshot partitioned table + one --no-copy absolute file."""
    wh = str(tmp_path / "wh_src")
    cat = Catalog(spark, wh)
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.orders",
        schema_from_parquet=f"{SF}/orders.parquet",
        partition_spec=[{"column": "o_orderdate", "transform": "year", "name": "y"}],
    )
    insert(t, [f"{SF}/orders.parquet"])  # snapshot 1 (copied, partitioned)
    insert(
        t, [f"{SF}/orders.parquet"], force_duplicates=True
    )  # snapshot 2 (duplicate append)
    # snapshot 3: --no-copy registration of a file that lives inside
    # the table location but outside data/ — its manifest entry is an
    # ABSOLUTE path (insert.py no-copy branch), exercising the
    # absolute-path rewrite
    os.makedirs(os.path.join(t.location, "imports"), exist_ok=True)
    loose = os.path.join(t.location, "imports", "loose.parquet")
    from pyspark.sql import functions as F

    # one partition's worth of rows (no-copy files must map to a
    # single partition value)
    spark.read.parquet(f"{SF}/orders.parquet").where(
        F.year("o_orderdate") == 1995
    ).limit(7).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "loose_dir"))
    part = next(
        p for p in os.listdir(tmp_path / "loose_dir") if p.endswith(".parquet")
    )
    os.rename(tmp_path / "loose_dir" / part, loose)
    insert(t.refresh(), [loose], no_copy=True)
    return cat.load_table("ns.orders")


class TestRewrite:
    def test_dry_run_writes_nothing(self, src_table, tmp_path):
        target = str(tmp_path / "wh_dst" / "ns" / "orders")
        out = rewrite_table_path(src_table, target)  # dry_run default
        assert out["dry_run"] and out["copied"] == 0
        assert out["new_location"] == target
        assert out["metadata_files"] > 0 and out["replacements"] > 0
        assert len(out["copy_plan"]) == len(
            {e["path"] for e in _all_entries(src_table)}
        )
        assert not os.path.exists(target)

    def test_relocated_scan_identical_incl_time_travel(
        self, spark, src_table, tmp_path
    ):
        target = str(tmp_path / "wh_dst" / "ns" / "orders")
        before_cur = _rows(src_table.read())
        snaps = src_table.snapshots()
        assert len(snaps) >= 3
        old_id = snaps[0]["snapshot_id"]
        before_old = _rows(src_table.read(snapshot_id=old_id))

        out = rewrite_table_path(src_table, target, dry_run=False, copy_data=True)
        assert out["copied"] == len(out["copy_plan"]) > 0
        assert out["external"] == []  # everything lived under the prefix

        moved = Table(src_table.spark, target).refresh()
        assert _rows(moved.read()) == before_cur
        assert _rows(moved.read(snapshot_id=old_id)) == before_old
        # no metadata file at the new location references the old root
        src_root = src_table.location
        for name in os.listdir(os.path.join(target, "metadata")):
            if name.endswith(".json") and name != "copy-plan.json":
                with open(os.path.join(target, "metadata", name)) as f:
                    assert src_root not in f.read(), name

    def test_copy_plan_is_consumable_without_copy_data(self, src_table, tmp_path):
        """Object-store path: stage metadata only, copy via the plan."""
        target = str(tmp_path / "relocated")
        out = rewrite_table_path(src_table, target, dry_run=False, copy_data=False)
        plan_file = os.path.join(out["staging_location"], "copy-plan.json")
        with open(plan_file) as f:
            plan = json.load(f)["files"]
        assert plan == out["copy_plan"]
        import shutil

        for pair in plan:
            os.makedirs(os.path.dirname(pair["target"]), exist_ok=True)
            shutil.copyfile(pair["source"], pair["target"])
        moved = Table(src_table.spark, target).refresh()
        assert moved.read().count() == src_table.read().count()

    def test_source_prefix_must_cover_location(self, src_table, tmp_path):
        with pytest.raises(ValueError):
            rewrite_table_path(
                src_table, str(tmp_path / "x"), source_prefix="/nonexistent/root"
            )

    def test_broad_prefix_rewrites_whole_warehouse_root(
        self, spark, src_table, tmp_path
    ):
        """source_prefix may be an ancestor of the table location (the
        warehouse root) — the table lands at the mirrored subpath."""
        src_wh = str(tmp_path / "wh_src")
        dst_wh = str(tmp_path / "wh_mirror")
        out = rewrite_table_path(
            src_table, dst_wh, source_prefix=src_wh, dry_run=False, copy_data=True
        )
        assert out["new_location"] == os.path.join(dst_wh, "ns", "orders")
        moved = Table(spark, out["new_location"]).refresh()
        assert moved.read().count() == src_table.read().count()


class TestCli:
    def test_verb_dry_run_then_execute(self, spark, src_table, tmp_path, capsys):
        from ice_spark.cli import main

        wh = str(tmp_path / "wh_src")
        target = str(tmp_path / "cli_dst")
        rc = main(
            [
                "--warehouse",
                wh,
                "rewrite-paths",
                "ns.orders",
                "--target-prefix",
                target,
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out)  # CLI prints one JSON doc
        assert out["dry_run"] is True
        assert not os.path.exists(target)
        rc = main(
            [
                "--warehouse",
                wh,
                "rewrite-paths",
                "ns.orders",
                "--target-prefix",
                target,
                "--no-dry-run",
                "--copy-data",
            ]
        )
        assert rc == 0
        moved = Table(spark, target).refresh()
        assert moved.read().count() == src_table.read().count()


def _all_entries(t):
    out = []
    for snap in t.snapshots():
        out.extend(t.snapshot_files(snap))
    # dedupe by path like the planner does
    seen, uniq = set(), []
    for e in out:
        if e["path"] not in seen:
            seen.add(e["path"])
            uniq.append(e)
    return uniq
