"""Z-order clustering rewrite: content preserved, per-file bounds on
every clustered column tighten, and merge pruning benefits."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.maintenance import cluster_files
from ice_spark.catalog.merge import merge_upsert
from ice_spark.ingest.insert import append_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _grid(spark, n=32):
    rows = [(x, y, f"{x}:{y}") for x in range(n) for y in range(n)]
    # shuffled order so the initial file has full-range bounds
    rows.sort(key=lambda r: (r[0] * 7919 + r[1] * 104729) % 1000003)
    return spark.createDataFrame(rows, SCHEMA)


def test_zorder_tightens_bounds_and_prunes(spark, cat):
    t = cat.create_table("ns.z", schema=SCHEMA)
    append_dataframe(t, _grid(spark))
    before = t.read().orderBy("x", "y").collect()

    res = cluster_files(t, ["x", "y"], target_file_size_mb=64, dry_run=True)
    assert res["dry_run"] and res["input_files"] >= 1

    res = cluster_files(t, ["x", "y"], bits=8, n_output_files=4)
    assert res["rewritten_files"] >= 2
    assert t.snapshot()["operation"] == "replace"

    after = t.read().orderBy("x", "y").collect()
    assert after == before

    files = t.files()
    n = 32
    for col in ("x", "y"):
        spans = [
            f["column_metrics"][col]["max"] - f["column_metrics"][col]["min"]
            for f in files
        ]
        # z-order quadrants: average per-file span well under full range
        assert sum(spans) / len(spans) < 0.8 * (n - 1), (col, spans)

    # pruning payoff: a merge touching one corner skips files
    src = spark.createDataFrame([(0, 0, "UP")], SCHEMA)
    mres = merge_upsert(t, src, ["x", "y"])
    assert mres["files_kept"] >= 1
    got = {r.v for r in t.read().where("x = 0 AND y = 0").collect()}
    assert got == {"UP"}


def test_zorder_partitioned_per_partition(spark, cat):
    schema = T.StructType(
        [
            T.StructField("p", T.LongType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
        ]
    )
    t = cat.create_table(
        "ns.zp", schema=schema, partition_spec=[{"column": "p"}]
    )
    rows = [(p, x, y) for p in (1, 2) for x in range(16) for y in range(16)]
    rows.sort(key=lambda r: (r[1] * 7919 + r[2] * 104729) % 1000003)
    # two appends -> >= 2 files per partition, eligible for rewrite
    half = len(rows) // 2
    df1 = spark.createDataFrame(rows[:half], schema)
    df2 = spark.createDataFrame(rows[half:], schema)
    append_dataframe(t, df1)
    append_dataframe(t, df2)
    before = t.read().orderBy("p", "x", "y").collect()

    res = cluster_files(t, ["x", "y"], bits=8, n_output_files=2)
    assert res["groups"] == 2 and res["rewritten_files"] >= 4
    assert t.read().orderBy("p", "x", "y").collect() == before
    # files stay inside their partition dirs with partition recorded
    for e in t.files():
        assert e["partition"] in ({"p": "1"}, {"p": "2"})
        assert f"p={e['partition']['p']}" in e["path"]
