"""Per-file Bloom index (catalog/fileindex.py): point-lookup pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.fileindex import (
    build_bloom_index,
    might_contain,
    py_char_hash,
)
from ice_spark.ingest.insert import append_dataframe

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def test_hash_parity_spark_vs_python(spark):
    from ice_spark.functions.text import char_hash

    vals = ["42", "hello", "user_99871", "0", "-5"]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", char_hash(F.col("s")).alias("h")
    )
    got = {r.s: r.h for r in df.collect()}
    assert got == {v: py_char_hash(v) for v in vals}


def _table(spark, cat, name="ns.b"):
    t = cat.create_table(name, schema=SCHEMA)
    # three files with disjoint user sets
    append_dataframe(t, spark.createDataFrame([(i, "a") for i in range(0, 100)], SCHEMA).coalesce(1))
    append_dataframe(
        t.refresh(),
        spark.createDataFrame([(i, "b") for i in range(1000, 1100)], SCHEMA).coalesce(1),
    )
    append_dataframe(
        t.refresh(),
        spark.createDataFrame([(i, "c") for i in range(5000, 5100)], SCHEMA).coalesce(1),
    )
    return t.refresh()


def test_point_lookup_prunes_to_one_file(spark, cat):
    t = _table(spark, cat)
    res = build_bloom_index(t, "user_id")
    assert res["indexed_files"] == 3
    t = t.refresh()

    planned = t.plan_files([{"name": "user_id", "op": "equals", "values": [1042]}])
    assert len(planned) == 1  # bloom pruned the other two files

    # correctness: the scan still returns exactly the right row
    rows = t.read_filtered(
        [{"name": "user_id", "op": "equals", "values": [1042]}]
    ).collect()
    assert [(r.user_id, r.v) for r in rows] == [(1042, "b")]


def test_absent_key_prunes_everything(spark, cat):
    t = _table(spark, cat, "ns.b2")
    build_bloom_index(t, "user_id")
    t = t.refresh()
    # min/max alone can't rule 550 out of file 1's [0,99]? it can — use
    # a value INSIDE a file's range but absent from the table
    planned = t.plan_files([{"name": "user_id", "op": "equals", "values": [57]}])
    assert len(planned) == 1  # present value: one file
    gone = t.plan_files([{"name": "user_id", "op": "equals", "values": [63]}])
    assert len(gone) <= 1  # 63 IS present (0..99); sanity
    # value inside [1000,1099] bounds but never written:
    # bloom may false-positive, but usually prunes; assert no false
    # NEGATIVE ever: every actually-present value keeps its file
    for v in (0, 99, 1000, 5099):
        assert len(
            t.plan_files([{"name": "user_id", "op": "equals", "values": [v]}])
        ) >= 1


def test_unindexed_new_file_never_pruned(spark, cat):
    t = _table(spark, cat, "ns.b3")
    build_bloom_index(t, "user_id")
    t = t.refresh()
    append_dataframe(t, spark.createDataFrame([(777777, "d")], SCHEMA))
    t = t.refresh()
    planned = t.plan_files(
        [{"name": "user_id", "op": "equals", "values": [777777]}]
    )
    # the new file has no bitmap -> must survive planning
    assert any(e.get("bloom") is None or "user_id" not in (e.get("bloom") or {}) for e in planned)
    rows = t.read_filtered(
        [{"name": "user_id", "op": "equals", "values": [777777]}]
    ).collect()
    assert [(r.user_id, r.v) for r in rows] == [(777777, "d")]


def test_index_commit_is_replace_and_feedsafe(spark, cat, tmp_path):
    """The index snapshot is `replace`: incremental consumers skip it."""
    from ice_spark.streaming.table_changes import TableChangeFeed

    t = _table(spark, cat, "ns.b4")
    feed = TableChangeFeed(t, str(tmp_path / "cp.json"))
    feed.process_available(lambda df, sid: None)  # catch up
    build_bloom_index(t, "user_id")
    t.refresh()
    assert t.snapshot()["operation"] == "replace"
    assert feed.pending() is None  # no phantom redelivery


def test_might_contain_no_false_negatives():
    entry = {
        "bloom": {},
    }
    # no bitmap -> always might contain
    assert might_contain(entry, "user_id", 1)


def test_float_probe_coerces_not_false_prunes(spark, cat):
    """JSON filters arrive as floats ('1042.0'); the probe must hash
    them exactly as the build cast rendered the column ('1042')."""
    t = _table(spark, cat, "ns.b5")
    build_bloom_index(t, "user_id")
    t = t.refresh()
    planned = t.plan_files(
        [{"name": "user_id", "op": "equals", "values": [1042.0]}]
    )
    assert len(planned) >= 1  # float probe still finds its file
    assert (
        len(t.plan_files([{"name": "user_id", "op": "equals", "values": [1042.5]}]))
        == 0
    )  # fractional value provably matches nothing


def test_unstable_string_types_rejected_at_build(spark, cat):
    import pyspark.sql.types as T2

    t = cat.create_table(
        "ns.b6",
        schema=T2.StructType([T2.StructField("x", T2.DoubleType())]),
    )
    append_dataframe(t, spark.createDataFrame([(1.5,)], t.schema))
    with pytest.raises(ValueError, match="indexable types"):
        build_bloom_index(t.refresh(), "x")


def test_compaction_preserves_metrics_and_bloom(spark, cat):
    from ice_spark.catalog.maintenance import compact_data

    t = _table(spark, cat, "ns.b7")
    build_bloom_index(t, "user_id")
    t = t.refresh()
    res = compact_data(t, candidate_min_age_hours=0, min_input_files=2)
    assert res["rewritten"] >= 1
    t = t.refresh()
    merged = [e for e in t.files() if "bloom" in e]
    assert merged, "compacted entries lost their bloom index"
    # bounds survive too: pruning works post-compaction
    assert all(e.get("column_metrics") for e in t.files())
    # point lookup still finds its row and still prunes nothing wrongly
    rows = t.read_filtered(
        [{"name": "user_id", "op": "equals", "values": [1042]}]
    ).collect()
    assert [r.user_id for r in rows] == [1042]
    # a value in no source file is still bloom-pruned after the merge
    t.last_plan_stats = {}
    planned = t.plan_files(
        [{"name": "user_id", "op": "equals", "values": [999999]}]
    )
    assert len(planned) == 0 or all(
        "bloom" not in e for e in planned
    )  # either pruned or only unindexed files remain


def test_ingest_time_bloom_via_table_property(spark, cat, tmp_path):
    """bloom-columns property: every insert indexes its new files —
    no unindexed-file window, no rebuild needed."""
    import glob

    from ice_spark.ingest.insert import insert

    t = cat.create_table(
        "ns.b8",
        schema=SCHEMA,
        properties={"bloom-columns": "user_id"},
    )
    for lo in (0, 1000, 5000):
        src = str(tmp_path / f"s{lo}.parquet")
        spark.createDataFrame(
            [(i, "v") for i in range(lo, lo + 100)], SCHEMA
        ).coalesce(1).write.parquet(src)
        insert(t.refresh(), sorted(glob.glob(src + "/*.parquet")))
    t = t.refresh()
    assert all("user_id" in (e.get("bloom") or {}) for e in t.files())
    planned = t.plan_files(
        [{"name": "user_id", "op": "equals", "values": [5042]}]
    )
    assert len(planned) == 1  # bloom-pruned straight from ingest
    rows = t.read_filtered(
        [{"name": "user_id", "op": "equals", "values": [5042]}]
    ).collect()
    assert [r.user_id for r in rows] == [5042]
