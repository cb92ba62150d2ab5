"""Parity extras: column metrics, as-source compression, retry-list,
SQL views over catalog tables, matcher."""

from __future__ import annotations

import os

import pytest

from ice_spark.catalog import Catalog
from ice_spark.ingest import insert
from ice_spark.ingest.insert import sniff_compression
from ice_spark.sources.matcher import Matcher

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_column_metrics_in_describe(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.r", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    d = t.describe(show_metrics=True)
    cols = d["file_metrics"][0]["columns"]
    assert cols["r_regionkey"]["min"] == 0 and cols["r_regionkey"]["max"] == 4
    assert cols["r_name"]["nulls"] == 0 and cols["r_name"]["values"] == 5


def test_as_source_compression(cat, spark, tmp_path):
    src = str(tmp_path / "z.parquet")
    spark.read.parquet(f"{SF}/region.parquet").write.option("compression", "zstd").parquet(src)
    part = next(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    assert sniff_compression(part) == "zstd"
    cat.create_namespace("ns")
    t = cat.create_table("ns.r", schema_from_parquet=part)
    insert(t, [part], compression="as-source")
    import pyarrow.parquet as pq

    out = os.path.join(t.location, t.files()[0]["path"])
    assert pq.ParquetFile(out).metadata.row_group(0).column(0).compression.lower() == "zstd"


def test_retry_list_on_failure(cat, tmp_path):
    cat.create_namespace("ns")
    t = cat.create_table("ns.r", schema_from_parquet=f"{SF}/region.parquet")
    rl = str(tmp_path / "retry.txt")
    with pytest.raises(Exception):
        insert(t, [f"{SF}/customer.parquet"], retry_list=rl)  # schema mismatch
    assert open(rl).read().strip() == f"{SF}/customer.parquet"
    # successful insert writes nothing
    insert(t, [f"{SF}/region.parquet"], retry_list=rl)
    assert len(open(rl).read().strip().splitlines()) == 1


def test_sql_over_catalog_tables(cat, spark):
    cat.create_namespace("ns")
    for name in ("nation", "region"):
        t = cat.create_table(f"ns.{name}", schema_from_parquet=f"{SF}/{name}.parquet")
        insert(t, [f"{SF}/{name}.parquet"])
    views = cat.register_views("ns", prefix="cat_")
    assert sorted(views) == ["cat_nation", "cat_region"]
    rows = spark.sql(
        """SELECT r_name, COUNT(*) AS n FROM cat_nation
           JOIN cat_region ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name"""
    ).collect()
    assert len(rows) == 5 and sum(r.n for r in rows) == 25


def test_matcher_semantics():
    m = Matcher(["*.parquet", "!*tmp*"])
    assert m.matches("a/b.parquet")
    assert not m.matches("a/tmp/b.parquet")
    assert not m.matches("a/b.csv")
    neg_only = Matcher(["!*secret*"])
    assert neg_only.matches("x.bin") and not neg_only.matches("a/secret/x")
