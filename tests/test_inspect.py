"""Partition inference + sortedness checking for no-copy ingestion."""

from __future__ import annotations

import pytest

from ice_spark.catalog import Catalog
from ice_spark.catalog.transforms import SortField, parse_partition_spec
from ice_spark.ingest import insert
from ice_spark.ingest.inspect import check_sorted, infer_partition

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_infer_partition_single_year(spark, tmp_path):
    # carve out one year of orders → whole file is one partition
    p = str(tmp_path / "o1996")
    spark.read.parquet(f"{SF}/orders.parquet").where(
        "o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'"
    ).coalesce(1).write.parquet(p)
    import os

    f = next(os.path.join(p, x) for x in os.listdir(p) if x.endswith(".parquet"))
    spec = parse_partition_spec(
        [{"column": "o_orderdate", "transform": "year", "name": "Year"}]
    )
    assert infer_partition(f, spec) == {"Year": "1996"}
    # the full table spans years → inference must refuse
    with pytest.raises(ValueError, match="spans multiple partitions"):
        infer_partition(f"{SF}/orders.parquet", spec)


def test_no_copy_into_partitioned_table(cat, spark, tmp_path):
    import os

    p = str(tmp_path / "o1997")
    spark.read.parquet(f"{SF}/orders.parquet").where(
        "o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'"
    ).coalesce(1).write.parquet(p)
    f = next(os.path.join(p, x) for x in os.listdir(p) if x.endswith(".parquet"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.o",
        schema_from_parquet=f"{SF}/orders.parquet",
        partition_spec=[{"column": "o_orderdate", "transform": "year", "name": "Year"}],
    )
    insert(t, [f], no_copy=True, force_no_copy=True)
    assert t.partitions()[0]["partition"] == {"Year": "1997"}
    # partition-predicate delete now prunes the no-copy file too
    from ice_spark.catalog.delete import delete

    plan = delete(t, [{"name": "Year", "op": "equals", "values": [1997]}])
    assert len(plan["candidates"]) == 1


def test_check_sorted_asc_desc_nulls(spark, tmp_path):
    import os

    base = str(tmp_path / "sorted")
    spark.read.parquet(f"{SF}/nation.parquet").orderBy("n_nationkey").coalesce(
        1
    ).write.parquet(base)
    f = next(os.path.join(base, x) for x in os.listdir(base) if x.endswith(".parquet"))
    assert check_sorted(f, [SortField("n_nationkey")])
    assert not check_sorted(f, [SortField("n_nationkey", desc=True)])
    # unsorted column
    assert not check_sorted(f, [SortField("n_name", desc=True)])


def test_no_copy_sorted_table_guard(cat, spark, tmp_path):
    import os

    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.s",
        schema_from_parquet=f"{SF}/nation.parquet",
        sort_order=[{"column": "n_nationkey", "desc": False}],
    )
    # unsorted input file: guard rejects no-copy
    unsorted = str(tmp_path / "unsorted")
    spark.read.parquet(f"{SF}/nation.parquet").orderBy("n_name").coalesce(1).write.parquet(
        unsorted
    )
    f = next(
        os.path.join(unsorted, x) for x in os.listdir(unsorted) if x.endswith(".parquet")
    )
    with pytest.raises(ValueError, match="not sorted"):
        insert(t, [f], no_copy=True, force_no_copy=True)
    # assume_sorted skips the check (reference --assume-sorted)
    insert(t, [f], no_copy=True, force_no_copy=True, assume_sorted=True)
    assert t.read().count() == 25
