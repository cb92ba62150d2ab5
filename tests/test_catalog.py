"""Control-plane tests: catalog/namespace/table CRUD, schema gate,
inserts (plain/partitioned/sorted/no-copy/dedup), scan, time travel,
delete, alter, maintenance — modeled on the reference's scenario
suite (SURVEY.md §5: basic-operations, insert-partitioned,
schema-evolution, delete-partition, ...)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.alter import apply_operations
from ice_spark.catalog.delete import delete
from ice_spark.catalog.schema import SchemaIncompatibleError, check_compatible
from ice_spark.ingest import insert

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def test_namespace_crud(cat):
    cat.create_namespace("a")
    cat.create_namespace("a.b")
    with pytest.raises(Exception):
        cat.create_namespace("a.b")  # exists
    with pytest.raises(Exception):
        cat.create_namespace("x.y")  # parent missing
    cat.create_namespace("x.y", parents=True)
    assert cat.list_namespaces() == ["a", "x"]
    assert cat.list_namespaces("a") == ["a.b"]
    with pytest.raises(Exception):
        cat.delete_namespace("a")  # not empty
    cat.delete_namespace("a.b")
    cat.delete_namespace("a")
    assert cat.list_namespaces() == ["x"]
    with pytest.raises(Exception):
        cat.create_namespace("bad..ns")


def test_table_lifecycle_and_scan(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.orders", schema_from_parquet=f"{SF}/orders.parquet")
    assert cat.list_tables("ns") == ["orders"]
    res = insert(t, [f"{SF}/orders.parquet"])
    assert res["added"] >= 1
    assert t.read().count() == 1500
    rows = t.scan(limit=3)
    assert len(rows) == 3 and "o_orderkey" in rows[0]
    d = t.describe(show_schema=True)
    assert d["current_snapshot"]["summary"]["total-records"] == 1500
    cat.drop_table("ns.orders", purge=True)
    assert cat.list_tables("ns") == []


def test_insert_dedup_and_snapshots(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.nation", schema_from_parquet=f"{SF}/nation.parquet")
    insert(t, [f"{SF}/nation.parquet"])
    # duplicate rejected
    with pytest.raises(Exception):
        insert(t, [f"{SF}/nation.parquet"])
    # skip-duplicates: no-op
    res = insert(t, [f"{SF}/nation.parquet"], skip_duplicates=True)
    assert res["added"] == 0 and res["skipped"] == 1
    # force: appends again
    insert(t, [f"{SF}/nation.parquet"], force_duplicates=True)
    assert t.read().count() == 50
    snaps = t.snapshots()
    assert len(snaps) == 2
    # time travel to first snapshot
    assert t.read(snapshot_id=snaps[0]["snapshot_id"]).count() == 25


def test_partitioned_sorted_insert_and_delete(cat, spark):
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.orders",
        schema_from_parquet=f"{SF}/orders.parquet",
        partition_spec=[{"column": "o_orderdate", "transform": "year", "name": "Year"}],
        sort_order=[{"column": "o_totalprice", "desc": True}],
    )
    insert(t, [f"{SF}/orders.parquet"])
    parts = t.partitions()
    assert all("Year" in p["partition"] for p in parts)
    years = sorted(p["partition"]["Year"] for p in parts)
    assert years[0] == "1995"
    # partition dirs on disk (reference scenario insert-partitioned
    # expects data/Year=2010/*.parquet style paths)
    assert any("Year=1995" in e["path"] for e in t.files())
    # file-level delete with dry-run default
    plan = delete(t, [{"name": "Year", "op": "equals", "values": [1995]}])
    assert plan["candidates"] and not plan["deleted"]
    before = t.read().count()
    res = delete(t, [{"name": "Year", "op": "equals", "values": [1995]}], dry_run=False, purge=True)
    assert res["deleted"] and res["purged"] >= 1
    after = t.read().count()
    assert after < before
    assert t.read().where(F.year("o_orderdate") == 1995).count() == 0
    # predicates must reference partition fields
    with pytest.raises(Exception):
        delete(t, [{"name": "o_custkey", "op": "equals", "values": [1]}])
    # range op
    plan = delete(t, [{"name": "Year", "op": "less_than", "values": [1997]}])
    assert all("Year=1996" in p for p in plan["candidates"])


def test_sorted_file_contents(cat, spark):
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.sorted",
        schema_from_parquet=f"{SF}/nation.parquet",
        sort_order=[{"column": "n_nationkey", "desc": True}],
    )
    insert(t, [f"{SF}/nation.parquet"])
    entry = t.files()[0]
    df = spark.read.parquet(os.path.join(t.location, entry["path"]))
    keys = [r.n_nationkey for r in df.collect()]
    assert keys == sorted(keys, reverse=True)


def test_schema_gate(cat, spark):
    table_schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.DoubleType(), True),
        ]
    )
    ok = T.StructType([T.StructField("a", T.IntegerType(), False)])
    check_compatible(ok, table_schema)  # int->long + missing optional
    with pytest.raises(SchemaIncompatibleError):
        check_compatible(
            T.StructType([T.StructField("c", T.LongType(), True)]), table_schema
        )  # extra field
    with pytest.raises(SchemaIncompatibleError):
        check_compatible(
            T.StructType([T.StructField("b", T.DoubleType(), True)]), table_schema
        )  # required a missing
    with pytest.raises(SchemaIncompatibleError):
        check_compatible(
            T.StructType(
                [T.StructField("a", T.LongType(), True)]
            ),
            table_schema,
        )  # optional->required
    with pytest.raises(SchemaIncompatibleError):
        check_compatible(
            T.StructType([T.StructField("a", T.DoubleType(), False)]), table_schema
        )  # bad promotion
    # decimal widening ok at equal scale
    ts = T.StructType([T.StructField("d", T.DecimalType(20, 2), True)])
    check_compatible(T.StructType([T.StructField("d", T.DecimalType(10, 2), True)]), ts)
    with pytest.raises(SchemaIncompatibleError):
        check_compatible(
            T.StructType([T.StructField("d", T.DecimalType(10, 3), True)]), ts
        )


def test_no_copy_add_files(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.region", schema_from_parquet=f"{SF}/region.parquet")
    with pytest.raises(Exception):
        insert(t, [f"{SF}/region.parquet"], no_copy=True)  # outside location
    res = insert(t, [f"{SF}/region.parquet"], no_copy=True, force_no_copy=True)
    assert res["added"] == 1
    assert t.files()[0]["external"] is True
    assert t.read().count() == 5


def test_alter_table_ops(cat, spark):
    cat.create_namespace("ns")
    t = cat.create_table("ns.n", schema_from_parquet=f"{SF}/nation.parquet")
    insert(t, [f"{SF}/nation.parquet"])
    apply_operations(
        t,
        [
            {"add_column": {"name": "flag", "type": "string", "position": "after:n_name"}},
            {"rename_column": {"name": "n_name", "new_name": "name"}},
            {"set_tblproperty": {"key": "owner", "value": "me"}},
        ],
    )
    t.refresh()
    assert [f.name for f in t.schema.fields][:3] == ["n_nationkey", "name", "flag"]
    assert t.properties["owner"] == "me"
    # old files still readable: rename applied, new column null
    row = t.read().where(F.col("n_nationkey") == 0).first()
    assert row.name == "NATION_0" and row.flag is None
    # required add on non-empty table without default is rejected
    with pytest.raises(ValueError):
        apply_operations(t, [{"add_column": {"name": "r", "type": "int", "required": True}}])
    # with initial_default it works and backfills old rows
    apply_operations(
        t,
        [{"add_column": {"name": "r", "type": "int", "required": True, "initial_default": 7}}],
    )
    t.refresh()
    assert t.read().where(F.col("r") == 7).count() == 25
    # promotion-only alter_column
    apply_operations(t, [{"alter_column": {"name": "n_nationkey", "type": "bigint"}}])
    with pytest.raises(Exception):
        apply_operations(t, [{"alter_column": {"name": "n_nationkey", "type": "int"}}])
    # drop column
    apply_operations(t, [{"drop_column": {"name": "flag"}}])
    t.refresh()
    assert "flag" not in t.schema.fieldNames()
    # set_tblproperty null removes
    apply_operations(t, [{"set_tblproperty": {"key": "owner", "value": None}}])
    t.refresh()
    assert "owner" not in t.properties


def test_schema_evolution_mixed_files(cat, spark, tmp_path):
    """Files written under different schema versions read back
    aligned (scenario schema-evolution analog)."""
    cat.create_namespace("ns")
    t = cat.create_table("ns.ev", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    apply_operations(
        t, [{"add_column": {"name": "extra", "type": "bigint", "initial_default": -1}}]
    )
    t.refresh()
    # new file WITH the extra column
    p = str(tmp_path / "new.parquet")
    spark.createDataFrame(
        [(100, "NEW_REGION", 42)], "r_regionkey int, r_name string, extra bigint"
    ).write.parquet(p)
    insert(t, [p])
    df = t.read()
    assert df.count() == 6
    assert df.where(F.col("extra") == -1).count() == 5  # backfilled old rows
    assert df.where(F.col("extra") == 42).count() == 1


def test_catalog_export_import(cat, spark, tmp_path):
    cat.create_namespace("ns")
    t = cat.create_table("ns.r", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    reg = cat.export_registry()
    assert reg["namespaces"] == ["ns"] and "ns.r" in reg["tables"]
    # drop (no purge) then re-register from metadata
    cat.drop_table("ns.r")
    assert not cat.table_exists("ns.r")
    actions = cat.import_registry(reg)
    assert any("register" in a for a in actions)
    assert cat.load_table("ns.r").read().count() == 5


def test_commit_conflict_retry(cat):
    cat.create_namespace("ns")
    t = cat.create_table("ns.c", schema_from_parquet=f"{SF}/region.parquet")
    t2 = cat.load_table("ns.c")
    insert(t, [f"{SF}/region.parquet"])
    # t2 has stale version; its commit must retry against fresh
    # metadata and succeed (optimistic CAS loop)
    insert(t2, [f"{SF}/region.parquet"], force_duplicates=True)
    assert t2.read().count() == 10
    assert len(t2.snapshots()) == 2


def test_partition_evolution(cat, spark):
    from ice_spark.catalog.alter import add_partition_field, apply_operations
    from ice_spark.ingest.insert import append_dataframe

    cat.create_namespace("pe")
    t = cat.create_table("pe.t", schema_from_parquet=f"{SF}/orders.parquet")
    res = insert(t, [f"{SF}/orders.parquet"])
    assert res["added"] >= 1
    n_before = t.read().count()
    files_before = {e["path"] for e in t.files()}

    # evolve the spec on a NON-empty table (beyond the reference's
    # empty-only sync); existing files stay untouched
    apply_operations(
        t, [{"add_partition_field": {"column": "o_orderdate", "transform": "year", "name": "Year"}}]
    )
    assert {e["path"] for e in t.files()} == files_before

    # new writes land partitioned by the evolved spec
    append_dataframe(t, t.spark.read.parquet(f"{SF}/orders.parquet"))
    new_files = [e for e in t.files() if e["path"] not in files_before]
    assert new_files and all("Year" in (e.get("partition") or {}) for e in new_files)
    # old + new read together fine
    assert t.read().count() == 2 * n_before

    with pytest.raises(ValueError, match="no such column"):
        add_partition_field(t, "nope")
    with pytest.raises(ValueError, match="duplicate"):
        add_partition_field(t, "o_orderdate", transform="year", name="Year")


def test_analyze_and_glob_insert(cat, tmp_path):
    import shutil as _sh
    import subprocess
    import sys

    cat.create_namespace("an")
    t = cat.create_table("an.r", schema_from_parquet=f"{SF}/region.parquet")
    insert(t, [f"{SF}/region.parquet"])
    stats = t.analyze(approx=False)
    assert stats["row_count"] == 5
    assert stats["columns"]["r_regionkey"]["ndv"] == 5
    assert stats["columns"]["r_regionkey"]["nulls"] == 0
    assert stats["columns"]["r_regionkey"]["min"] == "0"
    t.refresh()
    assert t.properties["stats"]["row_count"] == 5

    # CLI glob expansion
    d = tmp_path / "globdir"
    d.mkdir()
    _sh.copyfile(f"{SF}/region.parquet", d / "a.parquet")
    _sh.copyfile(f"{SF}/nation.parquet", d / "b_nation.parquet")
    from ice_spark.cli import build_parser

    args = build_parser().parse_args(
        ["--warehouse", str(tmp_path / "w2"), "insert", "x.t", str(d / "a*.parquet")]
    )
    assert args.files == [str(d / "a*.parquet")]  # parser passes through; main() expands
