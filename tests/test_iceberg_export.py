"""Iceberg v2 interop bridge round trip (VERDICT r2 #3).

The reference's headline property is that its tables are standard
Iceberg, readable by other engines (DockerLocalFileIOClickHouseIT,
ice-rest-catalog/src/test/pyiceberg/ice_scan.py). These tests prove
the analogous property for the export bridge at three levels:

1. STRUCTURE — exported metadata.json carries every v2-required
   field; manifests carry spec field-ids and required file metadata.
2. CROSS-IMPLEMENTATION — the JVM's own org.apache.avro library
   (avro-1.12.1.jar, NOT our code) parses the manifest-list and
   manifest Avro files and sees the same file paths/counts. Our
   writer and the Java reader share zero code.
3. ROWS — reading the parquet files listed by the exported metadata
   returns exactly the rows of table.read(): a user of another
   engine would get identical data.
"""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.iceberg_export import (
    export_iceberg,
    iceberg_data_files,
    read_iceberg_manifest,
    read_iceberg_manifest_list,
    read_iceberg_metadata,
    spark_to_iceberg_schema,
)
from ice_spark.ingest import insert

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cat", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

V2_REQUIRED_KEYS = {
    "format-version",
    "table-uuid",
    "location",
    "last-sequence-number",
    "last-updated-ms",
    "last-column-id",
    "current-schema-id",
    "schemas",
    "default-spec-id",
    "partition-specs",
    "last-partition-id",
    "default-sort-order-id",
    "sort-orders",
    "snapshots",
}


@pytest.fixture()
def exported(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.sales", schema=SCHEMA, partition_spec=[{"column": "cat"}]
    )
    df = spark.range(0, 100).select(
        F.col("id"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
        (F.col("id") * 1.5).alias("price"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    src = str(tmp_path / "src.parquet")
    df.coalesce(2).write.parquet(src)
    import glob

    insert(t, sorted(glob.glob(src + "/*.parquet")))
    # second commit so the export covers multi-snapshot history
    df2 = df.limit(10).withColumn("id", F.col("id") + 1000)
    src2 = str(tmp_path / "src2.parquet")
    df2.coalesce(1).write.parquet(src2)
    insert(t, sorted(glob.glob(src2 + "/*.parquet")))

    dest = str(tmp_path / "iceberg_export")
    summary = export_iceberg(t, dest)
    return t, dest, summary


def test_metadata_json_structure(exported):
    t, dest, summary = exported
    meta = read_iceberg_metadata(summary["metadata_file"])
    assert V2_REQUIRED_KEYS <= set(meta.keys())
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == t.meta["current_snapshot_id"]
    assert len(meta["snapshots"]) == 2
    # sequence numbers are 1-based and monotonically assigned
    assert [s["sequence-number"] for s in meta["snapshots"]] == [1, 2]
    # identity partition spec exported faithfully
    spec = meta["partition-specs"][0]["fields"]
    assert spec[0]["transform"] == "identity"
    assert spec[0]["name"] == "cat"
    assert spec[0]["field-id"] == 1000
    # schema has unique field ids and required flags
    fields = meta["schemas"][0]["fields"]
    ids = [f["id"] for f in fields]
    assert len(ids) == len(set(ids))
    assert {f["name"] for f in fields} == {"id", "cat", "price", "ts"}
    assert meta["refs"]["main"]["snapshot-id"] == t.meta["current_snapshot_id"]


def test_manifest_files_python_read(exported):
    t, dest, summary = exported
    meta = read_iceberg_metadata(summary["metadata_file"])
    snap = meta["snapshots"][-1]
    manifests = read_iceberg_manifest_list(snap["manifest-list"])
    assert len(manifests) >= 1
    total_rows = 0
    paths = set()
    for mf in manifests:
        assert mf["content"] == 0
        assert mf["partition_spec_id"] == 0
        entries = read_iceberg_manifest(mf["manifest_path"])
        assert len(entries) == mf["added_files_count"]
        for e in entries:
            d = e["data_file"]
            assert d["file_format"] == "PARQUET"
            assert d["file_path"].startswith("/")
            assert d["partition"]["cat"] in ("c0", "c1", "c2")
            total_rows += d["record_count"]
            paths.add(d["file_path"])
    assert total_rows == 110
    assert len(paths) == len(t.files())


def test_bounds_serialization(exported):
    t, dest, summary = exported
    meta = read_iceberg_metadata(summary["metadata_file"])
    by_name = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    snap = meta["snapshots"][0]
    entries = read_iceberg_manifest(
        read_iceberg_manifest_list(snap["manifest-list"])[0]["manifest_path"]
    )
    e0 = entries[0]["data_file"]
    if e0["lower_bounds"]:
        lowers = {kv["key"]: kv["value"] for kv in e0["lower_bounds"]}
        uppers = {kv["key"]: kv["value"] for kv in e0["upper_bounds"]}
        if by_name["id"] in lowers:
            lo = struct.unpack("<q", lowers[by_name["id"]])[0]
            hi = struct.unpack("<q", uppers[by_name["id"]])[0]
            assert 0 <= lo <= hi <= 99


def test_jvm_avro_cross_read(exported, spark):
    """The JVM's org.apache.avro reader — a fully independent
    implementation — must parse our hand-encoded Avro files."""
    t, dest, summary = exported
    meta = read_iceberg_metadata(summary["metadata_file"])
    snap = meta["snapshots"][-1]
    jvm = spark._jvm

    def jvm_read(path):
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
        out = []
        while dfr.hasNext():
            out.append(dfr.next())
        dfr.close()
        return out

    mfs = jvm_read(snap["manifest-list"])
    py_mfs = read_iceberg_manifest_list(snap["manifest-list"])
    assert len(mfs) == len(py_mfs)
    jvm_paths = {m.get("manifest_path").toString() for m in mfs}
    assert jvm_paths == {m["manifest_path"] for m in py_mfs}

    entries = jvm_read(py_mfs[0]["manifest_path"])
    py_entries = read_iceberg_manifest(py_mfs[0]["manifest_path"])
    assert len(entries) == len(py_entries)
    jvm_first = entries[0].get("data_file")
    assert jvm_first.get("file_path").toString() == py_entries[0]["data_file"]["file_path"]
    assert jvm_first.get("record_count") == py_entries[0]["data_file"]["record_count"]
    # field-id properties survive in the schema the JVM sees
    dfr_schema = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(py_mfs[0]["manifest_path"]),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    ).getSchema()
    parsed = json.loads(dfr_schema.toString())
    status_field = next(f for f in parsed["fields"] if f["name"] == "status")
    assert status_field["field-id"] == 0


def test_row_parity_through_exported_metadata(exported, spark):
    """Read the table THROUGH the exported Iceberg metadata only —
    rows must match table.read() exactly."""
    t, dest, summary = exported
    files = iceberg_data_files(summary["metadata_file"])
    assert len(files) == len(t.files())
    df_iceberg = spark.read.schema(SCHEMA).parquet(*[f["file_path"] for f in files])
    ours = {tuple(r) for r in t.read().collect()}
    theirs = {tuple(r) for r in df_iceberg.collect()}
    assert ours == theirs
    assert sum(f["record_count"] for f in files) == 110


def test_time_travel_through_export(exported, spark):
    t, dest, summary = exported
    meta = read_iceberg_metadata(summary["metadata_file"])
    first_sid = meta["snapshots"][0]["snapshot-id"]
    files = iceberg_data_files(summary["metadata_file"], snapshot_id=first_sid)
    assert sum(f["record_count"] for f in files) == 100


def test_date_transform_export(spark, tmp_path):
    """year/month/day transforms convert rendered values to Iceberg's
    epoch-offset representation."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.ev",
        schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("day", T.DateType()),
            ]
        ),
        partition_spec=[{"column": "day", "transform": "year"}],
    )
    df = spark.createDataFrame(
        [(1, "2020-03-04"), (2, "2021-07-08")], "id long, day string"
    ).select("id", F.col("day").cast("date").alias("day"))
    src = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(src)
    import glob

    insert(t, sorted(glob.glob(src + "/*.parquet")))
    dest = str(tmp_path / "ice")
    summary = export_iceberg(t, dest)
    files = iceberg_data_files(summary["metadata_file"])
    years = {f["partition"]["day_year"] for f in files}
    assert years <= {50, 51}  # 2020-1970, 2021-1970


def test_bucket_partition_exported_with_iceberg_murmur3(spark, tmp_path):
    """bucket[N] partition values are Iceberg's murmur3 bucket ids
    (spec Appendix B), so the exported spec RETAINS the field and each
    file's partition value matches what an Iceberg reader would
    compute for every row in that file."""
    import pyarrow.parquet as pq

    from ice_spark.catalog.iceberg_transforms import bucket_value

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.b",
        schema=T.StructType([T.StructField("id", T.LongType())]),
        partition_spec=[{"column": "id", "transform": "bucket[4]"}],
    )
    df = spark.range(0, 20)
    src = str(tmp_path / "b.parquet")
    df.coalesce(1).write.parquet(src)
    import glob

    insert(t, sorted(glob.glob(src + "/*.parquet")))
    summary = export_iceberg(t, str(tmp_path / "ice"))
    meta = read_iceberg_metadata(summary["metadata_file"])
    fields = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in fields] == ["bucket[4]"]
    files = iceberg_data_files(summary["metadata_file"])
    assert sum(f["record_count"] for f in files) == 20
    seen = set()
    for f in files:
        bid = f["partition"]["id_bucket_4"]
        seen.add(bid)
        ids = pq.read_table(f["file_path"]).column("id").to_pylist()
        assert ids, f["file_path"]
        for v in ids:
            assert bucket_value(v, 4, T.LongType()) == bid
    assert len(seen) > 1  # 20 ids actually spread over buckets


def test_numeric_truncate_partition_exported(spark, tmp_path):
    """truncate[W] on a long column is Iceberg floor-mod truncation
    and survives export with per-file values intact."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.tr",
        schema=T.StructType([T.StructField("id", T.LongType())]),
        partition_spec=[{"column": "id", "transform": "truncate[10]"}],
    )
    df = spark.range(-15, 25)
    src = str(tmp_path / "tr.parquet")
    df.coalesce(1).write.parquet(src)
    import glob

    insert(t, sorted(glob.glob(src + "/*.parquet")))
    summary = export_iceberg(t, str(tmp_path / "ice"))
    meta = read_iceberg_metadata(summary["metadata_file"])
    fields = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in fields] == ["truncate[10]"]
    files = iceberg_data_files(summary["metadata_file"])
    vals = {f["partition"]["id_truncate_10"] for f in files}
    assert vals == {-20, -10, 0, 10, 20}  # floor semantics: -15 -> -20


def test_schema_conversion_nested():
    st = T.StructType(
        [
            T.StructField("a", T.LongType(), nullable=False),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("props", T.MapType(T.StringType(), T.DoubleType())),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.IntegerType())]),
            ),
        ]
    )
    ice = spark_to_iceberg_schema(st)
    assert ice["fields"][0]["required"] is True
    assert ice["fields"][1]["type"]["type"] == "list"
    assert ice["fields"][2]["type"]["type"] == "map"
    assert ice["fields"][3]["type"]["type"] == "struct"
    # all ids unique across nesting
    ids = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    ids.append(f["id"])
                    walk(f["type"])
            elif t.get("type") == "list":
                ids.append(t["element-id"])
                walk(t["element"])
            elif t.get("type") == "map":
                ids.append(t["key-id"])
                ids.append(t["value-id"])
                walk(t["key"])
                walk(t["value"])

    walk({"type": "struct", "fields": ice["fields"]})
    assert len(ids) == len(set(ids))


def test_export_mirrors_shards_o_metadata(tmp_path):
    """Export cost is O(distinct shards), not O(snapshots x files):
    a 50-commit metadata-only table exports exactly one Avro manifest
    per internal shard, shared across all 50 manifest lists."""
    from ice_spark.catalog.fileio import InMemoryFileIO
    from ice_spark.catalog.iceberg_export import export_iceberg
    from ice_spark.catalog.table import Table
    from tests.test_manifest_sharding import SCHEMA as MSCHEMA
    from tests.test_manifest_sharding import entries_for_day

    io = InMemoryFileIO()
    Table.create(
        None, "/wh/ns/t", MSCHEMA, partition_spec=[{"column": "day"}], io=io
    )
    t = Table(None, "/wh/ns/t", io=io)
    for day in range(50):
        t.append_snapshot(entries_for_day(day, 100))
    summary = export_iceberg(t, str(tmp_path / "ice"))
    assert summary["snapshots"] == 50
    assert summary["manifests"] == 50  # one per SHARD, not per (snap, file)
    assert summary["files"] == 5000
    # current snapshot's manifest list references all 50 shards
    files = iceberg_data_files(summary["metadata_file"])
    assert len(files) == 5000
    assert {f["partition"]["day"] for f in files} == set(range(50))


def test_pre_spec_bucket_values_dropped_not_mislabeled(spark, tmp_path):
    """A table whose partition values predate the Iceberg-spec
    transform implementation (no transform-impl stamp) must export
    WITHOUT the bucket field — mislabeling Spark-hash values as spec
    murmur3 would make foreign readers prune wrongly."""
    import glob
    import json as _json

    from pyspark.sql import types as T

    from ice_spark.catalog import Catalog
    from ice_spark.catalog.iceberg_export import export_iceberg
    from ice_spark.ingest.insert import insert

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.old",
        schema=T.StructType([T.StructField("id", T.LongType())]),
        partition_spec=[{"column": "id", "transform": "bucket[4]"}],
    )
    src = str(tmp_path / "s.parquet")
    spark.range(0, 20).coalesce(1).write.parquet(src)
    insert(t, sorted(glob.glob(src + "/*.parquet")))

    # simulate a pre-stamp table: remove the marker
    def strip(meta):
        meta.get("properties", {}).pop("transform-impl", None)
        return meta

    t.refresh().commit(strip)

    out = export_iceberg(t.refresh(), str(tmp_path / "ice_old"))
    meta = _json.loads(open(out["metadata_file"]).read())
    fields = meta["partition-specs"][0]["fields"]
    assert fields == []  # bucket dropped, not mislabeled

    # stamped table (the default) keeps the field
    t2 = cat.create_table(
        "ns.new",
        schema=T.StructType([T.StructField("id", T.LongType())]),
        partition_spec=[{"column": "id", "transform": "bucket[4]"}],
    )
    insert(t2, sorted(glob.glob(src + "/*.parquet")))
    out2 = export_iceberg(t2.refresh(), str(tmp_path / "ice_new"))
    meta2 = _json.loads(open(out2["metadata_file"]).read())
    assert [f["transform"] for f in meta2["partition-specs"][0]["fields"]] == [
        "bucket[4]"
    ]


def test_evolved_partition_field_dropped_from_export(spark, tmp_path):
    """Files from before add_partition_field have no value for the new
    field; exporting it would null-prune them in foreign readers."""
    import glob
    import json as _json

    from pyspark.sql import types as T

    from ice_spark.catalog import Catalog
    from ice_spark.catalog.alter import add_partition_field
    from ice_spark.catalog.iceberg_export import export_iceberg
    from ice_spark.ingest.insert import insert

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.evolved",
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("c", T.StringType())]
        ),
    )
    src = str(tmp_path / "s.parquet")
    spark.createDataFrame([(1, "x"), (2, "y")], t.schema).coalesce(1).write.parquet(src)
    insert(t, sorted(glob.glob(src + "/*.parquet")))
    add_partition_field(t.refresh(), "c")
    src2 = str(tmp_path / "s2.parquet")
    spark.createDataFrame([(3, "z")], t.schema).coalesce(1).write.parquet(src2)
    insert(t.refresh(), sorted(glob.glob(src2 + "/*.parquet")))

    out = export_iceberg(t.refresh(), str(tmp_path / "ice"))
    meta = _json.loads(open(out["metadata_file"]).read())
    names = [f["name"] for f in meta["partition-specs"][0]["fields"]]
    assert "c" not in names  # pre-evolution files can't carry it honestly


def test_renamed_column_exports_name_mapping(spark, tmp_path):
    """Old files carry old physical names; the export must emit
    schema.name-mapping.default listing every historical name per
    field-id so foreign readers project them correctly."""
    import glob
    import json as _json

    from pyspark.sql import types as T

    from ice_spark.catalog import Catalog
    from ice_spark.catalog.alter import rename_column
    from ice_spark.catalog.iceberg_export import export_iceberg
    from ice_spark.ingest.insert import insert

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.renamed",
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("old", T.StringType())]
        ),
    )
    src = str(tmp_path / "s.parquet")
    spark.createDataFrame([(1, "x")], t.schema).coalesce(1).write.parquet(src)
    insert(t, sorted(glob.glob(src + "/*.parquet")))
    rename_column(t.refresh(), "old", "mid")
    rename_column(t.refresh(), "mid", "new")

    out = export_iceberg(t.refresh(), str(tmp_path / "ice"))
    meta = _json.loads(open(out["metadata_file"]).read())
    mapping = _json.loads(meta["properties"]["schema.name-mapping.default"])
    by_names = {tuple(m["names"]): m["field-id"] for m in mapping}
    assert ("new", "mid", "old") in by_names  # full lineage, newest first
    assert ("id",) in by_names
