"""Iceberg import (reverse bridge): register a foreign Iceberg v2
table and query it through the engine — the pyiceberg-cross-client
property (ice_scan.py) in the other direction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.iceberg_export import export_iceberg
from ice_spark.catalog.iceberg_import import (
    iceberg_to_spark_schema,
    register_iceberg_table,
)
from ice_spark.ingest import insert


def test_schema_conversion_roundtrip():
    ice = {
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "a", "required": True, "type": "long"},
            {"id": 2, "name": "b", "required": False, "type": "string"},
            {"id": 3, "name": "c", "required": False, "type": "decimal(12, 2)"},
            {
                "id": 4,
                "name": "tags",
                "required": False,
                "type": {
                    "type": "list",
                    "element-id": 5,
                    "element": "string",
                    "element-required": False,
                },
            },
            {
                "id": 6,
                "name": "nested",
                "required": False,
                "type": {
                    "type": "struct",
                    "fields": [
                        {"id": 7, "name": "x", "required": True, "type": "int"}
                    ],
                },
            },
        ],
    }
    st = iceberg_to_spark_schema(ice)
    assert st["a"].dataType == T.LongType() and not st["a"].nullable
    assert st["c"].dataType == T.DecimalType(12, 2)
    assert st["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert st["nested"].dataType["x"].dataType == T.IntegerType()

    with pytest.raises(ValueError, match="unsupported"):
        iceberg_to_spark_schema(
            {"fields": [{"id": 1, "name": "z", "type": "wat", "required": False}]}
        )


def test_export_import_roundtrip(spark, tmp_path):
    """ice_spark writes Iceberg, a 'foreign' catalog imports it and
    serves identical rows, with column-bound pruning intact."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.src",
        schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("grp", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        ),
        partition_spec=[{"column": "grp"}],
    )
    df = spark.range(0, 60).select(
        "id",
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        (F.col("id") * 2.0).alias("val"),
    )
    import glob

    src = str(tmp_path / "in.parquet")
    df.coalesce(2).write.parquet(src)
    insert(t, sorted(glob.glob(src + "/*.parquet")))

    summary = export_iceberg(t, str(tmp_path / "ice"))

    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    cat2.create_namespace("ext")
    imp = register_iceberg_table(cat2, "ext.src", summary["metadata_file"])

    ours = {tuple(r) for r in t.read().collect()}
    theirs = {tuple(r) for r in imp.read().collect()}
    assert ours == theirs

    # identity partition values survive -> partition pruning works
    planned = imp.plan_files([{"name": "grp", "op": "equals", "values": ["g1"]}])
    assert planned and all(e["partition"]["grp"] == "g1" for e in planned)
    assert len(planned) < len(imp.files())

    # column bounds survive -> bound pruning works on imported entries
    some = imp.plan_files([{"name": "id", "op": "greater_than", "values": [999]}])
    assert some == []  # max id is 59: every file pruned by bounds

    # imported files are external: purge-style ops must never delete them
    assert all(e.get("external") for e in imp.files())


def test_import_refuses_delete_manifests(spark, tmp_path):
    """v2 merge-on-read tables (delete manifests) are rejected loudly."""
    import json

    from ice_spark.catalog.iceberg_import import iceberg_table_entries
    from ice_spark.sources import avro_io
    from ice_spark.catalog.iceberg_export import MANIFEST_LIST_SCHEMA

    meta_dir = tmp_path / "t" / "metadata"
    meta_dir.mkdir(parents=True)
    ml = str(meta_dir / "snap-1.avro")
    avro_io.write_container(
        ml,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": str(meta_dir / "m1.avro"),
                "manifest_length": 0,
                "partition_spec_id": 0,
                "content": 1,  # DELETES manifest
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "added_files_count": 0,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": None,
                "key_metadata": None,
            }
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "u",
        "location": str(tmp_path / "t"),
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 1,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [{"id": 1, "name": "id", "required": False, "type": "long"}],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 0,
                "manifest-list": ml,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
    }
    mf = str(meta_dir / "v1.metadata.json")
    with open(mf, "w") as f:
        json.dump(metadata, f)
    with pytest.raises(ValueError, match="delete manifests|merge-on-read"):
        iceberg_table_entries(mf)


def test_cli_iceberg_roundtrip(spark, tmp_path, capsys, monkeypatch):
    """CLI surface: export-iceberg -> describe-metadata (Iceberg
    drill-down) -> register-iceberg, end to end."""
    import glob
    import json

    import ice_spark.session as session_mod
    from ice_spark.cli import main

    # the CLI builds its own session; reuse the test session
    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.t",
        schema=T.StructType([T.StructField("id", T.LongType())]),
    )
    src = str(tmp_path / "s.parquet")
    spark.range(0, 30).coalesce(1).write.parquet(src)
    insert(t, sorted(glob.glob(src + "/*.parquet")))

    dest = str(tmp_path / "ice")
    assert main(["--warehouse", wh, "export-iceberg", "ns.t", dest]) == 0
    out = json.loads(capsys.readouterr().out)
    meta_file = out["metadata_file"]

    assert main(["--warehouse", wh, "describe-metadata", meta_file]) == 0
    desc = json.loads(capsys.readouterr().out)
    assert desc["summary"]["format_version"] == 2
    assert desc["snapshots"][0]["manifests"][0]["files"]

    cat.create_namespace("ext")
    assert main(["--warehouse", wh, "register-iceberg", "ext.t", meta_file]) == 0
    reg = json.loads(capsys.readouterr().out)
    assert reg["records"] == 30
    assert cat.load_table("ext.t").read().count() == 30


def test_import_file_uri_paths(spark, tmp_path):
    """Real Iceberg writers emit file:/// URIs for metadata and data
    paths; the import must resolve them (and reject remote schemes
    loudly instead of fabricating garbage paths)."""
    import json

    from ice_spark.catalog.iceberg_import import _local_path, iceberg_table_entries

    base = str(tmp_path / "t")
    assert _local_path(f"file://{base}/metadata/m.avro", base) == f"{base}/metadata/m.avro"
    assert _local_path("metadata/m.avro", base) == f"{base}/metadata/m.avro"
    assert _local_path(f"{base}/metadata/m.avro", base) == f"{base}/metadata/m.avro"
    with pytest.raises(ValueError, match="cannot read s3://"):
        _local_path("s3://bucket/metadata/m.avro", base)

    # end to end: rewrite an exported table's metadata to file:// URIs
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ns")
    t = cat.create_table(
        "ns.u", schema=T.StructType([T.StructField("id", T.LongType())])
    )
    import glob

    src = str(tmp_path / "s.parquet")
    spark.range(0, 12).coalesce(1).write.parquet(src)
    insert(t, sorted(glob.glob(src + "/*.parquet")))
    summary = export_iceberg(t, str(tmp_path / "ice"))
    with open(summary["metadata_file"]) as f:
        meta = json.load(f)
    for s in meta["snapshots"]:
        s["manifest-list"] = "file://" + s["manifest-list"]
    uri_meta = str(tmp_path / "ice" / "metadata" / "v2.metadata.json")
    with open(uri_meta, "w") as f:
        json.dump(meta, f)
    schema, entries = iceberg_table_entries(uri_meta)
    assert sum(e["records"] for e in entries) == 12
    assert all(e["path"].startswith("/") for e in entries)


def test_import_spec_complete_foreign_fixture(spark, tmp_path):
    """A hand-synthesized foreign Iceberg v2 table — built straight
    from the public Table Spec, NOT by our exporter — covering shapes
    the exporter never emits: EXISTING (status=0) and DELETED
    (status=2) manifest entries, required fields, field-id-keyed
    bounds, identity partition values in the manifest's partition
    record. Import must serve exactly the live rows and keep bound
    pruning working."""
    import json
    import struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ice_spark.catalog.iceberg_export import MANIFEST_LIST_SCHEMA
    from ice_spark.catalog.iceberg_import import iceberg_table_entries
    from ice_spark.sources import avro_io

    root = tmp_path / "foreign"
    meta_dir = root / "metadata"
    data_dir = root / "data"
    meta_dir.mkdir(parents=True)
    data_dir.mkdir(parents=True)

    # two live data files (one per partition) + one dropped file
    files = {}
    for name, cat, ids in [
        ("a.parquet", "x", [1, 2, 3]),
        ("b.parquet", "y", [10, 11]),
        ("dropped.parquet", "x", [99]),
    ]:
        p = str(data_dir / name)
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()), "cat": [cat] * len(ids)}), p
        )
        files[name] = (p, cat, ids)

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {"name": "file_path", "type": "string", "field-id": 100},
                        {"name": "file_format", "type": "string", "field-id": 101},
                        {
                            "name": "partition",
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": [
                                    {"name": "cat", "type": ["null", "string"], "default": None, "field-id": 1000}
                                ],
                            },
                            "field-id": 102,
                        },
                        {"name": "record_count", "type": "long", "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                        {
                            "name": "lower_bounds",
                            "type": ["null", {"type": "array", "items": {
                                "type": "record", "name": "k126_v127",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 126},
                                    {"name": "value", "type": "bytes", "field-id": 127},
                                ]}, "logicalType": "map"}],
                            "default": None,
                            "field-id": 125,
                        },
                        {
                            "name": "upper_bounds",
                            "type": ["null", {"type": "array", "items": {
                                "type": "record", "name": "k129_v130",
                                "fields": [
                                    {"name": "key", "type": "int", "field-id": 129},
                                    {"name": "value", "type": "bytes", "field-id": 130},
                                ]}, "logicalType": "map"}],
                            "default": None,
                            "field-id": 128,
                        },
                    ],
                },
                "field-id": 2,
            },
        ],
    }

    def entry(status, name):
        p, cat, ids = files[name]
        return {
            "status": status,
            "snapshot_id": 77,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                "file_path": p,
                "file_format": "PARQUET",
                "partition": {"cat": cat},
                "record_count": len(ids),
                "file_size_in_bytes": 100,
                "lower_bounds": [{"key": 1, "value": struct.pack("<q", min(ids))}],
                "upper_bounds": [{"key": 1, "value": struct.pack("<q", max(ids))}],
            },
        }

    m_path = str(meta_dir / "m-foreign.avro")
    avro_io.write_container(
        m_path,
        entry_schema,
        [entry(1, "a.parquet"), entry(0, "b.parquet"), entry(2, "dropped.parquet")],
    )
    ml_path = str(meta_dir / "snap-77.avro")
    avro_io.write_container(
        ml_path,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": m_path,
                "manifest_length": 1000,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 77,
                "added_files_count": 1,
                "existing_files_count": 1,
                "deleted_files_count": 1,
                "added_rows_count": 3,
                "existing_rows_count": 2,
                "deleted_rows_count": 1,
                "partitions": None,
                "key_metadata": None,
            }
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "11111111-2222-3333-4444-555555555555",
        "location": str(root),
        "last-sequence-number": 1,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": True, "type": "long"},
                    {"id": 2, "name": "cat", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {"name": "cat", "transform": "identity", "source-id": 2, "field-id": 1000}
                ],
            }
        ],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 77,
        "snapshots": [
            {
                "snapshot-id": 77,
                "sequence-number": 1,
                "timestamp-ms": 1700000000000,
                "manifest-list": ml_path,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
    }
    mf = str(meta_dir / "v3.metadata.json")
    with open(mf, "w") as f:
        json.dump(metadata, f)

    schema, entries = iceberg_table_entries(mf)
    # DELETED entry skipped; ADDED + EXISTING live
    assert len(entries) == 2
    assert sum(e["records"] for e in entries) == 5
    assert {e["partition"]["cat"] for e in entries} == {"x", "y"}
    # bounds decoded from field-id keyed byte maps
    by_cat = {e["partition"]["cat"]: e for e in entries}
    assert by_cat["x"]["column_metrics"]["id"] == {"min": 1, "max": 3}
    assert by_cat["y"]["column_metrics"]["id"] == {"min": 10, "max": 11}

    # end to end through the catalog: rows + pruning
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ext")
    imp = register_iceberg_table(cat, "ext.foreign", mf)
    assert imp.read().count() == 5
    got = {(r.id, r.cat) for r in imp.read().collect()}
    assert got == {(1, "x"), (2, "x"), (3, "x"), (10, "y"), (11, "y")}
    assert (99, "x") not in got  # dropped file's rows absent
    planned = imp.plan_files([{"name": "id", "op": "greater_than", "values": [5]}])
    assert len(planned) == 1 and planned[0]["partition"]["cat"] == "y"
