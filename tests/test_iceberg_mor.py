"""Merge-on-read scan of foreign Iceberg v2 tables with delete files.

Fixture is hand-built from the public Table Spec (same approach as
tests/test_iceberg_import.py's foreign fixture): data manifests plus a
delete manifest carrying one position-delete file and one
equality-delete file, with sequence numbers arranged so every spec
rule is exercised:

- position delete seq=2 applies to data seq=1 (2 >= 1) but NOT to
  data seq=3 (2 < 3);
- equality delete seq=2 applies to data seq=1 (2 > 1) but NOT to
  data seq=3 — a row re-inserted after the delete survives.
"""

from __future__ import annotations

import json
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ice_spark.catalog.iceberg_export import (
    MANIFEST_LIST_SCHEMA,
    manifest_entry_schema,
)
from ice_spark.catalog.iceberg_mor import iceberg_scan_files, read_iceberg_mor
from ice_spark.sources import avro_io


def _entry(path, *, content, seq, records, equality_ids=None):
    return {
        "status": 1,
        "snapshot_id": 9,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": records,
            "file_size_in_bytes": 128,
            "column_sizes": None,
            "value_counts": None,
            "null_value_counts": None,
            "nan_value_counts": None,
            "lower_bounds": [{"key": 1, "value": struct.pack("<q", 0)}],
            "upper_bounds": [{"key": 1, "value": struct.pack("<q", 1000)}],
            "key_metadata": None,
            "split_offsets": None,
            "equality_ids": equality_ids,
            "sort_order_id": None,
        },
    }


def _manifest_file(path, *, content, seq):
    return {
        "manifest_path": path,
        "manifest_length": 512,
        "partition_spec_id": 0,
        "content": content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": 9,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 1,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,
        "key_metadata": None,
    }


@pytest.fixture()
def mor_table(tmp_path):
    root = tmp_path / "mor"
    meta_dir = root / "metadata"
    data_dir = root / "data"
    meta_dir.mkdir(parents=True)
    data_dir.mkdir(parents=True)

    # data file A (seq 1): ids 1..6
    file_a = str(data_dir / "a.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "val": ["old"] * 6,
            }
        ),
        file_a,
    )
    # data file B (seq 3): re-inserts 5 and 6, adds 100
    file_b = str(data_dir / "b.parquet")
    pq.write_table(
        pa.table(
            {"id": pa.array([5, 6, 100], pa.int64()), "val": ["new"] * 3}
        ),
        file_b,
    )
    # position delete (seq 2): rows 0,1 of A (ids 1,2) AND row 0 of B
    # — the B target must NOT apply (2 < B's seq 3)
    pos_del = str(data_dir / "pos-del.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": [file_a, file_a, file_b],
                "pos": pa.array([0, 1, 0], pa.int64()),
            }
        ),
        pos_del,
    )
    # equality delete (seq 2) on id: 5 and 6 — hits A (seq 1), not B (seq 3)
    eq_del = str(data_dir / "eq-del.parquet")
    pq.write_table(pa.table({"id": pa.array([5, 6], pa.int64())}), eq_del)

    entry_schema = manifest_entry_schema([])
    m_data1 = str(meta_dir / "m-data1.avro")
    avro_io.write_container(
        m_data1, entry_schema, [_entry(file_a, content=0, seq=1, records=6)]
    )
    m_data2 = str(meta_dir / "m-data2.avro")
    avro_io.write_container(
        m_data2, entry_schema, [_entry(file_b, content=0, seq=3, records=3)]
    )
    m_del = str(meta_dir / "m-del.avro")
    avro_io.write_container(
        m_del,
        entry_schema,
        [
            _entry(pos_del, content=1, seq=2, records=3),
            _entry(eq_del, content=2, seq=2, records=2, equality_ids=[1]),
        ],
    )
    ml = str(meta_dir / "snap-9.avro")
    avro_io.write_container(
        ml,
        MANIFEST_LIST_SCHEMA,
        [
            _manifest_file(m_data1, content=0, seq=1),
            _manifest_file(m_data2, content=0, seq=3),
            _manifest_file(m_del, content=1, seq=2),
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee",
        "location": str(root),
        "last-sequence-number": 3,
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "id", "required": True, "type": "long"},
                    {"id": 2, "name": "val", "required": False, "type": "string"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": 9,
        "snapshots": [
            {
                "snapshot-id": 9,
                "sequence-number": 3,
                "timestamp-ms": 1700000000000,
                "manifest-list": ml,
                "summary": {"operation": "overwrite"},
                "schema-id": 0,
            }
        ],
    }
    mf = str(meta_dir / "v4.metadata.json")
    with open(mf, "w") as f:
        json.dump(metadata, f)
    return mf


def test_scan_plan_classifies_files(mor_table):
    schema, parts, data, pos, eq = iceberg_scan_files(mor_table)
    assert schema.fieldNames() == ["id", "val"]
    assert parts == []
    assert sorted(d["seq"] for d in data) == [1, 3]
    assert [p["seq"] for p in pos] == [2]
    assert [(e["seq"], e["names"]) for e in eq] == [(2, ["id"])]


def test_mor_read_applies_both_delete_kinds(spark, mor_table):  # noqa: F811
    rows = {(r.id, r.val) for r in read_iceberg_mor(spark, mor_table).collect()}
    # A: 1,2 position-deleted; 5,6 equality-deleted; 3,4 survive.
    # B: 5,6,100 all survive — eq delete (seq 2) precedes B (seq 3),
    # and the pos-delete row targeting B is ignored for the same reason.
    assert rows == {
        (3, "old"),
        (4, "old"),
        (5, "new"),
        (6, "new"),
        (100, "new"),
    }


def test_mor_plan_is_join_based_no_python(spark, mor_table):  # noqa: F811
    plan = read_iceberg_mor(spark, mor_table)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert bad not in plan


def test_cli_scan_iceberg(spark, mor_table, capsys, monkeypatch, tmp_path):  # noqa: F811
    import ice_spark.session as session_mod
    from ice_spark.cli import main

    monkeypatch.setattr(session_mod, "get_spark", lambda *a, **k: spark)
    wh = str(tmp_path / "wh")
    assert main(["--warehouse", wh, "scan-iceberg", mor_table, "--limit", "10"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert {(r["id"], r["val"]) for r in rows} == {
        (3, "old"),
        (4, "old"),
        (5, "new"),
        (6, "new"),
        (100, "new"),
    }


def test_register_still_rejects_mor(spark, tmp_path, mor_table):  # noqa: F811
    from ice_spark.catalog.catalog import Catalog
    from ice_spark.catalog.iceberg_import import register_iceberg_table

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("ext")
    with pytest.raises(ValueError, match="merge-on-read"):
        register_iceberg_table(cat, "ext.mor", mor_table)
