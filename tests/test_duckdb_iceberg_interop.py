"""Cross-engine interop: exported Iceberg tables read by DuckDB.

Reference parity: the reference's headline property is that its tables
are readable by ANY Iceberg client (ClickHouse/pyiceberg ITs,
ice-rest-catalog/src/test/java/.../DockerLocalFileIOClickHouseIT.java,
ice-rest-catalog/src/test/pyiceberg/ice_scan.py). This module drives
the sandbox's own oracle engine — DuckDB's `iceberg` extension — as a
second REAL reader over repo-written Iceberg metadata, mirroring the
pyiceberg suite's three round-trips (plain / bucket[4] / renamed
column).

Probed r9: `INSTALL iceberg` needs network (the sandbox blocks
extensions.duckdb.org, exactly like pip for pyiceberg), so these tests
skip loudly in this environment. In any environment where the
extension is present (or installable) they run for real with zero new
Python dependencies — DuckDB itself is already the correctness-gate
oracle engine.
"""

from __future__ import annotations

import glob

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.catalog.catalog import Catalog
from ice_spark.catalog.iceberg_export import export_iceberg
from ice_spark.ingest.insert import insert


def _iceberg_con():
    con = duckdb.connect()
    try:
        con.execute("LOAD iceberg")
    except Exception:
        try:
            con.execute("INSTALL iceberg")
            con.execute("LOAD iceberg")
        except Exception as e:  # pragma: no cover - environment-dependent
            pytest.skip(f"duckdb iceberg extension unavailable (needs network): {e}")
    return con


def _duckdb_rows(metadata_file: str) -> list[tuple]:
    con = _iceberg_con()
    rel = con.sql(f"SELECT * FROM iceberg_scan('{metadata_file}')")
    cols = sorted(rel.columns)
    ordered = con.sql(
        f"SELECT {', '.join(cols)} FROM iceberg_scan('{metadata_file}')"
    )
    return sorted(tuple(r) for r in ordered.fetchall())


def _spark_rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _ingest(spark, t, df, tmp_path, name):
    src = str(tmp_path / f"{name}.parquet")
    df.coalesce(1).write.parquet(src)
    insert(t.refresh(), sorted(glob.glob(src + "/*.parquet")))


def test_plain_table_row_parity(spark, cat, tmp_path):
    t = cat.create_table(
        "ns.plain",
        schema=T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("price", T.DoubleType()),
            ]
        ),
    )
    df = spark.range(0, 50).select(
        "id",
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        (F.col("id") * 2.5).alias("price"),
    )
    _ingest(spark, t, df, tmp_path, "plain")
    summary = export_iceberg(cat.load_table("ns.plain"), str(tmp_path / "ice_plain"))
    assert _duckdb_rows(summary["metadata_file"]) == _spark_rows(
        cat.load_table("ns.plain").read()
    )


def test_bucket_partitioned_row_parity(spark, cat, tmp_path):
    """bucket[4] partition values are Iceberg murmur3 ids — a real
    Iceberg reader must accept the spec AND return every row."""
    t = cat.create_table(
        "ns.bucketed",
        schema=T.StructType([T.StructField("id", T.LongType())]),
        partition_spec=[{"column": "id", "transform": "bucket[4]"}],
    )
    _ingest(spark, t, spark.range(0, 40), tmp_path, "bucketed")
    summary = export_iceberg(
        cat.load_table("ns.bucketed"), str(tmp_path / "ice_bucketed")
    )
    assert _duckdb_rows(summary["metadata_file"]) == _spark_rows(
        cat.load_table("ns.bucketed").read()
    )


def test_renamed_column_row_parity(spark, cat, tmp_path):
    """Rename after ingest: files on disk carry the OLD column name;
    the export maps them onto the current schema, and DuckDB must
    surface the NEW name with the old files' data."""
    from ice_spark.catalog.alter import apply_operations

    t = cat.create_table(
        "ns.renamed",
        schema=T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
        ),
    )
    _ingest(
        spark,
        t,
        spark.range(0, 25).select("id", (F.col("id") * 3).alias("val")),
        tmp_path,
        "renamed",
    )
    apply_operations(
        t.refresh(), [{"rename_column": {"name": "val", "new_name": "amount"}}]
    )
    t = cat.load_table("ns.renamed")
    assert "amount" in t.read().columns
    summary = export_iceberg(t, str(tmp_path / "ice_renamed"))
    rows = _duckdb_rows(summary["metadata_file"])
    assert rows == _spark_rows(t.read())
    con = _iceberg_con()
    cols = [
        r[0]
        for r in con.sql(
            "DESCRIBE SELECT * FROM iceberg_scan("
            f"'{summary['metadata_file']}')"
        ).fetchall()
    ]
    assert "amount" in cols
