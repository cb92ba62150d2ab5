"""Cross-engine interop: exported Iceberg tables read by pyiceberg.

Reference parity: the reference's headline property is that its tables
are readable by ANY Iceberg client, proven in its CI with
ClickHouse/pyiceberg integration tests
(ice-rest-catalog/src/test/java/.../DockerLocalFileIOClickHouseIT.java,
ice-rest-catalog/src/test/pyiceberg/ice_scan.py). The repo's own Avro
writer already has a JVM cross-read test (test_iceberg_export.py);
this module adds the second REAL reader: export-iceberg → pyiceberg
StaticTable scan → row parity, including a bucket-partitioned table
and a renamed-column table.

Guarded with skip-if-unavailable: pyiceberg is pip-installable but
not baked into this sandbox; in an environment with pyiceberg these
tests run for real, elsewhere they skip loudly rather than vanish.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

pyiceberg = pytest.importorskip("pyiceberg", reason="pyiceberg not installed")

from ice_spark.catalog.catalog import Catalog  # noqa: E402
from ice_spark.catalog.iceberg_export import export_iceberg  # noqa: E402
from ice_spark.ingest.insert import insert  # noqa: E402


def _pyiceberg_rows(metadata_file: str) -> list[tuple]:
    from pyiceberg.table import StaticTable

    table = StaticTable.from_metadata(metadata_file)
    arrow = table.scan().to_arrow()
    cols = sorted(arrow.column_names)
    data = {c: arrow.column(c).to_pylist() for c in cols}
    n = arrow.num_rows
    return sorted(tuple(data[c][i] for c in cols) for i in range(n))


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
    assert _pyiceberg_rows(summary["metadata_file"]) == _spark_rows(
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
    assert _pyiceberg_rows(summary["metadata_file"]) == _spark_rows(
        cat.load_table("ns.bucketed").read()
    )


def test_renamed_column_row_parity(spark, cat, tmp_path):
    """Rename after ingest: files on disk carry the OLD column name;
    the export maps them onto the current schema, and pyiceberg must
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
    rows = _pyiceberg_rows(summary["metadata_file"])
    assert rows == _spark_rows(t.read())
    # and the new name is what the foreign reader sees
    from pyiceberg.table import StaticTable

    st = StaticTable.from_metadata(summary["metadata_file"])
    assert "amount" in {f.name for f in st.schema().fields}
