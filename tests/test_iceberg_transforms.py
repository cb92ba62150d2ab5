"""Iceberg-spec bucket/truncate transforms: pure-Python oracle vs the
published spec reference values, and the JVM-side Column expressions
vs the oracle (the two implementations must be byte-identical — the
expression path writes partition values; the Python path writes the
exported Iceberg metadata)."""

import datetime
import decimal
import random
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.catalog.iceberg_transforms import (
    bucket_expr,
    bucket_value,
    murmur3_32,
    truncate_expr,
    truncate_value,
)


class TestSpecReferenceValues:
    """Hash values published in the Iceberg Table Spec, Appendix B
    ("Bucket transform details" table)."""

    def test_int_34(self):
        assert murmur3_32(struct.pack("<q", 34)) == 2017239379

    def test_long_34(self):
        assert murmur3_32(struct.pack("<q", 34)) == 2017239379

    def test_string_iceberg(self):
        assert murmur3_32(b"iceberg") == 1210000089

    def test_date(self):
        days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
        assert murmur3_32(struct.pack("<q", days)) == -653330422

    def test_decimal_14_20(self):
        d = decimal.Decimal("14.20")
        unscaled = int(d.scaleb(2))
        assert murmur3_32(unscaled.to_bytes(2, "big", signed=True)) == -500754589

    def test_timestamp(self):
        micros = int(
            (
                datetime.datetime(2017, 11, 16, 22, 31, 8, tzinfo=datetime.timezone.utc)
                - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            ).total_seconds()
            * 1_000_000
        )
        assert murmur3_32(struct.pack("<q", micros)) == -2047944441

    def test_empty_bytes(self):
        assert murmur3_32(b"") == 0

    def test_bucket_id_positive(self):
        # bucket = (hash & Integer.MAX_VALUE) % N, never negative
        for v in (-1, 0, 34, 2**40, -(2**40)):
            b = bucket_value(v, 16, T.LongType())
            assert 0 <= b < 16


class TestExprMatchesOracle:
    def test_long_bucket(self, spark):
        random.seed(3)
        vals = [random.randint(-(2**62), 2**62) for _ in range(300)] + [0, 1, -1, 34]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = [
            r.b
            for r in df.select(bucket_expr(F.col("v"), T.LongType(), 16).alias("b")).collect()
        ]
        assert got == [bucket_value(v, 16, T.LongType()) for v in vals]

    def test_int_bucket(self, spark):
        random.seed(4)
        vals = [random.randint(-(2**31), 2**31 - 1) for _ in range(100)]
        df = spark.createDataFrame([(v,) for v in vals], "v int")
        got = [
            r.b
            for r in df.select(bucket_expr(F.col("v"), T.IntegerType(), 7).alias("b")).collect()
        ]
        assert got == [bucket_value(v, 7, T.IntegerType()) for v in vals]

    def test_date_bucket(self, spark):
        random.seed(5)
        vals = [
            datetime.date(1970, 1, 1) + datetime.timedelta(days=random.randint(-20000, 40000))
            for _ in range(60)
        ]
        df = spark.createDataFrame([(v,) for v in vals], "v date")
        got = [
            r.b
            for r in df.select(bucket_expr(F.col("v"), T.DateType(), 16).alias("b")).collect()
        ]
        assert got == [bucket_value(v, 16, T.DateType()) for v in vals]

    def test_string_bucket(self, spark):
        vals = ["iceberg", "", "héllo wörld", "a" * 200, None]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = [
            r.b
            for r in df.select(bucket_expr(F.col("v"), T.StringType(), 16).alias("b")).collect()
        ]
        assert got == [
            bucket_value(v, 16, T.StringType()) if v is not None else None for v in vals
        ]

    def test_null_long_bucket(self, spark):
        df = spark.createDataFrame([(None,), (34,)], "v long")
        got = [
            r.b
            for r in df.select(bucket_expr(F.col("v"), T.LongType(), 16).alias("b")).collect()
        ]
        assert got[0] is None and got[1] is not None

    def test_long_truncate_floor(self, spark):
        vals = [-15, -10, -7, -1, 0, 1, 9, 10, 23]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = [
            r.t
            for r in df.select(truncate_expr(F.col("v"), T.LongType(), 10).alias("t")).collect()
        ]
        assert got == [-20, -10, -10, -10, 0, 0, 0, 10, 20]
        assert got == [truncate_value(v, 10, T.LongType()) for v in vals]

    def test_decimal_truncate(self, spark):
        dt = T.DecimalType(9, 2)
        vals = [decimal.Decimal("12.34"), decimal.Decimal("-0.05"), None]
        df = spark.createDataFrame(
            [(v,) for v in vals], T.StructType([T.StructField("v", dt)])
        )
        got = [r.t for r in df.select(truncate_expr(F.col("v"), dt, 50).alias("t")).collect()]
        # truncate W applies to the UNSCALED value: 1234 -> 1200, -5 -> -50
        assert got == [decimal.Decimal("12.00"), decimal.Decimal("-0.50"), None]

    def test_unsupported_type_raises(self):
        with pytest.raises(ValueError):
            bucket_expr(F.col("v"), T.DoubleType(), 4)
