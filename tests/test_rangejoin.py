"""Bucketized range join == naive BETWEEN join, including intervals
spanning many buckets, boundary exclusivity, and key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ice_spark.operators.rangejoin import bucketed_range_join

TS = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("eid", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
IV = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("wid", T.LongType()),
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
    ]
)


def _t(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_matches_naive_join(spark):
    events = [
        (1, 1, _t(0)),
        (1, 2, _t(5)),
        (1, 3, _t(29.9)),
        (1, 4, _t(30)),  # boundary: end-exclusive
        (2, 5, _t(5)),  # other key, inside window times
        (1, 6, _t(175)),  # inside the long interval
    ]
    intervals = [
        (1, 10, _t(0), _t(30)),  # exactly one bucket width
        (1, 11, _t(100), _t(200)),  # spans many 10-min buckets
        (2, 12, _t(1000), _t(1010)),  # no matching events
    ]
    left = spark.createDataFrame(events, TS)
    iv = spark.createDataFrame(intervals, IV)

    got = {
        (r.eid, r.wid)
        for r in bucketed_range_join(
            left, iv, ["k"], "ts", "start", "end", bucket_seconds=600
        ).collect()
    }
    naive = {
        (r.eid, r.wid)
        for r in left.join(iv, "k")
        .where((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    assert got == naive
    assert got == {(1, 10), (2, 10), (3, 10), (6, 11)}


def test_no_duplicate_pairs_when_interval_spans_buckets(spark):
    left = spark.createDataFrame([(1, 1, _t(50))], TS)
    iv = spark.createDataFrame([(1, 9, _t(0), _t(100))], IV)
    rows = bucketed_range_join(
        left, iv, ["k"], "ts", "start", "end", bucket_seconds=60
    ).collect()
    assert len(rows) == 1
