"""exact_median property tests: the two-pass narrowing must produce
the true lower median on adversarial shapes — duplicates piled on a
bucket boundary, single element, all-equal, even/odd counts, values
spanning many buckets and values inside one bucket."""

from __future__ import annotations

import random

import pytest

from ice_spark.operators.median import exact_median

CASES = {
    "single": [7],
    "two": [10, 20],  # lower median = 10
    "all_equal": [5] * 100,
    "boundary_pile": [65536] * 50 + [65535] * 50 + [0, 1, 2],
    "one_bucket": list(range(100, 200)),
    "wide": [i * 100_000 for i in range(1, 202)],
    "dups_even": [1, 1, 2, 2],
    "skewed": [0] * 999 + [10_000_000],
}


def _lower_median(vals: list[int]) -> int:
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


@pytest.mark.parametrize("name", sorted(CASES))
def test_exact_median_cases(spark, name):
    vals = CASES[name]
    df = spark.createDataFrame([(v,) for v in vals], ["cents"])
    row = exact_median(df, "cents").collect()[0]
    assert row.median_cents == _lower_median(vals), name
    assert row.rank_certified, name
    assert row.n == len(vals)


def test_exact_median_random(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = rng.randint(1, 500)
        vals = [rng.randint(0, 3_000_000) for _ in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], ["cents"])
        row = exact_median(df, "cents").collect()[0]
        assert row.median_cents == _lower_median(vals), f"trial {trial}"
        assert row.rank_certified


def test_group_percentiles_null_parity(spark):
    """exact_group_percentiles must SKIP nulls like F.percentile does
    (r11 ADVICE: the pre-fix form counted null rows in __n and the
    window sorted them first — wrong answers on nullable columns), and
    all-null groups must still appear with a null percentile."""
    from pyspark.sql import functions as F

    from ice_spark.operators.median import exact_group_percentiles

    rng = random.Random(12)
    rows = []
    for g in ["a", "b", "c"]:
        for _ in range(rng.randint(5, 40)):
            v = None if rng.random() < 0.3 else rng.randint(0, 10_000) / 100.0
            rows.append((g, v))
    rows.append(("allnull", None))
    rows.append(("allnull", None))
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [("p25", 0.25), ("p50", 0.5), ("p95", 0.95)]
    got = {
        r["g"]: (r["p25"], r["p50"], r["p95"])
        for r in exact_group_percentiles(df, "g", "v", ps).collect()
    }
    want = {
        r["g"]: (r["p25"], r["p50"], r["p95"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", 0.25).alias("p25"),
            F.percentile("v", 0.5).alias("p50"),
            F.percentile("v", 0.95).alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(want) == {"a", "b", "c", "allnull"}
    assert got["allnull"] == (None, None, None)
    for g in ["a", "b", "c"]:
        assert got[g] == want[g], g  # bit-for-bit, not approx


def test_group_percentiles_null_group_key(spark):
    """A NULL group KEY is a real group to both groupBy and
    F.percentile; the cum/n join must use eqNullSafe so the null
    group's value rows reach the final aggregation (r12 ADVICE: plain
    equi-join dropped them — null percentiles for a group with real
    values)."""
    from pyspark.sql import functions as F

    from ice_spark.operators.median import exact_group_percentiles

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0),
        (None, 10.0), (None, 20.0), (None, 30.0), (None, None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [("p50", 0.5), ("p90", 0.9)]
    got = {
        r["g"]: (r["p50"], r["p90"])
        for r in exact_group_percentiles(df, "g", "v", ps).collect()
    }
    want = {
        r["g"]: (r["p50"], r["p90"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", 0.5).alias("p50"),
            F.percentile("v", 0.9).alias("p90"),
        )
        .collect()
    }
    assert set(got) == set(want) == {"a", None}
    for g in got:
        assert got[g] == pytest.approx(want[g]), (g, got[g], want[g])
