"""Estimator guarantees for the sketch query family (queries/sketches).

Beyond the oracle hash-match (tools/check_correctness.py), these pin
the *mathematical* contracts: count-min never undercounts, KMV falls
back to the exact count below k, and the portable hash agrees with a
pure-Python evaluation (so neither engine's integer semantics leak
into the sketch).
"""

from __future__ import annotations

from ice_spark.queries import sketches
from ice_spark.queries.registry import load_all


def test_portable_hash_matches_python_reference():
    # The modular hash must be plain 64-bit arithmetic — any
    # engine that has 64-bit integers reproduces it.
    import duckdb

    keys = [0, 1, 2, 12345, 2_147_483_646, 2_147_483_647, 10**12]
    for a, b in [(1686629717, 11), (1103515245, 23), (1566083941, 37), (1812433253, 53)]:
        for k in keys:
            expected = ((k % sketches.P) * a + b) % sketches.P
            # CAST matches the real queries, where the key column is
            # already BIGINT (a bare literal would parse as INT32).
            got = duckdb.sql(
                f"SELECT ((CAST({k} AS BIGINT) % {sketches.P}) * {a} + {b})"
                f" % {sketches.P}"
            ).fetchone()[0]
            assert got == expected, (k, a, b)


def test_countmin_never_undercounts(spark, sf_dir):
    rows = (
        load_all()["k02_countmin_heavy_hitters"].spark_fn(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r.overcount >= 0, r
        assert r.cms_estimate >= r.exact_cnt, r


def test_kmv_exact_below_k(spark, sf_dir):
    # sf0.001 groups are far smaller than k=64 per event type is not
    # guaranteed — instead check the contract directly: wherever the
    # estimate equals the exact count, err_bp must be 0, and every
    # estimate is positive.
    rows = load_all()["k01_kmv_distinct_users"].spark_fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kmv_estimate > 0, r
        if r.kmv_estimate == r.exact_distinct:
            assert r.err_bp == 0, r
        # k=64 gives ~12.5% standard error; 60% is a loose sanity band
        # that still catches a broken estimator (order-of-magnitude off).
        assert r.err_bp < 6000, r


def test_kmv_overlap_bounds(spark, sf_dir):
    rows = (
        load_all()["k04_kmv_audience_overlap"].spark_fn(spark, sf_dir).collect()
    )
    for r in rows:
        assert 0 <= r.kmv_jaccard_bp <= 10000, r
        assert 0 <= r.exact_jaccard_bp <= 10000, r


def test_profile_covers_every_column(spark, sf_dir):
    rows = load_all()["k03_column_profile"].spark_fn(spark, sf_dir).collect()
    names = {r.column_name for r in rows}
    assert names == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    for r in rows:
        assert r.n_nulls >= 0 and r.n_distinct >= 1, r
        assert r.min_value is not None and r.max_value is not None, r


def test_kmv_merge_lossless_property():
    # Mergeability, property-tested: for ANY key multiset and ANY
    # partitioning into parts, merging per-part k-min sketches yields
    # exactly the global k-min sketch (the algebra k05 and the
    # streaming operator rely on).
    from hypothesis import given, settings
    from hypothesis import strategies as st

    P = sketches.P
    K = 8  # small k exercises the truncation boundary

    def kmin(keys):
        return sorted({((k % P) * 1686629717 + 11) % P for k in keys})[:K]

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10**12), max_size=60),
        st.integers(min_value=1, max_value=5),
    )
    def check(keys, n_parts):
        parts = [keys[i::n_parts] for i in range(n_parts)]
        merged_pool = set()
        for p in parts:
            merged_pool.update(kmin(p))
        assert sorted(merged_pool)[:K] == kmin(keys)

    check()


def test_hll_register_merge_is_lossless(spark):
    """HLL merge = register-wise max: the sketch of a union equals the
    merge of per-part sketches under ANY partitioning of the data —
    the property that makes daily partial sketches roll up exactly."""
    from ice_spark.streaming.sketch import hll_finalize
    from ice_spark.queries.sketches import HLL_M, HLL_W
    from pyspark.sql import functions as F

    P = 2_147_483_647

    def regs(df):
        from ice_spark.queries.sketches import hll_registers

        return hll_registers(
            df.select(F.lit("g").alias("group_key"), "user_id"), "user_id", ["group_key"]
        )

    full = spark.range(0, 3000).selectExpr("id * 7 AS user_id")
    part_a = full.where(F.col("user_id") % 3 == 0)
    part_b = full.where(F.col("user_id") % 3 != 0)
    merged = (
        regs(part_a)
        .unionByName(regs(part_b))
        .groupBy("group_key", "reg")
        .agg(F.max("m_j").alias("m_j"))
    )
    est_full = hll_finalize(regs(full)).collect()[0]
    est_merged = hll_finalize(merged).collect()[0]
    assert est_full.harmonic_sum == est_merged.harmonic_sum
    assert est_full.hll_estimate == est_merged.hll_estimate


def test_hll_estimate_error_bound(spark):
    """m=64 HLL has ~13% relative standard error; pin a generous 3-
    sigma envelope at a few cardinalities so estimator regressions
    (hash clustering, register addressing bugs) fail loudly."""
    from ice_spark.streaming.sketch import hll_finalize
    from ice_spark.queries.sketches import HLL_M, HLL_W
    from pyspark.sql import functions as F

    P = 2_147_483_647
    for n in (500, 5000, 20000):
        from ice_spark.queries.sketches import hll_registers

        df = spark.range(0, n).selectExpr("id * 13 + 5 AS user_id")
        regs = hll_registers(
            df.select(F.lit("g").alias("group_key"), "user_id"), "user_id", ["group_key"]
        )
        est = hll_finalize(regs).collect()[0].hll_estimate
        assert abs(est - n) / n < 0.40, f"n={n}: estimate {est}"
