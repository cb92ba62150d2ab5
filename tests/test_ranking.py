"""operators/ranking: distributed global rank / NTILE correctness.

The round-6 bug these tests pin: an un-materialized
repartitionByRange relation re-samples partition boundaries on every
re-execution, so the offsets pass and the rank pass can disagree —
at ~150k rows the decile assignment silently collapsed from 10 tiles
to 5. The operator now localCheckpoints the partitioned relation
(one shared RDD for both passes, lineage truncated so a stage retry
can't re-sample either); these tests run at a row count where the
unfixed version reproducibly corrupted.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ice_spark.operators.ranking import global_ntile, with_global_rank

N = 200_000


def _noisy(spark):
    # keys shuffled so range partitioning actually has to sort
    return spark.range(N).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 1_000_000).alias("v"),
    ).repartition(16)


def test_global_rank_matches_window_rank(spark):
    spark.catalog.clearCache()
    df = _noisy(spark)
    got = with_global_rank(df, [F.asc("v"), F.asc("id")], "r")
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("r", F.row_number().over(w).cast("long"))
    diff = (
        got.select("id", "r")
        .join(want.select("id", F.col("r").alias("r2")), "id")
        .where(F.col("r") != F.col("r2"))
        .count()
    )
    assert diff == 0
    n = got.select("r_n").distinct().collect()
    assert len(n) == 1 and n[0][0] == N


def test_global_ntile_matches_window_ntile(spark):
    spark.catalog.clearCache()
    df = _noisy(spark)
    got = global_ntile(df, [F.asc("v"), F.asc("id")], 10, "t")
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("t", F.ntile(10).over(w).cast("long"))
    diff = (
        got.select("id", "t")
        .join(want.select("id", F.col("t").alias("t2")), "id")
        .where(F.col("t") != F.col("t2"))
        .count()
    )
    assert diff == 0
    # all ten tiles populated with SQL-standard sizes
    sizes = {r["t"]: r["c"] for r in got.groupBy("t").agg(F.count("*").alias("c")).collect()}
    assert sorted(sizes) == list(range(1, 11))
    assert all(v == N // 10 for v in sizes.values())


def test_global_ntile_uneven_split(spark):
    spark.catalog.clearCache()
    df = spark.range(10_007).select(F.col("id"), (F.col("id") * 7 % 9973).alias("v"))
    got = global_ntile(df, [F.asc("v"), F.asc("id")], 4, "t")
    sizes = {r["t"]: r["c"] for r in got.groupBy("t").agg(F.count("*").alias("c")).collect()}
    # 10007 = 4*2501 + 3 -> first 3 tiles get 2502, last gets 2501
    assert sizes == {1: 2502, 2: 2502, 3: 2502, 4: 2501}


def test_ntile_formula_matches_sql_standard(spark):
    """ntile_from_rank is pure integer arithmetic — sweep (n, tiles)
    combinations against the SQL-standard definition (first n%t tiles
    get ceil(n/t) rows) computed in Python."""
    from pyspark.sql import Row

    from ice_spark.operators.ranking import ntile_from_rank

    cases = []
    for n in (1, 2, 3, 4, 9, 10, 11, 40, 101, 1000, 10007):
        for t in (1, 2, 3, 4, 7, 10):
            cases.append((n, t))
    rows = [
        Row(n=n, t=t, rank=r)
        for n, t in cases
        for r in ([1, 2, n // 2 + 1, max(1, n - 1), n] if n >= 2 else [1])
    ]
    df = spark.createDataFrame(rows)
    # evaluate per (n, t) pair with the matching tiles argument
    for n, t in cases:
        sub = df.where((F.col("n") == n) & (F.col("t") == t))
        out = sub.select(
            "rank", ntile_from_rank(F.col("rank"), F.col("n"), t).alias("tile")
        ).collect()
        base, s = n // t, n % t
        for r in out:
            rank = r["rank"]
            boundary = s * (base + 1)
            if rank <= boundary:
                want = 1 + (rank - 1) // (base + 1)
            else:
                want = s + 1 + (rank - boundary - 1) // base
            assert r["tile"] == want, (n, t, rank, r["tile"], want)
