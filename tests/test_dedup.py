"""Dedup operators: LSH recall vs the exact-Jaccard oracle, simhash,
exact dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_dedup_keeps_min_id(spark):
    from ice_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")], ["id", "text"]
    )
    out = exact_dedup(df, ["text"], "id")
    assert sorted(r.id for r in out.collect()) == [1, 3, 5]


def test_dedup_by_fingerprint_matches_exact(spark, sf_dir):
    from ice_spark.operators.dedup import dedup_by_fingerprint, exact_dedup
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in exact_dedup(docs, ["text"], "doc_id").collect())
    b = sorted(r.doc_id for r in dedup_by_fingerprint(docs, "text", "doc_id").collect())
    assert a == b


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH pipeline must find every pair the exact O(n^2)-free shingle
    join finds at J>=0.8 (the planted near-dups separate cleanly)."""
    from ice_spark.operators.dedup import minhash_lsh_pairs
    from ice_spark.queries.registry import load_all

    exact = load_all()["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    expected = {(r.doc_a, r.doc_b) for r in exact.collect()}

    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got_df = minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=16, bands=8, threshold=0.8)
    got = {(r.doc_a, r.doc_b) for r in got_df.collect()}
    # Verification step guarantees precision; banding should give full
    # recall on J>=0.9 planted dups.
    assert got == expected


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    from ice_spark.functions.text import hamming64, simhash
    from ice_spark.queries.registry import load_all
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = load_all()["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    sh = docs.select("doc_id", simhash("text").alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    dists = [r.d for r in joined.select(hamming64(F.col("sha"), F.col("shb")).alias("d")).collect()]
    if dists:  # sf0.001 documents also carry planted dups
        assert max(dists) <= 8  # near-dups land close in simhash space


def test_lsh_bucket_cap_bounds_candidates(spark):
    """Adversarial hot bucket: many identical docs land in one LSH
    bucket. With the cap, candidate generation stays bounded (the hot
    bucket is dropped); distinct docs still pair normally."""
    from ice_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    hot = [(i, "the same boilerplate text repeated everywhere " * 3) for i in range(60)]
    base = "a perfectly unique document about owls rivers lakes and quiet forests " * 4
    normal = [(1000, base + "today"), (1001, base + "tonight")]
    docs = spark.createDataFrame(hot + normal, ["doc_id", "text"])

    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=8, max_bucket_size=10
    ).collect()
    hot_pairs = [r for r in capped if r.doc_a < 1000 and r.doc_b < 1000]
    assert hot_pairs == []  # 60-member buckets dropped: no 1770-pair blowup
    assert {(r.doc_a, r.doc_b) for r in capped} >= {(1000, 1001)}

    sim = simhash_pairs(docs, "doc_id", "text", max_hamming=3, max_bucket_size=10).collect()
    assert [r for r in sim if r.doc_a < 1000 and r.doc_b < 1000] == []


def test_lsh_dropped_bucket_mass_audit(spark):
    from ice_spark.operators.dedup import lsh_dropped_bucket_mass

    buckets = spark.createDataFrame(
        [(i, 0, "hot") for i in range(20)] + [(100, 0, "cold"), (101, 1, "cold2")],
        ["__id", "band", "key"],
    )
    dropped = lsh_dropped_bucket_mass(buckets, ["band", "key"], max_bucket_size=10).collect()
    assert len(dropped) == 1 and dropped[0].key == "hot" and dropped[0].bucket_size == 20
