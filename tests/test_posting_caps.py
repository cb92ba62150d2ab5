"""Inverted-index posting-list caps (the d02/d07/d08/d10 skew guard).

A posting list of p documents under one shingle/gram key produces
p*(p-1)/2 candidate pairs inside a SINGLE join partition — the
skewed-key quadratic blowup. `operators.dedup.cap_postings` drops
postings longer than the cap (default DEFAULT_MAX_POSTING=512, which
never triggers at test SF: measured posting maxima are ~25 at sf0.1,
so every gated oracle stays hash-identical). These tests prove:

- behavior: a synthetic hot shingle is dropped, cold ones survive,
  and `lsh_dropped_bucket_mass` reports exactly the dropped mass;
- plan: all four gated queries carry the cap (the `__bsz` window
  count) in their compiled plans, so a future edit can't silently
  remove the guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ice_spark.operators.dedup import (
    DEFAULT_MAX_POSTING,
    cap_postings,
    lsh_dropped_bucket_mass,
)


def _index(spark):
    # 6 docs share shingle 111 (hot); 2 docs share 222; 1 doc has 333.
    rows = [(d, 111) for d in range(6)] + [(6, 222), (7, 222), (8, 333)]
    return spark.createDataFrame(rows, "doc_id long, s long")


def test_hot_posting_dropped_cold_kept(spark):
    ex = _index(spark)
    capped = cap_postings(ex, ["s"], max_posting=4)
    kept = {(r.doc_id, r.s) for r in capped.collect()}
    assert kept == {(6, 222), (7, 222), (8, 333)}


def test_dropped_mass_reported(spark):
    ex = _index(spark)
    mass = lsh_dropped_bucket_mass(ex, ["s"], 4).collect()
    assert [(r.s, r.bucket_size) for r in mass] == [(111, 6)]


def test_default_cap_is_noop_at_test_sf(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from ice_spark.functions import text as T

    ex = docs.select("doc_id", F.explode(T.shingle_hashes("text")).alias("s"))
    dropped = lsh_dropped_bucket_mass(ex, ["s"], DEFAULT_MAX_POSTING).count()
    assert dropped == 0


def test_gated_plans_carry_the_cap(spark, sf_dir):
    from ice_spark.queries.registry import load_all

    specs = load_all()
    for name in (
        "d02_ngram_jaccard_pairs",
        "d07_containment_pairs",
        "d08_contamination",
        "d10_duplicate_shingle_fraction",
    ):
        plan = (
            specs[name]
            .spark_fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "__bsz" in plan, f"{name} lost its posting cap"
