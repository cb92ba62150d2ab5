"""Deterministic hash sampling: reproducibility, disjointness."""

from __future__ import annotations

from ice_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_heldout_split,
)
from ice_spark.tables import load_table


def test_sample_reproducible_and_about_right(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect())
    s2 = sorted(r.doc_id for r in hash_sample(docs, "doc_id", 0.2).collect())
    assert s1 == s2 and s1
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n  # ~20%


def test_split_disjoint_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, heldout = train_heldout_split(docs, "doc_id", 0.1)
    a = {r.doc_id for r in train.collect()}
    b = {r.doc_id for r in heldout.collect()}
    assert a.isdisjoint(b)
    assert len(a) + len(b) == docs.count()


def test_stratified_keeps_unlisted_strata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    out = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.5})
    after = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert after["en"] < before["en"]
    for lang in before:
        if lang != "en":
            assert after[lang] == before[lang]
