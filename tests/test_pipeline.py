"""Corpus-build pipeline: dedup → gates → split → catalog tables."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from ice_spark.catalog import Catalog
from ice_spark.operators.pipeline import build_corpus, clean_corpus
from ice_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("corpus")
    return c


def test_clean_corpus_split_disjoint_exhaustive(spark):
    docs = load_table(spark, SF, "documents")
    train, heldout = clean_corpus(docs)
    n_train, n_held = train.count(), heldout.count()
    assert n_train > 0 and n_held > 0
    # disjoint and exhaustive over the gated set
    ids_t = {r.doc_id for r in train.select("doc_id").collect()}
    ids_h = {r.doc_id for r in heldout.select("doc_id").collect()}
    assert not (ids_t & ids_h)
    # reproducible: second run yields the identical split
    t2, h2 = clean_corpus(docs)
    assert {r.doc_id for r in t2.select("doc_id").collect()} == ids_t
    # gates actually reject something
    assert n_train + n_held < docs.count()


WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega one two "
    "three four five six"
)


def _uniqueish_docs(spark, n=8):
    """n mostly-unique 30-token docs + one near-dup pair (ids 100/101,
    differing in the last token -> jaccard ~0.87)."""
    rows = []
    base = WORDS.split()
    for i in range(n):
        toks = [f"{w}{i}" for w in base]
        rows.append((i, " ".join(toks)))
    rows.append((100, WORDS))
    rows.append((101, " ".join(base[:-1] + ["thirty"])))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dup_heavy_docs(spark, n_dups=12, n_unique=3):
    """n_dups identical docs (every shingle bucket has n_dups members)
    plus a few unique docs."""
    rows = [(i, WORDS) for i in range(n_dups)]
    base = WORDS.split()
    for j in range(n_unique):
        rows.append((1000 + j, " ".join(f"{w}x{j}" for w in base)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dedup_auto_holds_capped_when_caps_dont_bind(spark):
    """Unique-ish corpus: no posting bucket exceeds the cap, the audit
    reads 0 bp, the router keeps the capped finder — and the capped
    finder removes the near-dup pair (keep min id)."""
    from ice_spark.operators.pipeline import near_dedup

    docs = _uniqueish_docs(spark)
    out, info = near_dedup(docs, "auto", max_posting=4)
    assert info["routed"] and info["strategy"] == "capped-shingle"
    assert info["dropped_bp"] < 100
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert 100 in ids and 101 not in ids  # pair deduped, min id kept
    assert ids >= set(range(8))  # unique docs untouched


def test_near_dedup_auto_flips_to_lsh_when_caps_bind(spark):
    """Dup-heavy corpus at a cap the duplicates blow through: the
    capped finder alone would return ZERO pairs (every bucket is over
    cap and dropped — the sf5 recall-collapse regime); the router
    measures that and switches to banded LSH, which removes all 11
    redundant copies."""
    from ice_spark.operators.dedup import shingle_jaccard_pairs
    from ice_spark.operators.pipeline import near_dedup

    docs = _dup_heavy_docs(spark)
    # the failure mode being routed around, pinned explicitly
    assert shingle_jaccard_pairs(docs, max_posting=4).count() == 0

    out, info = near_dedup(docs, "auto", max_posting=4)
    assert info["routed"] and info["strategy"] == "minhash-lsh"
    assert info["dropped_bp"] >= 100
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids == {0, 1000, 1001, 1002}  # one keeper + uniques


def test_build_corpus_auto_route_recorded(spark, cat):
    """build-corpus --dedup auto consumes the audit and records the
    route it took alongside the materialized tables."""
    docs = load_table(spark, SF, "documents")
    out = build_corpus(cat, docs, "corpus", near_dedup_strategy="auto")
    assert set(out) == {"train", "heldout", "dedup_route"}
    r = out["dedup_route"]
    assert r["routed"] and r["strategy"] in ("capped-shingle", "minhash-lsh")
    # sf0.001 documents: production cap 512 never binds -> capped path
    assert r["strategy"] == "capped-shingle" and r["dropped_bp"] < 100
    assert cat.load_table("corpus.train").read().count() == out["train"]["rows"] > 0


def test_build_corpus_materializes_tables(spark, cat):
    docs = load_table(spark, SF, "documents")
    out = build_corpus(cat, docs, "corpus")
    assert set(out) == {"train", "heldout"}
    t = cat.load_table("corpus.train")
    h = cat.load_table("corpus.heldout")
    assert t.read().count() == out["train"]["rows"] > 0
    assert h.read().count() == out["heldout"]["rows"] > 0
    assert t.snapshot()["operation"] == "append"


def test_near_dedup_auto_empty_corpus_no_crash(spark):
    """Empty corpus: dropped_posting_mass returns ZERO audit rows (r11
    ADVICE — the pre-fix .collect()[0] raised IndexError through the
    public operator and the build-corpus --dedup auto CLI path). The
    router must no-op on the cheap capped route instead."""
    from ice_spark.operators.pipeline import near_dedup

    docs = spark.createDataFrame([], "doc_id long, text string")
    out, info = near_dedup(docs, "auto", max_posting=4)
    assert out.count() == 0
    assert info["strategy"] == "capped-shingle"
    assert info["empty_audit"] and info["dropped_bp"] == 0
