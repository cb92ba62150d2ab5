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


def test_build_corpus_materializes_tables(spark, cat):
    docs = load_table(spark, SF, "documents")
    out = build_corpus(cat, docs, "corpus")
    assert set(out) == {"train", "heldout"}
    t = cat.load_table("corpus.train")
    h = cat.load_table("corpus.heldout")
    assert t.read().count() == out["train"]["rows"] > 0
    assert h.read().count() == out["heldout"]["rows"] > 0
    assert t.snapshot()["operation"] == "append"
