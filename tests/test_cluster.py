"""Connected-components operators vs a pure-Python union-find oracle."""

from __future__ import annotations

import random

import pytest

from ice_spark.operators.cluster import (
    alternating_star_components,
    dedup_keep_canonical,
    label_propagation_components,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _check(spark, edges: list[tuple[int, int]], fn) -> None:
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"] for r in fn(df).collect()}
    assert got == _union_find(edges)


@pytest.mark.parametrize("fn", [alternating_star_components, label_propagation_components])
def test_two_components(spark, fn):
    _check(spark, [(1, 2), (2, 3), (10, 11), (12, 11)], fn)


@pytest.mark.parametrize("fn", [alternating_star_components, label_propagation_components])
def test_long_chain_diameter(spark, fn):
    # a 40-node chain: label propagation needs ~diameter rounds,
    # alternating-star must collapse it in O(log^2 n).
    _check(spark, [(i, i + 1) for i in range(40)], fn)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges, alternating_star_components)


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 4), (3, 5)], ["doc_a", "doc_b"])
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect())
    # clusters {1,2,4} -> keep 1; {3,5} -> keep 3; singletons 0
    assert kept == [0, 1, 3]


@pytest.mark.parametrize(
    "fn", [alternating_star_components, label_propagation_components]
)
def test_stale_round_checkpoints_are_freed(spark, fn):
    """Every CC round eagerly localCheckpoints a new relation; the
    stale rounds' blocks must be released explicitly — relying on the
    GC + ContextCleaner let them pile up and OOM the sf10 probe
    (25M-edge relation x O(log² n) rounds on an 8g heap)."""
    sc = spark.sparkContext
    spark.catalog.clearCache()

    def persistent_ids():
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}

    # long chain -> several rounds, so stale checkpoints would accrue
    # (40 stays under label propagation's max_iter=50 diameter bound)
    edges = [(i, i + 1) for i in range(40)]
    before = persistent_ids()
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["component"] for r in fn(df).collect()}
    assert out == _union_find(edges)
    leaked = persistent_ids() - before
    # at most the FINAL round's relations may still be pinned (the
    # returned DataFrame scans them); every earlier round must be gone
    assert len(leaked) <= 2, f"stale checkpointed rounds leaked: {leaked}"
