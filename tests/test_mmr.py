"""mmr_rerank correctness: the distributed greedy walk must equal a
reference in-memory greedy MMR on arbitrary candidate/similarity
inputs (seeded random cases, multiple queries, ties included)."""

from __future__ import annotations

import random


def _py_mmr(cand: dict[int, int], sim: dict[tuple[int, int], int], k: int):
    """Reference greedy MMR: pick argmax(rel - max_sim_to_selected),
    ties on smallest id. Returns [(cid, mmr_u, position)]."""
    out = []
    selected: list[int] = []
    remaining = dict(cand)
    for pos in range(1, k + 1):
        if not remaining:
            break
        best = None
        for cid, rel in remaining.items():
            if not selected:
                score = rel
            else:
                score = rel - max(sim[(cid, s)] for s in selected)
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, score)
        _, cid, score = best
        out.append((cid, score, pos))
        selected.append(cid)
        del remaining[cid]
    return out


def test_mmr_matches_reference_greedy(spark):
    from ice_spark.operators.similarity import mmr_rerank

    rng = random.Random(42)
    cand_rows, pair_rows, want = [], [], []
    for qid in range(4):
        n = rng.randint(4, 8)
        cids = rng.sample(range(100), n)
        # Duplicate relevance values on purpose: ties must break on id.
        rels = {c: rng.choice([100, 250, 250, 400, 900]) for c in cids}
        sims = {}
        for a in cids:
            for b in cids:
                if a != b:
                    v = sims.get((b, a), rng.randint(-50, 800))
                    sims[(a, b)] = v
        cand_rows += [(qid, c, r) for c, r in rels.items()]
        pair_rows += [(qid, a, b, v) for (a, b), v in sims.items()]
        want += [(qid, cid, mmr, pos) for cid, mmr, pos in _py_mmr(rels, sims, k=4)]

    cand = spark.createDataFrame(cand_rows, ["query_id", "cid", "rel_u"])
    pair = spark.createDataFrame(pair_rows, ["query_id", "ca", "cb", "sim_u"])
    got = [
        (r.query_id, r.cid, r.mmr_u, r.position)
        for r in mmr_rerank(cand, pair, k=4).collect()
    ]
    assert sorted(got) == sorted(
        (q, c, m, p) for q, c, m, p in want
    ), f"\ngot:  {sorted(got)}\nwant: {sorted(want)}"
