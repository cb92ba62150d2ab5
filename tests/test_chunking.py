"""chunk_expr edge cases: empty, short, exact-width, overlapping docs."""

from __future__ import annotations

from ice_spark.functions.text import chunk_expr


def _chunks(spark, text: str, width: int, stride: int):
    df = spark.createDataFrame([(text,)], ["text"])
    rows = df.select(chunk_expr("text", width, stride)).collect()
    return [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in rows]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b c", 4, 2) == [(0, "a b c", 3)]


def test_empty_doc(spark):
    assert _chunks(spark, "", 4, 2) == [(0, "", 0)]


def test_exact_width(spark):
    assert _chunks(spark, "a b c d", 4, 2) == [(0, "a b c d", 4)]


def test_overlap_and_tail(spark):
    # 6 tokens, width 4, stride 2 -> chunks at 0 and 2 (tail covered)
    got = _chunks(spark, "t1 t2 t3 t4 t5 t6", 4, 2)
    assert got == [(0, "t1 t2 t3 t4", 4), (1, "t3 t4 t5 t6", 4)]


def test_every_token_covered(spark):
    text = " ".join(f"w{i}" for i in range(101))
    got = _chunks(spark, text, 64, 48)
    covered = set()
    for idx, chunk, n in got:
        start = idx * 48
        covered.update(range(start, start + n))
        assert chunk.split() == [f"w{i}" for i in range(start, start + n)]
    assert covered == set(range(101))
