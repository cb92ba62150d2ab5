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


class TestSequencePacking:
    def test_bin_assignment_semantics(self, spark):
        """Hand-checked concat-and-chunk: budget 10, one shard."""
        from ice_spark.operators.packing import assign_bins

        rows = [(0, "a b c d"), (8, "e f g h i j k l"), (16, "m n")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_toks, r.end_pos, r.bin, r.straddles)
            for r in assign_bins(df, budget=10, shards=1).collect()
        }
        # stream: 4 + 8 + 2 tokens; windows of 10
        assert got[0] == (4, 4, 0, False)
        assert got[8] == (8, 12, 1, True)  # spans tokens 5..12 -> straddles
        assert got[16] == (2, 14, 1, False)

    def test_stats_and_utilization(self, spark):
        from ice_spark.operators.packing import packing_stats

        rows = [(i, "t " * 7) for i in range(20)]  # 7 tokens each
        df = spark.createDataFrame(rows, "doc_id long, text string")
        [row] = packing_stats(df, budget=70, shards=1).collect()
        assert row.n_docs == 20 and row.total_tokens == 140
        assert row.n_bins == 2 and row.utilization == 1.0
        assert row.n_straddlers == 0  # 10 docs fill each window exactly

    def test_single_shuffle_plan(self, spark):
        """The packer's only exchange is the window partition — no
        hidden global sort or extra shuffle."""
        from ice_spark.operators.bucketed import exchange_count
        from ice_spark.operators.packing import packing_stats

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        out = packing_stats(df, budget=16, shards=4)
        assert exchange_count(out) <= 2  # window partition + final groupBy
