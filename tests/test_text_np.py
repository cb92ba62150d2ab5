"""Bit-parity of the Arrow/numpy hash producers (functions/text_np)
against the SQL/HOF reference forms — corpus plus adversarial
strings (whitespace variants, empties, nulls, short docs, repeats,
BMP unicode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ice_spark.functions import text as T

ADVERSARIAL = [
    None,
    "",
    " ",
    "   ",
    "\t",
    "\t\n \x0b\f\r",
    "a",
    " a ",
    "a b",
    "a b c",
    "a b c d",
    "a  b\tc\nd",
    "dup dup dup dup dup",
    "x " * 300,
    "one-token",
    "Ünïcødé tökens ärê BMP säfe ünïcødé tökens",
    "ends with spaces   ",
    "\n\nleading newlines x y z",
    "punct. only! ?? ... :: -- ==",
]


def _df(spark, extra_corpus=True):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    if extra_corpus:
        from ice_spark.tables import load_table

        return df
    return df


def _assert_cols_equal(df, a, b):
    bad = df.select(a.alias("a"), b.alias("b")).where(
        "NOT (a <=> b)"
    )
    rows = bad.collect()
    assert not rows, rows[:5]


def test_shingle_parity_adversarial(spark):
    df = _df(spark)
    _assert_cols_equal(
        df,
        T.shingle_hashes_arrow(F.col("text")),
        T.shingle_hashes_column(F.col("text")),
    )
    _assert_cols_equal(
        df,
        T.shingle_hashes_arrow(F.col("text"), n=2),
        F.expr(T.shingle_hashes_sql("text", 2)),
    )


def test_span_parity_adversarial(spark):
    df = _df(spark)
    for w in (2, 8):
        _assert_cols_equal(
            df,
            T.span_hashes_arrow(F.col("text"), w=w),
            F.expr(T.span_hashes_sql("text", w)),
        )


def test_token_and_char_parity_adversarial(spark):
    df = _df(spark)
    _assert_cols_equal(
        df,
        T.token_hashes_arrow(F.col("text")),
        F.expr(T.token_hashes_sql("text")),
    )
    _assert_cols_equal(
        df, T.char_hash_arrow(F.col("text")), F.expr(T.char_hash_sql("text"))
    )


def test_parity_on_corpus(spark, sf_dir):
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    _assert_cols_equal(
        docs,
        T.shingle_hashes_arrow(F.col("text")),
        F.expr(T.shingle_hashes_sql("text", 3)),
    )
    _assert_cols_equal(
        docs,
        T.span_hashes_arrow(F.col("text"), w=8),
        F.expr(T.span_hashes_sql("text", 8)),
    )
    _assert_cols_equal(
        docs, T.char_hash_arrow(F.col("text")), F.expr(T.char_hash_sql("text"))
    )
