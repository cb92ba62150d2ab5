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


def _df(spark):
    rows = [(i, t) for i, t in enumerate(ADVERSARIAL)]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


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


def _minhash_reference(df, id_col, text_col, k):
    """The explode + groupBy-min spec form (kept in operators/dedup
    as _signatures_from_exploded), driven off the HOF shingle
    producer so the whole reference path is Spark-side."""
    from ice_spark.operators.dedup import _signatures_from_exploded

    ex = df.select(
        F.col(id_col),
        F.explode(T.shingle_hashes_column(F.col(text_col))).alias("__h"),
    )
    return _signatures_from_exploded(ex, id_col, k)


def _assert_rows_equal(a, b):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, (ra[:3], rb[:3])


def _kernel_sigs(df, k):
    """The d03 construction: text -> signature array in one Arrow
    pass, unpacked to mh columns."""
    sig = T.minhash_sigs_arrow("text", n=3, k=k)
    return df.select("doc_id", sig.alias("__sig")).select(
        "doc_id", *[F.col("__sig").getItem(j).alias(f"mh{j}") for j in range(k)]
    )


def test_minhash_sig_parity_adversarial(spark):
    df = _df(spark)
    for k in (4, 16):
        new = _kernel_sigs(df, k)
        ref = _minhash_reference(df, "doc_id", "text", k)
        _assert_rows_equal(new, ref)


def test_minhash_sig_parity_on_corpus(spark, sf_dir):
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    new = _kernel_sigs(docs, 16)
    ref = _minhash_reference(docs, "doc_id", "text", 16)
    _assert_rows_equal(new, ref)


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
