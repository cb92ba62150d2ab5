"""srp_signature_unrolled_sql must be bit-identical to the
higher-order-function form it replaces (r13-opt: the interpreted
lambda path cost ~30x; the unrolled form folds the constant plane
weights and stays inside whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ice_spark.operators.similarity import (
    srp_signature_sql,
    srp_signature_unrolled_sql,
)


def test_unrolled_matches_aggregate_form_on_corpus(spark, sf_dir):
    from ice_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mism = (
        emb.select(
            F.expr(srp_signature_sql("embedding", 16)).alias("a"),
            F.expr(srp_signature_unrolled_sql("embedding", 16)).alias("b"),
        )
        .where("a <> b")
        .count()
    )
    assert mism == 0


def test_unrolled_matches_on_adversarial_vectors(spark):
    # signs near zero, subnormals, exact cancellations, negatives —
    # the cases where a different summation ORDER would flip a bit
    rows = [
        ([0.0] * 64,),
        ([1e-300] * 64,),
        ([(-1.0) ** d * 1e-9 for d in range(64)],),
        ([float(d) - 31.5 for d in range(64)],),
        ([1.0] * 32 + [-1.0] * 32,),
    ]
    df = spark.createDataFrame(rows, "embedding: array<double>")
    got = df.select(
        F.expr(srp_signature_sql("embedding", 16)).alias("a"),
        F.expr(srp_signature_unrolled_sql("embedding", 16)).alias("b"),
    ).collect()
    for r in got:
        assert r.a == r.b


def test_unrolled_plan_has_no_interpreted_lambda(spark, sf_dir):
    from ice_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plan = (
        emb.select(F.expr(srp_signature_unrolled_sql("embedding", 16)).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lambdafunction" not in plan.lower()
