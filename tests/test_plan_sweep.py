"""Whole-registry physical-plan invariants.

tests/test_plans.py pins per-query shuffle budgets for the queries
whose plans were hand-audited; this sweep asserts the invariants
that must hold for EVERY registered query, so a new or edited query
can't silently regress them:

- no ``CartesianProduct``: an unconstrained cross join is quadratic
  in data — at 100 TB it never finishes.
- no ``BatchEvalPython``: row-at-a-time Python UDFs serialize one
  row per round trip — the repo's contract is that every
  Python-executed path is Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / pandas aggregates), which this does not ban.
- ``BroadcastNestedLoopJoin`` only at AUDITED sites: a BNLJ whose
  broadcast side grows with the corpus is the O(n²) plan that
  CartesianProduct-banning alone missed (r7's v04 finding — an
  all-pairs cosine self-join compiled to BNLJ and evaded the sweep).
  Every BNLJ in the registry was audited (r7 corpus-scaled broadcast
  sweep + r8): each broadcast side is bounded by construction — a
  global 1-row aggregate (k10's medians, s08/s09 mixture floors), a
  literal-bounded query set (v01/v06/v11/v12/v14's vec_id < k), or a
  fixed-size sketch state (k04/k08/k09). The allowlist pins query →
  exact BNLJ count; ANY new site (or a count increase) fails here
  and must be audited before being added.
- partitionless ``Window``/``WindowGroupLimit`` only over AUDITED
  BOUNDED relations: a window with no PARTITION BY moves its entire
  input to ONE task, so it is only legal when the input cannot grow
  with the corpus (r9's e21 finding — an NTILE over the per-user
  conversion relation escaped the string-based bans above). Each
  partitionless window is identified by its ORDER BY expression
  signature, walked from the compiled physical plan tree (through
  the AdaptiveSparkPlan wrapper and subqueries). Two signatures are
  allowed everywhere because they are bounded by construction —
  ``('__gr_pid',)`` and ``('1',)``, operators/ranking.py's offsets
  windows over the one-row-per-shuffle-partition counts relation;
  everything else must be pinned per query in
  AUDITED_PARTITIONLESS_WINDOWS (month/day grains, 64-bucket
  histograms, 10-decile rollups — the r9 verdict's cleared list).
  A growing-relation window (old e21: ordering (delay_sec, user_id))
  has a different signature and fails.

The sweep compiles each plan at sf0.001 (no execution), so the whole
registry costs plan-analysis time only.
"""

from __future__ import annotations

import re
from collections import Counter

BANNED = ("CartesianProduct", "BatchEvalPython")

# query name -> number of audited BroadcastNestedLoopJoin nodes whose
# broadcast sides are bounded by construction (see module docstring).
AUDITED_BNLJ = {
    "a07_association_rules": 1,
    "d16_dedup_policy_simulator": 1,
    "dq01_constraint_suite": 2,
    "dq02_benford_digit_audit": 1,
    "dq03_composition_drift": 1,
    "e20_rfm_segmentation": 1,
    "e23_dau_wau_stickiness": 1,
    "e26_user_lifespan_survival": 2,
    "e27_three_step_funnel": 2,
    "g02_copurchase_triangles": 2,
    "j01_bloom_semijoin_revenue": 1,
    "j02_salted_hot_key_join": 1,
    "k04_kmv_audience_overlap": 2,
    "k06_histogram_median": 2,
    "k08_hll_sliding_distinct": 2,
    "k09_bloom_membership_audit": 2,
    "k10_exact_median_two_pass": 13,
    "k11_ams_selfjoin_size": 1,
    "k12_log_histogram_percentiles": 1,
    "k13_hash_sample_quantiles": 2,  # 3-row percentile spec + 3-row estimates

    "p02_pretraining_mixture_pipeline": 1,
    "q11_important_parts": 1,
    "q22_global_sales_opportunity": 1,
    "s08_mixture_weights": 1,
    "s09_temperature_sampling": 1,
    "s11_cluster_disjoint_split": 1,
    "s13_cluster_split_lsh": 1,  # 1-row leaky-audit aggregate crossJoin
    "t07_tfidf_top_terms": 1,
    "t08_unigram_logprob": 1,
    "t16_dsir_importance_weights": 1,  # 1-row totals aggregate crossJoin
    "t13_collocations": 1,
    "t14_vocabulary_growth": 2,
    "v01_knn_bruteforce": 1,
    "v06_ivf_ann": 1,
    "v11_pq_adc_ann": 1,
    "v12_ann_recall_audit": 1,
    "v14_vector_analogy": 1,
}


# Ordering-expression signatures of partitionless windows that are
# bounded by construction EVERYWHERE: operators/ranking.py's offsets
# pass windows run over the per-range-partition counts relation (one
# row per shuffle partition, never per data row).
GLOBALLY_BOUNDED_SIGS = {("__gr_pid",), ("1",)}

# query name -> audited multiset of partitionless-window ordering
# signatures whose INPUT relation is bounded (grain-sized, never
# corpus-sized). Audit trail: r9 VERDICT cleared list + this sweep.
AUDITED_PARTITIONLESS_WINDOWS = {
    "k06_histogram_median": [("b",), ("cents",)],  # 64-bucket histogram + narrowed bucket
    "k10_exact_median_two_pass": [  # 64-bucket state, then one narrowed bucket, x2 passes
        ("bkt",), ("bkt",), ("bkt",), ("bkt",), ("bkt",), ("cents",), ("cents",),
    ],
    "w02_monthly_revenue_running_total": [("month",)],  # month grain
    "w05_sliding_7day_revenue": [("_w1",)],  # day grain
    "w07_mom_revenue_growth": [("mon",)],  # month grain
    "w10_lorenz_gini_deciles": [(), ("decile",)],  # 10-decile rollup
    # both windows run over the 256-row bottom-k-by-hash sample
    # (TakeOrderedAndProject LIMIT upstream bounds the relation)
    "k13_hash_sample_quantiles": [(), ("cents", "event_id")],
}


def _partitionless_window_sigs(jplan) -> list[tuple]:
    """Walk a compiled physical plan (through the AdaptiveSparkPlan
    wrapper and subquery plans) and return the ORDER BY expression
    signature of every Window/WindowGroupLimit with an empty
    partitionSpec. Signatures strip the #exprId suffixes so they are
    stable across compilations."""
    out: list[tuple] = []

    def sig(n) -> tuple:
        cols = []
        so = n.orderSpec()
        for i in range(so.size()):
            e = so.apply(i).child()
            try:
                s = e.sql()
            except Exception:
                s = e.toString()
            cols.append(re.sub(r"#\d+[A-Za-z]*", "", s))
        return tuple(cols)

    def walk(n) -> None:
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            try:
                walk(n.initialPlan())
                return
            except Exception:
                pass
        if name in ("Window", "WindowGroupLimit", "WindowInPandas"):
            if n.partitionSpec().isEmpty():
                out.append(sig(n))
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        try:
            sq = n.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))
        except Exception:
            pass

    walk(jplan)
    return out


def _unaudited_partitionless_windows(name: str, jplan) -> list[tuple]:
    sigs = [
        s
        for s in _partitionless_window_sigs(jplan)
        if s not in GLOBALLY_BOUNDED_SIGS
    ]
    budget = Counter(
        tuple(s) for s in AUDITED_PARTITIONLESS_WINDOWS.get(name, [])
    )
    bad = []
    for s in sigs:
        if budget[s] > 0:
            budget[s] -= 1
        else:
            bad.append(s)
    return bad


def test_no_cartesian_rowwise_python_or_unaudited_bnlj(spark, sf_dir):
    from ice_spark.queries.registry import load_all

    offenders: dict[str, list[str]] = {}
    for name, spec in load_all().items():
        jplan = spec.spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        plan = jplan.toString()
        bad = [m for m in BANNED if m in plan]
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj > AUDITED_BNLJ.get(name, 0):
            bad.append(
                f"unaudited BroadcastNestedLoopJoin x{n_bnlj} "
                f"(audited: {AUDITED_BNLJ.get(name, 0)})"
            )
        unaudited = _unaudited_partitionless_windows(name, jplan)
        if unaudited:
            bad.append(
                "unaudited partitionless window over possibly-growing "
                f"relation, ORDER BY signature(s) {unaudited}"
            )
        if bad:
            offenders[name] = bad
    assert not offenders, f"banned physical operators: {offenders}"


def test_partitionless_window_detector_catches_growing_relation(spark, sf_dir):
    """The detector goes red on exactly the shape that escaped in r9:
    a partitionless NTILE over a per-user (corpus-growing) relation —
    old e21 restored in miniature."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ice_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    delay = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("delay_sec"))
    old_e21 = delay.select(
        F.ntile(10).over(Window.orderBy("delay_sec", "user_id")).alias("decile")
    )
    bad = _unaudited_partitionless_windows(
        "e21_time_to_convert", old_e21._jdf.queryExecution().executedPlan()
    )
    assert bad == [("delay_sec", "user_id")]
