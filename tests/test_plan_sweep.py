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

The sweep compiles each plan at sf0.001 (no execution), so the whole
registry costs plan-analysis time only.
"""

from __future__ import annotations

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
    "p02_pretraining_mixture_pipeline": 1,
    "q11_important_parts": 1,
    "q22_global_sales_opportunity": 1,
    "s08_mixture_weights": 1,
    "s09_temperature_sampling": 1,
    "s11_cluster_disjoint_split": 1,
    "s13_cluster_split_lsh": 1,  # 1-row leaky-audit aggregate crossJoin
    "t07_tfidf_top_terms": 1,
    "t08_unigram_logprob": 1,
    "t13_collocations": 1,
    "t14_vocabulary_growth": 2,
    "v01_knn_bruteforce": 1,
    "v06_ivf_ann": 1,
    "v11_pq_adc_ann": 1,
    "v12_ann_recall_audit": 1,
    "v14_vector_analogy": 1,
}


def test_no_cartesian_rowwise_python_or_unaudited_bnlj(spark, sf_dir):
    from ice_spark.queries.registry import load_all

    offenders: dict[str, list[str]] = {}
    for name, spec in load_all().items():
        plan = spec.spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        bad = [m for m in BANNED if m in plan]
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        if n_bnlj > AUDITED_BNLJ.get(name, 0):
            bad.append(
                f"unaudited BroadcastNestedLoopJoin x{n_bnlj} "
                f"(audited: {AUDITED_BNLJ.get(name, 0)})"
            )
        if bad:
            offenders[name] = bad
    assert not offenders, f"banned physical operators: {offenders}"
