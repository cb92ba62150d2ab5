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

- buffering aggregates (``percentile`` / ``collect_list`` /
  ``collect_set`` / ``mode`` / ``histogram_numeric``) only at AUDITED
  sites: these ObjectHashAggregate functions hold per-group state that
  grows with the group (a value→count map or the raw value list), so
  over an unbounded-group relation they OOM at scale while passing
  every gate SF (r11's a02 finding — ``F.percentile`` over 60M-row
  lineitem groups OOM'd an 8g heap at sf10 and was only caught by the
  honest force_rows probe; this ban catches the next one at plan time,
  at sf0.001, in CI). ``F.median`` compiles to percentile and is
  covered; ``percentile_approx``/``approx_percentile`` are bounded
  sketches and stay legal. Detection counts FINAL-mode aggregate
  expressions in the executed plan (``partial_``-prefixed duplicates
  of two-stage aggregates are excluded by the lookbehind), so one
  logical aggregate = one count. The allowlist pins query → exact
  {function: count}; each entry's audit states why the per-group
  state is bounded by construction.

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
    # 3x 1-row aggregate crossJoins (n_nodes x n_edges x n_wedges x
    # wt) — every broadcast side is exactly one row by construction
    "g02_copurchase_triangles": 3,
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


# Final-mode buffering-aggregate functions in the executed plan:
# (?<![\w.]) excludes the partial_/merge_ stage duplicates and
# percentile_approx/approx_percentile (bounded sketches, legal).
# The argument capture (up to the first close-paren) is the SITE
# SIGNATURE: textual occurrence counts are cache-state-dependent
# (executedPlan.toString re-prints each persisted relation's build
# subtree under every consumer, and nested persists multiply the
# prints — g02's ONE bounded collect_set printed 23x in a fresh
# session and 262x after a test file had built and partially
# uncached the same relations), so the sweep counts DISTINCT
# normalized sites instead: (function, #exprId-stripped argument
# prefix). A new aggregate over a different column/expression is a
# new signature and fails; re-prints of the same site collapse to 1.
BUFFERING_AGG_RE = re.compile(
    r"(?<![\w.])(percentile|collect_list|collect_set|mode|histogram_numeric)\(([^)]*)"
)

_EXPR_ID_RE = re.compile(r"#\d+[A-Za-z]*")


def _buffering_sites(plan: str) -> Counter:
    """{function: number of DISTINCT normalized argument signatures}."""
    sites: dict[str, set] = {}
    for fn, arg in BUFFERING_AGG_RE.findall(plan):
        sites.setdefault(fn, set()).add(_EXPR_ID_RE.sub("", arg))
    return Counter({fn: len(s) for fn, s in sites.items()})


# query name -> audited {buffering function: distinct-site count}. An
# entry is legal ONLY when the per-group state is bounded by
# construction — bounded by a fixed key domain or by a per-entity
# envelope (a doc's own tokens, an order's own lines), never by
# corpus size. ANY new site fails the sweep and must be audited here.
AUDITED_BUFFERING_AGGS = {
    # per-order line list: TPC-H lineitem has <= 7 lines per order
    # (l_linenumber domain) — per-entity envelope, not corpus-scaled
    "f13_array_ordinality": {"collect_list": 1},
    # input relation is the (o_orderpriority, o_orderstatus) grain —
    # 5x3 fixed key domain, bounded before the collect_list runs
    "f15_map_functions": {"collect_list": 1},
    # oriented out-neighbor adjacency arrays: group size is the
    # degree-ordered out-degree, <= sqrt(2m) by the arboricity bound
    # (every out-neighbor has degree >= deg(u), so outdeg*deg <= 2m);
    # measured max 222 at sf10 — per-node envelope, never
    # corpus-scaled (queries/graph.py g02). x3: the same persisted
    # adj relation feeds both endpoint joins and the n_wedges
    # outdeg agg, so the one bounded aggregate prints three times
    # (the persisted relation computes it once at runtime).
    # collect_set x3: the per-order part set of the edge build,
    # bounded by the l_linenumber domain (<= 7 parts/order — the
    # f13 per-entity envelope); the persisted e relation prints it
    # under each of its consumers (deg union sides, orientation
    # join, n_edges count). One site each regardless of print
    # multiplicity (distinct-signature counting, see BUFFERING_AGG_RE);
    # at runtime each aggregate computes once (DISK_ONLY persist).
    "g02_copurchase_triangles": {"collect_list": 1, "collect_set": 1},
    # same bounded _oriented_adjacency / edge-build relations
    "g03_triangle_support_by_degree": {"collect_list": 1, "collect_set": 1},
}


def _unaudited_buffering_aggs(name: str, plan: str) -> list[str]:
    got = _buffering_sites(plan)
    budget = AUDITED_BUFFERING_AGGS.get(name, {})
    return [
        f"{fn} x{n} distinct site(s) (audited: {budget.get(fn, 0)})"
        for fn, n in sorted(got.items())
        if n > budget.get(fn, 0)
    ]


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
    from tools.lint_overflow import unaudited_multiplies

    from ice_spark.queries.registry import load_all

    offenders: dict[str, list[str]] = {}
    for name, spec in load_all().items():
        df = spec.spark_fn(spark, sf_dir)
        overflow = unaudited_multiplies(name, df)
        if overflow:
            offenders.setdefault(name, []).append(
                f"int64-overflow-risk bigint products (lint_overflow): "
                f"{overflow} — stage through decimal(38,0) or audit the "
                "bound in tools/lint_overflow.AUDITED"
            )
        jplan = df._jdf.queryExecution().executedPlan()
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
        buffering = _unaudited_buffering_aggs(name, plan)
        if buffering:
            bad.append(
                f"unaudited buffering aggregate(s): {buffering} — "
                "per-group state grows with the group; use a bounded "
                "rewrite (operators/median.exact_group_percentiles for "
                "percentile) or audit the bound in "
                "AUDITED_BUFFERING_AGGS"
            )
        if bad:
            offenders.setdefault(name, []).extend(bad)
    assert not offenders, f"banned physical operators: {offenders}"


def test_overflow_lint_catches_e24_prefix_form(spark, sf_dir):
    """tools/lint_overflow red-flags exactly the r11 e24 shape: a
    bigint (num*100)^2 where num is count-derived — overflow-safe at
    every gate SF, int64 overflow at 100x counts. The decimal(38,0)
    form (the fix) and literal-scaled products must pass."""
    from tools.lint_overflow import unaudited_multiplies

    from pyspark.sql import functions as F

    from ice_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        (F.count(F.lit(1)) * 100).alias("num")
    )
    old_e24 = agg.select((F.col("num") * F.col("num")).alias("r2"))
    assert unaudited_multiplies("e24_volume_correlation", old_e24) == [
        "(num * num)"
    ]
    fixed = agg.select(
        (F.col("num").cast("decimal(38,0)") * F.col("num")).alias("r2")
    )
    assert unaudited_multiplies("e24_volume_correlation", fixed) == []
    # literal-scaled long products stay legal (count * 100 is linear)
    assert unaudited_multiplies("x", agg) == []


def test_buffering_agg_detector_catches_a02_prefix_form(spark, sf_dir):
    """The detector goes red on exactly the shape the r11 honest probe
    caught by OOM: a02's pre-fix F.percentile over raw lineitem groups
    (per-group value-count map in executor memory, 60M rows/group at
    sf10) — restored here in miniature. Bounded sketches
    (percentile_approx) and the partial_ stage duplicates must NOT
    count."""
    from pyspark.sql import functions as F

    from ice_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    old_a02 = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
    )
    plan = old_a02._jdf.queryExecution().executedPlan().toString()
    assert _unaudited_buffering_aggs("a02_price_percentiles", plan) == [
        "percentile x3 distinct site(s) (audited: 0)"
    ]
    # the legal bounded sketch stays legal
    ok = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("p50")
    )
    plan_ok = ok._jdf.queryExecution().executedPlan().toString()
    assert _unaudited_buffering_aggs("a02_price_percentiles", plan_ok) == []


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
