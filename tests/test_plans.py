"""Physical-plan invariants — the scale contract, enforced.

These tests pin the plan shapes that make the engine viable at
100 TB: dimension joins must broadcast (no sort-merge join against a
bounded dim), selective scans must push filters into the parquet
reader, single-shuffle operators must stay single-shuffle. A future
change that silently regresses a plan fails here, not in production.

Inspection helpers live in ice_spark.plans (the user-facing audit
API); tests go through the same code path.
"""

from __future__ import annotations

import pytest

from ice_spark.plans import audit


def _audit(spark, sf_dir, name: str):
    from ice_spark.queries.registry import load_all

    return audit(load_all()[name].spark_fn(spark, sf_dir))


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    a = _audit(spark, sf_dir, "q05_local_supplier_volume")
    assert a.sort_merge_joins == 0
    assert a.broadcast_joins >= 4


def test_selective_scan_pushes_filters(spark, sf_dir):
    a = _audit(spark, sf_dir, "q06_forecast_revenue")
    # plan toString truncates long filter lists — assert on presence
    assert a.pushed_filters, a.plan
    assert not a.has_empty_pushed_filters


def test_column_pruning_reaches_scan(spark, sf_dir):
    a = _audit(spark, sf_dir, "q06_forecast_revenue")
    assert a.read_schemas, a.plan
    # q06 needs exactly 4 lineitem columns
    assert all(len(s.split(",")) <= 4 for s in a.read_schemas), a.read_schemas


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("q01_pricing_summary", 1),  # one shuffle for the final agg
        ("q18_large_volume_customer", 1),  # per-order agg, dims broadcast
        ("w01_top_customers_per_nation", 3),  # agg + window repartition
        ("e03_sessionization", 2),  # one shuffle by user + agg reuse
        ("e06_asof_click_before_purchase", 2),  # union+window asof: by key
    ],
)
def test_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"


def test_q18_scans_lineitem_once(spark, sf_dir):
    a = _audit(spark, sf_dir, "q18_large_volume_customer")
    assert a.plan.count("lineitem.parquet") == 1, "q18 must not re-scan the fact table"


def test_no_cartesian_products_in_headline(spark, sf_dir):
    for name in (
        "q01_pricing_summary",
        "q05_local_supplier_volume",
        "q18_large_volume_customer",
        "d04_minhash_lsh_pairs",
    ):
        a = _audit(spark, sf_dir, name)
        assert "CartesianProduct" not in a.plan, name


def test_audit_report_renders(spark, sf_dir):
    a = _audit(spark, sf_dir, "q05_local_supplier_volume")
    rep = a.report()
    assert "broadcast hash joins" in rep and "shuffles" in rep


def test_range_join_is_hash_join(spark, sf_dir):
    a = _audit(spark, sf_dir, "e09_error_recovery_windows")
    assert "NestedLoop" not in a.plan and "CartesianProduct" not in a.plan
    # bucketized: an equi-join (broadcast at this SF, shuffled at scale)
    assert a.broadcast_joins + a.sort_merge_joins + a.plan.count("ShuffledHashJoin") >= 1


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("t08_unigram_logprob", 4),  # tok counts + join + source agg
        ("t09_repetition_filter", 4),  # per-doc aggs + doc join + source agg
        ("w04_customer_order_gaps", 2),  # window by custkey + reuse for agg
        ("s06_stratified_sample", 3),  # two aggs + join on lang
    ],
)
def test_new_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("e10_daily_top_event_types", 3),  # agg + window over day-type rows
        ("e11_cohort_retention", 4),  # first-seen agg + join + distinct + agg
        # round 6: distributed-sort ntile (range exchange + local
        # ranks + offsets + decile agg) — more exchanges, but the one
        # SinglePartition exchange left is the partition-count offset
        # window, bounded by cluster parallelism, not data
        ("a05_order_value_deciles", 5),
        ("w05_sliding_7day_revenue", 2),  # daily agg + single-partition window
        ("t10_token_entropy", 4),  # doc-token counts + doc agg + lang agg
    ],
)
def test_latest_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("t11_pii_scrub", 1),  # map-only regex + one final agg
        # r8: +3 exchanges for the per-side posting caps (each side's
        # window count hash-partitions on g; the skew guard is worth
        # the extra posting-relation shuffles)
        ("d08_contamination", 7),  # gram dedup + caps + 2-sided join + agg
        ("v10_semantic_dedup", 3),  # assign is narrow; join + pairs
        ("v11_pq_adc_ann", 2),  # encode+ADC narrow; top-k window only
        # r9: 3 index branches x (posting-key agg + O(#caps) agg) +
        # union ordering — vocabulary-keyed shuffles only, no joins
        ("d17_dropped_posting_mass", 8),
        # r9: dup-hash agg + merge-pinned semi join (both keyed on
        # h — the dup side OOMed as an AQE broadcast at the 100x
        # probe), per-doc coverage window, two source aggs + final
        # source join — posting lists stay linear, never pairs
        ("d18_duplicate_spans", 7),
        # r9: d18's machinery + keeper selection as TWO keyed aggs
        # (min-doc, then min-pos) instead of a posting-list
        # row_number window — linear passes, no single-task sort
        ("d19_span_dedup_cut", 8),
        # r9: with_global_rank (range exchange + offsets) + 8-group
        # shard agg — no single-task sort window anywhere
        ("s14_balanced_shards", 4),
        # r10: corpus span-hash distinct + merge-pinned semi join
        # (batch spans vs the growing index — the d18/g01 AQE-
        # broadcast class), per-batch-doc coverage window, source
        # join + final agg
        ("d20_span_incremental_admission", 7),
        # r10: d17's audit + two map-side derived columns + the
        # final ORDER BY range exchange of the 6-row report
        ("p04_corpus_health_card", 9),
    ],
)
def test_round3_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"
    assert "CartesianProduct" not in a.plan


def test_lsh_cap_single_bucket_shuffle(spark, sf_dir):
    """The bucket-size cap must ride the window over the bucket key,
    not an extra aggregate+join (one shuffle of the bucket set saved;
    regression here re-doubles d04's heaviest exchange)."""
    a = _audit(spark, sf_dir, "d04_minhash_lsh_pairs")
    assert a.shuffles <= 5, a.plan[:2000]
    # Exactly ONE SortMergeJoin: the band self-join is merge-pinned
    # (r13-opt) — both sides are the same capped bucket relation,
    # partitioned + sorted on (band, key) by the cap window, so the
    # exchange is computed once and reused (the small-SF broadcast
    # plan rebuilt the whole signature pipeline as its build side;
    # sf1 A/B 2.24 s vs 2.50 s). A second SMJ would mean the verify
    # joins regressed off broadcast-at-small-SF.
    assert a.sort_merge_joins == 1, a.plan[:2000]


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # hourly agg + LOCF fill-group windows (round 6: the IGNORE-
        # NULLS window became running-COUNT + per-(type,grp) MAX — one
        # more exchange, but both run on the tiny types x hours grid)
        ("e13_hourly_gap_fill_locf", 3),
        ("j01_bloom_semijoin_revenue", 1),  # bloom prefilter is map-side; broadcast join
        # monthly agg + rank windows sharing the pri partitioning +
        # the round-6 deterministic ORDER BY (a range exchange over
        # the months x priorities rollup — bounded rows at any scale)
        ("w06_value_window_functions", 3),
        ("f13_array_ordinality", 1),  # per-order collect; posexplode is narrow
        # r8: +2 for the posting cap's window (hash-partition on s +
        # the freq join's re-exchange of the capped relation)
        ("d10_duplicate_shingle_fraction", 4),  # cap + posting count + per-doc agg
    ],
)
def test_round4_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"
    assert a.sort_merge_joins == 0
    assert "CartesianProduct" not in a.plan


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        ("a06_grouping_id_rollup", 1),  # rollup expands map-side
        # r13: +1 — the failing-try_cast columns moved behind a
        # (flag, status) pre-aggregate (per-row exception unwinding
        # was 15x the query); the second exchange carries ~6 rows
        ("f14_try_functions", 2),
        ("s09_temperature_sampling", 3),  # counts + broadcast rates + final agg
        ("s10_importance_resampling", 1),  # per-row threshold, one agg
        # keyed dedup agg + per-type rollup + the round-6
        # deterministic ORDER BY (range exchange over ~|types| rows)
        ("e14_windowed_dedup", 3),
    ],
)
def test_round4b_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"
    assert a.sort_merge_joins == 0
    assert "CartesianProduct" not in a.plan


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # key-only distinct + window + sketch agg + exact 2-phase distinct
        ("k01_kmv_distinct_users", 5),
        # 2048-cell sketch agg + top-k candidates; probe join broadcasts
        ("k02_countmin_heavy_hitters", 2),
        # one Expand-based multi-distinct pass over the table
        ("k03_column_profile", 1),
        # vocab groupBy + pair agg; pair explosion on vocab, not corpus
        ("t12_bpe_merge_pairs", 2),
        # bucket-histogram agg is the only keyed shuffle; the exact-
        # median audit side is a global sort by design (the cost the
        # sketch avoids); cross joins are broadcast one-row aggregates
        ("k06_histogram_median", 2),
    ],
)
def test_sketch_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"
    assert a.sort_merge_joins == 0
    assert "CartesianProduct" not in a.plan


def test_kmv_rollup_plan(spark, sf_dir):
    # Daily sketch + merged/direct re-rank + tiny joins; no shuffle join
    # and no cross product anywhere.
    a = _audit(spark, sf_dir, "k05_kmv_mergeable_rollup")
    assert a.sort_merge_joins == 0
    assert "CartesianProduct" not in a.plan
    assert a.shuffles <= 12, f"{a.shuffles} shuffles\n{a.plan[:2000]}"


def test_kmv_rollup_merge_is_lossless(spark, sf_dir):
    from ice_spark.queries.registry import load_all

    df = load_all()["k05_kmv_mergeable_rollup"].spark_fn(spark, sf_dir)
    rows = df.collect()
    assert rows, "rollup produced no groups"
    for r in rows:
        assert r.merge_lossless == 1, r
        assert r.merged_estimate == r.direct_estimate, r


def test_kmv_overlap_plan(spark, sf_dir):
    # k04's sketch path is all tiny broadcast joins; the one sort-merge
    # join is the exact-audit self-join on user_id — a high-cardinality
    # key where a shuffle join is the CORRECT plan at scale (broadcast
    # is impossible by design; that cost is what the sketch avoids).
    a = _audit(spark, sf_dir, "k04_kmv_audience_overlap")
    assert a.sort_merge_joins <= 1
    assert "CartesianProduct" not in a.plan
    assert a.shuffles <= 18, f"{a.shuffles} shuffles\n{a.plan[:2000]}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # (type,reg) max + type sum for the sketch path; the exact
        # COUNT(DISTINCT) audit adds an Expand 2-phase pass + join
        ("k07_hll_distinct_users", 5),
        # map agg over per-status agg + output sort
        ("f15_map_functions", 3),
    ],
)
def test_round5_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"
    assert a.sort_merge_joins == 0
    assert "CartesianProduct" not in a.plan


def test_d11_admission_no_corpus_self_join(spark, sf_dir):
    """Batch-vs-corpus admission: candidate generation joins batch
    band keys against corpus band keys only — no corpus x corpus or
    batch x batch pair formation, no cartesian. The shingle-set
    verification join is big x big on doc id, where a sort-merge
    join IS the right plan at scale (neither side is bounded), so
    SMJ is allowed here — unlike the bounded-dim star joins."""
    a = _audit(spark, sf_dir, "d11_incremental_neardup_admission")
    assert a.shuffles <= 4, a.plan[:2000]
    assert "CartesianProduct" not in a.plan


def test_g01_pagerank_iteration_shuffles(spark, sf_dir):
    """2 unrolled PageRank iterations over a CACHED degree-annotated
    edge list. The cache is the load-bearing invariant: without it the
    unrolled plan replays the edge-build subtree (lineitem scan +
    distinct + degree agg) once per iteration. The static explain
    still PRINTS the cached subtree's exchanges under every
    InMemoryRelation reference, so the shuffle count here is an
    explain-string artifact; at runtime the subtree executes once and
    each iteration costs one scatter/gather shuffle pair. We pin the
    cache's presence and the absence of cartesians. r9 additions
    (the sf10 probe's heap-OOM lesson): every join side in this plan
    GROWS with the corpus — orders, deg, pr — so no BroadcastHashJoin
    may appear anywhere (AQE's compressed-parquet size estimate says
    'small' right up until the deserialized LongHashedRelation OOMs
    the heap), and the persisted edge relation is DISK_ONLY so the
    unified memory region stays with the iteration shuffles."""
    a = _audit(spark, sf_dir, "g01_pagerank_order_network")
    assert "InMemoryTableScan" in a.plan or "InMemoryRelation" in a.plan, a.plan[:1500]
    assert "CartesianProduct" not in a.plan
    assert "BroadcastHashJoin" not in a.plan, a.plan[:2000]
    assert "disk" in a.plan and "StorageLevel(disk" in a.plan, a.plan[:1500]


def test_no_cartesian_in_any_registered_query(spark, sf_dir):
    """Blanket invariant over the ENTIRE query library: no plan may
    contain a CartesianProduct. One-row broadcast cross joins compile
    to BroadcastNestedLoopJoin (bounded, fine); a true cartesian at
    100 TB is always a bug. Sweeping all plans (~35s at sf0.001)
    means a new query can't slip one in unpinned."""
    from ice_spark.queries.registry import load_all

    offenders = []
    for name, spec in load_all().items():
        a = audit(spec.spark_fn(spark, sf_dir))
        if "CartesianProduct" in a.plan:
            offenders.append(name)
    assert not offenders, offenders


def test_e15_two_shuffle_anomaly_plan(spark, sf_dir):
    """e15: hourly agg (one shuffle) + per-type window (one) — the
    window input is the tiny rollup, never raw events."""
    a = _audit(spark, sf_dir, "e15_anomalous_hours")
    assert a.shuffles <= 2, a.plan[:1500]
    assert a.sort_merge_joins == 0


def test_g02_triangle_joins_never_broadcast_graph_relations(spark, sf_dir):
    """g02: edges/degrees/oriented all grow with the graph, so the
    self-joins must be shuffle joins — a broadcast of the oriented
    relation OOMs the driver at scale (observed at sf0.1 pre-hint)."""
    # The static (pre-AQE) plan may still broadcast the lineitem
    # self-join side — AQE re-plans that from runtime sizes. What must
    # never be broadcast are the hinted graph relations; the hints are
    # load-bearing (removing them OOMs the sf0.1 broadcast). The
    # degree-keyed joins are MERGE, not shuffle_hash: the r8 sf5 probe
    # showed the per-task hash build of a hub-skewed partition has no
    # spill path (hard "can't acquire memory" crash), while sort-merge
    # spills and AQE splits the skewed partitions. EXACTLY two
    # ShuffledHashJoins are sanctioned (r13 shape) — the two
    # adjacency-array endpoint joins, whose build side is the
    # per-node adjacency relation (unique hash-uniform node keys, no
    # hub partition; AQE skew split covers an in-degree hub on the
    # probe side).
    for name in (
        "g02_copurchase_triangles",
        "g03_triangle_support_by_degree",
    ):
        a = _audit(spark, sf_dir, name)
        assert a.sort_merge_joins >= 2, (name, a.plan[:1500])
        assert a.plan.count("ShuffledHashJoin") == 2, (name, a.plan[:1500])


def test_dq01_single_pass_per_table(spark, sf_dir):
    """dq01: all per-table constraints share ONE conditional-aggregate
    scan; only the FK anti-joins rescan. Adding a constraint must not
    add a scan."""
    a = _audit(spark, sf_dir, "dq01_constraint_suite")
    # The 1-row metric tuples are cached; each InMemoryRelation prints
    # its build subtree, so textual scan counts over-state runtime
    # scans (runtime: lineitem = cache build + FK anti-join = 2).
    assert a.plan.count("InMemoryTableScan") >= 2, a.plan[:1500]
    assert a.plan.count("lineitem.parquet") <= 5, "constraint checks rescan lineitem"
    assert a.plan.count("orders.parquet") <= 6, "constraint checks rescan orders"


def test_k08_partials_merge_without_raw_rescan(spark, sf_dir):
    """k08: the sketch side scans raw events once (cached partials feed
    both the day grid and the window merge); the exact audit adds one
    more. The static explain prints the cached subtree per reference,
    so the bound is 3 textual scans; at runtime the cache collapses
    the partials replays to one."""
    spark.catalog.clearCache()
    a = _audit(spark, sf_dir, "k08_hll_sliding_distinct")
    # Every partials consumer must read the cache (the explain prints
    # the cached build subtree under each InMemoryTableScan, so the
    # textual parquet count over-states the runtime scans).
    assert a.plan.count("InMemoryTableScan") >= 2, a.plan[:1500]
    assert a.plan.count("events.parquet") <= 4, a.plan[:1500]


def test_k12_bounded_sketch_plan(spark, sf_dir):
    """k12: one raw scan feeds the bucket build; the percentile
    windows and probe run on the <=64-buckets-per-group relation —
    three shuffles total, no joins beyond the broadcast probe."""
    a = _audit(spark, sf_dir, "k12_log_histogram_percentiles")
    assert a.plan.count("events.parquet") == 1, a.plan[:1500]
    assert a.shuffles <= 3, a.plan[:1500]
    assert a.sort_merge_joins == 0


def test_e12_no_raw_event_sort(spark, sf_dir):
    """e12 (round-6 rewrite): bottom-half value mass via bucket
    narrowing — the plan must contain NO single-partition exchange
    (the old cume_dist form sorted every raw event into one task per
    type) and no cume_dist window at all."""
    spark.catalog.clearCache()
    a = _audit(spark, sf_dir, "e12_event_value_percentile")
    assert "Exchange SinglePartition" not in a.plan, a.plan[:1500]
    assert "cume_dist" not in a.plan, a.plan[:1500]
    assert a.sort_merge_joins == 0


def test_e20_ntile_is_distributed_sort(spark, sf_dir):
    """e20 (round-6 rewrite): the three RFM quartiles go through
    operators/ranking.global_ntile — three range-partitioned
    distributed sorts; no ntile() window (the old form ran three
    unpartitioned NTILE sorts over the whole per-customer relation).
    SinglePartition exchanges remain only over partition-count-sized
    offset relations (bounded by cluster parallelism, not data).

    Round 7: with_global_rank materializes the range-partitioned
    relation via localCheckpoint (ADVICE r6 — the cache leaked a
    CacheManager entry per call and a stage retry could re-sample
    boundaries), so the explain of the final plan is truncated at the
    checkpointed RDD: the three range exchanges live upstream of the
    three `Scan ExistingRDD` leaves instead of appearing inline."""
    spark.catalog.clearCache()
    a = _audit(spark, sf_dir, "e20_rfm_segmentation")
    assert "ntile(" not in a.plan, a.plan[:1500]
    assert a.plan.count("Scan ExistingRDD") >= 3, a.plan[:1500]
    # the range partitioning itself is pinned by tests/test_ranking.py
    # (correctness at 200k rows) — the exchange is inside the
    # checkpoint's upstream plan, invisible to this explain.


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # per-customer agg + global_ntile (range sort + offsets) +
        # decile rollup + ordered output — each exchange past the
        # first moves bounded relations (deciles, offsets)
        ("w10_lorenz_gini_deciles", 7),
        # user-keyed agg + lifespan histogram + 14-row grid rollup
        ("e26_user_lifespan_survival", 4),
        # map-only synth+demux; fps rollup + ordered output
        ("m07_video_frame_sampling", 3),
        # hot/cold split + salted hot path + union + rollup — the
        # extra exchanges move the 1%-of-keys hot slice and the tiny
        # profile relation, never the full fact twice
        ("j02_salted_hot_key_join", 7),
        # three monotone-shrinking user-keyed step joins + 1-row combine
        ("e27_three_step_funnel", 3),
    ],
)
def test_round6_query_shuffle_budget(spark, sf_dir, name, max_exchanges):
    spark.catalog.clearCache()
    a = _audit(spark, sf_dir, name)
    assert a.shuffles <= max_exchanges, f"{name}: {a.shuffles} shuffles\n{a.plan[:2000]}"
    assert a.sort_merge_joins == 0
    assert "CartesianProduct" not in a.plan


def test_v04_banded_neardup_is_keyed_not_allpairs(spark, sf_dir):
    """v04 (r8 re-spec): candidates must come from (band, bucket)
    equi-joins — zero BroadcastNestedLoopJoin (the old all-pairs
    plan), zero CartesianProduct, zero SortMergeJoin at this SF, and
    the bucket cap's window present."""
    a = _audit(spark, sf_dir, "v04_cosine_neardup_pairs")
    assert "BroadcastNestedLoopJoin" not in a.plan
    assert "CartesianProduct" not in a.plan
    # Exactly one SMJ: the (band, key) bucket self-join is
    # merge-pinned (r13-opt, see dedup.band_candidates) — exchange
    # reused across the two sides instead of a broadcast rebuild.
    assert a.sort_merge_joins == 1, a.plan[:1500]
    assert a.shuffles <= 6, f"{a.shuffles} shuffles\n{a.plan[:2000]}"
    assert "__bsz" in a.plan  # the banded-bucket cap


def test_s13_lsh_split_shuffle_budget(spark, sf_dir):
    """s13: d04's banding + one CC round's static plan + the split
    tail. The only BNLJ is the 1-row leaky-audit aggregate crossJoin;
    everything else is keyed."""
    spark.catalog.clearCache()
    a = _audit(spark, sf_dir, "s13_cluster_split_lsh")
    assert "CartesianProduct" not in a.plan
    assert a.plan.count("BroadcastNestedLoopJoin") <= 1
    assert a.shuffles <= 11, f"{a.shuffles} shuffles\n{a.plan[:2000]}"


def test_force_rows_defeats_join_elimination(spark, sf_dir):
    """The honest-probe contract (PERF.md Round 10 / VERDICT r10 #4):
    t16's final operator is a left join against an aggregate keyed by
    the unique doc_id — under count() Catalyst ELIMINATES it and the
    probe reads parquet metadata; force_agg references every output
    column, so the join must survive in the optimized plan and the
    count must agree."""
    from ice_spark.plans import force_agg, force_rows, plan_string
    from ice_spark.queries.registry import load_all

    df = load_all()["t16_dsir_importance_weights"].spark_fn(spark, sf_dir)
    count_plan = plan_string(df.groupBy().count())
    forced_plan = plan_string(force_agg(df))
    # the pitfall itself: bare count() really does lose the join
    assert "Join" not in count_plan, count_plan[:1200]
    assert "Join" in forced_plan, forced_plan[:1200]
    assert force_rows(df) == df.count()


def test_force_rows_handles_map_columns(spark):
    """Map-typed outputs (not hashable in Spark SQL) go through the
    to_json detour rather than failing the probe."""
    from ice_spark.plans import force_rows

    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2})], "id long, kv map<string,int>"
    )
    assert force_rows(df) == 2


def test_g03_triangle_mass_matches_g02(spark, sf_dir):
    """Cross-invariant: g03's per-degree-bucket triangle counts are
    g02's exactly-once apex accounting DISAGGREGATED, so their sum
    must equal g02's n_triangles on the same corpus (both relations
    also hold independently against their DuckDB oracles)."""
    from pyspark.sql import functions as F

    from ice_spark.queries.registry import load_all

    specs = load_all()
    g02 = specs["g02_copurchase_triangles"].spark_fn(spark, sf_dir).collect()[0]
    g03 = (
        specs["g03_triangle_support_by_degree"]
        .spark_fn(spark, sf_dir)
        .agg(F.sum("n_triangles").alias("t"), F.sum("n_nodes").alias("n"))
        .collect()[0]
    )
    assert g03["t"] == g02["n_triangles"]
    assert g03["n"] == g02["n_nodes"]
