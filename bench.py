"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall-clock seconds across headline queries (lower is
better). Each query is executed with a count-style action so results
materialize fully but don't serialize to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Headline set: mix of scan-heavy, join-heavy, window, text, vector.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q09_product_type_profit",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "w01_top_customers_per_nation",
    "e01_hourly_event_stats",
    "e03_sessionization",
    "e06_asof_click_before_purchase",
    "t02_quality_scores",
    "d03_minhash_signatures",
    "d04_minhash_lsh_pairs",
    "v01_knn_bruteforce",
]

# Aux sections (timed once each; warmed at sf0.001 like the headline
# so the single shot measures the operator, not first-run compile).
SKETCH_OPS = (
    "k01_kmv_distinct_users",
    "k02_countmin_heavy_hitters",
    "k05_kmv_mergeable_rollup",
)
R5_OPS = (
    "k07_hll_distinct_users",
    "g01_pagerank_order_network",
    "d11_incremental_neardup_admission",
    "m04_audio_window_energy",
    "d12_fuzzy_name_matches",
)
R5B_OPS = (
    "dq01_constraint_suite",
    "g02_copurchase_triangles",
    "k08_hll_sliding_distinct",
    "k10_exact_median_two_pass",
    "e17_multitouch_attribution",
    "p03_dataset_card",
    "s11_cluster_disjoint_split",
    "v13_mmr_rerank",
)
AUX_OPS = SKETCH_OPS + R5_OPS + R5B_OPS


def main() -> None:
    from ice_spark.queries.registry import load_all
    from ice_spark.session import get_spark, sf_dir

    sf = sf_dir()
    spark = get_spark("ice_spark_bench")
    from ice_spark.session import assert_ansi

    assert_ansi(spark)
    specs = load_all()

    # Warm the JVM, codegen, and parquet reader paths so the first
    # measured query doesn't pay session startup.
    spark.read.parquet(os.path.join(sf, "region.parquet")).count()
    warm = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    warm.groupBy("l_returnflag").count().collect()

    # Whole-stage-codegen compile costs ~1s per distinct plan shape and
    # is cached by generated source. Running each headline query once
    # against the tiniest SF compiles the same generated classes the
    # sf run will use, so measured timings reflect steady-state
    # execution, not one-time JIT.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and os.path.realpath(warm_sf) != os.path.realpath(sf):
        # The aux sections below (sketch/r5_ops/r5b_ops) time each
        # operator ONCE, so without this they measured cold
        # first-execution (codegen compile + Python-worker spin-up +
        # plan analysis), not the operator (r13-opt, guide §1:
        # m04 measured 1.8-2.2 s cold vs 0.58 s steady-state at
        # sf0.1). Same warm-up contract as the headline loop above —
        # the warm run computes sf0.001 data and nothing from it is
        # reused by the measured run (caches cleared).
        for name in HEADLINE + list(AUX_OPS):
            try:
                specs[name].spark_fn(spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass  # warm-up is best-effort; the measured run reports errors
            spark.catalog.clearCache()

    # Median-of-N per query (VERDICT r3: sub-second queries on a
    # shared sandbox swing ±0.3s run-to-run; three rounds of bench
    # disagreed by more than the noise budget with zero code changes).
    # The median is the reported number; p25/p75 expose the spread so
    # a future drift can be judged against the distribution, not a
    # single sample.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        spec = specs[name]
        samples: list[float] = []
        for _ in range(reps):
            t0 = time.time()
            try:
                df = spec.spark_fn(spark, sf)
                # Materialize every row without collecting to the driver.
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
            except Exception as e:  # one bad query must not kill the line
                errors[name] = str(e).splitlines()[0][:200]
                samples.append(time.time() - t0)
                break
        s = sorted(samples)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        timings[name] = round(med, 3)
        stats[name] = {
            "median": round(med, 3),
            "p25": round(s[max(0, (len(s) - 1) // 4)], 3),
            "p75": round(s[min(len(s) - 1, (3 * (len(s) - 1) + 3) // 4)], 3),
            "runs": len(s),
        }

    # Drift vs the committed anchor (BENCH_r01.json medians — r1 is
    # the oldest clean full run). >25% per-query movement is flagged
    # in the output so measurement problems surface as data, not as
    # three rounds of unexplained disagreement.
    drift: dict[str, dict] = {}
    anchor_file = REPO / "BENCH_r01.json"
    try:
        anchor = json.loads(anchor_file.read_text())
        anchor_q = anchor.get("queries", {}) if anchor.get("sf") == float(
            os.path.basename(sf.rstrip("/")).replace("sf", "") or 0
        ) else {}
        for name, med in timings.items():
            base = anchor_q.get(name)
            if base and base > 0:
                ratio = med / base
                if abs(ratio - 1.0) > 0.25:
                    drift[name] = {"anchor": base, "now": med, "ratio": round(ratio, 2)}
    except (OSError, ValueError):
        pass

    # Ingest throughput — the reference's actual performance surface
    # (its hot path is parquet→table ingest with client-side
    # partitioning + sorting; SURVEY.md §3.1). Partitioned+sorted
    # write of lineitem through the engine's insert verb.
    ingest: dict[str, float] = {}
    try:
        import shutil
        import tempfile

        from ice_spark.catalog.catalog import Catalog
        from ice_spark.ingest.insert import insert

        wh = tempfile.mkdtemp(prefix="ice_bench_wh_")
        try:
            cat = Catalog(spark, wh)
            cat.create_namespace("bench")
            src = os.path.join(sf, "lineitem.parquet")
            n_rows = spark.read.parquet(src).count()
            t0 = time.time()
            t = cat.create_table(
                "bench.lineitem_part",
                schema_from_parquet=src,
                partition_spec=[
                    {"column": "l_shipdate", "transform": "year", "name": "Year"}
                ],
                sort_order=[{"column": "l_orderkey"}],
            )
            insert(t, [src])
            ingest["partitioned_sorted_sec"] = round(time.time() - t0, 3)
            t0 = time.time()
            t2 = cat.create_table("bench.lineitem_plain", schema_from_parquet=src)
            insert(t2, [src])
            ingest["plain_copy_sec"] = round(time.time() - t0, 3)
            # gzip above is the reference's default codec (parity);
            # zstd is what a 100 TB deployment would actually run.
            t0 = time.time()
            t3 = cat.create_table("bench.lineitem_zstd", schema_from_parquet=src)
            insert(t3, [src], compression="zstd")
            ingest["plain_copy_zstd_sec"] = round(time.time() - t0, 3)
            ingest["rows"] = n_rows
            ingest["rows_per_sec_partitioned"] = round(
                n_rows / max(ingest["partitioned_sorted_sec"], 1e-9)
            )
            # Layout + mutation path: z-order the plain table on the
            # key, then merge an ~1%-of-keyrange update — measures
            # cluster_files and the bounds-pruned copy-on-write merge
            # (files_kept > 0 proves manifest pruning engaged).
            from pyspark.sql import functions as F

            from ice_spark.catalog.maintenance import cluster_files
            from ice_spark.catalog.merge import merge_upsert

            t0 = time.time()
            cluster_files(t2, ["l_orderkey"], n_output_files=8)
            ingest["zorder_sec"] = round(time.time() - t0, 3)
            hi = spark.read.parquet(src).agg(F.max("l_orderkey")).collect()[0][0]
            src_df = spark.read.parquet(src).where(F.col("l_orderkey") <= hi // 100)
            t0 = time.time()
            mres = merge_upsert(t2, src_df, ["l_orderkey", "l_linenumber"])
            ingest["merge_upsert_sec"] = round(time.time() - t0, 3)
            ingest["merge_source_rows"] = mres["source_rows"]
            ingest["merge_files_kept"] = mres["files_kept"]
            ingest["merge_files_rewritten"] = mres["files_rewritten"]
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    except Exception as e:  # ingest bench is additive; never break the line
        ingest["error"] = str(e).splitlines()[0][:200]

    # --- sketch operators (additive; not part of the anchored headline) -
    sketch: dict = {}
    try:
        for name in SKETCH_OPS:
            t0 = time.time()
            specs[name].spark_fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            sketch[name] = round(time.time() - t0, 3)
    except Exception as e:
        sketch["error"] = str(e).splitlines()[0][:200]

    # --- round-5 operators (additive; headline stays anchor-comparable) -
    r5_ops: dict = {}
    try:
        for name in R5_OPS:
            t0 = time.time()
            specs[name].spark_fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            r5_ops[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()  # drop per-query cached relations
    except Exception as e:
        r5_ops["error"] = str(e).splitlines()[0][:200]

    # --- round-5 continuation operators (additive) ---------------------
    r5b_ops: dict = {}
    try:
        for name in R5B_OPS:
            t0 = time.time()
            specs[name].spark_fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            r5b_ops[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
    except Exception as e:
        r5b_ops["error"] = str(e).splitlines()[0][:200]

    # --- sf1 scale probe (VERDICT r2 #8) -------------------------------
    # 10x the bench SF via key-shifted replication (tools/
    # scale_testdata.py), then run a representative headline subset.
    # Surfaces cliffs sf0.1 hides (shuffle spill, LSH bucket growth);
    # cached across runs; disable with SPARK_GRAFT_SF1_PROBE=0.
    sf1: dict = {}
    if os.environ.get("SPARK_GRAFT_SF1_PROBE", "1") != "0" and os.path.realpath(
        sf
    ) == os.path.realpath("/root/testdata/sf0.1"):
        try:
            from tools.scale_testdata import make_scaled

            sf1_dir = str(REPO / ".bench_cache" / "sf1")
            t0 = time.time()
            make_scaled(spark, sf, sf1_dir, factor=10)
            sf1["generate_sec"] = round(time.time() - t0, 3)
            probe = [
                "q01_pricing_summary",
                "q03_shipping_priority",
                "q18_large_volume_customer",
                "e01_hourly_event_stats",
                "e06_asof_click_before_purchase",
                "d04_minhash_lsh_pairs",
                "v01_knn_bruteforce",
                "t02_quality_scores",
                # round-5 ops: bounded-state sketch + batch-scaled
                # admission dedup, probed at 10x for cliff detection
                "k07_hll_distinct_users",
                "d11_incremental_neardup_admission",
                # round-5 continuation: bounded-partials sliding sketch
                # and two-pass exact median, both should stay flat-ish
                # at 10x (state is bounded; scans scale linearly)
                "k08_hll_sliding_distinct",
                "k10_exact_median_two_pass",
            ]
            q1: dict[str, float] = {}
            for name in probe:
                t0 = time.time()
                try:
                    specs[name].spark_fn(spark, sf1_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    q1[name] = round(time.time() - t0, 3)
                except Exception as e:
                    q1[name] = round(time.time() - t0, 3)
                    sf1.setdefault("errors", {})[name] = str(e).splitlines()[0][:200]
                finally:
                    spark.catalog.clearCache()
            sf1["queries"] = q1
            # same rule as the headline: a total summed over errored
            # queries is not a number anyone may compare
            sf1["valid"] = "errors" not in sf1
            sf1["total_sec"] = round(sum(q1.values()), 3) if sf1["valid"] else None
            sf1["sf"] = 1.0
        except Exception as e:  # the probe is additive; never break the line
            sf1["error"] = str(e).splitlines()[0][:200]

    total = round(sum(timings.values()), 3)
    sf_label = os.path.basename(sf.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_stats": stats,
        "reps": reps,
        **({"drift_vs_r01": drift} if drift else {}),
        "sf": float(sf_label) if sf_label else sf,
        "ingest": ingest,
        **({"sketch": sketch} if sketch else {}),
        **({"r5_ops": r5_ops} if r5_ops else {}),
        **({"r5b_ops": r5b_ops} if r5b_ops else {}),
        **({"sf1_probe": sf1} if sf1 else {}),
        # A total computed while queries errored is not comparable to a
        # clean run (failed queries "finish" in ~0.2s) — r2 published
        # 10.4s that way and it read as a win. Mark the line invalid
        # loudly and exit nonzero so no one graphs it by accident.
        "valid": not errors,
    }
    if errors:
        out["errors"] = errors
        out["value"] = None
    # The driver tail-captures stdout and parses the LAST line as the
    # bench record; r05's single fat line outgrew the capture window
    # and landed as parsed:null. Emit the full detail blob first, then
    # a compact headline line LAST so the tail always parses.
    print(json.dumps(out))
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": {k: v for k, v in timings.items()},
        "sf": out["sf"],
        "valid": out["valid"],
        **({"errors": sorted(errors)} if errors else {}),
    }
    print(json.dumps(compact))
    if errors:
        print(
            f"bench INVALID: {len(errors)} of {len(HEADLINE)} headline queries "
            f"errored: {sorted(errors)}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
