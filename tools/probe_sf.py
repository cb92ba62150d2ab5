"""Scale-probe runner over the query registry.

The per-round bench (bench.py) runs the 15 headline queries at sf0.1;
this tool drives ANY scale directory (e.g. `.bench_cache/sf1` /
`.bench_cache/sf5` built by tools/scale_testdata.py) over named
queries or the whole registry, printing per-query wall time and row
counts. It is how the r8 findings were made: g02's shuffle_hash OOM,
the v06/v10/v11 seed-hash overflow at 49e9 ids, d12's 424M-pair block
blowup, and the posting-cap recall/waste regime — run it after any
operator change that claims a scale property.

Every probe evaluates via ice_spark.plans.force_rows (a hash over all
output columns), never bare count(): count() lets Catalyst eliminate
final cardinality-preserving operators, turning the probe into a
parquet-metadata read (t16 measured 0.5s that way in r10). Against an
sf10 directory the sweep additionally pins the cap-collapse output
shapes of the d02-pair family (SF10_EXPECT_ROWS).

Usage:
    python tools/probe_sf.py <sf_dir> [query ...]      # min-of-2 warm
    python tools/probe_sf.py <sf_dir> --sweep          # whole registry, 1 run each
    python tools/probe_sf.py <sf_dir> --sweep --skip d02_ngram_jaccard_pairs ...

The sweep doubles as a large-id robustness test when the scale
directory carries shifted surrogate keys (sf5's ids reach 49e9 —
any `id * bigconstant` overflows ANSI arithmetic there long before
production snowflake ids would hit it).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The d02-pair family regime at sf10, PINNED instead of skipped
# (the r8-era skip list is retired — re-measured r10 at 37-47s each):
# at 100x dup density the 512-posting caps drop ~94% of postings
# (d17's measured collapse), so the capped candidate set is EMPTY by
# construction and every consumer's output shape is fixed. The sweep
# asserts these shapes whenever it runs against an sf10 directory —
# a non-empty d02 there would mean the cap semantics changed.
SF10_EXPECT_ROWS = {
    "d02_ngram_jaccard_pairs": 0,
    "d07_containment_pairs": 0,
    "d06_neardup_clusters": 0,
    "d09_canonical_selection": 0,
    "s11_cluster_disjoint_split": 2,
    "d16_dedup_policy_simulator": 4,
}

# Queries that need an ISOLATED SparkSession (stop + fresh app before
# and after) mid-sweep: the graph triangle pair. r13 tried removing
# g02 after the adjacency-intersection reshape cut its footprint 3.7x
# — a 5-query shared-session sequence (d04 -> s11 -> g02 -> g01 ->
# g02 at sf10) held with the inter-query GC hygiene below, but the
# REAL sweep OOM'd g02 at 77 queries of session history (r13 final
# sweep log): accumulated JVM state a short sequence can't reproduce.
# A real cluster runs every job as its own application; the marathon
# shared session is a probe-harness artifact, and this pin makes the
# sweep behave like production for the two queries that need it.
FRESH_SESSION: set[str] = {
    "g02_copurchase_triangles",
    "g03_triangle_support_by_degree",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sweep", action="store_true", help="run every registered query once")
    ap.add_argument("--skip", nargs="*", default=None, help="sweep skip list (default: none)")
    ap.add_argument("--runs", type=int, default=2, help="runs per named query (warm = last)")
    ap.add_argument(
        "--span-cut-check",
        action="store_true",
        help="run the APPLIED span cut and pin tokens_cut conservation "
        "against d19 per source at this scale (not just a timing)",
    )
    args = ap.parse_args()

    from ice_spark.session import get_spark
    from ice_spark.queries.registry import load_all

    spark = get_spark("probe_sf")
    from ice_spark.session import assert_ansi

    assert_ansi(spark)
    specs = load_all()

    if args.span_cut_check:
        # Cross-invariant at scale (VERDICT r9 item 8): the applied
        # transform must remove EXACTLY the token mass the gated d19
        # summary reports, per source — the same pin
        # tests/test_dedup.py holds at gate SF, re-asserted wherever
        # the probe runs (sf10's 100x dup density included).
        from pyspark.sql import functions as F

        from ice_spark.operators.dedup import span_cut_documents
        from ice_spark.tables import load_table

        t0 = time.time()
        docs = load_table(spark, args.sf_dir, "documents")
        got = {
            r.source: (r.n, r.cut)
            for r in span_cut_documents(docs)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("tokens_cut").alias("cut"))
            .collect()
        }
        t_cut = time.time() - t0
        t0 = time.time()
        want = {
            r.source: (r.n_docs, r.tokens_cut)
            for r in specs["d19_span_dedup_cut"].spark_fn(spark, args.sf_dir).collect()
        }
        t_d19 = time.time() - t0
        total_cut = sum(c for _, c in got.values())
        print(
            f"span-cut-check@{args.sf_dir}: cut={t_cut:.1f}s d19={t_d19:.1f}s "
            f"sources={len(got)} tokens_cut={total_cut} "
            f"conserved={'YES' if got == want else 'NO'}",
            flush=True,
        )
        if got != want:
            print(f"  span_cut per source: {got}", flush=True)
            print(f"  d19 per source:      {want}", flush=True)
            return 1
        if not args.queries and not args.sweep:
            return 0

    if args.sweep:
        from ice_spark.plans import force_rows

        skip = set(args.skip) if args.skip is not None else set()
        # shape pins apply only to the sf10 cap-collapse regime
        expect = (
            SF10_EXPECT_ROWS
            if Path(args.sf_dir).name.rstrip("/") == "sf10"
            else {}
        )
        ok, fails = 0, []
        t_all = time.time()
        for name in sorted(specs):
            if name in skip:
                print(f"SKIP {name}", flush=True)
                continue
            if name in FRESH_SESSION:
                # A truly fresh JVM via subprocess. The old form
                # (spark.stop() + new session IN-PROCESS) restarts
                # the SparkContext but keeps the py4j gateway JVM —
                # and with it ~80 queries of heap state: the third
                # r13-opt sweep OOM'd g02 that way
                # (UNABLE_TO_ACQUIRE_MEMORY acquiring 128 MB pages)
                # while the identical query was green in a clean
                # process minutes later. A real cluster runs each job
                # as its own application; subprocess isolation makes
                # the sweep match that for the queries pinned here.
                import re as _re  # noqa: PLC0415
                import subprocess  # noqa: PLC0415

                t0 = time.time()
                proc = subprocess.run(
                    [sys.executable, __file__, args.sf_dir, name, "--runs", "1"],
                    capture_output=True,
                    text=True,
                    check=False,
                )
                dt = time.time() - t0
                m = _re.search(r"rows=(\d+)", proc.stdout or "")
                if proc.returncode == 0 and m:
                    n = int(m.group(1))
                    if name in expect and n != expect[name]:
                        print(
                            f"FAIL {name}: rows={n}, sf10 regime pin "
                            f"expects rows={expect[name]} {dt:.1f}s",
                            flush=True,
                        )
                        fails.append(name)
                    else:
                        pin = " (pinned)" if name in expect else ""
                        print(
                            f"OK   {name}: rows={n}{pin} {dt:.1f}s "
                            "(fresh JVM)",
                            flush=True,
                        )
                        ok += 1
                else:
                    tail = (
                        ((proc.stdout or "") + (proc.stderr or ""))
                        .strip()
                        .splitlines()
                    )
                    last = tail[-1][:160] if tail else ""
                    print(
                        f"FAIL {name}: fresh-JVM run rc={proc.returncode} {last}",
                        flush=True,
                    )
                    fails.append(name)
                continue
            spark.catalog.clearCache()
            # localCheckpoint blocks are NOT freed by clearCache —
            # they go when the RDD is GC'd, and Python->py4j->JVM GC
            # lags a 184-query single-session sweep enough to OOM at
            # sf10 (d02-d08's checkpointed shingle relations piled up
            # into d09's heap). Collect both sides between queries.
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            try:
                # force_rows, not count(): every output column is
                # evaluated, so Catalyst can't eliminate a final join
                # and turn the probe into a metadata read (the t16
                # pitfall, PERF.md Round 10)
                n = force_rows(specs[name].spark_fn(spark, args.sf_dir))
                if name in expect and n != expect[name]:
                    print(
                        f"FAIL {name}: rows={n}, sf10 regime pin expects "
                        f"rows={expect[name]} {time.time() - t0:.1f}s",
                        flush=True,
                    )
                    fails.append(name)
                    continue
                pin = " (pinned)" if name in expect else ""
                print(
                    f"OK   {name}: rows={n}{pin} {time.time() - t0:.1f}s",
                    flush=True,
                )
                ok += 1
            except Exception as ex:  # noqa: BLE001 - sweep reports, never dies
                print(f"FAIL {name}: {str(ex).splitlines()[0][:160]}", flush=True)
                fails.append(name)
        print(
            f"DONE ok={ok} fail={len(fails)} skip={len(skip)} "
            f"total={time.time() - t_all:.0f}s fails={fails}",
            flush=True,
        )
        return 1 if fails else 0

    for name in args.queries:
        if name not in specs:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        from ice_spark.plans import force_rows

        for attempt in range(1, args.runs + 1):
            spark.catalog.clearCache()
            t0 = time.time()
            n = force_rows(specs[name].spark_fn(spark, args.sf_dir))
            print(
                f"{name}@{args.sf_dir} run{attempt}: rows={n} {time.time() - t0:.1f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
