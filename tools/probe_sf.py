"""Scale-probe runner over the query registry.

The per-round bench (bench.py) runs the 15 headline queries at sf0.1;
this tool drives ANY scale directory (e.g. `.bench_cache/sf1` /
`.bench_cache/sf5` built by tools/scale_testdata.py) over named
queries or the whole registry, printing per-query wall time and row
counts. It is how the r8 findings were made: g02's shuffle_hash OOM,
the v06/v10/v11 seed-hash overflow at 49e9 ids, d12's 424M-pair block
blowup, and the posting-cap recall/waste regime — run it after any
operator change that claims a scale property.

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

# Known-heavy at 50x: the d02-pair consumers are workload-bound
# (240-360s each, measured r8) — skip them by default in --sweep.
# d08 left the skip list in r9: its split hash now carries the
# (id % 2^31) * KNUTH overflow guard and runs clean at 49e9-id scale.
DEFAULT_SWEEP_SKIP = {
    "d02_ngram_jaccard_pairs",
    "d07_containment_pairs",
    "s11_cluster_disjoint_split",
    "d06_neardup_clusters",
    "d09_canonical_selection",
    "d16_dedup_policy_simulator",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sweep", action="store_true", help="run every registered query once")
    ap.add_argument("--skip", nargs="*", default=None, help="override the sweep skip list")
    ap.add_argument("--runs", type=int, default=2, help="runs per named query (warm = last)")
    args = ap.parse_args()

    from ice_spark.session import get_spark
    from ice_spark.queries.registry import load_all

    spark = get_spark("probe_sf")
    specs = load_all()

    if args.sweep:
        skip = set(args.skip) if args.skip is not None else DEFAULT_SWEEP_SKIP
        ok, fails = 0, []
        t_all = time.time()
        for name in sorted(specs):
            if name in skip:
                print(f"SKIP {name}", flush=True)
                continue
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                n = specs[name].spark_fn(spark, args.sf_dir).count()
                print(f"OK   {name}: rows={n} {time.time() - t0:.1f}s", flush=True)
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
        for attempt in range(1, args.runs + 1):
            spark.catalog.clearCache()
            t0 = time.time()
            n = specs[name].spark_fn(spark, args.sf_dir).count()
            print(
                f"{name}@{args.sf_dir} run{attempt}: rows={n} {time.time() - t0:.1f}s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
