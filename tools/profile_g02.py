"""Phase profile of the shared g02/g03 co-purchase graph build.

Times each materialization boundary of _copurchase_graph + the g02
consumers separately (noop-style force_agg actions), so the sf10
dominator's 250-440 s can be attributed to a phase before any rewrite
(guide §1: measure first). Run in a FRESH process per the r13 lesson
(g02 at sf10 needs a clean JVM):

    python tools/profile_g02.py .bench_cache/sf1
    python tools/profile_g02.py .bench_cache/sf10
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1]
    from pyspark.sql import functions as F

    from ice_spark.plans import force_agg
    from ice_spark.queries.graph import (
        _copurchase_graph,
        _oriented_adjacency,
        _triangles_per_edge,
    )
    from ice_spark.session import get_spark

    spark = get_spark("profile_g02")
    sc = spark.sparkContext

    def tick(label: str, df) -> float:
        sc.setJobDescription(f"g02-phase: {label}")
        t0 = time.time()
        row = force_agg(df).collect()[0]
        dt = time.time() - t0
        print(f"{label:28s} {dt:8.1f}s  rows={row['n']}", flush=True)
        return dt

    t_total0 = time.time()
    e, deg, od = _copurchase_graph(spark, sf_dir)
    # Phase 1: the edge build (sets agg + pair explode + distinct),
    # materialized into e's DISK_ONLY persist.
    tick("e (edges, persist)", e)
    # Phase 2: degree aggregate off the persisted e.
    tick("deg (cache)", deg)
    # Phase 3: orientation joins + repartition(sid), persisted.
    tick("od (orientation, persist)", od)
    # Phase 4: adjacency arrays off the persisted od.
    adj = _oriented_adjacency(od)
    tick("adj (arrays, persist)", adj)
    # Phase 5: wedge count (reads persisted adj only).
    nw = adj.select(F.size("nbrs").alias("c")).agg(
        F.expr("COALESCE(SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)), 0) div 2")
        .cast("long")
        .alias("n_wedges")
    )
    tick("nw (wedge agg)", nw)
    # Phase 6: triangle count — od join adj twice + array_intersect.
    wt = _triangles_per_edge(od, adj).agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles")
    )
    tick("wt (intersect+agg)", wt)
    tick("n_nodes", deg.agg(F.count(F.lit(1)).alias("n_nodes")))
    tick("n_edges", e.agg(F.count(F.lit(1)).alias("n_edges")))
    print(f"{'TOTAL':28s} {time.time() - t_total0:8.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
