"""Capture ``explain("formatted")`` for registered queries and
summarize physical-plan shapes (optimization-round evidence).

Usage:
    python tools/capture_plans.py <sf_dir> <out_dir> [query ...]

Writes ``<out_dir>/<query>.txt`` per query plus a one-line-per-query
``<out_dir>/SHAPES.tsv`` with: Exchange count, join node histogram,
Python-boundary nodes, scan PushedFilters presence. Plans are compiled
only (no execution) — some operators (IVF training, repartitionByRange
sampling) do run driver-side jobs while *building* the DataFrame;
that cost is accepted here.
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
            "FlatMapGroupsInPandas", "AggregateInPandas")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def shape(plan: str) -> str:
    c = Counter()
    for node in JOIN_NODES + PY_NODES + ("Exchange", "WindowExec", "Window ", "Subquery"):
        c[node.strip()] = len(re.findall(rf"\b{node.strip()}\b", plan))
    joins = ",".join(f"{n}:{c[n]}" for n in (j for j in JOIN_NODES) if c[n])
    pys = ",".join(f"{n}:{c[n]}" for n in (p for p in PY_NODES) if c[n])
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    scans = plan.count("Scan parquet")
    return (
        f"exch={c['Exchange']}\tjoins=[{joins}]\tpy=[{pys}]\t"
        f"scans={scans}\tscans_with_pushed={pushed}"
    )


def main() -> None:
    sf, out_dir = sys.argv[1], Path(sys.argv[2])
    only = set(sys.argv[3:])
    out_dir.mkdir(parents=True, exist_ok=True)

    from ice_spark.queries.registry import load_all
    from ice_spark.session import get_spark

    spark = get_spark("capture_plans")
    rows = []
    for name, spec in sorted(load_all().items()):
        if only and name not in only:
            continue
        try:
            df = spec.spark_fn(spark, sf)
            plan = explain_str(df)
        except Exception as e:  # capture must be a full sweep, not die
            plan = f"ERROR: {e}"
        (out_dir / f"{name}.txt").write_text(plan)
        s = shape(plan) if not plan.startswith("ERROR") else "ERROR"
        rows.append(f"{name}\t{s}")
        print(f"{name}\t{s}", flush=True)
        spark.catalog.clearCache()
    (out_dir / "SHAPES.tsv").write_text("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
