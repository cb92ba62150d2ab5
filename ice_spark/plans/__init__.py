"""Physical-plan inspection utilities — the scale contract, queryable.

The reference has no optimizer (SURVEY.md §4); in this engine Catalyst
owns planning, and this module is how we *audit* what Catalyst chose:
which joins broadcast, which filters reached the parquet reader, how
many shuffles a pipeline costs. `tests/test_plans.py` pins these
invariants so a regression fails in CI, not at 100 TB.

Usage:

    from ice_spark.plans import audit
    a = audit(df)
    assert a.sort_merge_joins == 0 and a.shuffles <= 1
    print(a.report())
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Executed-plan text (pre-AQE final shape, broadcast hints resolved)."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanAudit:
    plan: str
    shuffles: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    broadcast_nested_loop_joins: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    scans: int = 0
    has_empty_pushed_filters: bool = False

    def report(self) -> str:
        lines = [
            f"shuffles (hash+range exchanges): {self.shuffles}",
            f"broadcast hash joins:            {self.broadcast_joins}",
            f"sort-merge joins:                {self.sort_merge_joins}",
            f"nested-loop joins:               {self.broadcast_nested_loop_joins}",
            f"parquet scans:                   {self.scans}",
        ]
        for s in self.read_schemas:
            cols = len(s.split(",")) if s else 0
            lines.append(f"  scan reads {cols} cols: {s[:80]}")
        for f_ in self.pushed_filters:
            lines.append(f"  pushed: {f_[:80]}")
        return "\n".join(lines)


def audit(df: DataFrame) -> PlanAudit:
    plan = plan_string(df)
    return PlanAudit(
        plan=plan,
        shuffles=plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        broadcast_nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)", plan) if m
        ],
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        scans=plan.count("Scan parquet"),
        has_empty_pushed_filters="PushedFilters: []" in plan,
    )


def force_rows(df: DataFrame) -> int:
    """Row count with EVERY output column evaluated.

    `df.count()` lets Catalyst eliminate final operators that don't
    change cardinality — a left join against an aggregate keyed by a
    unique column costs nothing under count(), so a probe built on it
    measures parquet metadata, not the query (the t16 pitfall,
    PERF.md Round 10). Aggregating a hash over all output columns
    references every column, so no final operator can be pruned; the
    returned count is identical to df.count().

    Map-typed columns aren't hashable in Spark SQL — they go through
    to_json first (probe-only path; never in a hot query).
    """
    return force_agg(df).collect()[0]["n"]


def force_agg(df: DataFrame) -> DataFrame:
    """The one-row (n, h) aggregate force_rows evaluates — exposed so
    tests can pin that its plan retains operators count() eliminates."""
    from pyspark.sql import functions as F

    cols = [
        F.to_json(F.col(c)) if "map<" in t else F.col(c)
        for c, t in df.dtypes
    ]
    # bit_xor, not sum: hash sums overflow int64 under ANSI mode
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols) if cols else F.lit(0)).alias("h"),
    )
