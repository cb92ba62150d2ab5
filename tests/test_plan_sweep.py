"""Whole-registry physical-plan invariants.

tests/test_plans.py pins per-query shuffle budgets for the queries
whose plans were hand-audited; this sweep asserts the two invariants
that must hold for EVERY registered query, so a new or edited query
can't silently regress them:

- no ``CartesianProduct``: an unconstrained cross join is quadratic
  in data — at 100 TB it never finishes. Bounded cross joins
  (1-row audit relations, broadcast candidate sets) compile to
  ``BroadcastNestedLoopJoin`` instead, which is allowed.
- no ``BatchEvalPython``: row-at-a-time Python UDFs serialize one
  row per round trip — the repo's contract is that every
  Python-executed path is Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / pandas aggregates), which this does not ban.

The sweep compiles each plan at sf0.001 (no execution), so the whole
registry costs plan-analysis time only.
"""

from __future__ import annotations

BANNED = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_or_rowwise_python_anywhere(spark, sf_dir):
    from ice_spark.queries.registry import load_all

    offenders: dict[str, list[str]] = {}
    for name, spec in load_all().items():
        plan = spec.spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        bad = [m for m in BANNED if m in plan]
        if bad:
            offenders[name] = bad
    assert not offenders, f"banned physical operators: {offenders}"
