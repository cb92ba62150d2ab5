"""Smoke: every registered query runs and returns a stable schema.

Full value-level verification against DuckDB lives in
tools/check_correctness.py (mirrors the driver's gate); these tests
guard importability, execution, and determinism across runs.
"""

from __future__ import annotations

import pytest


def _specs():
    from ice_spark.queries.registry import load_all

    return load_all()


def test_registry_nonempty():
    specs = _specs()
    assert len(specs) >= 40
    # Every oracle is a non-empty SQL string when present.
    for spec in specs.values():
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper()


@pytest.mark.parametrize("name", sorted(_specs()))
def test_query_runs(spark, sf_dir, name):
    spec = _specs()[name]
    df = spec.spark_fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns  # schema exists
    assert rows is not None


def test_entry_contract(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
    qs = ent.queries()
    oracles = ent.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
