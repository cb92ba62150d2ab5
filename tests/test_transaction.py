"""Multi-table publish saga (catalog/transaction.py)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.catalog.table import CommitConflictError
from ice_spark.catalog.transaction import publish_all
from ice_spark.ingest.insert import append_dataframe, insert

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def _src(spark, tmp_path, rows, name):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(d)
    return sorted(glob.glob(d + "/*.parquet"))


def _staged_table(spark, cat, tmp_path, ident, seed):
    t = cat.create_table(ident, schema=SCHEMA)
    append_dataframe(t, spark.createDataFrame([(seed, "base")], SCHEMA))
    insert(
        t.refresh(),
        _src(spark, tmp_path, [(seed + 100, "staged")], f"src_{ident.replace('.', '_')}"),
        stage_branch="txn",
    )
    return t.refresh()


def test_publish_all_success(spark, cat, tmp_path):
    a = _staged_table(spark, cat, tmp_path, "ns.a", 1)
    b = _staged_table(spark, cat, tmp_path, "ns.b", 2)
    res = publish_all(cat, [("ns.a", "txn"), ("ns.b", "txn")])
    assert res["published"] == [("ns.a", "txn"), ("ns.b", "txn")]
    assert {r.id for r in a.refresh().read().collect()} == {1, 101}
    assert {r.id for r in b.refresh().read().collect()} == {2, 102}


def test_validate_fails_before_anything_moves(spark, cat, tmp_path):
    a = _staged_table(spark, cat, tmp_path, "ns.a2", 1)
    b = _staged_table(spark, cat, tmp_path, "ns.b2", 2)
    # b's main advances after the stage: validation must refuse and
    # table a must NOT be published
    append_dataframe(b.refresh(), spark.createDataFrame([(9, "later")], SCHEMA))
    with pytest.raises(CommitConflictError, match="nothing was published"):
        publish_all(cat, [("ns.a2", "txn"), ("ns.b2", "txn")])
    assert {r.id for r in a.refresh().read().collect()} == {1}
    assert "txn" in a.refs()  # stage intact for retry


def test_compensation_rolls_back_published(spark, cat, tmp_path, monkeypatch):
    a = _staged_table(spark, cat, tmp_path, "ns.a3", 1)
    _staged_table(spark, cat, tmp_path, "ns.b3", 2)

    # make b's publish fail AFTER validation (simulating a racing
    # writer landing between validate and publish)
    from ice_spark.catalog.table import Table

    real_publish = Table.publish_branch

    def flaky(self, branch):
        if "b3" in self.location:
            raise CommitConflictError("simulated race")
        return real_publish(self, branch)

    monkeypatch.setattr(Table, "publish_branch", flaky)
    with pytest.raises(CommitConflictError, match="rolled back: \\['ns.a3'\\]"):
        publish_all(cat, [("ns.a3", "txn"), ("ns.b3", "txn")])
    # a is back to its pre-publish state, with history preserved
    a.refresh()
    assert {r.id for r in a.read().collect()} == {1}
    assert a.snapshot()["operation"] == "rollback"
    # staged snapshot still pinned by the restored ref
    assert "txn" in a.refs()
