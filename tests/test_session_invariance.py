"""Results must not depend on session tuning.

The external correctness runner executes every query on its OWN
untuned SparkSession — default shuffle partitions (200), default
broadcast threshold (10 MB), no AQE overrides — while the local gate
and the test suite run on `ice_spark.session.get_spark` (32/8
shuffle partitions, 64 MB broadcast). A query whose output depends on
partition count (tie-breaking in a window, range-partitioner boundary
sampling, per-partition rank arithmetic) passes every tuned check and
fails only at the driver — exactly the class of the round-6
`with_global_rank` boundary-resampling bug (caught at 150k rows).

This test re-runs the partition-topology-sensitive queries on a
`newSession()` clone with adversarial session confs (prime shuffle
partition count, reference-default broadcast threshold) and asserts
value-hash-identical results. The full 172-query version of this
check is `SPARK_GRAFT_PLAIN=1 python tools/check_correctness.py` —
run it per-round; this subset keeps the invariant pinned in CI time.
"""

from __future__ import annotations

import pytest

from tools.check_correctness import value_hash

# Queries whose plans contain the partition-sensitive constructs:
# distributed rank/NTILE (repartitionByRange + offsets), two-pass
# quantile narrowing, iterative keyed fixpoints, LSH bucket joins
# behind a localCheckpoint, salted joins.
SENSITIVE = [
    "a05_order_value_deciles",  # global_ntile (deciles)
    "e20_rfm_segmentation",  # global_ntile x3
    "w10_lorenz_gini_deciles",  # global_ntile + running shares
    "e12_event_value_percentile",  # two-pass bucket narrowing
    "k10_exact_median_two_pass",  # two-pass exact median
    "d04_minhash_lsh_pairs",  # banded LSH + shingle localCheckpoint
    "j02_salted_hot_key_join",  # salt fan-out must not change results
    "s11_cluster_disjoint_split",  # iterative connected components
    "s13_cluster_split_lsh",  # CC over LSH pairs (same sensitivity)
    "s14_balanced_shards",  # with_global_rank round-robin dealing
    "d18_duplicate_spans",  # span posting joins behind localCheckpoint
]


@pytest.fixture(scope="module")
def specs():
    from ice_spark.queries.registry import load_all

    return load_all()


@pytest.fixture(scope="module")
def alt_session(spark):
    """Session clone with adversarial confs: a prime, larger-than-data
    shuffle partition count and the stock broadcast threshold. SQLConf
    is session-scoped, so this runs side-by-side with the tuned one on
    the same SparkContext."""
    alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "197")
    alt.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    return alt


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_to_session_tuning(spark, sf_dir, specs, name, alt_session):
    fn = specs[name].spark_fn
    a = fn(spark, sf_dir)
    b = fn(alt_session, sf_dir)
    ha = value_hash(a.columns, [tuple(r) for r in a.collect()])
    hb = value_hash(b.columns, [tuple(r) for r in b.collect()])
    assert a.columns == b.columns
    assert ha == hb, f"{name}: result changed under untuned session confs"
