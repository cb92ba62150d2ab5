"""Near-duplicate clustering: connected components over a pair list.

A dedup pipeline rarely stops at *pairs* — to keep one canonical doc
per duplicate group you need the transitive closure of the near-dup
relation. The reference has nothing like this (SURVEY.md §2.8);
it is a beyond-reference training-data operator.

Two implementations, both pure DataFrame loops (the per-iteration
work is shuffles Catalyst plans; the driver only counts changes):

- ``alternating_star_components``: the large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14). Converges in O(log^2 n) rounds regardless of
  component diameter — the 100 TB path, where a chain of near-dups
  (doc A ~ B ~ C ~ ... at shingle drift) can have large diameter.
- ``label_propagation_components``: min-label flooding; rounds =
  component diameter. Simpler plan per round; fine when components
  are known-small.

Each round materializes the frontier with ``localCheckpoint`` —
otherwise the lineage doubles per iteration and Catalyst re-analyzes
an exponentially growing plan (the classic iterative-Spark trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).where(
        F.col("u") != F.col("v")
    )


class _CheckpointPool:
    """Tracked eager localCheckpoints with explicit block release.

    localCheckpoint(eager=True) caches the relation's RDD blocks and
    TRUNCATES lineage — the blocks are the only copy, and Spark only
    frees them when the GC + ContextCleaner get around to the dead
    RDD. In an iterative loop that checkpoints every round (connected
    components: O(log² n) rounds over an edge set), the stale rounds'
    blocks pile up faster than the cleaner runs and OOM the executor
    storage region — measured at the sf10 probe (25M-edge relation,
    8g heap: round blocks ~¾ GB each; the run died in round ~7).
    checkpoint() records which persistent-RDD ids a relation owns;
    release(ids) drops exactly those blocks the moment the loop
    proves it will never touch that round again. Single-session
    bookkeeping: the before/after diff assumes no concurrent
    checkpointing job in this SparkSession (true for the operators
    here; worst case a foreign id is attributed to us and released
    late, never early, because release only ever frees ids the pool
    itself recorded)."""

    def __init__(self, df: DataFrame):
        self._jsc = df.sparkSession.sparkContext._jsc

    def _ids(self) -> set:
        return {int(k) for k in self._jsc.getPersistentRDDs().keySet().toArray()}

    def checkpoint(self, df: DataFrame) -> tuple[DataFrame, set]:
        from pyspark import StorageLevel

        before = self._ids()
        # DISK_ONLY, deliberately: iterative-round relations are
        # written once and scanned 1-2 times, and keeping them OUT of
        # the unified memory region leaves the whole execution pool to
        # the rounds' own shuffles. With the default MEMORY_AND_DISK
        # the sf10 probe died with UNABLE_TO_ACQUIRE_MEMORY — round
        # blocks pinned the storage region while the next round's
        # shuffle starved. Local-disk sequential IO is not the
        # bottleneck of a CC round; the shuffles are.
        # eager=False: every pool.checkpoint here is immediately
        # followed by an action over the checkpointed relation (the
        # convergence signature scan / changed-count), so a lazy
        # checkpoint materializes inside THAT job instead of paying a
        # separate materialization job first — one job per CC round
        # instead of two (r13-opt: the rounds are scheduling-latency
        # bound — isolated CC A/B at sf0.1, identical components:
        # 2.47 s -> 1.83 s median of 5). The persistent-RDD
        # id registers at call time even when lazy (verified), so the
        # release() bookkeeping is unchanged, and materialization
        # always precedes release of the prior round's blocks because
        # the signature action runs before release() in every loop.
        out = df.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        return out, self._ids() - before

    def release(self, ids: set) -> None:
        m = self._jsc.getPersistentRDDs()
        for k in ids:
            r = m.get(k)
            if r is not None:
                r.unpersist(False)


def alternating_star_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    Each round: large-star hangs every neighbor v > u onto
    m = min(N(u) ∪ {u}); small-star re-hangs the rest. The edge set
    monotonically flattens into stars around component minima.
    """
    def _sig(df: DataFrame) -> tuple:
        """(count, order-insensitive hash-sum) of an edge relation —
        a narrow two-aggregate scan of the checkpointed blocks. Used
        as a cheap convergence proxy so the expensive exceptAll
        double-check runs once at the end, not twice per round."""
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: overflow-free under ANSI mode, and
            # order-insensitive. XOR cancellation of duplicate rows
            # can't fire — the relation is distinct() by construction.
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    pool = _CheckpointPool(edges)
    e, e_ids = pool.checkpoint(_symmetrize(edges, src, dst).distinct())
    sig = _sig(e)
    for _ in range(max_iter):
        # large-star: for each u, m = min(neighbors ∪ self);
        # connect strictly larger neighbors to m.
        mins = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            e.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        e1 = _symmetrize(large, "a", "b").distinct()
        # small-star: connect neighbors <= u (plus u itself) to m.
        mins1 = e1.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        small = (
            e1.join(mins1, "u")
            .where(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(mins1.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e_next, next_ids = pool.checkpoint(_symmetrize(small, "a", "b").distinct())
        # Converged when the edge relation is stable. The (count,
        # hash-sum) signature decides for free; only a signature MATCH
        # pays the exact exceptAll confirmation (a 64-bit collision on
        # unequal sets would otherwise terminate early with wrong
        # components — the confirm keeps the exit sound while the
        # evolving rounds skip both shuffles entirely).
        sig_next = _sig(e_next)
        converged = sig_next == sig and (
            e_next.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(e_next).limit(1).count() == 0
        )
        # the previous round's blocks are dead either way — free them
        # NOW instead of waiting for the GC/ContextCleaner (stale
        # rounds otherwise accumulate and OOM at scale; sf10 probe)
        pool.release(e_ids)
        e, e_ids = e_next, next_ids
        if converged:
            break
        sig = sig_next
    # Star state: every node's component is min(neighbors ∪ self).
    return e.groupBy(F.col("u").alias("node")).agg(
        F.least(F.min("v"), F.first("u")).alias("component")
    )


def label_propagation_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(node, component) by min-label flooding (rounds = diameter)."""
    pool = _CheckpointPool(edges)
    sym, _sym_ids = pool.checkpoint(_symmetrize(edges, src, dst).distinct())
    labels, label_ids = pool.checkpoint(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_comp"))
        )
        new_labels, new_ids = pool.checkpoint(
            labels.join(nbr_min, labels.node == nbr_min.u, "left").select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "old"), "node")
            .where(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        pool.release(label_ids)
        labels, label_ids = new_labels, new_ids
        if changed == 0:
            break
    return labels


def dedup_keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Drop every member of a near-dup cluster except the min-id doc."""
    comp = alternating_star_components(pairs, a, b)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
