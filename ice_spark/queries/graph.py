"""Graph queries over the order network.

Iterative distributed algorithms are the one query class where
"loop over a DataFrame plan" replaces the reference's imperative
loops: each PageRank iteration is a join + groupBy (contribution
scatter + gather), unrolled statically so Catalyst sees one plan.
At 100 TB each iteration shuffles (node, contribution) pairs — never
adjacency lists — and the damping constant re-seeds map-side.

Determinism: ranks are integer micro-units (start 1_000_000); each
contribution is an integer floor division by out-degree, the damped
update is `150_000 + 850 * (sum // 1000)` — integers end to end, so
Spark and DuckDB agree bit-for-bit regardless of aggregation order
(bigint sums are associative-exact, unlike doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ice_spark.queries.registry import register
from ice_spark.tables import load_table

PR_ITERS = 2
PR_INIT = 1_000_000


def _pr_oracle() -> str:
    edges = """
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """
    it = """
    pr{n} AS (
      SELECT e.dst AS node,
             150000 + 850 * (SUM(p.rank // d.outdeg) // 1000) AS rank
      FROM pr{p} p
      JOIN deg d ON d.node = p.node
      JOIN bidir e ON e.src = p.node
      GROUP BY e.dst
    )"""
    iters = ",".join(it.format(n=i + 1, p=i) for i in range(PR_ITERS))
    return f"""
    WITH e0 AS ({edges}),
    bidir AS (
      SELECT src, dst FROM e0
      UNION ALL
      SELECT dst AS src, src AS dst FROM e0
    ),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM bidir GROUP BY src),
    pr0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS rank FROM deg),
    {iters}
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           node // 2 AS entity_key,
           CAST(rank AS BIGINT) AS rank_micro
    FROM pr{PR_ITERS}
    ORDER BY rank DESC, node
    LIMIT 20
    """


@register(
    "g01_pagerank_order_network",
    _pr_oracle(),
    doc="PageRank (2 unrolled iterations, damping 0.85) over the "
    "bipartite customer-supplier graph induced by order lineitems. "
    "Each iteration is scatter (rank//outdeg along edges) + gather "
    "(sum per destination) — one keyed shuffle per iteration, "
    "map-side combinable; adjacency is re-joined per iteration "
    "rather than materialized per node, so skewed hub nodes cost a "
    "skewed-join (salt-able) rather than an OOM row. Integer "
    "micro-unit arithmetic end to end: floor-div contributions and "
    "the damped update `150000 + 850*(sum//1000)` make both engines "
    "agree bit-for-bit independent of aggregation order.",
)
def g01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # orders GROWS with the corpus — never let AQE broadcast it (the
    # size estimate is compressed parquet bytes; the deserialized
    # LongHashedRelation of 15M orders at the sf10 probe was the
    # heap OOM). SMJ on the already-sorted-by-key fact join spills.
    e0 = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bidir = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # Degree-annotated edge list in ONE exchange: repartition by src,
    # then outdeg = count over (partition by src) rides that
    # partitioning and its sort — the former groupBy(src) + merge
    # join shuffled bidir twice and scanned it twice (r13-opt A/B:
    # sf0.1 3.45 -> 2.29 s, sf1 7.54 -> 6.16 s, every pair in favor;
    # a repartition WITHOUT the window rewrite loses, so the window
    # is the load-bearing half). Per-partition window state is one
    # node's edge set (max outdeg, bounded by the partner-entity
    # count) — the same per-key bound the old degree join carried.
    # Persisted: every iteration re-reads this relation, and without
    # it the unrolled plan replays the edge-build subtree once per
    # iteration (N iterations -> N scans of lineitem). This is the
    # standard Spark iterative-algorithm shape (GraphX/MLlib persist
    # exactly this way). DISK_ONLY, not cache(): the edge relation
    # GROWS with the corpus while the unified memory region doesn't —
    # at the sf10 probe (~100M bidirectional edges) the in-memory
    # cache OOMed the heap, while a disk-persisted edge list is one
    # sequential columnar read per iteration and leaves execution
    # memory to the iteration shuffles. At gate SF the write+read
    # costs milliseconds. Unlike a localCheckpoint, persist KEEPS the
    # plan's outputPartitioning/ordering, so each iteration's merge
    # join needs no exchange and no sort on the edge side.
    # Lifecycle: no explicit unpersist is possible here (the returned
    # plan hasn't executed yet); once the caller drops the result,
    # Spark's ContextCleaner reclaims the unreferenced persisted RDD
    # (spark.cleaner.referenceTracking, on by default), so repeated
    # invocations don't accumulate storage.
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # MERGE hints on every growing-side join (the g02 lesson, which
    # g01 re-learned at the sf10 probe): pr is a node-count relation
    # and ed is the edge list — BOTH grow with the corpus, and AQE
    # happily builds a LongHashedRelation broadcast of the rank side
    # per unrolled iteration when it measures small at the current
    # SF; ten of those live at once OOMed the 8g heap at ~3.3M
    # nodes. Sort-merge spills, and AQE can still skew-split it.
    ed = (
        bidir.repartition("src")
        .withColumn(
            "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
        .sortWithinPartitions("src")
        .persist(StorageLevel.DISK_ONLY)
    )
    # Initial ranks: the distinct srcs of ed — a hash aggregate that
    # reuses ed's partitioning (no exchange; HashPartitioning(src)
    # satisfies the dedup's clustering requirement).
    pr = (
        ed.select(F.col("src").alias("node"))
        .dropDuplicates()
        .select("node", F.lit(PR_INIT).cast("long").alias("rank"))
    )
    for _ in range(PR_ITERS):
        contrib = pr.hint("merge").join(ed, pr.node == ed.src).select(
            "dst", F.expr("rank div outdeg").alias("c")
        )
        pr = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(150_000) + F.lit(850) * F.expr("sum(c) div 1000")).alias("rank")
        )
    return (
        pr.select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node div 2").alias("entity_key"),
            F.col("rank").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "node")
        .limit(20)
    )


_G02_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN dv.d ELSE du.d END AS dst_d
  FROM e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
wedges AS (
  SELECT o1.dst AS v, o2.dst AS w
  FROM oriented o1 JOIN oriented o2
    ON o1.src = o2.src
   AND ((o1.dst_d < o2.dst_d) OR (o1.dst_d = o2.dst_d AND o1.dst < o2.dst))
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM wedges wg JOIN oriented t ON wg.v = t.src AND wg.w = t.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
       (SELECT n_triangles FROM tri) AS n_triangles
"""


def _copurchase_graph(spark: SparkSession, sf_dir: str):
    """(edges e, degrees deg, oriented edges od) of the part
    co-purchase graph — the shared build for g02/g03. e and od are
    persisted DISK_ONLY, deg cached; every caller consumes each
    relation more than once."""
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Edge build: per-order sorted part set + i<j pair explode. The
    # set is bounded by the l_linenumber domain (<= 7 parts per order
    # — the f13 per-entity envelope; collect_set is audited in
    # AUDITED_BUFFERING_AGGS on it), so the explode emits each
    # order's C(|ps|, 2) pairs with u < v for free from the sort.
    # This replaces the lineitem self-join + distinct: one keyed agg
    # instead of a join stage. r13-opt A/B, value-identical noop
    # medians: sf0.1 6.54 s vs 6.75 s, sf1 20.0 s vs 24.5 s (every
    # interleaved pair in the agg form's favor); sf10 interleaved
    # trials were flat (self-join 30.7/19.1 s vs collect-set
    # 25.2/20.9 s, PERF.md §R13) — AQE amortizes the self-join's
    # shuffle there, while at bench SFs the agg form drops a stage.
    sets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    e = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .distinct()
        # e / deg / od are each consumed by several downstream
        # operators; without materializing, Catalyst replays the whole
        # edge build once per consumer — measured 56 lineitem scans in
        # the unmaterialized plan. DISK_ONLY, not cache: the edge list
        # is O(m) rows and at the sf10 probe its in-heap copy (~2GB)
        # plus od's (~2.4GB) tipped the 77-queries-in sweep session
        # into OOM — same posture as g01's persisted edges.
        .persist(StorageLevel.DISK_ONLY)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .cache()
    )
    # Every relation in this query grows with the graph (edges, degrees,
    # oriented edges), so no side is safely broadcastable — pin shuffle
    # joins instead of letting AQE's pre-execution estimates attempt a
    # driver-memory broadcast of a million-row build side (observed to
    # OOM the broadcast at sf0.1 without the hints). The hint is MERGE,
    # not shuffle_hash: a hub node keys all its oriented edges into one
    # partition, and the per-task hash build of a skewed partition has
    # no spill path — shuffle_hash OOMed the sf5 probe ("can't acquire
    # 128MB to build hash relation") while sort-merge spills and lets
    # AQE split skewed partitions.
    du, dv = deg.hint("merge").alias("du"), deg.hint("merge").alias("dv")
    ann = e.join(du, F.col("u") == F.col("du.node")).join(dv, F.col("v") == F.col("dv.node"))
    u_first = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    # No dense-id remap: it existed to pack the wedge form's closure
    # key (v, w) into one long for a 4.1e9-row semi join; the
    # intersection form below never builds that stream, so raw node
    # ids ride the arrays directly and the with_global_rank pass plus
    # two merge joins it cost are gone. DISK_ONLY like e (multiple
    # consumers; the heap copy OOM'd the r11 long-session sweep).
    # repartition("sid") BEFORE the persist: both consumers key on sid
    # — _oriented_adjacency's groupBy(sid) and the intersection's
    # probe join — so one exchange, baked into the persisted blocks
    # and advertised by the InMemoryRelation, replaces the exchange
    # each consumer would otherwise run (guide §2.4: two operations
    # keyed the same way share one exchange). adj inherits the
    # partitioning through its exchange-free aggregate, which also
    # makes BOTH adjacency joins in _triangles_per_edge build-side
    # exchange-free. r13-opt A/B, values identical: sf0.1 g02
    # 4.82 -> 4.49 s (4/5 pairs), g03 5.10 -> 4.26 s (5/5); sf1
    # medians in favor in both (18.1 -> 16.7, 16.5 -> 16.4).
    od = (
        oriented.select(F.col("src").alias("sid"), F.col("dst").alias("did"))
        .repartition("sid")
        .persist(StorageLevel.DISK_ONLY)
    )
    return e, deg, od


def _oriented_adjacency(od: DataFrame) -> DataFrame:
    """Per-node oriented out-neighbor arrays, bounded by the
    degree-ordered orientation's sqrt(2m) out-degree cap (every
    out-neighbor has degree >= deg(u), so outdeg(u)*deg(u) <= 2m;
    measured max 222 at sf10). collect_list is audited in
    AUDITED_BUFFERING_AGGS on that envelope. Persisted DISK_ONLY:
    both endpoint joins consume it and there is no exchange reuse
    across them (~1.6 GB at sf10 — one array cell per edge)."""
    from pyspark import StorageLevel

    return (
        od.groupBy("sid")
        .agg(F.collect_list("did").alias("nbrs"))
        .persist(StorageLevel.DISK_ONLY)
    )


def _triangles_per_edge(od: DataFrame, adj: DataFrame) -> DataFrame:
    """(e_sid, e_did, t): each oriented edge with the number of
    triangles it closes, t = |N+(u) ∩ N+(v)| — every triangle
    {a<b<c in orientation order} lands exactly once, on its (a,b)
    edge, since a→c and b→c are both oriented low-to-high. The heavy
    relation is m rows carrying ~outdeg-sized array payloads — per-row
    shuffle cost scales with m, not sum-outdeg^2 (the r12 wedge
    stream's 4.1e9 rows / 125 GB sort spill, PERF.md §Round 12-13).

    JOIN ORDER (r14-opt): attach the DESTINATION arrays first, then
    exchange the stream by e_sid and attach the source arrays from the
    co-partitioned build side. The stream between the two joins is the
    only per-edge array exchange, and which side rides it is
    asymmetric: sum over edges of outdeg(did) = 4.92e9 elements vs
    outdeg(sid) = 8.28e9 at the sf10 probe (destinations are the
    higher-(degree,id) endpoints, whose OUT-degree the orientation
    caps hardest), so shipping n2 moves 41% less than the old
    n1-first order; od itself crosses the first exchange as two bare
    longs per row. The closing repartition("e_sid") co-partitions the
    stream with adj's baked-in sid partitioning, so the n1 join adds
    no exchange, and g03's apex groupBy(e_sid) rides the same
    exchange for free. sf10 phase A/B (zstd codec on both sides):
    old order 150.2 s -> this order 37.2 s, identical triangle sum;
    guide §2.3 (shuffle fewer bytes) + §2.4 (share one exchange).
    shuffle_hash on the adj build sides: n rows, hash-uniform node
    keys; AQE skew split still applies on the probes."""
    a1 = adj.select(F.col("sid").alias("e_sid"), F.col("nbrs").alias("n1"))
    a2 = adj.select(F.col("sid").alias("e_did"), F.col("nbrs").alias("n2"))
    return (
        od.select(F.col("sid").alias("e_sid"), F.col("did").alias("e_did"))
        .join(a2.hint("shuffle_hash"), "e_did")
        .repartition("e_sid")
        .join(a1.hint("shuffle_hash"), "e_sid")
        .select(
            "e_sid",
            "e_did",
            F.size(F.array_intersect("n1", "n2")).alias("t"),
        )
    )


@register(
    "g02_copurchase_triangles",
    _G02_ORACLE,
    doc="Triangle count over the part co-purchase graph (parts sharing "
    "an order). Uses the degree-ordered orientation: each undirected "
    "edge points from its lower-(degree, id) endpoint to the higher, "
    "so every wedge is enumerated exactly once from its lowest-degree "
    "corner and each out-degree is O(sqrt(m)) — the arboricity bound "
    "that makes distributed triangle counting feasible on skewed "
    "graphs (a hub of degree 1M contributes ZERO wedges from itself; "
    "its triangles are found from their low-degree corners). Plan: "
    "edge dedup (one shuffle), degree agg (one), bounded adjacency "
    "arrays + per-edge intersection — all keyed shuffles, no global "
    "ordering or driver-side structure; counts only cross the final "
    "exchange.",
)
def g02(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, deg, od = _copurchase_graph(spark, sf_dir)
    # Triangles by ADJACENCY-ARRAY INTERSECTION — the wedge stream
    # never exists (the r12 shape's 4.1e9-row self-join sort-spilled
    # 125 GB and was 439 of g02's 552 s; a Bloom prefilter of that
    # stream was built and REJECTED on interleaved A/B before this
    # reshape removed it, PERF.md §Round 12-13). Mechanics + bounds
    # in _oriented_adjacency/_triangles_per_edge.
    adj = _oriented_adjacency(od)
    # n_wedges WITHOUT materializing wedges: the oriented enumeration
    # defines each wedge exactly once at its src, so the count is
    # sum over src of C(outdeg, 2). outdeg is size(nbrs) of the
    # already-persisted adjacency — reading it there instead of a
    # second groupBy over od removes one m-row shuffle (r13-opt:
    # 0.99 s -> 0.29 s for this agg at sf0.1). c*(c-1) rides
    # decimal(38,0) (count-squared — lint_overflow's class; the
    # arboricity bound keeps c ~ sqrt(m), but the SUM crosses int64
    # long before the halved total does).
    nw = adj.select(F.size("nbrs").alias("c")).agg(
        F.expr(
            "COALESCE(SUM(CAST(c AS DECIMAL(38,0)) * (c - 1)), 0) div 2"
        )
        .cast("long")
        .alias("n_wedges")
    )
    wt = _triangles_per_edge(od, adj).agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles")
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(nw)
        .crossJoin(wt)
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


_G03_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
  ) GROUP BY node
),
od AS (
  SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
apex AS (
  SELECT o1.src AS node, COUNT(*) AS apex_tri
  FROM od o1
  JOIN od o2 ON o2.src = o1.src AND o1.dst <> o2.dst
  JOIN od o3 ON o3.src = o1.dst AND o3.dst = o2.dst
  GROUP BY o1.src
)
SELECT CAST(LENGTH(BIN(deg.d)) AS BIGINT) AS degree_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(COALESCE(apex.apex_tri, 0)) AS BIGINT) AS n_triangles,
       CAST(MAX(COALESCE(apex.apex_tri, 0)) AS BIGINT) AS max_apex_triangles
FROM deg LEFT JOIN apex ON apex.node = deg.node
GROUP BY degree_bucket
ORDER BY degree_bucket
"""


@register(
    "g03_triangle_support_by_degree",
    _G03_ORACLE,
    doc="Triangle support per APEX node, rolled up by power-of-two "
    "degree bucket (bucket = bit-length of the undirected degree — "
    "exact integer arithmetic on both engines, no float log2 seam). "
    "Each triangle is attributed to its orientation-lowest corner "
    "(the node sourcing two of its three oriented edges) — the same "
    "exactly-once accounting as g02's count, disaggregated. The "
    "per-apex support distribution is the standard cohesion signal "
    "truss/k-core style corpus-graph pruning reads. Plan: shared "
    "_copurchase_graph build, bounded adjacency arrays, per-edge "
    "intersection grouped by apex (one extra keyed agg over m rows), "
    "degree join, 1-row-per-bucket rollup — nothing beyond g02's "
    "proven sf10 envelope; the oracle triple-self-join is "
    "DuckDB-only, gate-SF-only.",
)
def g03(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, deg, od = _copurchase_graph(spark, sf_dir)
    adj = _oriented_adjacency(od)
    apex = (
        _triangles_per_edge(od, adj)
        .groupBy("e_sid")
        .agg(F.sum("t").alias("apex_tri"))
    )
    node_tri = deg.join(
        apex, deg["node"] == apex["e_sid"], "left"
    ).select(
        "d", F.coalesce("apex_tri", F.lit(0)).alias("apex_tri")
    )
    return (
        node_tri.groupBy(
            F.length(F.bin(F.col("d"))).cast("long").alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("apex_tri").cast("long").alias("n_triangles"),
            F.max("apex_tri").cast("long").alias("max_apex_triangles"),
        )
        .orderBy("degree_bucket")
    )
