"""Deduplication operators for training-data pipelines.

Reference has only file-path dedup on ingest
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/Insert.java:172-178);
content-level dedup is beyond-reference capability.

All operators are DataFrame→DataFrame compositions — no driver
collects, no Python row loops:

- exact_dedup: hash-groupBy keep-min-id. One shuffle on the dedup key.
- minhash_lsh_pairs: shingle→MinHash→band→bucket-join→exact-verify.
  Candidate generation is O(sum of bucket sizes squared), bounded by
  banding; verification joins shingle sets back by id (so big arrays
  aren't duplicated through the band explode).
- simhash_pairs: 32-bit SimHash bucket candidates + Hamming verify.

Skew guard: both LSH joins cap bucket size before the self-join
(`max_bucket_size`). At 100 TB a degenerate bucket — boilerplate-heavy
shingles hashing identically — would otherwise produce an O(n²) join
partition; buckets above the cap are dropped from candidate
generation (their members still pair through their other, non-hot
bands/blocks, which is why per-bucket drop loses far less recall than
it sounds like). The count-per-bucket pass shuffles on the same key
as the join itself, so AQE coalesces it into the same exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ice_spark.functions import text as T

# Default cap on LSH bucket size before the candidate self-join. A
# bucket of b members contributes b*(b-1)/2 candidate pairs; 512 keeps
# the worst single bucket at ~131k pairs — trivially bounded per task.
DEFAULT_MAX_BUCKET = 512

# Default cap on inverted-index posting-list length (docs per shingle /
# per n-gram) before a pairwise candidate join. Same rationale as
# DEFAULT_MAX_BUCKET: one boilerplate shingle shared by p documents
# contributes p*(p-1)/2 pairs under a SINGLE join key — the
# skewed-key quadratic blowup — so postings above the cap are dropped
# from candidate generation and their mass is reportable via
# lsh_dropped_bucket_mass. Test-SF posting maxima are ~25 (measured at
# sf0.1), so the default never triggers there and capped pipelines
# stay hash-identical to their oracles.
#
# Regime note, measured on the 50x-replicated sf5 probe corpus (every
# document is a 50-way near-dup group, so dup-group shingles carry
# postings of ~50-1250 — adversarially close to the cap): with the
# cap at 512 those shingles are dropped and d02's recall on that
# corpus collapses to zero (honestly reported: 6.56M of 13.26M
# posting rows in dropped mass); raising it to 2048 restores recall
# but admits ~8 BILLION intermediate pair increments (10k keys x
# ~780k pairs, 99.9% cross-group waste) — an 8g heap OOMs and a
# cluster would just burn the same work. The cap is a BOILERPLATE
# guard, not a dup-group mechanism: corpora whose duplicate groups
# are themselves cap-sized belong on the MinHash-LSH path
# (minhash_lsh_pairs / d04 — banding cost doesn't grow with
# posting², and it finds that corpus's 6.7M pairs in ~19s at sf5).
DEFAULT_MAX_POSTING = 512


def _cap_buckets(
    buckets: DataFrame,
    key_cols: list[str],
    max_bucket_size: int,
    keep_size: str | None = None,
) -> DataFrame:
    """Drop buckets with more than `max_bucket_size` members.

    Implemented as a window count partitioned by the bucket key: ONE
    shuffle of the bucket set, reused by the candidate join that
    follows (an aggregate+join formulation shuffles the set twice —
    measured ~15% slower on the d04 headline). Trades bounded recall
    loss in degenerate buckets for a hard O(max_bucket_size²)
    per-bucket candidate bound.

    keep_size: expose the window's bucket count under this column
    name instead of dropping it — for surviving rows it IS the
    bucket/posting frequency (the cap drops whole buckets), so a
    caller that needs per-key frequencies gets them without a second
    aggregate or join (d10).
    """
    if max_bucket_size <= 0:
        return buckets
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    capped = buckets.withColumn("__bsz", F.count(F.lit(1)).over(w)).where(
        F.col("__bsz") <= max_bucket_size
    )
    if keep_size is not None:
        return capped.withColumnRenamed("__bsz", keep_size)
    return capped.drop("__bsz")


def cap_postings(
    ex: DataFrame,
    key_cols: list[str],
    max_posting: int = DEFAULT_MAX_POSTING,
    keep_size: str | None = None,
) -> DataFrame:
    """Drop inverted-index postings whose list exceeds `max_posting`.

    The public posting-list guard for the n-gram pair finders
    (d02/d07/d08/d10): identical mechanics to the LSH bucket cap —
    one window-count shuffle on the posting key, reused by the
    candidate join that follows — applied to an exploded
    (doc_id, key) index relation. Audit dropped mass with
    ``lsh_dropped_bucket_mass(ex, key_cols, max_posting)``.
    """
    return _cap_buckets(ex, key_cols, max_posting, keep_size=keep_size)


def lsh_dropped_bucket_mass(
    buckets: DataFrame, key_cols: list[str], max_bucket_size: int
) -> DataFrame:
    """Audit helper: (bucket key, size) for buckets the cap drops —
    "log dropped mass" before running a capped dedup at scale."""
    return (
        buckets.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket_size)
    )


def dropped_posting_mass(
    ex: DataFrame, key_cols: list[str], caps: list[int], index_name: str
) -> DataFrame:
    """The gated form of the cap audit (d17): ONE aggregate report row
    per cap over a posting/bucket index, so capped recall loss is a
    pipeline OUTPUT, not a docstring. For each cap: how many buckets
    the cap would drop, how many posting rows they carry, and the
    candidate-pair mass b*(b-1)/2 those buckets would have contributed
    — the measured sf5 regime (d02 recall collapsing to zero on a
    dup-heavy corpus, 6.56M/13.26M posting rows dropped) makes this
    the number a 100 TB pipeline must look at before trusting a
    capped finder's pair list.

    Shape: one vocabulary-sized groupBy on the posting key (the same
    shuffle the capped finder itself performs), then a 3-row explode
    and a tiny O(len(caps)) aggregate. `dropped_pair_mass` accumulates
    in DECIMAL(38,0) (a bucket's pair mass squares its size, which
    grows with corpus dup density); the BIGINT output overflows
    (loudly, under ANSI — both engines) only if the reported mass
    itself exceeds int64.
    """
    counts = ex.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("b"))
    capped = counts.withColumn(
        "cap", F.explode(F.array(*[F.lit(int(c)).cast("long") for c in caps]))
    )
    over = F.col("b") > F.col("cap")
    return (
        capped.groupBy("cap")
        .agg(
            F.sum(F.when(over, 1).otherwise(0)).cast("long").alias("buckets_over_cap"),
            F.coalesce(F.sum(F.when(over, F.col("b"))), F.lit(0))
            .cast("long")
            .alias("dropped_posting_rows"),
            # decimal(38,0) accumulation: b*(b-1) squares a bucket size
            # that grows with corpus dup density (lint_overflow's
            # class) — int64 would overflow mid-sum at ~3e9-member
            # buckets. b*(b-1) is always even, so per-bucket halving
            # equals halving the sum; the final div (long result) only
            # overflows if the REPORTED mass itself exceeds int64.
            F.expr(
                "COALESCE(SUM(CASE WHEN b > cap THEN "
                "CAST(b AS DECIMAL(38,0)) * (b - 1) END), 0) div 2"
            )
            .cast("long")
            .alias("dropped_pair_mass"),
            F.sum("b").cast("long").alias("total_posting_rows"),
        )
        .select(
            F.lit(index_name).alias("index_name"),
            "cap",
            "buckets_over_cap",
            "dropped_posting_rows",
            "dropped_pair_mass",
            "total_posting_rows",
        )
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_posting: int = DEFAULT_MAX_POSTING,
    shingle_n: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a capped shingle-hash
    inverted index — the d02 finder as a reusable, cap-parametrized
    operator (the dedup router runs it at the cap it audited).

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold and
    doc_a < doc_b. Jaccard denominators use the UNCAPPED per-doc
    shingle set sizes; the cap bounds only candidate generation
    (identical semantics to the d02 oracle's capped replay).

    Shape: one posting-key shuffle (window cap + candidate self-join
    share it), one (doc_a, doc_b) aggregate, two keyed size joins —
    never a cross join; per-bucket candidate work is hard-bounded at
    O(max_posting²).
    """
    # `shingled`: an optional PRE-CHECKPOINTED (__id, __sh) relation a
    # caller that also computes shingles for other stages (the p05
    # router: audit + both finders) passes in, so the corpus-wide
    # shingle-hash pass — the pipeline's most expensive expression —
    # is evaluated once per run instead of once per stage.
    docs = (
        shingled
        if shingled is not None
        else df.select(
            F.col(id_col).alias("__id"),
            T.shingle_hashes(text_col, n=shingle_n).alias("__sh"),
        ).localCheckpoint(eager=False)
    )
    # Uncapped per-doc set sizes ride the posting explode as one int
    # per posting row and come back out of the pair aggregate via
    # max() — no size joins (the d02 rewrite; sf1 21.3 -> 17.6 s,
    # 5/5 pairs, ~0.1 s cost at sf0.1 where AQE broadcast the joins).
    ex = _cap_buckets(
        docs.select(
            "__id", F.size("__sh").alias("__n"), F.explode("__sh").alias("__s")
        ),
        ["__s"],
        max_posting,
    )
    ex2 = ex.select(
        F.col("__id").alias("__id2"),
        F.col("__n").alias("__n2"),
        F.col("__s").alias("__s2"),
    )
    # MERGE hint: same posting relation on both sides, partitioned +
    # sorted on the posting key by the cap window — shuffle join
    # reuses the one exchange instead of recomputing the index as a
    # broadcast build side at small SFs (see band_candidates).
    pairs = (
        ex.join(ex2.hint("merge"), (F.col("__s") == F.col("__s2")) & (F.col("__id") < F.col("__id2")))
        .groupBy(F.col("__id").alias("doc_a"), F.col("__id2").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("__inter"),
            F.max("__n").alias("__na"),
            F.max("__n2").alias("__nb"),
        )
    )
    jacc = F.col("__inter").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__inter")
    )
    return pairs.where(jacc >= threshold).select(
        "doc_a", "doc_b", jacc.alias("jaccard")
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct key tuple.

    Single hash-aggregate shuffle; at 100 TB prefer hashing long text
    to a fingerprint first (dedup_by_fingerprint) so the shuffle moves
    8-byte keys instead of document bodies.
    """
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[*key_cols, id_col], how="left_semi")


def dedup_by_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup shuffling only (fingerprint, id) — the scale path."""
    fp = df.select(F.col(id_col), T.char_hash_arrow(text_col).alias("__fp"))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), on=id_col, how="left_semi")


def _signatures_from_exploded(ex: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, mh0..mh{k-1}) from an exploded (id, __h) shingle relation."""
    # One F.expr per aggregate (single py4j call each) — the Column
    # API costs ~6 round trips per permutation, measurable at k=16.
    aggs = [
        F.expr(f"min((__h * {2 * j + 3} + {7 * j + 1}) % {T.MOD}) AS mh{j}")
        for j in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int, shingle_n: int = 3
) -> DataFrame:
    """(id, mh0..mh{k-1}) MinHash signature columns.

    Implemented as explode + groupBy-min rather than array_min over a
    transformed array: the nested-lambda form re-inlines the shingle
    hash computation per permutation (catastrophic at scale), while
    explode computes each shingle hash exactly once and the k mins
    reduce map-side (partial aggregation) before one narrow shuffle
    on id.
    """
    ex = df.select(
        F.col(id_col), F.explode(T.shingle_hashes(text_col, n=shingle_n)).alias("__h")
    )
    return _signatures_from_exploded(ex, id_col, k)


def band_candidates(
    sigs: DataFrame, n_hashes: int, bands: int, max_bucket_size: int = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """(__id, __id2) candidate pairs whose signatures collide in at
    least one band. Shared by the LSH dedup pipeline and the estimate
    audit so both replay the identical banding spec."""
    r = n_hashes // bands
    structs = ", ".join(
        "struct({b} AS band, concat_ws('_', {cols}) AS key)".format(
            b=b,
            cols=", ".join(f"cast(mh{b * r + i} AS string)" for i in range(r)),
        )
        for b in range(bands)
    )
    buckets = sigs.select(
        "__id", F.expr(f"explode(array({structs})) AS bk")
    ).select("__id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    buckets = _cap_buckets(buckets, ["band", "key"], max_bucket_size)
    # Same band + same key → candidate pair. The distinct() collapses
    # pairs that collide in multiple bands before the (expensive)
    # exact verification join.
    b2 = buckets.select(
        F.col("__id").alias("__id2"), F.col("band").alias("band2"), F.col("key").alias("key2")
    )
    # MERGE hint on the self-join: both sides are the SAME capped
    # bucket relation, already hash-partitioned AND sorted on
    # (band, key) by the cap window — a sort-merge join adds zero
    # exchanges/sorts and the exchange subtree is computed once
    # (AQE stage reuse), where the small-SF auto-broadcast rebuilt
    # the whole signature pipeline as the build side. At corpus
    # scale both sides grow with the data, so the shuffle join is
    # the only correct strategy anyway. r13-opt A/B at sf1:
    # 2.24 s vs 2.50 s median (5/5 pairs), flat at sf0.1.
    return (
        buckets.join(
            b2.hint("merge"),
            (F.col("band") == F.col("band2"))
            & (F.col("key") == F.col("key2"))
            & (F.col("__id") < F.col("__id2")),
        )
        .select("__id", "__id2")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding + exact verify.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.

    `shingled`: optional pre-checkpointed (__id, __shs) relation from
    a caller that shares the shingle pass across stages (p05 router).

    Band collision probability for Jaccard s with r rows/band and b
    bands is 1-(1-s^r)^b; with r=2, b=8 the curve passes ~0.99 recall
    at s=0.8 while keeping s<0.2 collisions negligible.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands

    # The shingle arrays feed THREE consumers (the signature pass and
    # both sides of the verify join). The char-walk token hashing is
    # the single most expensive expression in the pipeline (~30% of
    # d04 wall-clock at sf0.1), so compute it exactly once: a lazy
    # localCheckpoint materializes (id, shingles) to executor block
    # storage on first use and every consumer scans the checkpointed
    # blocks instead of replaying the parquet scan + regex + hash
    # subtree. Same pattern as operators/ranking.with_global_rank —
    # lineage truncation also means a stage retry cannot recompute a
    # different relation, and the blocks are GC-freed with the
    # DataFrame (no unpersist bookkeeping).
    base = (
        shingled
        if shingled is not None
        else df.select(
            F.col(id_col).alias("__id"),
            T.shingle_hashes(text_col, n=shingle_n).alias("__shs"),
        ).localCheckpoint(eager=False)
    )
    ex = base.select("__id", F.explode("__shs").alias("__h"))
    sigs = _signatures_from_exploded(ex, "__id", n_hashes)

    cands = band_candidates(sigs, n_hashes=n_hashes, bands=bands, max_bucket_size=max_bucket_size)
    # Join shingle sets back by id (keeps the band join narrow).
    sa = base.select(F.col("__id").alias("__id"), F.col("__shs").alias("__sha"))
    sb = base.select(F.col("__id").alias("__id2"), F.col("__shs").alias("__shb"))
    verified = cands.join(sa, "__id").join(sb, "__id2")
    inter = F.size(F.array_intersect("__sha", "__shb"))
    union = F.size("__sha") + F.size("__shb") - inter
    jacc = inter.cast("double") / union
    return (
        verified.where(jacc >= threshold)
        .select(
            F.col("__id").alias("doc_a"),
            F.col("__id2").alias("doc_b"),
            F.round(jacc, 6).alias("jaccard"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 32,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup candidates via SimHash block permutation.

    Split the simhash into (max_hamming+1) blocks; by pigeonhole, any
    pair within max_hamming shares at least one exact block → join on
    (block_idx, block_value), verify full Hamming distance.
    """
    nblocks = max_hamming + 1
    width = bits // nblocks
    sh = df.select(F.col(id_col).alias("__id"), T.simhash(F.col(text_col), bits).alias("__sh"))
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("__sh"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("val"),
            )
            for i in range(nblocks)
        ]
    )
    ex = sh.select("__id", "__sh", F.explode(blocks).alias("b")).select(
        "__id", "__sh", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    ex = _cap_buckets(ex, ["blk", "val"], max_bucket_size)
    ex2 = ex.select(
        F.col("__id").alias("__id2"),
        F.col("__sh").alias("__sh2"),
        F.col("blk").alias("blk2"),
        F.col("val").alias("val2"),
    )
    # MERGE hint: same block relation both sides, partitioned + sorted
    # on (blk, val) by the cap window (see band_candidates).
    cands = (
        ex.join(
            ex2.hint("merge"),
            (F.col("blk") == F.col("blk2"))
            & (F.col("val") == F.col("val2"))
            & (F.col("__id") < F.col("__id2")),
        )
        .select("__id", "__sh", "__id2", "__sh2")
        .distinct()
    )
    dist = T.hamming64(F.col("__sh"), F.col("__sh2"))
    return cands.where(dist <= max_hamming).select(
        F.col("__id").alias("doc_a"),
        F.col("__id2").alias("doc_b"),
        dist.alias("hamming"),
    )


def incremental_lsh_admission(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Admission-control dedup: decide, per incoming batch document,
    whether it is a near-duplicate of the EXISTING corpus (reference
    domain: the insert dedup gate, generalized from exact file hashes
    to near-dup text). Returns (id, n_candidates, best_jaccard,
    admitted).

    Scale shape: this is the streaming-ingest dedup pattern — corpus
    band keys are computed once (in production: stored alongside the
    table and read back, KBs per million docs per band), the batch
    side is small, and the join is batch-keys ⋈ corpus-keys on
    (band, key) — shuffle proportional to the BATCH, with the corpus
    side pruned to colliding keys. No batch-batch or corpus-corpus
    pairs are ever formed. The corpus side's degenerate band buckets
    (boilerplate signatures shared by > max_bucket_size docs — a
    B_k × C_k blowup under one join key) are dropped like d04's,
    no-op at gate SFs; a batch doc colliding only there reports
    fewer candidates, through its other bands otherwise."""
    assert n_hashes % bands == 0
    r = n_hashes // bands

    def bucketize(df: DataFrame, out_id: str) -> DataFrame:
        sigs = minhash_signatures(df, id_col, text_col, k=n_hashes, shingle_n=shingle_n)
        structs = ", ".join(
            "struct({b} AS band, concat_ws('_', {cols}) AS key)".format(
                b=b,
                cols=", ".join(f"cast(mh{b * r + i} AS string)" for i in range(r)),
            )
            for b in range(bands)
        )
        return sigs.select(
            F.col(id_col).alias(out_id), F.expr(f"explode(array({structs})) AS bk")
        ).select(out_id, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    cands = (
        bucketize(batch, "__id")
        .join(
            _cap_buckets(bucketize(corpus, "__cid"), ["band", "key"], max_bucket_size),
            ["band", "key"],
        )
        .select("__id", "__cid")
        .distinct()
    )
    shs_b = batch.select(
        F.col(id_col).alias("__id"), T.shingle_hashes(text_col, n=shingle_n).alias("__sha")
    )
    shs_c = corpus.select(
        F.col(id_col).alias("__cid"), T.shingle_hashes(text_col, n=shingle_n).alias("__shb")
    )
    inter = F.size(F.array_intersect("__sha", "__shb"))
    union = F.size("__sha") + F.size("__shb") - inter
    verified = (
        cands.join(shs_b, "__id")
        .join(shs_c, "__cid")
        .select("__id", "__cid", (inter.cast("double") / union).alias("__j"))
    )
    per_doc = verified.groupBy("__id").agg(
        F.countDistinct("__cid").alias("n_candidates"),
        F.round(F.max("__j"), 6).alias("best_jaccard"),
    )
    return (
        batch.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            "best_jaccard",
            F.when(
                F.col("best_jaccard").isNull() | (F.col("best_jaccard") < threshold),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("admitted"),
        )
    )


def duplicate_span_cut_positions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 8
) -> DataFrame:
    """(id, pos) of every NON-KEEPER occurrence of a cross-document
    duplicated w-token span — ExactSubstr semantics (Lee et al. 2022):
    the keeper is the globally first occurrence (smallest id, then
    position). Same shape as the gated d19 summary: dup membership is
    a merge-pinned semi join on the 8-byte span hash (the growing
    side OOMed as an AQE broadcast at the 100x probe), and keeper
    selection is two keyed min-aggregations — never a row_number
    window over a posting list, never an (id*K + pos) encoding.
    Output columns: `<id_col>`, `pos` (1-based first token)."""
    sp = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(T.span_hashes_arrow(text_col, w)).alias(
                "__pos0", "__h"
            ),
        )
        .select("__id", (F.col("__pos0") + 1).alias("__pos"), "__h")
        .localCheckpoint(eager=False)
    )
    dup = (
        sp.groupBy("__h")
        .agg(F.count_distinct("__id").alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__h")
    )
    occ = (
        sp.join(dup.hint("merge"), "__h", "semi")
        .select("__id", "__pos", "__h")
        .localCheckpoint(eager=False)
    )
    k1 = (
        occ.groupBy("__h")
        .agg(F.min("__id").alias("__d0"))
        .select(F.col("__h").alias("__h1"), "__d0")
    )
    k2 = (
        occ.join(
            k1.hint("merge"),
            (F.col("__h") == F.col("__h1")) & (F.col("__id") == F.col("__d0")),
        )
        .groupBy(F.col("__h1").alias("__kh"), "__d0")
        .agg(F.min("__pos").alias("__p0"))
    )
    return (
        occ.join(k2.hint("merge"), F.col("__h") == F.col("__kh"))
        .where(~((F.col("__id") == F.col("__d0")) & (F.col("__pos") == F.col("__p0"))))
        .select(F.col("__id").alias(id_col), F.col("__pos").alias("pos"))
    )


def span_cut_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 8
) -> DataFrame:
    """Apply the ExactSubstr cut: rebuild each document's text with
    every non-keeper duplicated-span occurrence removed. Returns the
    input columns plus `text_clean` and `tokens_cut` (so the caller
    decides whether to drop the original text).

    Shape at 100 TB: cut positions per doc collapse to a sorted
    position list (collect_list is bounded by the doc's own token
    count — per-doc state, the same envelope as chunking/packing),
    positions merge into disjoint intervals with one aggregate()
    fold, and the rebuild is a single JVM higher-order filter over
    the token array testing membership against the MERGED intervals
    — O(tokens x merged_intervals), and merging makes the interval
    list tiny in both regimes (sparse dups -> few islands; a fully
    duplicated doc -> ONE interval). No Python in the plan."""
    ivs = (
        duplicate_span_cut_positions(df, text_col, id_col, w)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
        .select(
            F.col(id_col).alias("__cid"),
            F.expr(
                f"""aggregate(
                  __ps,
                  CAST(array() AS array<struct<s:int,e:int>>),
                  (acc, p) -> CASE
                    WHEN size(acc) > 0 AND p <= element_at(acc, -1).e + 1
                    THEN concat(
                      slice(acc, 1, size(acc) - 1),
                      array(named_struct(
                        's', element_at(acc, -1).s,
                        'e', greatest(element_at(acc, -1).e, p + {w - 1}))))
                    ELSE concat(acc, array(named_struct('s', p, 'e', p + {w - 1})))
                  END)"""
            ).alias("__iv"),
        )
    )
    toks_sql = T.tokens_sql(text_col)
    kept = (
        f"filter(transform({toks_sql}, (t, i) -> named_struct('t', t, 'p', i + 1)), "
        f"x -> __iv IS NULL OR NOT exists(__iv, v -> x.p >= v.s AND x.p <= v.e))"
    )
    return (
        df.join(ivs.hint("merge"), F.col(id_col) == F.col("__cid"), "left")
        .withColumn("text_clean", F.expr(f"array_join(transform({kept}, x -> x.t), ' ')"))
        .withColumn(
            "tokens_cut",
            (F.size(F.expr(toks_sql)) - F.size(F.expr(kept))).cast("long"),
        )
        .drop("__cid", "__iv")
    )


def span_incremental_admission(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    reject_bp: int = 5000,
) -> DataFrame:
    """Span-level admission gate for continuous ingest: for each
    incoming batch document, measure how much of it is ALREADY
    REPRESENTED in the indexed corpus at w-token-span granularity
    (d18's index as the standing side) and admit it only when the
    covered share stays under `reject_bp` basis points. d11 is this
    gate at the document level (whole-doc near-dup); this is the
    substring-level analog — the daily operator of a
    continuously-ingesting pipeline, where yesterday's corpus is the
    standing index and today's crawl is the batch.

    Returns (id_col, n_toks, covered_tokens, covered_bp, admitted).

    Scale shape: the standing index is the DISTINCT corpus span-hash
    set (8 bytes per unique span; in production computed once at
    ingest and stored). The membership join ships BATCH spans against
    it as a merge-pinned semi join — the corpus side grows with the
    corpus, which is exactly the relation AQE mis-promoted to a
    broadcast at the 100x probe for d18/g01, so the pin is load-
    bearing. Covered tokens use the same interval-union running-max
    window as d18/d19, partitioned per batch doc (bounded by one
    document's spans, never the corpus)."""
    idx = (
        corpus.select(
            F.explode(T.span_hashes_arrow(text_col, w)).alias("__h")
        )
        .distinct()
    )
    return span_admission_against_index(
        idx, batch, id_col=id_col, text_col=text_col, w=w, reject_bp=reject_bp
    )


def span_index(df: DataFrame, text_col: str = "text", w: int = 8) -> DataFrame:
    """The standing span-hash index of a corpus: its DISTINCT w-token
    span hashes, one `__h` bigint column (8 bytes per unique span).
    In production this is computed once at ingest and STORED — the
    admission gate then never rescans the corpus."""
    return df.select(
        F.explode(T.span_hashes_arrow(text_col, w)).alias("__h")
    ).distinct()


def span_admission_against_index(
    idx: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    reject_bp: int = 5000,
) -> DataFrame:
    """The admission core of span_incremental_admission, taking the
    standing index (one `__h` column, span_index output) directly —
    the entry point for pipelines that persist the index instead of
    rebuilding it per batch (streaming/dedupe.span_admission_stream)."""
    b_sp = batch.select(
        F.col(id_col).alias("__id"),
        F.posexplode(T.span_hashes_arrow(text_col, w)).alias("__pos0", "__h"),
    ).select("__id", (F.col("__pos0") + 1).alias("__pos"), "__h")
    occ = b_sp.join(idx.hint("merge"), "__h", "semi").select("__id", "__pos")

    from pyspark.sql import Window

    prev_end = F.max(F.col("__pos") + (w - 1)).over(
        Window.partitionBy("__id")
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0),
        (F.col("__pos") + (w - 1))
        - F.greatest(F.col("__pos") - 1, F.coalesce(prev_end, F.lit(0))),
    )
    per_doc = (
        occ.withColumn("__c", contrib)
        .groupBy("__id")
        .agg(F.sum("__c").cast("long").alias("__cov"))
    )
    base = batch.select(
        F.col(id_col).alias("__id"),
        F.size(T.tokens(F.col(text_col))).cast("long").alias("n_toks"),
    )
    return (
        base.join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_toks",
            F.coalesce("__cov", F.lit(0)).cast("long").alias("covered_tokens"),
        )
        .withColumn(
            "covered_bp",
            F.expr("covered_tokens * 10000 div greatest(n_toks, 1)"),
        )
        .withColumn("admitted", F.col("covered_bp") < reject_bp)
    )
