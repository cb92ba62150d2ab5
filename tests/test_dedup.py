"""Dedup operators: LSH recall vs the exact-Jaccard oracle, simhash,
exact dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_dedup_keeps_min_id(spark):
    from ice_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")], ["id", "text"]
    )
    out = exact_dedup(df, ["text"], "id")
    assert sorted(r.id for r in out.collect()) == [1, 3, 5]


def test_dedup_by_fingerprint_matches_exact(spark, sf_dir):
    from ice_spark.operators.dedup import dedup_by_fingerprint, exact_dedup
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in exact_dedup(docs, ["text"], "doc_id").collect())
    b = sorted(r.doc_id for r in dedup_by_fingerprint(docs, "text", "doc_id").collect())
    assert a == b


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH pipeline must find every pair the exact O(n^2)-free shingle
    join finds at J>=0.8 (the planted near-dups separate cleanly)."""
    from ice_spark.operators.dedup import minhash_lsh_pairs
    from ice_spark.queries.registry import load_all

    exact = load_all()["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    expected = {(r.doc_a, r.doc_b) for r in exact.collect()}

    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    got_df = minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=16, bands=8, threshold=0.8)
    got = {(r.doc_a, r.doc_b) for r in got_df.collect()}
    # Verification step guarantees precision; banding should give full
    # recall on J>=0.9 planted dups.
    assert got == expected


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    from ice_spark.functions.text import hamming64, simhash
    from ice_spark.queries.registry import load_all
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = load_all()["d02_ngram_jaccard_pairs"].spark_fn(spark, sf_dir)
    sh = docs.select("doc_id", simhash("text").alias("sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    dists = [r.d for r in joined.select(hamming64(F.col("sha"), F.col("shb")).alias("d")).collect()]
    if dists:  # sf0.001 documents also carry planted dups
        assert max(dists) <= 8  # near-dups land close in simhash space


def test_lsh_bucket_cap_bounds_candidates(spark):
    """Adversarial hot bucket: many identical docs land in one LSH
    bucket. With the cap, candidate generation stays bounded (the hot
    bucket is dropped); distinct docs still pair normally."""
    from ice_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    hot = [(i, "the same boilerplate text repeated everywhere " * 3) for i in range(60)]
    base = "a perfectly unique document about owls rivers lakes and quiet forests " * 4
    normal = [(1000, base + "today"), (1001, base + "tonight")]
    docs = spark.createDataFrame(hot + normal, ["doc_id", "text"])

    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=8, max_bucket_size=10
    ).collect()
    hot_pairs = [r for r in capped if r.doc_a < 1000 and r.doc_b < 1000]
    assert hot_pairs == []  # 60-member buckets dropped: no 1770-pair blowup
    assert {(r.doc_a, r.doc_b) for r in capped} >= {(1000, 1001)}

    sim = simhash_pairs(docs, "doc_id", "text", max_hamming=3, max_bucket_size=10).collect()
    assert [r for r in sim if r.doc_a < 1000 and r.doc_b < 1000] == []


def test_lsh_dropped_bucket_mass_audit(spark):
    from ice_spark.operators.dedup import lsh_dropped_bucket_mass

    buckets = spark.createDataFrame(
        [(i, 0, "hot") for i in range(20)] + [(100, 0, "cold"), (101, 1, "cold2")],
        ["__id", "band", "key"],
    )
    dropped = lsh_dropped_bucket_mass(buckets, ["band", "key"], max_bucket_size=10).collect()
    assert len(dropped) == 1 and dropped[0].key == "hot" and dropped[0].bucket_size == 20


def test_dropped_posting_mass_report(spark):
    """The gated cap-audit aggregate (d17's engine): per cap, the
    buckets a cap would drop, their posting rows, and the b*(b-1)/2
    candidate-pair mass lost."""
    from ice_spark.operators.dedup import dropped_posting_mass

    # key 'hot' has 5 postings, 'warm' 3, 'cold' 1
    rows = [(i, "hot") for i in range(5)]
    rows += [(i, "warm") for i in range(3)]
    rows += [(0, "cold")]
    ex = spark.createDataFrame(rows, ["doc_id", "k"])
    got = {
        (r.cap): r.asDict()
        for r in dropped_posting_mass(ex, ["k"], [2, 4, 100], "idx").collect()
    }
    assert got[2]["buckets_over_cap"] == 2  # hot + warm
    assert got[2]["dropped_posting_rows"] == 8
    assert got[2]["dropped_pair_mass"] == 10 + 3  # C(5,2) + C(3,2)
    assert got[4]["buckets_over_cap"] == 1  # hot only
    assert got[4]["dropped_pair_mass"] == 10
    assert got[100]["buckets_over_cap"] == 0
    assert got[100]["dropped_pair_mass"] == 0
    assert all(r["total_posting_rows"] == 9 for r in got.values())
    assert all(r["index_name"] == "idx" for r in got.values())


def test_span_hashes_positional_semantics(spark):
    """span_hashes_sql keeps duplicates and positions: element i (0-based)
    hashes tokens i..i+w-1 with the module's polynomial spec, count is
    n_tokens - w + 1, and short docs yield an empty (not null) array."""
    from ice_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, "aa bb cc aa bb cc"), (2, "aa bb"), (3, "")], ["id", "text"]
    )
    rows = {
        r.id: r.sp
        for r in df.select(
            "id", F.expr(T.span_hashes_sql("text", 3)).alias("sp")
        ).collect()
    }
    assert rows[2] == [] and rows[3] == []
    sp = rows[1]
    assert len(sp) == 4  # 6 tokens, w=3

    def ch(s):
        acc = 7
        for c in s:
            acc = (acc * 131 + ord(c)) % 1_000_000_007
        return acc

    def span(toks):
        acc = 7
        for t in toks:
            acc = (acc * 1_000_003 + ch(t)) % 1_000_000_007
        return acc

    toks = "aa bb cc aa bb cc".split()
    assert sp == [span(toks[i : i + 3]) for i in range(4)]
    # the repeated window 'aa bb cc' hashes identically at both positions
    assert sp[0] == sp[3]


def test_span_cut_bounded_by_span_coverage(spark, sf_dir):
    """d19 (cut every non-first occurrence) must remove no more than
    d18's duplicated-span coverage, and on a corpus where duplicate
    spans exist it must remove strictly less: the keeper occurrence
    survives, so per source tokens_cut <= covered_tokens, with
    equality impossible wherever a keeper doc contributes coverage."""
    from ice_spark.queries.registry import load_all

    qs = load_all()
    audit = {r.source: r for r in qs["d18_duplicate_spans"].spark_fn(spark, sf_dir).collect()}
    cut = {r.source: r for r in qs["d19_span_dedup_cut"].spark_fn(spark, sf_dir).collect()}
    assert set(audit) == set(cut)
    total_cov = sum(a.covered_tokens for a in audit.values())
    total_cut = sum(c.tokens_cut for c in cut.values())
    assert total_cov > 0, "test corpus should contain duplicate spans"
    assert total_cut < total_cov
    for src, c in cut.items():
        a = audit[src]
        assert c.tokens_cut <= a.covered_tokens
        assert c.docs_cut <= a.n_dup_docs
        assert c.cut_occurrences <= a.dup_span_occurrences
        assert c.total_tokens == a.total_tokens


def test_span_cut_documents_hand_case(spark):
    """Keeper doc unchanged; the later doc loses exactly the shared
    8-token window; overlapping cut spans merge to one interval."""
    from ice_spark.operators.dedup import span_cut_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i tail"),  # keeper: spans at pos 1..3
            (2, "pre a b c d e f g h i post"),  # non-keeper: pos 2..4 merge
            (3, "z1 z2 z3 z4 z5 z6 z7 z8"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in span_cut_documents(df).collect()}
    assert out[1].text_clean == "a b c d e f g h i tail"
    assert out[1].tokens_cut == 0
    # doc 2: spans 'a..h' (pos 2), 'b..i' (pos 3) and 'c..i post'? no —
    # shared spans are pos 2..4 windows of the 9 shared tokens; their
    # union is tokens 2..10, one merged interval of 9 tokens.
    assert out[2].text_clean == "pre post"
    assert out[2].tokens_cut == 9
    assert out[3].tokens_cut == 0


def test_span_cut_documents_matches_d19(spark, sf_dir):
    """The applied transform must remove EXACTLY the token mass the
    gated d19 summary reports, per source (same keeper rule, same
    interval union), and the cleaned corpus must keep every doc."""
    from ice_spark.operators.dedup import span_cut_documents
    from ice_spark.queries.registry import load_all
    from ice_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cleaned = span_cut_documents(docs)
    got = {
        r.source: (r.n, r.cut)
        for r in cleaned.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tokens_cut").alias("cut"))
        .collect()
    }
    want = {
        r.source: (r.n_docs, r.tokens_cut)
        for r in load_all()["d19_span_dedup_cut"].spark_fn(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(c for _, c in want.values()) > 0
