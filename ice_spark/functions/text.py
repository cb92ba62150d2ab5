"""Text-analysis primitives: tokenization, portable hashes, shingles,
MinHash signatures, SimHash, language-ID scoring, quality metrics.

Two execution forms since r13-opt: the SQL/Column expression trees
(whole-stage codegen; the oracle spec and parity reference) and
Arrow-batched numpy producers (``*_arrow``, ``functions/text_np.py``)
used at corpus-scan sites, where Spark's interpreted HOF-lambda path
loses 1.5-10x to a vectorized pandas UDF (guide §4.2). Bit parity is
pinned by ``tests/test_text_np.py``.

Portable hash spec (reproducible in any engine, incl. the DuckDB
oracle):

    token_hash(s) = fold over characters c of s:
        acc <- (acc * 131 + codepoint(c)) mod 1_000_000_007, acc0 = 7

Shingle hashes combine per-token hashes polynomially (each token is
hashed once, not re-walked per shingle — at 100 TB this is the
difference between O(chars) and O(chars * shingle_width) per doc):

    shingle_hash(t_i..t_{i+n-1}) = fold over token hashes h:
        acc <- (acc * 1_000_003 + h) mod 1_000_000_007, acc0 = 7

MinHash permutation j (j = 0..k-1), over the distinct shingle hashes:

    perm_j(h) = (A[j] * h + B[j]) mod 1_000_000_007
    A[j] = 2*j + 3, B[j] = 7*j + 1   (odd multipliers, fixed seeds)

The reference has no text functions at all (SURVEY.md §2.8); these
are the beyond-reference training-data operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
HASH_INIT = 7
HASH_MULT = 131

# Stopword marker sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "y", "es", "que", "un"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "zh": ["de", "shi", "zai", "le", "he"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["that", "for", "on", "with", "as", "at", "this"]


# --- SQL-string builders -----------------------------------------------------
# Building deep higher-order-function trees through the Column API
# costs hundreds of py4j round trips (~0.3-0.7 s per query on the
# bench); rendering the SAME expression as one SQL string and parsing
# it JVM-side with F.expr is a single round trip. Both paths produce
# identical semantics; tests assert they agree.


def tokens_sql(col_sql: str) -> str:
    return f"filter(split(trim({col_sql}), '\\\\s+'), t -> t != '')"


def char_hash_sql(s_sql: str) -> str:
    return (
        f"aggregate(split({s_sql}, ''), CAST({HASH_INIT} AS BIGINT), "
        f"(acc, c) -> (acc * {HASH_MULT} + ascii(c)) % {MOD})"
    )


def token_hashes_sql(col_sql: str) -> str:
    return f"transform({tokens_sql(col_sql)}, tk -> {char_hash_sql('tk')})"


def shingle_hashes_sql(col_sql: str, n: int = 3) -> str:
    """SQL text equivalent of shingle_hashes (same hash spec)."""
    poly = str(HASH_INIT)
    for j in range(n):
        poly = f"(({poly} * {SHINGLE_MULT} + element_at(th, CAST(i + {j + 1} AS INT))) % {MOD})"
    return (
        f"element_at(transform(array({token_hashes_sql(col_sql)}), th -> "
        f"array_distinct(CASE WHEN size(th) >= {n} THEN "
        f"transform(sequence(0, size(th) - {n}), i -> {poly}) "
        f"ELSE array(aggregate(th, CAST({HASH_INIT} AS BIGINT), "
        f"(acc, h) -> (acc * {SHINGLE_MULT} + h) % {MOD})) END)), 1)"
    )


def span_hashes_sql(col_sql: str, w: int = 8) -> str:
    """Positional w-token span hashes (same poly spec as shingles,
    width w, duplicates KEPT and position preserved): element i of
    the result hashes tokens [i+1 .. i+w] (1-based).  Unlike
    shingle_hashes this is position-addressable, so a consumer can
    map a shared hash back to the exact covered token interval —
    the primitive for exact-substring dedup (Lee et al. 2022).
    Docs shorter than w tokens yield an empty array.  Cost is
    O(tokens * w) per doc with w constant — map-side, no shuffle."""
    poly = str(HASH_INIT)
    for j in range(w):
        poly = f"(({poly} * {SHINGLE_MULT} + element_at(th, CAST(i + {j + 1} AS INT))) % {MOD})"
    return (
        f"element_at(transform(array({token_hashes_sql(col_sql)}), th -> "
        f"CASE WHEN size(th) >= {w} THEN "
        f"transform(sequence(0, size(th) - {w}), i -> {poly}) "
        f"ELSE CAST(array() AS array<bigint>) END), 1)"
    )


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    if isinstance(text, str):
        return F.expr(tokens_sql(text))
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    if isinstance(text, str):
        return F.expr(f"size({tokens_sql(text)})")
    return F.size(tokens(text))


def char_hash(s: Column | str) -> Column:
    """Portable polynomial rolling hash of a string (see module doc)."""
    if isinstance(s, str):
        return F.expr(char_hash_sql(s))
    return F.aggregate(
        F.split(s, ""),
        F.lit(HASH_INIT).cast("long"),
        lambda acc, ch: (acc * HASH_MULT + F.ascii(ch)) % MOD,
    )


SHINGLE_MULT = 1_000_003


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined strings)."""
    t = tokens(text)
    idx = F.sequence(F.lit(0), F.size(t) - n)
    shingled = F.when(
        F.size(t) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))
    return F.array_distinct(shingled)


def _poly_combine(hashes_slice: list[Column]) -> Column:
    acc: Column = F.lit(HASH_INIT).cast("long")
    for h in hashes_slice:
        acc = (acc * SHINGLE_MULT + h) % MOD
    return acc


def bind_once(expr: Column, body) -> Column:
    """Evaluate ``expr`` once and pass it to ``body`` as a bound value.

    Catalyst inlines sub-expressions referenced from lambda bodies —
    an expression used k times is *computed* k times (there is no CSE
    through higher-order functions). Wrapping it as the element of a
    one-element array and transforming binds it to a lambda variable,
    which IS evaluated once. Essential for array pipelines like
    tokens → token-hashes → shingles where the inner array is
    referenced per output element.
    """
    return F.element_at(F.transform(F.array(expr), body), 1)


# --- Arrow-batched producers -------------------------------------------------
# The SQL/Column hash pipelines above are higher-order-function trees;
# HOF lambdas are CodegenFallback in Spark, so every character of
# every token pays an interpreted expression-tree walk. For the
# corpus-scan producers (whole-document hash columns) the same folds
# run as vectorized numpy over Arrow batches (functions/text_np.py,
# guide §4.2) — bit-identical outputs, pinned by tests/test_text_np.py
# against the SQL path. The SQL forms stay: they are the oracle spec,
# they serve HOF call sites (expressions nested inside transform()),
# and they are the parity reference.


def _repo_root() -> str:
    import os  # noqa: PLC0415

    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _arrow_array_udf(kernel_name: str, text: Column | str, **kw) -> Column:
    import pandas as pd  # noqa: PLC0415 — executor-side import
    from pyspark.sql.types import ArrayType, LongType

    root = _repo_root()

    # NOTE: the closure must stay self-contained (only stdlib/pandas
    # globals): anything referencing this module by name forces the
    # executor worker — which inherits the driver's cwd but NOT its
    # sys.path — to import ice_spark before the fallback can run.
    # LOCAL-MODE ASSUMPTION: the sys.path fallback below points the
    # worker at the DRIVER's repo root, which only resolves when
    # executors share the driver's filesystem (local[N], or a cluster
    # with a shared mount). On a distributed cluster, ship the package
    # with sc.addPyFile/--py-files so the plain import succeeds first.
    def _fn(s):
        import importlib  # noqa: PLC0415

        try:
            text_np = importlib.import_module("ice_spark.functions.text_np")
        except ModuleNotFoundError:  # pragma: no cover - path-dependent
            import sys  # noqa: PLC0415

            sys.path.insert(0, root)
            text_np = importlib.import_module("ice_spark.functions.text_np")
        fn = getattr(text_np, kernel_name)
        return pd.Series(fn(s.tolist(), **kw))

    # real type objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf
    # cannot resolve against this module's globals
    _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_fn, ArrayType(LongType()))
    return udf(F.col(text) if isinstance(text, str) else text)


def shingle_hashes_arrow(text: Column | str, n: int = 3) -> Column:
    """Arrow-batched ``shingle_hashes`` (same bits, numpy fold)."""
    return _arrow_array_udf("shingle_hash_lists", text, n=n)


def span_hashes_arrow(text: Column | str, w: int = 8) -> Column:
    """Arrow-batched ``span_hashes_sql`` (positional, duplicates
    kept, < w tokens or NULL -> empty array — same bits)."""
    return _arrow_array_udf("span_hash_lists", text, w=w)


def token_hashes_arrow(text: Column | str) -> Column:
    """Arrow-batched ``token_hashes_sql`` (same bits)."""
    return _arrow_array_udf("token_hash_lists", text)


def minhash_sigs_arrow(text: Column | str, n: int = 3, k: int = 16) -> Column:
    """Arrow-batched text -> k-permutation MinHash signature array —
    bit-identical to exploding ``shingle_hashes`` and aggregating
    ``min((h*(2j+3)+(7j+1)) % MOD)`` per permutation
    (operators/dedup._signatures_from_exploded), in ONE Python pass:
    tokenize + shingle + k mins, shipping k longs per doc back over
    Arrow instead of the whole shingle array. NULL text -> NULL array
    (all-null signature row, matching the exploded [None] group)."""
    return _arrow_array_udf("minhash_sig_lists", text, n=n, k=k)


def char_hash_arrow(text: Column | str) -> Column:
    """Arrow-batched whole-string ``char_hash`` — for corpus-scan
    fingerprint columns over full document text. Keep the Column/SQL
    form for short keys and for call sites inside HOF lambdas (a
    pandas UDF cannot appear there)."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.types import LongType

    root = _repo_root()

    def _fn(s):
        import importlib  # noqa: PLC0415

        try:
            text_np = importlib.import_module("ice_spark.functions.text_np")
        except ModuleNotFoundError:  # pragma: no cover - path-dependent
            import sys  # noqa: PLC0415

            sys.path.insert(0, root)
            text_np = importlib.import_module("ice_spark.functions.text_np")
        return pd.Series(text_np.char_hash_values(s.tolist()), dtype="object")

    _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_fn, LongType())
    return udf(F.col(text) if isinstance(text, str) else text)


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct portable hashes of word n-gram shingles.

    Tokens are hashed once (char walk), shingle hashes combine the
    token hashes polynomially — O(total chars + shingles), not
    O(total chars * shingles). Since r13-opt this dispatches to the
    Arrow-batched numpy fold (bit-identical; the HOF form below is
    kept as the spec/parity reference via ``shingle_hashes_column``).
    """
    return shingle_hashes_arrow(text, n)


def shingle_hashes_column(text: Column | str, n: int = 3) -> Column:
    """The original Column/HOF implementation (parity reference)."""
    if isinstance(text, str):
        return F.expr(shingle_hashes_sql(text, n))
    th_expr = F.transform(tokens(text), char_hash)

    def build(th: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(th) - n)
        full = F.when(
            F.size(th) >= n,
            F.transform(
                idx,
                lambda i: _poly_combine(
                    [F.element_at(th, (i + j + 1).cast("int")) for j in range(n)]
                ),
            ),
        ).otherwise(
            # short doc: one shingle over all its token hashes
            F.array(
                F.aggregate(
                    th,
                    F.lit(HASH_INIT).cast("long"),
                    lambda acc, h: (acc * SHINGLE_MULT + h) % MOD,
                )
            )
        )
        return F.array_distinct(full)

    return bind_once(th_expr, build)


def minhash_perm(hashes: Column, j: int) -> Column:
    """MinHash value for permutation j over a set of shingle hashes."""
    a, b = 2 * j + 3, 7 * j + 1
    return F.array_min(F.transform(hashes, lambda h: (h * a + b) % MOD))


def minhash_signature(hashes: Column, k: int) -> Column:
    """Array of k MinHash values."""
    return F.array(*[minhash_perm(hashes, j) for j in range(k)])


def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash over token hashes: for each bit, sum +1/-1 votes of all
    tokens' hash bits; bit set iff the vote is positive.

    32-bit so the value stays comfortably in a signed 64-bit long in
    every engine.
    """
    th_expr = F.transform(tokens(text), char_hash)

    def build(th: Column) -> Column:
        def bit_vote(b: int):
            return F.aggregate(
                th,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )

        val = F.lit(0).cast("long")
        for b in range(bits):
            val = val + F.when(bit_vote(b) > 0, F.lit(2**b).cast("long")).otherwise(0)
        return val

    return bind_once(th_expr, build)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two long values (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit counts per language (occurrence counts, not distinct)."""
    t = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda tok: F.array_contains(arr, tok)))
    return out


def predict_lang(text: Column | str) -> Column:
    """Argmax of lang_scores with fixed tie order en>de>es>fr>zh."""
    s = lang_scores(text)
    order = ["en", "de", "es", "fr", "zh"]
    expr = F.lit("zh")
    for i in range(len(order) - 2, -1, -1):
        lang = order[i]
        cond = None
        for other in order[i + 1 :]:
            c = s[lang] >= s[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or EN_STOPWORDS
    if isinstance(text, str):
        arr_sql = "array(" + ", ".join(f"'{m}'" for m in sw) + ")"
        toks = tokens_sql(f"lower({text})")
        return F.expr(
            f"element_at(transform(array({toks}), lt -> "
            f"CAST(size(filter(lt, tok -> array_contains({arr_sql}, tok))) AS DOUBLE)"
            f" / CAST(greatest(size(lt), 1) AS DOUBLE)), 1)"
        )
    t = tokens(F.lower(text))
    arr = F.array(*[F.lit(m) for m in sw])
    hits = F.size(F.filter(t, lambda tok: F.array_contains(arr, tok)))
    return hits.cast("double") / F.greatest(F.size(t), F.lit(1)).cast("double")


def mean_token_len(text: Column | str) -> Column:
    if isinstance(text, str):
        toks = tokens_sql(text)
        return F.expr(
            f"element_at(transform(array({toks}), lt -> "
            f"CAST(aggregate(lt, CAST(0 AS BIGINT), (acc, tok) -> acc + length(tok)) AS DOUBLE)"
            f" / CAST(greatest(size(lt), 1) AS DOUBLE)), 1)"
        )
    t = tokens(text)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, tok: acc + F.length(tok))
    return total.cast("double") / F.greatest(F.size(t), F.lit(1)).cast("double")


def chunk_expr(col_sql: str, width: int = 64, stride: int = 48) -> Column:
    """Explode a document into overlapping token-window chunks.

    Returns an inline()-style generator column producing
    (chunk_idx INT, chunk_text STRING, n_tokens INT) rows per doc:
    chunk i covers tokens [i*stride, i*stride + width). Docs with
    <= width tokens yield exactly one chunk. Pure JVM expression —
    at 100 TB chunking is a map-only stage, no shuffle.
    """
    toks = tokens_sql(col_sql)
    n_chunks = (
        f"CASE WHEN size(t) <= {width} THEN 0 "
        f"ELSE (size(t) - {width} + {stride} - 1) div {stride} END"
    )
    return F.expr(
        f"inline(element_at(transform(array({toks}), t -> "
        f"transform(sequence(0, {n_chunks}), i -> struct("
        f"CAST(i AS INT) AS chunk_idx, "
        f"array_join(slice(t, i * {stride} + 1, {width}), ' ') AS chunk_text, "
        f"size(slice(t, i * {stride} + 1, {width})) AS n_tokens))), 1))"
    )
