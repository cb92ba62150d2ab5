"""Arrow-batched numpy implementations of the portable text hashes.

Same hash spec as :mod:`ice_spark.functions.text` (token / shingle /
span / char hashes) — bit-identical outputs, executed as vectorized
numpy folds inside pandas UDF batches instead of Spark's interpreted
higher-order-function path (guide §4.2: HOF lambdas are
CodegenFallback — every char of every token costs an interpreted
expression-tree walk; r13-opt measured the swap at 1.5-2x on the
shingle producer and ~10x on whole-document char hashes).

Parity contract (pinned by tests/test_text_np.py):

- tokens are maximal runs of non-``[\\t\\n\\x0b\\f\\r ]`` characters —
  exactly ``filter(split(trim(s), '\\s+'), t -> t != '')`` for any
  string (Java's ASCII ``\\s`` == this set; trim only strips 0x20
  which is in the set; leading/trailing empties are filtered/dropped
  on both paths);
- character values are Unicode CODEPOINTS (numpy reads utf-32), which
  matches Spark ``ascii()``/``split('')`` for all BMP text and the
  DuckDB oracle for all text; astral-plane chars (> 0xFFFF) would
  diverge from Spark's surrogate-pair split — the corpus contract is
  ASCII (TESTDATA) and the oracle itself already disagrees with Spark
  there, so the numpy path sides with the oracle;
- all arithmetic stays < 2^63 (acc < 1e9, *131 or *1e6 + codepoint).
"""

from __future__ import annotations

import numpy as np

MOD = 1_000_000_007
HASH_INIT = 7
HASH_MULT = 131
SHINGLE_MULT = 1_000_003

# Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
_WS = np.array([9, 10, 11, 12, 13, 32], dtype=np.uint32)


def _codepoints(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """One flat codepoint array for the batch (docs separated by \\n
    so runs cannot cross docs) + per-doc [start, end) offsets."""
    joined = "\n".join(t if t is not None else "" for t in texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    doc_lens = np.fromiter(
        (len(t) if t is not None else 0 for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(doc_lens + 1, out=offs[1:])  # +1 = separator
    return codes, offs


def _poly_fold(
    codes: np.ndarray, starts: np.ndarray, lens: np.ndarray, mult: int
) -> np.ndarray:
    """acc_i = fold over codes[starts_i .. starts_i+lens_i) of
    (acc * mult + c) % MOD from HASH_INIT — vectorized across
    segments by iterating char position over a shrinking
    length-sorted prefix (no boolean masks in the loop)."""
    n = len(starts)
    out = np.full(n, HASH_INIT, dtype=np.int64)
    if n == 0 or lens.max() == 0:
        return out
    order = np.argsort(-lens, kind="stable")
    s, ln = starts[order], lens[order]
    acc = np.full(n, HASH_INIT, dtype=np.int64)
    # number of segments with len > j, for prefix slicing
    alive = n
    maxlen = int(ln[0])
    # precompute how many stay alive at each j via searchsorted on -ln
    neg = -ln
    for j in range(maxlen):
        alive = int(np.searchsorted(neg, -j, side="left"))
        if alive == 0:
            break
        a = acc[:alive]
        np.multiply(a, mult, out=a)
        np.add(a, codes[s[:alive] + j], out=a)
        np.mod(a, MOD, out=a)
    out[order] = acc
    return out


def _tokenize(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (tokens-per-doc counts, flat per-token hashes, null mask)."""
    null = np.fromiter(
        (t is None for t in texts), dtype=bool, count=len(texts)
    )
    codes, offs = _codepoints(texts)
    if len(codes) == 0:
        return np.zeros(len(texts), dtype=np.int64), np.empty(0, np.int64), null
    nonws = ~np.isin(codes, _WS)
    prev = np.empty_like(nonws)
    prev[0] = False
    prev[1:] = nonws[:-1]
    starts = np.flatnonzero(nonws & ~prev)
    nxt = np.empty_like(nonws)
    nxt[-1] = False
    nxt[:-1] = nonws[1:]
    ends = np.flatnonzero(nonws & ~nxt) + 1
    tok_doc = np.searchsorted(offs[1:], starts, side="right")
    counts = np.bincount(tok_doc, minlength=len(texts)).astype(np.int64)
    hashes = _poly_fold(
        codes.astype(np.int64), starts, ends - starts, HASH_MULT
    )
    return counts, hashes, null


def _windows(
    counts: np.ndarray, th: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All n-token windows on the flat token-hash array that lie
    inside one doc. -> (win_doc, local position, values, per-doc
    window counts m)."""
    ndocs = len(counts)
    tok_offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offs[1:])
    total = len(th)
    if total >= n:
        sh = np.full(total - n + 1, HASH_INIT, dtype=np.int64)
        for j in range(n):
            np.multiply(sh, SHINGLE_MULT, out=sh)
            np.add(sh, th[j : total - n + 1 + j], out=sh)
            np.mod(sh, MOD, out=sh)
    else:
        sh = np.empty(0, dtype=np.int64)
    m = np.maximum(counts - n + 1, 0)
    win_doc = np.repeat(np.arange(ndocs), m)
    win_off = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(m, out=win_off[1:])
    local = np.arange(win_off[-1]) - np.repeat(win_off[:-1], m)
    win_idx = np.repeat(tok_offs[:-1], m) + local
    vals = sh[win_idx] if len(win_idx) else np.empty(0, np.int64)
    return win_doc, local, vals, m


def _whole_fold(
    counts: np.ndarray, th: np.ndarray, docs: np.ndarray
) -> np.ndarray:
    """Per selected doc: fold its whole token-hash run with the
    shingle polynomial (the size(th) < n fallback)."""
    tok_offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_offs[1:])
    acc = np.full(len(docs), HASH_INIT, dtype=np.int64)
    if len(docs) == 0:
        return acc
    cmax = int(counts[docs].max()) if len(docs) else 0
    for j in range(cmax):
        mm = counts[docs] > j
        acc[mm] = (acc[mm] * SHINGLE_MULT + th[tok_offs[docs[mm]] + j]) % MOD
    return acc


def shingle_hash_lists(texts: list, n: int = 3) -> list:
    """Per doc: array_distinct of all n-token shingle hashes;
    < n tokens -> [whole-fold hash]; NULL text -> [None]."""
    counts, th, null = _tokenize(texts)
    win_doc, local, vals, m = _windows(counts, th, n)
    ndocs = len(counts)
    # order-preserving distinct, vectorized: first occurrence per
    # (doc, value), then re-sorted back to position order
    if len(vals):
        order = np.lexsort((local, vals, win_doc))
        sd, sv = win_doc[order], vals[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])
        keep = order[first]
        keep = keep[np.lexsort((local[keep], win_doc[keep]))]
        kept_vals = vals[keep]
        kept_doc = win_doc[keep]
        kcnt = np.bincount(kept_doc, minlength=ndocs).astype(np.int64)
    else:
        kept_vals = np.empty(0, np.int64)
        kcnt = np.zeros(ndocs, dtype=np.int64)
    short = np.flatnonzero((counts < n) & ~null)
    short_acc = _whole_fold(counts, th, short)
    out: list = [None] * ndocs
    koffs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(kcnt, out=koffs[1:])
    for d in range(ndocs):
        if null[d]:
            out[d] = [None]
        elif counts[d] >= n:
            out[d] = kept_vals[koffs[d] : koffs[d + 1]].tolist()
        else:
            pass  # filled below
    for k, d in enumerate(short):
        out[d] = [int(short_acc[k])]
    return out


def _seg_min_perms(
    flat: np.ndarray, cnt: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per segment (cnt>0): [min((h*(2j+3)+(7j+1)) % MOD) for j<k] —
    the minhash permutation spec of operators/dedup
    (_signatures_from_exploded), vectorized. Returns (nonzero segment
    indices, (len(nz), k) signature matrix). Duplicates in a segment
    cannot change a min, so callers may pass windows WITHOUT the
    order-preserving distinct."""
    ndocs = len(cnt)
    offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(cnt, out=offs[1:])
    nz = np.flatnonzero(cnt > 0)
    sig = np.empty((len(nz), k), dtype=np.int64)
    if len(nz):
        starts = offs[:-1][nz]
        for j in range(k):
            pj = (flat * (2 * j + 3) + (7 * j + 1)) % MOD
            sig[:, j] = np.minimum.reduceat(pj, starts)
    return nz, sig


def minhash_sig_lists(texts: list, n: int = 3, k: int = 16) -> list:
    """Per doc: the k-permutation MinHash signature over its n-token
    shingle hashes — bit-identical to exploding
    ``shingle_hash_lists`` and taking ``min((h*(2j+3)+(7j+1)) % MOD)``
    per permutation (< n tokens -> mins over the single whole-fold
    hash; NULL text -> None, i.e. an all-null signature row)."""
    counts, th, null = _tokenize(texts)
    win_doc, _local, vals, m = _windows(counts, th, n)
    ndocs = len(counts)
    short = np.flatnonzero((counts < n) & ~null)
    short_acc = _whole_fold(counts, th, short)
    cnt = m.copy()
    cnt[short] = 1
    cnt[null] = 0
    offs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(cnt, out=offs[1:])
    flat = np.empty(int(offs[-1]), dtype=np.int64)
    if len(vals):
        woffs = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(m, out=woffs[1:])
        # window row i of doc d lands at offs[d] + (i - woffs[d])
        shift = np.repeat(offs[:-1] - woffs[:-1], m)
        flat[shift + np.arange(len(vals))] = vals
    if len(short):
        flat[offs[short]] = short_acc
    nz, sig = _seg_min_perms(flat, cnt, k)
    out: list = [None] * ndocs
    for i, d in enumerate(nz):
        out[d] = sig[i].tolist()
    return out


def span_hash_lists(texts: list, w: int = 8) -> list:
    """Per doc: ALL w-token span hashes in position order (duplicates
    kept); < w tokens -> []; NULL text -> []."""
    counts, th, null = _tokenize(texts)
    win_doc, _local, vals, m = _windows(counts, th, w)
    ndocs = len(counts)
    woffs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(m, out=woffs[1:])
    return [vals[woffs[d] : woffs[d + 1]].tolist() for d in range(ndocs)]


def token_hash_lists(texts: list) -> list:
    """Per doc: the per-token hashes in order; NULL text -> None."""
    counts, th, null = _tokenize(texts)
    ndocs = len(counts)
    toffs = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=toffs[1:])
    return [
        None if null[d] else th[toffs[d] : toffs[d + 1]].tolist()
        for d in range(ndocs)
    ]


def char_hash_values(texts: list) -> list:
    """Whole-string char hash (every char, whitespace included) —
    fold of (acc*131 + codepoint) % MOD from 7. NULL -> None.
    Empty string: Spark's split('', '') yields [''] and ascii('')
    is 0, so the empty-string hash is (7*131 + 0) % MOD."""
    codes, offs = _codepoints(texts)
    ndocs = len(texts)
    starts = offs[:-1]
    lens = offs[1:] - offs[:-1] - 1  # strip the separator
    vals = _poly_fold(codes.astype(np.int64), starts, lens, HASH_MULT)
    out: list = []
    for d in range(ndocs):
        if texts[d] is None:
            out.append(None)
        elif lens[d] == 0:
            out.append((HASH_INIT * HASH_MULT) % MOD)
        else:
            out.append(int(vals[d]))
    return out
