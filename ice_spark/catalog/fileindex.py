"""Per-file Bloom indexes: point-lookup file pruning beyond min/max.

Manifest column bounds (min/max) prune range predicates well, but an
equality lookup on a high-cardinality column — `WHERE user_id = X`
over a table not partitioned by user — matches every file's [min,max]
and scans all of them. A small Bloom filter of each file's values
turns that into "open only the files whose filter MIGHT contain X":
at 100 TB with 4096-bit filters, the index costs 512 bytes per file
(KBs–MBs of manifest metadata for the whole table) and cuts a point
lookup from a full scan to a handful of files. This is the
file-level analog of Parquet's row-group bloom filters, lifted into
the manifest plane where planning happens without opening footers.

Mechanics:

- BUILD (`build_bloom_index`) is one distributed pass: every
  (file, value) pair hashes to k bit positions via the repo's
  portable polynomial hash (functions/text.char_hash — the same spec
  the sampling/shingle oracles replay), positions fold into 64-bit
  words with a map-side-combined bit_or grouped by (file, word), and
  only the finished bitmaps (<= num_bits/64 longs per file) reach the
  driver. The index commits as a `replace` snapshot — same logical
  content, richer metadata — so incremental readers skip it.
- PROBE is driver-side pure Python at plan time (`might_contain`):
  the identical hash arithmetic tests the k bits; a miss on every
  filter value prunes the file. No false pruning is possible
  (Bloom filters have no false negatives), so `plan_files` stays
  exact — files kept by a false positive are eliminated by the scan's
  own predicate, exactly like min/max pruning today.

Honesty rules: files written after the index was built carry no
bitmap and are never pruned by it — rebuild to cover them, or set the
table property `bloom-columns` so every INSERT indexes its new files
before the commit (attach_ingest_blooms) and DATA_COMPACTION merges
bitmaps by OR; the hash
stringifies values, so only types with a stable string form are
indexable (int/long/string — same set the portable hash oracles use).
"""

from __future__ import annotations

import base64
import struct

from pyspark.sql import functions as F

from ice_spark.functions.text import HASH_INIT, HASH_MULT, MOD, char_hash

DEFAULT_NUM_BITS = 4096
DEFAULT_NUM_HASHES = 5
_STEP_PRIME = 999_983


_INDEXABLE = {"integer", "long", "short", "byte", "string"}


def _coerce_probe(value, type_name: str) -> str:
    """Render a probe value EXACTLY as Spark's cast-to-string renders
    the column at build time. Integral columns: decimal digits (a
    float probe like 1042.0 from JSON must hash as '1042', and a
    fractional probe can never match an integral column). Strings:
    verbatim."""
    if type_name in ("integer", "long", "short", "byte"):
        if isinstance(value, float) and value != int(value):
            return None  # fractional probe: matches nothing integral
        return str(int(value))
    return str(value)


def py_char_hash(value) -> int:
    """Driver-side twin of functions.text.char_hash (must stay in
    lockstep with the Spark expression)."""
    h = HASH_INIT
    for ch in str(value):
        h = (h * HASH_MULT + ord(ch)) % MOD
    return h


def _py_positions(value, num_bits: int, num_hashes: int) -> list[int]:
    h = py_char_hash(value)
    step = h % _STEP_PRIME + 1
    return [(h + i * step) % num_bits for i in range(num_hashes)]


def _spark_positions(col, num_bits: int, num_hashes: int):
    h = char_hash(col.cast("string"))
    step = h % _STEP_PRIME + 1
    return F.array(*[(h + F.lit(i) * step) % num_bits for i in range(num_hashes)])


def _validate_column(table, column: str) -> str:
    fields = {f.name: f.dataType.typeName() for f in table.schema.fields}
    if column not in fields:
        raise ValueError(f"unknown column {column!r}")
    if fields[column] not in _INDEXABLE:
        raise ValueError(
            f"column {column!r} has type {fields[column]!r}; Bloom "
            f"indexing needs a stable cross-engine string form — "
            f"indexable types: {sorted(_INDEXABLE)} (float/timestamp/"
            "boolean stringify differently between the build cast and "
            "a driver-side probe, which would FALSELY prune files)"
        )
    return fields[column]


def bitmaps_for_entries(
    table,
    entries: list[dict],
    column: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> dict:
    """{entry path -> bloom metadata dict} for the given entries —
    one distributed pass, only finished bitmaps reach the driver."""
    import os

    type_name = _validate_column(table, column)
    entries = [e for e in entries if e.get("records", 0) > 0]
    if not entries:
        return {}
    by_ver: dict[int, list[str]] = {}
    for e in entries:
        by_ver.setdefault(e.get("schema_version", 1), []).append(
            os.path.join(table.location, e["path"])
        )
    parts = []
    for ver, paths in sorted(by_ver.items()):
        df = (
            table.spark.read.schema(table.schema_at(ver))
            .parquet(*paths)
            .withColumn("__file", F.col("_metadata.file_path"))
        )
        parts.append(
            table._align_to_current(df, ver, extra_cols=("__file",)).select(
                "__file", column
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)

    pos = F.explode(
        _spark_positions(F.col(column), num_bits, num_hashes)
    ).alias("pos")
    rows = (
        df.filter(F.col(column).isNotNull())
        .select("__file", pos)
        .groupBy("__file", (F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("pos") % 64).cast("int"),
                )
            ).alias("bits")
        )
        .collect()
    )
    words_by_rel: dict[str, list[int]] = {}
    for r in rows:
        f = r["__file"]
        if f.startswith("file:"):
            f = "/" + f[len("file:"):].lstrip("/")
        rel = os.path.relpath(f, table.location)
        words_by_rel.setdefault(rel, [0] * (num_bits // 64))[r["w"]] = r["bits"]
    out = {}
    for e in entries:
        words = words_by_rel.get(e["path"], [0] * (num_bits // 64))
        out[e["path"]] = {
            "bits": num_bits,
            "hashes": num_hashes,
            "type": type_name,
            "b64": base64.b64encode(
                struct.pack(f"<{num_bits // 64}q", *words)
            ).decode("ascii"),
        }
    return out


def attach_ingest_blooms(table, entries: list[dict]) -> list[dict]:
    """Ingest-time indexing: if the table property `bloom-columns`
    (comma-separated) is set, every NEW file gets its bitmaps before
    the commit — closing the window where fresh files are unindexed
    until a rebuild. Costs one narrow pass over the just-written
    files; invalid/absent columns are skipped silently (the property
    must never break an insert)."""
    import os

    spec = table.properties.get("bloom-columns", "")
    if not spec:
        return entries
    bits = int(table.properties.get("bloom-bits", DEFAULT_NUM_BITS))
    # externally-registered / absolute paths are skipped: the builder
    # resolves relative to the table location
    local = [
        e for e in entries
        if not e.get("external") and not os.path.isabs(e["path"])
    ]
    for column in [c.strip() for c in spec.split(",") if c.strip()]:
        try:
            bms = bitmaps_for_entries(table, local, column, num_bits=bits)
        except ValueError:
            continue
        for e in local:
            if e["path"] in bms:
                e.setdefault("bloom", {})[column] = bms[e["path"]]
    return entries


def build_bloom_index(
    table,
    column: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> dict:
    """Build (or rebuild) the per-file Bloom index for `column` over
    the CURRENT snapshot and commit it as a `replace` snapshot."""
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    _validate_column(table, column)
    table.refresh()
    entries = table.files()
    if not entries:
        return {"indexed_files": 0, "column": column}
    bms = bitmaps_for_entries(
        table, entries, column, num_bits=num_bits, num_hashes=num_hashes
    )
    new_entries = []
    indexed = 0
    for e in entries:
        e = dict(e)
        if e["path"] in bms or e.get("records", 0) == 0:
            bloom = dict(e.get("bloom") or {})
            bloom[column] = bms.get(
                e["path"],
                {
                    "bits": num_bits,
                    "hashes": num_hashes,
                    "type": _validate_column(table, column),
                    "b64": base64.b64encode(
                        struct.pack(f"<{num_bits // 64}q", *([0] * (num_bits // 64)))
                    ).decode("ascii"),
                },
            )
            e["bloom"] = bloom
            indexed += 1
        new_entries.append(e)
    table.append_snapshot(
        new_entries, "replace", extra_summary={"bloom-index": column}
    )
    return {"indexed_files": indexed, "column": column, "bits": num_bits}


def might_contain(entry: dict, column: str, value) -> bool:
    """Driver-side probe: False ONLY when the file provably lacks the
    value (no bitmap -> True, never a false prune)."""
    meta = (entry.get("bloom") or {}).get(column)
    if not meta:
        return True
    type_name = meta.get("type", "string")
    probe = _coerce_probe(value, type_name)
    if probe is None:
        return False  # fractional probe against an integral column
    words = struct.unpack(
        f"<{meta['bits'] // 64}q", base64.b64decode(meta["b64"])
    )
    for p in _py_positions(probe, meta["bits"], meta["hashes"]):
        if not (words[p // 64] >> (p % 64)) & 1:
            return False
    return True
