"""Copy-on-write MERGE (upsert) keyed on one or more columns.

The reference has no row-level mutation surface at all — its only
delete is whole-file partition-predicate drop
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/Delete.java:41-126).
Upsert is table-stakes for a training-data pipeline (refresh a crawl
slice, re-score a document batch), so we add it the way Iceberg's
Spark MERGE INTO does copy-on-write:

1. **Plan with metadata only.** Compute the source's min/max per key
   column (one tiny agg), then prune data files whose footer-derived
   column bounds (recorded in the manifest at write time, like
   Iceberg metrics — Insert.java:654-655) cannot intersect. Disjoint
   bounds on ANY key column proves no row of that file can equal any
   source row, so the file survives untouched. At 100 TB with
   time-or-id-clustered data this rewrites a handful of files, not
   the table.
2. **Rewrite only affected files**: remaining = affected ⟕̸ source
   (anti-join on keys), new data = remaining ∪ source — one shuffle
   on the key, sized by the affected files, never by the table.
3. Commit kept + rewritten files as one `overwrite` snapshot through
   the same CAS loop every other commit uses.

Null semantics: join keys never match NULL (standard SQL equality),
so source rows with a NULL key are always inserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ice_spark.catalog.table import Table
from ice_spark.ingest.insert import _write_df


def _bounds_disjoint(metric: dict | None, lo, hi) -> bool:
    """True iff the file's [min,max] for a key column provably cannot
    intersect the source's [lo,hi]. Conservative: any missing or
    type-mismatched bound means "might intersect"."""
    if not metric or lo is None or hi is None:
        return False
    fmin, fmax = metric.get("min"), metric.get("max")
    if fmin is None or fmax is None:
        return False
    numeric = (int, float)
    if isinstance(fmin, bool) or isinstance(lo, bool):
        return False
    if isinstance(fmin, numeric) and isinstance(lo, numeric):
        return fmax < lo or fmin > hi
    if isinstance(fmin, str) and isinstance(lo, str):
        return fmax < lo or fmin > hi
    return False


def merge_upsert(
    table: Table,
    source: DataFrame,
    key_cols: list[str],
    compression: str = "gzip",
) -> dict:
    """Upsert `source` into `table` on `key_cols`; returns a summary
    with file-level planning stats and row counts."""
    table.refresh()
    for k in key_cols:
        if k not in [f.name for f in table.schema.fields]:
            raise ValueError(f"key column {k!r} not in table schema")

    aligned = source.select(
        *[
            (F.col(fl.name) if fl.name in source.columns else F.lit(None))
            .cast(fl.dataType)
            .alias(fl.name)
            for fl in table.schema.fields
        ]
    )
    # The source may itself be an expensive query; persist it so the
    # whole merge reads it once (planning agg + anti-join + union all
    # hit the cache), and fold count + key bounds into a single action.
    aligned = aligned.persist()
    try:
        bounds_row = aligned.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.min(k).alias(f"lo_{k}") for k in key_cols],
            *[F.max(k).alias(f"hi_{k}") for k in key_cols],
        ).collect()[0]
        src_count = bounds_row["__n"]
        if src_count == 0:
            return {"source_rows": 0, "files_rewritten": 0, "files_kept": len(table.files())}
        return _merge_planned(table, aligned, key_cols, compression, src_count, bounds_row)
    finally:
        aligned.unpersist()


def _merge_planned(
    table: Table,
    aligned: DataFrame,
    key_cols: list[str],
    compression: str,
    src_count: int,
    bounds_row,
) -> dict:

    kept: list[dict] = []
    affected: list[dict] = []
    for e in table.files():
        metrics = e.get("column_metrics") or {}
        prunable = any(
            _bounds_disjoint(metrics.get(k), bounds_row[f"lo_{k}"], bounds_row[f"hi_{k}"])
            for k in key_cols
        )
        (kept if prunable else affected).append(e)

    if affected:
        existing = table._read_entries(affected)
        remaining = existing.join(aligned.select(*key_cols), on=key_cols, how="left_anti")
        new_data = remaining.unionByName(aligned)
    else:
        new_data = aligned

    entries = _write_df(table, new_data, compression, table.current_version())
    # Derive replaced-row count from the write itself instead of a
    # separate remaining.count() action: written = remaining + source.
    written_rows = sum(e.get("records", 0) for e in entries)
    updated = (
        sum(e.get("records", 0) for e in affected) - (written_rows - src_count)
        if affected
        else 0
    )
    sid = table.append_snapshot(
        kept + entries,
        "overwrite",
        extra_summary={
            "merge-keys": key_cols,
            "rewritten-data-files": len(affected),
            "kept-data-files": len(kept),
        },
    )
    return {
        "snapshot_id": sid,
        "source_rows": src_count,
        "rows_replaced": updated,
        "files_rewritten": len(affected),
        "files_kept": len(kept),
        "files_written": len(entries),
    }
