"""Partition-predicate, file-level delete.

Parity with the reference's `delete` verb
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/Delete.java:41-126):

- filters are a JSON list; within one filter, OR across `values`;
  AND across filters (Delete.java:65-85)
- ops: equals | less_than | greater_than | less_than_or_equal |
  greater_than_or_equal (op map Delete.java:128-136)
- predicates reference PARTITION FIELD names; whole files whose
  partition value matches are dropped (manifest pruning,
  Delete.java:87-97) via a replace snapshot (RewriteFiles analog,
  Delete.java:109-114)
- --dry-run defaults TRUE and lists candidates (Delete.java:116-121)
- --purge physically deletes the dropped files

This is deliberately file-level (the reference semantics), not
row-level DELETE — partition-aligned predicates make the two
coincide; see SURVEY.md §7 risk register.
"""

from __future__ import annotations

import os
import operator

from pyspark.sql import functions as F

from ice_spark.catalog.table import Table

_OPS = {
    "equals": operator.eq,
    "less_than": operator.lt,
    "greater_than": operator.gt,
    "less_than_or_equal": operator.le,
    "greater_than_or_equal": operator.ge,
}


def _coerce(file_value: str, filter_value):
    """Partition values are stored as strings in manifests; compare in
    the filter value's type when possible."""
    if isinstance(filter_value, bool):
        return file_value.lower() == "true", filter_value
    if isinstance(filter_value, int):
        try:
            return int(file_value), filter_value
        except ValueError:
            return file_value, str(filter_value)
    if isinstance(filter_value, float):
        try:
            return float(file_value), filter_value
        except ValueError:
            return file_value, str(filter_value)
    return file_value, str(filter_value)


def _matches(partition: dict, filters: list[dict]) -> bool:
    for flt in filters:
        name, op_name = flt["name"], flt.get("op", "equals")
        if op_name not in _OPS:
            raise ValueError(f"unknown op: {op_name}")
        op = _OPS[op_name]
        if name not in partition:
            return False  # predicate must reference a partition field
        fv = partition[name]
        values = flt.get("values", [])
        if not any(op(*_coerce(fv, v)) for v in values):
            return False
    return True


def delete(
    table: Table,
    filters: list[dict],
    dry_run: bool = True,
    purge: bool = False,
) -> dict:
    """Delete whole files whose partition matches all filters.

    filters: [{"name": partition_field, "op": "equals", "values": [..]}]
    Returns {"candidates": [paths], "deleted": bool, "purged": n}.
    """
    if not filters:
        raise ValueError("refusing to delete with no filters")
    table.refresh()
    part_names = {p.field_name for p in table.partition_spec}
    for flt in filters:
        if flt["name"] not in part_names:
            raise ValueError(
                f"filter references non-partition field {flt['name']!r}; "
                f"partition fields: {sorted(part_names)}"
            )
    entries = table.files()
    drop = [e for e in entries if _matches(e.get("partition") or {}, filters)]
    keep = [e for e in entries if e not in drop]
    result = {
        "candidates": [e["path"] for e in drop],
        "deleted": False,
        "purged": 0,
    }
    if dry_run or not drop:
        return result
    table.append_snapshot(keep, operation="delete", extra_summary={"deleted-data-files": len(drop)})
    result["deleted"] = True
    if purge:
        for e in drop:
            p = os.path.join(table.location, e["path"])
            if os.path.exists(p) and not e.get("external"):
                os.remove(p)
                result["purged"] += 1
    return result


def delete_rows(
    table: Table,
    filters: list[dict],
    compression: str = "gzip",
    dry_run: bool = False,
) -> dict:
    """Row-level copy-on-write DELETE WHERE — beyond the reference,
    whose only delete is whole-file partition drop (Delete.java:41-126).
    Same planning discipline as MERGE (catalog/merge.py): manifest
    bounds (+ Bloom index when present) prune files the predicate
    provably cannot touch; only files that MIGHT contain matching rows
    are read and rewritten without them. SQL DELETE semantics: a row
    is removed iff the predicate is TRUE — NULL keeps the row.

    filters use the delete dialect ({name, op, values}) on ANY column,
    not just partition fields."""
    from ice_spark.catalog.table import filters_to_column
    from ice_spark.ingest.insert import _write_df

    table.refresh()
    names = {f.name for f in table.schema.fields}
    for flt in filters:
        if flt["name"] not in names:
            raise ValueError(f"unknown column {flt['name']!r}")
    if not filters:
        raise ValueError("refusing to delete with no filters")

    kept, affected = [], []
    for e in table.files():
        might = all(Table._file_might_match(e, flt) for flt in filters)
        (affected if might else kept).append(e)
    plan = {
        "files_rewritten": len(affected),
        "files_kept": len(kept),
        "dry_run": dry_run,
    }
    if dry_run or not affected:
        plan["rows_deleted"] = 0
        return plan

    existing = table._read_entries(affected)
    pred = filters_to_column(filters)
    remaining = existing.where(~F.coalesce(pred, F.lit(False)))
    entries = _write_df(table, remaining, compression, table.current_version())
    written = sum(e.get("records", 0) for e in entries)
    affected_rows = sum(e.get("records", 0) for e in affected)
    table.append_snapshot(
        kept + entries,
        "overwrite",
        extra_summary={"row-delete-filters": filters, "rows-deleted": affected_rows - written},
    )
    plan["rows_deleted"] = affected_rows - written
    return plan
