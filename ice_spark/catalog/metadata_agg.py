"""Metadata-only aggregates: answer COUNT(*) / MIN / MAX from the
manifest plane without opening a single data file.

The 100-TB motivation: `SELECT count(*) ...`, `SELECT max(ts) ...`
freshness probes and partition row counts are the most frequent
queries against big tables, and the manifests already hold the
answer — per-file record counts and column bounds captured from
parquet footers at ingest (the same metrics the reference builds via
ParquetUtil.footerMetrics, Insert.java:654-655). Iceberg engines do
exactly this ("metadata-only" scans); here it is an explicit,
honesty-first API:

- COUNT(*) = sum of entry record counts — always exact.
- MIN/MAX(col) = fold of per-file bounds — exact only when EVERY
  selected file proves its contribution: bounds present, or the file
  demonstrably all-null for the column (nulls == values, which SQL
  MIN/MAX ignore). Any file that can't prove -> the whole request
  returns None rather than a plausible-but-unprovable number; the
  caller falls back to a real scan.
- Filters may reference identity-partition fields only: a partition
  value decides whole-file membership exactly. Column-bound filters
  can only PRUNE (might-match), never prove full containment, so
  they are rejected here (read_filtered covers that case).

Bounds are stored stringified (JSON manifests); comparisons coerce
through the table schema so numeric bounds compare numerically while
date/timestamp ISO strings compare lexicographically (order-safe).
"""

from __future__ import annotations

from typing import Optional

from ice_spark.catalog.delete import _matches


_NUMERIC = {"integer", "long", "short", "byte", "float", "double", "decimal"}


def _coerce_bound(value, type_name: str):
    if value is None:
        return None
    if type_name in ("integer", "long", "short", "byte"):
        return int(value)
    if type_name.startswith("decimal"):
        # exact: a float round-trip loses precision past 2^53, which
        # would break this module's provably-exact contract
        import decimal

        return decimal.Decimal(str(value))
    if type_name in ("float", "double"):
        return float(value)
    return str(value)


def aggregate_from_metadata(
    table,
    specs: list[dict],
    filters: Optional[list[dict]] = None,
    snapshot_id: Optional[int] = None,
) -> Optional[dict]:
    """specs: [{"op": "count"} | {"op": "min"|"max", "col": name,
    "alias": out_name?}]. Returns {alias: value} when every spec is
    provably exact from manifests alone, else None."""
    part_names = {p.field_name for p in table.partition_spec}
    for flt in filters or []:
        if flt["name"] not in part_names:
            return None  # only identity-partition filters are exact

    type_of = {f.name: f.dataType.typeName() for f in table.schema.fields}
    entries = [
        e
        for e in table.files(snapshot_id)
        if not filters or _matches(e.get("partition") or {}, filters)
    ]

    out: dict = {}
    for spec in specs:
        op = spec["op"]
        if op == "count":
            out[spec.get("alias", "count")] = sum(
                e.get("records", 0) for e in entries
            )
            continue
        if op not in ("min", "max"):
            raise ValueError(f"metadata aggregate supports count/min/max, not {op!r}")
        col = spec["col"]
        if col not in type_of:
            raise ValueError(f"unknown column {col!r}")
        alias = spec.get("alias", f"{op}_{col}")
        best = None
        for e in entries:
            if e.get("records", 0) == 0:
                continue
            m = (e.get("column_metrics") or {}).get(col)
            if m and m.get("nulls") is not None and m.get("values") is not None \
                    and m["nulls"] == m["values"]:
                continue  # provably all-null: contributes nothing to MIN/MAX
            if not m or m.get(op) is None:
                return None  # unprovable file — refuse to guess
            v = _coerce_bound(m[op], type_of[col])
            if best is None or (v < best if op == "min" else v > best):
                best = v
        out[alias] = best
    return out
