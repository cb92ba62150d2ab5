"""File inspection for no-copy registration: partition-key inference
from row-group stats, and streaming sortedness checking.

Parity:
- Partition inference: if, for every partition field, the transform of
  every row group's min equals the transform of its max, the whole
  file lies in ONE partition and can be registered without reading
  rows (/root/reference/ice/.../iceberg/Partitioning.java:189-271,
  stats decode 274-316).
- Sortedness: a single streaming pass over only the sort columns,
  batch by batch, honoring direction and null ordering
  (/root/reference/ice/.../iceberg/Sorting.java:125-211; null/
  direction semantics RecordComparator.java:20-54). Constant memory —
  row groups stream through Arrow batches.
"""

from __future__ import annotations

import datetime as _dt

from ice_spark.catalog.transforms import PartitionField, SortField


def _apply_transform(field: PartitionField, value):
    t = field.transform
    if t == "identity":
        return str(value)
    if isinstance(value, (int, float)) and t in {"year", "month", "day", "hour"}:
        raise ValueError(f"{t} transform needs a date/timestamp value, got {value!r}")
    if t == "year":
        return str(value.year)
    if t == "month":
        return f"{value.year:04d}-{value.month:02d}"
    if t == "day":
        return f"{value.year:04d}-{value.month:02d}-{value.day:02d}"
    if t == "hour":
        hour = value.hour if isinstance(value, _dt.datetime) else 0
        return f"{value.year:04d}-{value.month:02d}-{value.day:02d}-{hour:02d}"
    if t == "truncate":
        return str(value)[: field.param]
    if t == "bucket":
        # bucket uses Spark murmur3 — not derivable from stats bounds
        # (min/max under hash says nothing about the bucket); cannot
        # infer, mirroring the reference rejecting non-monotonic
        # transforms for inference.
        raise _NotInferable(f"bucket transform on {field.column}")
    raise ValueError(f"unknown transform {t}")


class _NotInferable(ValueError):
    pass


def infer_partition(path: str, spec: list[PartitionField]) -> dict[str, str]:
    """Partition values for a whole file, from footer min/max stats.
    Raises ValueError if the file spans multiple partitions or stats
    are missing — the caller must rewrite instead of no-copy."""
    if not spec:
        return {}
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    out: dict[str, str] = {}
    for field in spec:
        if field.column not in names:
            raise ValueError(f"partition source column {field.column!r} not in file")
        ci = names.index(field.column)
        vals = set()
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(ci).statistics
            if s is None or not s.has_min_max:
                raise ValueError(f"no stats for {field.column!r} in {path}")
            try:
                vals.add(_apply_transform(field, s.min))
                vals.add(_apply_transform(field, s.max))
            except _NotInferable as e:
                raise ValueError(f"cannot infer partition: {e}") from e
        if len(vals) != 1:
            raise ValueError(
                f"file spans multiple partitions for {field.field_name}: {sorted(vals)}"
            )
        out[field.field_name] = vals.pop()
    return out


def check_sorted(path: str, order: list[SortField]) -> bool:
    """True iff the file's rows are already sorted by `order`.
    Streams Arrow batches of only the sort columns — O(1) memory."""
    if not order:
        return True
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    cols = [s.column for s in order]
    prev = None
    for batch in pf.iter_batches(columns=cols, batch_size=8192):
        data = [batch.column(i).to_pylist() for i in range(len(cols))]
        for row_i in range(batch.num_rows):
            cur = tuple(data[ci][row_i] for ci in range(len(cols)))
            if prev is not None and _cmp_rows(prev, cur, order) > 0:
                return False
            prev = cur
    return True


def _cmp_rows(a: tuple, b: tuple, order: list[SortField]) -> int:
    """RecordComparator semantics: per-field direction + null order
    (default: asc→nulls first, desc→nulls last)."""
    for i, s in enumerate(order):
        av, bv = a[i], b[i]
        if av is None and bv is None:
            continue
        nulls_first = s.null_first if s.null_first is not None else not s.desc
        if av is None or bv is None:
            # null ordering is absolute (not flipped by desc)
            if av is None:
                c = -1 if nulls_first else 1
            else:
                c = 1 if nulls_first else -1
            return c
        if av < bv:
            c = -1
        elif av > bv:
            c = 1
        else:
            continue
        return -c if s.desc else c
    return 0
