"""Incrementally-maintained materialized views over catalog tables.

At 100 TB the expensive query is usually the same aggregation run
again and again over an append-mostly table. A materialized view
stores the aggregate once; refresh then costs O(new data), not O(all
data): the catalog's incremental append scan (Table.read_incremental)
yields exactly the rows added since the view's recorded base
snapshot, those rows are aggregated alone, and the delta is folded
into the stored state with each aggregate's MERGE function
(sum+=sum, count+=count, min=min(min), max=max(max) — all
decomposable, the same partial/final split Spark itself uses for
map-side combine).

The view is an ordinary catalog table — time travel, maintenance,
export all work on it — whose properties carry the definition:
  mv-base          base table identifier
  mv-group-by      JSON list of group columns
  mv-aggs          JSON list of {op, col, alias}
  mv-base-snapshot base snapshot folded in so far

Correctness boundary, enforced not assumed: read_incremental RAISES
on a non-append-only range (delete/overwrite snapshots), and refresh
answers that with a full recompute instead of a wrong delta. A
compaction `replace` snapshot is correctly treated as no logical
change. Decomposable aggregates only: avg is derivable by storing
sum + count; true holistic aggregates (median, distinct count) have
no delta form and are rejected at create time.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ice_spark.ingest.insert import _write_df

# op -> (delta aggregate over raw rows, merge aggregate over partials)
_OPS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _delta_agg(df: DataFrame, group_by: list[str], aggs: list[dict]) -> DataFrame:
    cols = [
        _OPS[a["op"]][0](a["col"]).alias(a["alias"]) for a in aggs
    ]
    return df.groupBy(*group_by).agg(*cols)


def _merge(old: DataFrame, delta: DataFrame, group_by: list[str], aggs: list[dict]) -> DataFrame:
    cols = [
        _OPS[a["op"]][1](a["alias"]).alias(a["alias"]) for a in aggs
    ]
    return old.unionByName(delta).groupBy(*group_by).agg(*cols)


def _validate(aggs: list[dict]) -> None:
    for a in aggs:
        if a["op"] not in _OPS:
            raise ValueError(
                f"aggregate {a['op']!r} is not incrementally mergeable; "
                f"supported: {sorted(_OPS)} (avg = store sum + count)"
            )


def create_matview(
    catalog,
    mv_ident: str,
    base_ident: str,
    group_by: list[str],
    aggs: list[dict],
    compression: str = "zstd",
):
    """Materialize groupBy(group_by).agg(aggs) over the base table's
    CURRENT snapshot as a new catalog table. aggs: [{op, col, alias}]."""
    _validate(aggs)
    base = catalog.load_table(base_ident)
    state = _delta_agg(base.read(), group_by, aggs)
    mv = catalog.create_table(
        mv_ident,
        schema=state.schema,
        properties={
            "mv-base": base_ident,
            "mv-group-by": json.dumps(group_by),
            "mv-aggs": json.dumps(aggs),
            "mv-base-snapshot": str(base.meta.get("current_snapshot_id")),
        },
    )
    entries = _write_df(mv, state, compression, mv.current_version())
    mv.append_snapshot(entries, "append", extra_summary={"mv-refresh": "initial"})
    return mv.refresh()


def refresh_matview(catalog, mv_ident: str, compression: str = "zstd") -> dict:
    """Fold base-table changes since the last refresh into the view.
    Append-only delta when possible; full recompute when the base
    range contains deletes/overwrites. Returns a summary dict."""
    mv = catalog.load_table(mv_ident)
    props = mv.properties
    base = catalog.load_table(props["mv-base"])
    group_by = json.loads(props["mv-group-by"])
    aggs = json.loads(props["mv-aggs"])
    last = props.get("mv-base-snapshot")
    last_sid = None if last in (None, "None") else int(last)
    cur_sid = base.meta.get("current_snapshot_id")
    if cur_sid == last_sid:
        return {"refreshed": mv_ident, "mode": "noop", "base_snapshot": cur_sid}

    mode = "incremental"
    try:
        delta = base.read_incremental(last_sid, cur_sid)
        state = _merge(mv.read(), _delta_agg(delta, group_by, aggs), group_by, aggs)
    except ValueError:
        mode = "full"
        state = _delta_agg(base.read(), group_by, aggs)

    entries = _write_df(mv, state, compression, mv.current_version())
    # state + checkpoint in ONE commit: a crash between two commits
    # would otherwise leave the folded data with a stale
    # mv-base-snapshot, double-folding the same delta on the next
    # refresh. Refresh is single-writer (like maintenance jobs — use
    # the scheduler); concurrent refreshes are not coordinated.
    mv.append_snapshot(
        entries,
        "overwrite",
        extra_summary={"mv-refresh": mode},
        set_properties={"mv-base-snapshot": str(cur_sid)},
    )
    return {"refreshed": mv_ident, "mode": mode, "base_snapshot": cur_sid}
