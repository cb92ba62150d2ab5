"""Table maintenance jobs.

Parity with the reference's four server-side jobs
(/root/reference/ice-rest-catalog/src/main/java/com/altinity/ice/rest/catalog/internal/maintenance/),
with the same defaults (BASELINE.md):

- data compaction  (DataCompaction.java:67-268): files smaller than
  target (512 MB default, 64 MB min) and older than min age (24 h),
  greedily binned per partition until target size or >= min_input_files
  (5); merged with Spark (a sorted table re-sorts — the reference's
  k-way PriorityQueue merge is Spark's sort, DataCompaction.java:189-224);
  committed as one replace snapshot (245-262).
- manifest compaction (ManifestCompaction.java:15-27): rewrite the
  current manifest (drops tombstoned manifests of older snapshots).
- snapshot cleanup (SnapshotCleanup.java:18-45): expire snapshots
  older than max age (120 h) keeping at least min (1).
- orphan cleanup (OrphanCleanup.java:49-201): files under the table
  location minus the transitive closure of known files, with
  retention age (3 days) and path whitelist.

Every job supports dry_run (plan only), like the CLI's
perform-maintenance (ice-rest-catalog/.../Main.java:103-208).
"""

from __future__ import annotations

import fnmatch
import os
import time
import uuid

from ice_spark.catalog.table import Table

MB = 1024 * 1024
DEFAULT_TARGET_FILE_SIZE_MB = 512
MIN_TARGET_FILE_SIZE_MB = 64
DEFAULT_MIN_INPUT_FILES = 5
DEFAULT_CANDIDATE_MIN_AGE_HOURS = 24.0
DEFAULT_MAX_SNAPSHOT_AGE_HOURS = 120.0
DEFAULT_MIN_SNAPSHOTS_TO_KEEP = 1
DEFAULT_ORPHAN_RETENTION_DAYS = 3.0
DEFAULT_ORPHAN_WHITELIST = ["*/metadata/*", "*/data/*"]


def _merged_bloom(group: list[dict]) -> dict:
    """Union of the inputs' per-file Bloom bitmaps (bitwise OR) —
    valid because OR preserves every set bit, so the merged filter has
    no false negatives for any input's values. Only columns indexed on
    EVERY input with identical parameters carry over; anything else is
    dropped (absent bloom = never pruned)."""
    import base64
    import struct

    if not group:
        return {}
    common = set((group[0].get("bloom") or {}).keys())
    for e in group[1:]:
        common &= set((e.get("bloom") or {}).keys())
    out: dict = {}
    for c in sorted(common):
        metas = [e["bloom"][c] for e in group]
        key0 = (metas[0]["bits"], metas[0]["hashes"], metas[0].get("type"))
        if any((m["bits"], m["hashes"], m.get("type")) != key0 for m in metas):
            continue
        n = key0[0] // 64
        acc = [0] * n
        for m in metas:
            words = struct.unpack(f"<{n}q", base64.b64decode(m["b64"]))
            acc = [a | w for a, w in zip(acc, words)]
        out[c] = {
            "bits": key0[0],
            "hashes": key0[1],
            "type": key0[2],
            "b64": base64.b64encode(struct.pack(f"<{n}q", *acc)).decode("ascii"),
        }
    return out


def compact_data(
    table: Table,
    target_file_size_mb: int = DEFAULT_TARGET_FILE_SIZE_MB,
    min_input_files: int = DEFAULT_MIN_INPUT_FILES,
    candidate_min_age_hours: float = DEFAULT_CANDIDATE_MIN_AGE_HOURS,
    dry_run: bool = False,
) -> dict:
    """Greedy per-partition binpack + Spark rewrite."""
    target_file_size_mb = max(target_file_size_mb, MIN_TARGET_FILE_SIZE_MB)
    target = target_file_size_mb * MB
    table.refresh()
    now = time.time()
    entries = table.files()

    # group candidates per partition (DataCompaction.java:80-123)
    by_part: dict[tuple, list[dict]] = {}
    for e in entries:
        p = os.path.join(table.location, e["path"])
        age_ok = True
        try:
            age_ok = (now - os.path.getmtime(p)) >= candidate_min_age_hours * 3600
        except OSError:
            age_ok = False
        if e.get("size_bytes", 0) < target and age_ok and not e.get("external"):
            by_part.setdefault(tuple(sorted((e.get("partition") or {}).items())), []).append(e)

    groups: list[list[dict]] = []
    for _part, cands in by_part.items():
        bin_: list[dict] = []
        size = 0
        for e in sorted(cands, key=lambda x: x.get("size_bytes", 0)):
            bin_.append(e)
            size += e.get("size_bytes", 0)
            if size >= target:
                groups.append(bin_)
                bin_, size = [], 0
        if len(bin_) >= min_input_files:  # leftovers need >= min files
            groups.append(bin_)

    plan = {
        "groups": [[e["path"] for e in g] for g in groups],
        "rewritten": 0,
        "dry_run": dry_run,
    }
    if dry_run or not groups:
        return plan

    spark = table.spark
    compact_set = {e["path"] for g in groups for e in g}
    new_entries = [e for e in entries if e["path"] not in compact_set]
    sorder = table.sort_order
    for g in groups:
        paths = [os.path.join(table.location, e["path"]) for e in g]
        ver = min(e.get("schema_version", 1) for e in g)
        df = spark.read.parquet(*paths).coalesce(1)
        if sorder:
            # sorted table ⇒ merged output re-sorted (the reference's
            # k-way merge; Spark's sort does the same job)
            df = df.sortWithinPartitions(*[s.expr() for s in sorder])
        part = dict(sorted((g[0].get("partition") or {}).items()))
        part_dirs = [f"{k}={v}" for k, v in part.items()]
        dst_dir = os.path.join(table.data_dir, *part_dirs)
        os.makedirs(dst_dir, exist_ok=True)
        tmp_out = os.path.join(table.location, f"_compact_{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(tmp_out)
        bloom = _merged_bloom(g)
        for root, _d, fnames in os.walk(tmp_out):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    dst = os.path.join(dst_dir, f"{int(now*1000)}-{uuid.uuid4().hex[:16]}.parquet")
                    os.replace(os.path.join(root, fn), dst)
                    import pyarrow.parquet as pq

                    from ice_spark.ingest.insert import _column_metrics_from_metadata

                    pf = pq.ParquetFile(dst)
                    md = pf.metadata
                    new_entries.append(
                        {
                            "path": os.path.relpath(dst, table.location),
                            "partition": part,
                            "records": md.num_rows,
                            "size_bytes": os.path.getsize(dst),
                            "schema_version": ver,
                            # bounds survive compaction (pruning parity
                            # with freshly-ingested files)...
                            "column_metrics": _column_metrics_from_metadata(md),
                            # ...and so do Bloom indexes, by bitmap OR
                            **({"bloom": bloom} if bloom else {}),
                        }
                    )
        import shutil

        shutil.rmtree(tmp_out, ignore_errors=True)
    table.append_snapshot(
        new_entries, operation="replace", extra_summary={"compacted-groups": len(groups)}
    )
    plan["rewritten"] = len(groups)
    return plan


def expire_snapshots(
    table: Table,
    max_age_hours: float = DEFAULT_MAX_SNAPSHOT_AGE_HOURS,
    min_to_keep: int = DEFAULT_MIN_SNAPSHOTS_TO_KEEP,
    dry_run: bool = False,
) -> dict:
    """SnapshotCleanup parity: expireOlderThan(now - maxAge),
    retainLast(min_to_keep); data files no longer referenced by any
    retained snapshot are deleted."""
    table.refresh()
    cutoff_ms = int((time.time() - max_age_hours * 3600) * 1000)
    snaps = sorted(table.snapshots(), key=lambda s: s["timestamp_ms"])
    current_id = table.meta.get("current_snapshot_id")
    # tags AND staged WAP branches pin their snapshots (a branch
    # awaiting audit must survive cleanup; abort_branch un-pins)
    ref_ids = set(table.refs().values())
    keep, expire = [], []
    for i, s in enumerate(snaps):
        remaining = len(snaps) - i
        if (
            s["timestamp_ms"] < cutoff_ms
            and remaining > min_to_keep
            and s["snapshot_id"] != current_id
            and s["snapshot_id"] not in ref_ids
        ):
            expire.append(s)
        else:
            keep.append(s)
    plan = {"expired": [s["snapshot_id"] for s in expire], "deleted_files": 0, "dry_run": dry_run}
    if dry_run or not expire:
        return plan

    # Iceberg's expire order: commit the snapshot-list removal FIRST,
    # then compute reachability from the COMMITTED metadata and delete
    # only what nothing live references. Deleting before the commit
    # can corrupt the table if the CAS fails after retries or a
    # concurrent rollback re-references an expired snapshot's files.
    expired_ids = {s["snapshot_id"] for s in expire}
    dropped: dict[str, list] = {"snaps": []}

    def mutate(meta: dict) -> dict:
        # Re-derive eligibility against the fresh metadata each retry:
        # a concurrent rollback may have made a planned expiree current
        # again — keep it.
        cur = meta.get("current_snapshot_id")
        drop = [
            s
            for s in meta["snapshots"]
            if s["snapshot_id"] in expired_ids and s["snapshot_id"] != cur
        ]
        dropped["snaps"] = drop
        drop_ids = {s["snapshot_id"] for s in drop}
        meta["snapshots"] = [
            s for s in meta["snapshots"] if s["snapshot_id"] not in drop_ids
        ]
        return meta

    table.commit(mutate)
    table.refresh()
    plan["expired"] = [s["snapshot_id"] for s in dropped["snaps"]]

    # Reachability from the committed state (includes snapshots added
    # by concurrent committers between planning and commit).
    kept_paths: set[str] = set()
    kept_meta: set[str] = set()
    for s in table.snapshots():
        kept_paths.update(e["path"] for e in table.snapshot_files(s))
        kept_meta.update(table.snapshot_meta_files(s))
    removed = 0
    for s in dropped["snaps"]:
        for e in table.snapshot_files(s):
            p = e["path"]
            if p not in kept_paths and not e.get("external"):
                full = os.path.join(table.location, p)
                if table.io.exists(full):
                    table.io.delete(full)
                    removed += 1

    # Metadata files of expired snapshots, minus shards still
    # referenced by a kept snapshot (shards are shared by reference
    # across snapshots — refcount, don't blindly delete).
    expired_meta: set[str] = set()
    for s in dropped["snaps"]:
        expired_meta.update(table.snapshot_meta_files(s))
    expired_meta -= kept_meta
    for mp in expired_meta:
        if table.io.exists(mp):
            table.io.delete(mp)
    plan["deleted_files"] = removed
    return plan


DEFAULT_MANIFEST_GC_MIN_AGE_HOURS = 1.0


def compact_manifests(
    table: Table,
    dry_run: bool = False,
    gc_min_age_hours: float = DEFAULT_MANIFEST_GC_MIN_AGE_HOURS,
) -> dict:
    """ManifestCompaction parity (ManifestCompaction.java:15-27):
    merge the current snapshot's small manifest shards into full ones
    (Table.rewrite_manifests), then garbage-collect manifest-list and
    shard files no longer referenced by any live snapshot (losers of
    commit races and rewritten-away shards).

    GC age guard: a concurrent committer writes its shard and
    manifest-list files BEFORE its metadata CAS, so a freshly written
    unreferenced file may be a commit in flight, not garbage. Only
    files older than `gc_min_age_hours` are deleted — the same
    defense remove_orphans applies with its retention window."""
    table.refresh()
    live: set[str] = set()
    for s in table.snapshots():
        for p in table.snapshot_meta_files(s):
            live.add(os.path.basename(p))
    cutoff = time.time() - gc_min_age_hours * 3600
    orphans = []
    for f in table.io.list_dir(table.metadata_dir):
        if not (f.startswith("manifest-") or f.startswith("ml-")) or f in live:
            continue
        try:
            if table.io.mtime(os.path.join(table.metadata_dir, f)) > cutoff:
                continue  # possibly an in-flight commit: too young to judge
        except (OSError, FileNotFoundError):
            continue
        orphans.append(f)
    result = {"removed_manifests": orphans, "dry_run": dry_run, "rewrite": None}
    if dry_run:
        return result
    for f in orphans:
        table.io.delete(os.path.join(table.metadata_dir, f))
    result["rewrite"] = table.rewrite_manifests()
    return result


def remove_orphans(
    table: Table,
    retention_days: float = DEFAULT_ORPHAN_RETENTION_DAYS,
    whitelist: list[str] | None = None,
    dry_run: bool = False,
) -> dict:
    """OrphanCleanup parity: list files under the table location,
    subtract the transitive closure of known files (all snapshots'
    data files + metadata + manifests), apply retention age and
    whitelist, delete the rest."""
    table.refresh()
    whitelist = whitelist or DEFAULT_ORPHAN_WHITELIST
    known: set[str] = set()
    for s in table.snapshots():
        known.update(table.snapshot_meta_files(s))
        for e in table.snapshot_files(s):
            known.add(
                e["path"]
                if os.path.isabs(e["path"])
                else os.path.join(table.location, e["path"])
            )
    for f in table.io.list_dir(table.metadata_dir):
        if f.endswith(".metadata.json") or f == "version-hint.text":
            known.add(os.path.join(table.metadata_dir, f))

    cutoff = time.time() - retention_days * 86400
    orphans = []
    for full in table.io.walk_files(table.location):
        if full in known:
            continue
        if not any(fnmatch.fnmatch(full, pat) for pat in whitelist):
            continue
        try:
            if table.io.mtime(full) > cutoff:
                continue
        except OSError:
            continue
        orphans.append(full)
    if not dry_run:
        for f in orphans:
            table.io.delete(f)
    return {"orphans": orphans, "deleted": 0 if dry_run else len(orphans), "dry_run": dry_run}


def perform_maintenance(table: Table, dry_run: bool = True, **kwargs) -> dict:
    """Run all four jobs (MaintenanceRunner.java:28-54 order).

    Prometheus counters mirror the reference's maintenance metric
    names (ice-rest-catalog/.../metrics/MaintenanceMetrics.java,
    examples/grafana/METRICS.md)."""
    import time as _time

    from ice_spark.metrics import default_registry

    reg = default_registry()
    tl = {"table": table.identifier or table.location}
    reg.set_gauge("ice_maintenance_in_progress", None, 1, help_="1 while running")
    t0 = _time.monotonic()
    try:
        out = {
            "data_compaction": compact_data(table, dry_run=dry_run),
            "manifest_compaction": compact_manifests(table, dry_run=dry_run),
            "snapshot_cleanup": expire_snapshots(table, dry_run=dry_run),
            "orphan_cleanup": remove_orphans(table, dry_run=dry_run),
        }
    except Exception:
        reg.inc(
            "ice_maintenance_runs_total", {"status": "failure"}, help_="maintenance runs"
        )
        raise
    finally:
        reg.set_gauge("ice_maintenance_in_progress", None, 0, help_="1 while running")
        reg.observe(
            "ice_maintenance_duration_seconds",
            _time.monotonic() - t0,
            None,
            help_="maintenance run duration",
        )
    reg.inc("ice_maintenance_runs_total", {"status": "success"}, help_="maintenance runs")
    reg.set_gauge(
        "ice_maintenance_last_run_timestamp", None, _time.time(),
        help_="unix time of last run",
    )
    oc = out["orphan_cleanup"]
    reg.inc(
        "ice_maintenance_orphan_files_found_total", tl, len(oc.get("orphans", [])),
        help_="orphan files discovered",
    )
    reg.inc(
        "ice_maintenance_orphan_files_deleted_total", tl, oc.get("deleted", 0),
        help_="orphan files deleted",
    )
    dc = out["data_compaction"]
    reg.inc(
        "ice_maintenance_compaction_files_merged_total",
        tl,
        sum(len(g) for g in dc.get("groups", [])) if dc.get("rewritten") else 0,
        help_="input files merged during compaction",
    )
    reg.inc(
        "ice_maintenance_compaction_output_files_total",
        tl,
        dc.get("rewritten", 0),
        help_="output files produced by compaction",
    )
    return out


# --- Z-order clustering rewrite ---------------------------------------------
# Beyond the reference's binpack/sort compaction: rewrite data files
# along a Morton (Z-order) curve over several columns so every file
# gets tight min/max bounds on ALL of them. The manifests record
# per-file column bounds (ingest/insert._footer_column_metrics);
# delete planning and merge_upsert prune on those bounds, so
# clustering directly multiplies how many files those operations can
# skip. At 100 TB this is the difference between "every merge touches
# every file" and "a merge touches one curve segment".


def _zvalue_sql(scaled_cols: list[str], bits: int) -> str:
    """Interleave `bits` bits of each pre-scaled BIGINT column.
    One column needs no interleaving — the scaled value IS the curve
    (plain range clustering), skipping the per-row bit fold."""
    if len(scaled_cols) == 1:
        return scaled_cols[0]
    n = len(scaled_cols)
    terms = " | ".join(
        f"shiftleft(shiftright({c}, i) & 1, i * {n} + {j})"
        for j, c in enumerate(scaled_cols)
    )
    return (
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc | {terms})"
    )


def _zorder_rewrite_group(
    table: Table,
    entries: list[dict],
    columns: list[str],
    bits: int,
    n_files: int,
    partition: dict,
) -> list[dict]:
    """Rewrite one file group (a partition, or the whole unpartitioned
    table) z-ordered on `columns`; returns new manifest entries.
    Normalization min/max are computed within the group so bounds stay
    tight per partition."""
    from pyspark.sql import functions as F

    from ice_spark.ingest.insert import _footer_column_metrics, _footer_stats

    df = table._read_entries(entries)
    for c in columns:
        if c not in df.columns:
            raise ValueError(f"cluster column {c!r} not in table schema")
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in columns],
        *[F.max(c).alias(f"hi_{c}") for c in columns],
    ).collect()[0]
    scaled = []
    top = (1 << bits) - 1
    for c in columns:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        if lo is None or hi is None or hi == lo:
            scaled.append("CAST(0 AS BIGINT)")
        else:
            scaled.append(
                f"CAST((CAST(`{c}` AS DOUBLE) - {float(lo)!r}) / "
                f"({float(hi)!r} - {float(lo)!r}) * {top} AS BIGINT)"
            )
    z = df.withColumn("__z", F.expr(_zvalue_sql(scaled, bits)))
    out = (
        z.repartitionByRange(int(n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )

    import shutil
    import tempfile

    ver = table.current_version()
    part_dirs = [f"{k}={v}" for k, v in sorted(partition.items())]
    dst_root = os.path.join(table.data_dir, *part_dirs)
    os.makedirs(dst_root, exist_ok=True)
    tmpdir = tempfile.mkdtemp(prefix="ice_spark_zorder_", dir=table.location)
    try:
        out.write.mode("overwrite").parquet(tmpdir)
        new_entries: list[dict] = []
        now_ms = int(time.time() * 1000)
        for root, _d, fnames in os.walk(tmpdir):
            for fn in fnames:
                if not fn.endswith(".parquet"):
                    continue
                dst = os.path.join(
                    dst_root, f"{now_ms}-{uuid.uuid4().hex[:16]}.parquet"
                )
                os.replace(os.path.join(root, fn), dst)
                rows, size = _footer_stats(dst)
                new_entries.append(
                    {
                        "path": os.path.relpath(dst, table.location),
                        "partition": dict(partition),
                        "records": rows,
                        "size_bytes": size,
                        "schema_version": ver,
                        "column_metrics": _footer_column_metrics(dst),
                    }
                )
        return new_entries
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def cluster_files(
    table: Table,
    columns: list[str],
    target_file_size_mb: int = DEFAULT_TARGET_FILE_SIZE_MB,
    bits: int = 16,
    n_output_files: int | None = None,
    dry_run: bool = False,
) -> dict:
    """Rewrite the table's data along a Z-order curve over `columns`.

    Unpartitioned tables rewrite as one range-partitioned job;
    partitioned tables rewrite per partition (like Iceberg's
    rewrite_data_files file groups), keeping single-file partitions
    untouched. Commits ONE `replace` snapshot (logical content
    unchanged — incremental readers skip it)."""
    table.refresh()
    entries = table.files()

    def files_for(size: int) -> int:
        if n_output_files is not None:
            return max(1, n_output_files)
        return max(
            1, -(-size // (max(target_file_size_mb, MIN_TARGET_FILE_SIZE_MB) * MB))
        )

    groups: list[tuple[dict, list[dict]]] = []
    kept: list[dict] = []
    if table.partition_spec:
        by_part: dict[tuple, list[dict]] = {}
        for e in entries:
            by_part.setdefault(
                tuple(sorted((e.get("partition") or {}).items())), []
            ).append(e)
        for key, group in sorted(by_part.items()):
            if len(group) >= 2:
                groups.append((dict(key), group))
            else:
                kept.extend(group)  # single file: already clustered
    elif entries:
        groups.append(({}, entries))

    plan = {
        "columns": columns,
        "input_files": len(entries),
        "groups": len(groups),
        "planned_files": sum(
            files_for(sum(e.get("size_bytes", 0) for e in g)) for _p, g in groups
        ),
        "dry_run": dry_run,
    }
    if dry_run or not groups:
        return plan

    new_entries: list[dict] = list(kept)
    for partition, group in groups:
        size = sum(e.get("size_bytes", 0) for e in group)
        new_entries.extend(
            _zorder_rewrite_group(
                table, group, columns, bits, files_for(size), partition
            )
        )
    table.append_snapshot(
        new_entries,
        operation="replace",
        extra_summary={"zorder-columns": columns},
    )
    plan["rewritten_files"] = len(new_entries) - len(kept)
    return plan
