"""Snapshot-versioned Parquet table with a sharded metadata plane.

Layout (mirrors Iceberg's hadoop-catalog protocol):

    <table location>/
      metadata/
        v1.metadata.json, v2.metadata.json, ...
        ml-<snapshot_id>.json             (manifest LIST: shard descriptors)
        manifest-<uuid>.json              (manifest SHARD: file entries)
        version-hint.text                 (current version number)
      data/
        [<part>=<val>/...]*.parquet

metadata.json fields: table_uuid, format_version, location, schema
(Spark JSON), partition_spec, sort_order, properties,
current_snapshot_id, snapshots[], metadata_log[], column_renames[],
column_defaults[].

Metadata plane is SHARDED, exactly like Iceberg's snapshot →
manifest-list → manifest design (SURVEY §1.1; the reference prunes
the same structure for deletes, ice/.../cmd/Delete.java:87-97):

- A snapshot points at a manifest list (`ml-<sid>.json`) whose
  entries describe immutable manifest shards: file/record/byte
  counts plus partition-value and column-bound summaries.
- An APPEND commit writes ONE new shard (the added files) and a new
  manifest list that references the existing shards by name —
  O(added + shard_count), never O(table).
- A REPLACE/DELETE commit diffs the new file list against the current
  shards and reuses every shard whose entries are untouched; only
  changed entries get new shards — a bounded-partition delete
  touches O(changed shards).
- Scan planning (`plan_files`) prunes SHARD-FIRST on the manifest
  list summaries, opening only shards that might match — at 100 TB
  the planner reads a few KB of summaries instead of the full file
  list.

All metadata IO goes through a `FileIO` (fileio.py) — local impl is
today's open/os.link; an S3 impl needs only conditional-PUT CAS.

Commits are optimistic CAS: stage metadata vN+1, then atomically
create it (first committer wins) — the same protocol the reference's
server implements over etcd
(/root/reference/ice-rest-catalog/.../etcd/EtcdCatalog.java:588-640),
with client-side retry mirroring Insert.java:937-1026.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SPT

from ice_spark.catalog.fileio import DEFAULT_IO, FileIO
from ice_spark.catalog.transforms import (
    PartitionField,
    SortField,
    parse_partition_spec,
    parse_sort_order,
)

# Entries per manifest shard. Appends usually write one shard per
# commit; residual rewrites chunk at this size so no single shard
# grows unbounded. 10k JSON entries ≈ a few MB — one metadata read.
MAX_ENTRIES_PER_SHARD = 10_000


class CommitConflictError(RuntimeError):
    pass


class NoSuchTableError(ValueError):
    pass


def _now_ms() -> int:
    return int(time.time() * 1000)


def _minmax(values: list):
    """(min, max) if every value is a comparable same-kind primitive
    (all str, or all non-bool numeric); else None — summaries must
    never lie, absence just disables pruning."""
    if not values:
        return None
    if all(isinstance(v, str) for v in values):
        return min(values), max(values)
    if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in values):
        return min(values), max(values)
    return None


def filters_to_column(filters: list[dict]):
    """Delete-dialect JSON filters -> a Spark Column predicate
    (AND of filters, OR of each filter's values)."""
    cmp_of = {
        "equals": lambda c, v: c == v,
        "less_than": lambda c, v: c < v,
        "greater_than": lambda c, v: c > v,
        "less_than_or_equal": lambda c, v: c <= v,
        "greater_than_or_equal": lambda c, v: c >= v,
    }
    cond = None
    for flt in filters:
        fn = cmp_of[flt.get("op", "equals")]
        clause = None
        for v in flt.get("values", []):
            cmp = fn(F.col(flt["name"]), F.lit(v))
            clause = cmp if clause is None else (clause | cmp)
        if clause is not None:
            cond = clause if cond is None else (cond & clause)
    return cond


def _range_might_match(lo, hi, op_name: str, values: list) -> bool:
    """Can any value in [lo, hi] satisfy `op` against any of `values`?
    Conservative: type mismatch ⇒ True (cannot prune)."""
    for v in values:
        same_num = (
            isinstance(lo, (int, float))
            and isinstance(v, (int, float))
            and not isinstance(lo, bool)
            and not isinstance(v, bool)
        )
        same_str = isinstance(lo, str) and isinstance(v, str)
        if not (same_num or same_str):
            return True
        if (
            (op_name == "equals" and lo <= v <= hi)
            or (op_name == "less_than" and lo < v)
            or (op_name == "less_than_or_equal" and lo <= v)
            or (op_name == "greater_than" and hi > v)
            or (op_name == "greater_than_or_equal" and hi >= v)
        ):
            return True
    return False


class Table:
    def __init__(
        self,
        spark: SparkSession,
        location: str,
        identifier: str = "",
        io: FileIO | None = None,
    ):
        self.spark = spark
        self.location = location.rstrip("/")
        self.identifier = identifier
        self.io = io or DEFAULT_IO
        self._meta: dict | None = None
        self._version: int | None = None
        # Shards are immutable once written (uuid-named) — cache by name.
        self._shard_cache: dict[str, list[dict]] = {}
        # Stats of the most recent plan_files call (scale tests/telemetry).
        self.last_plan_stats: dict = {}

    # ---------- metadata io ----------

    @property
    def metadata_dir(self) -> str:
        return os.path.join(self.location, "metadata")

    @property
    def data_dir(self) -> str:
        return os.path.join(self.location, "data")

    def _hint_path(self) -> str:
        return os.path.join(self.metadata_dir, "version-hint.text")

    def current_version(self) -> int:
        """Current metadata version. The hint file is exactly that — a
        hint (Iceberg hadoop-catalog semantics): a committer that
        crashed between creating vN+1 and updating the hint must not
        hide the durable commit, so advance past the hint while newer
        metadata files exist."""
        try:
            v = int(self.io.read_text(self._hint_path()).strip())
        except FileNotFoundError:
            raise NoSuchTableError(f"no table at {self.location}")
        while self.io.exists(self.metadata_path(v + 1)):
            v += 1
        return v

    def metadata_path(self, version: int) -> str:
        return os.path.join(self.metadata_dir, f"v{version}.metadata.json")

    def refresh(self) -> "Table":
        self._version = self.current_version()
        self._meta = json.loads(self.io.read_text(self.metadata_path(self._version)))
        return self

    @property
    def meta(self) -> dict:
        if self._meta is None:
            self.refresh()
        return self._meta

    @property
    def schema(self) -> SPT.StructType:
        return SPT.StructType.fromJson(self.meta["schema"])

    def schema_at(self, version: int) -> SPT.StructType:
        meta = json.loads(self.io.read_text(self.metadata_path(version)))
        return SPT.StructType.fromJson(meta["schema"])

    @property
    def partition_spec(self) -> list[PartitionField]:
        return parse_partition_spec(self.meta.get("partition_spec", []))

    @property
    def sort_order(self) -> list[SortField]:
        return parse_sort_order(self.meta.get("sort_order", []))

    @property
    def properties(self) -> dict:
        return dict(self.meta.get("properties", {}))

    # ---------- creation / commit ----------

    @staticmethod
    def new_table_metadata(
        location: str,
        schema: SPT.StructType,
        partition_spec: list[dict] | None = None,
        sort_order: list[dict] | None = None,
        properties: dict | None = None,
    ) -> dict:
        """Initial (v1) metadata document for a new table. Shared by
        the filesystem create path and alternative-registry backends
        (etcd), which differ only in where the current-version pointer
        lives, not in the metadata shape."""
        parse_partition_spec(partition_spec or [])  # validate
        parse_sort_order(sort_order or [])
        return {
            "table_uuid": str(uuid.uuid4()),
            "format_version": 2,
            "location": location.rstrip("/"),
            "schema": schema.jsonValue(),
            "partition_spec": partition_spec or [],
            "sort_order": sort_order or [],
            # transform-impl stamps WHICH bucket/truncate arithmetic
            # wrote this table's partition values; the Iceberg export
            # refuses to label unstamped (pre-spec) values with spec
            # transform names (see iceberg_export._exportable_spec_fields)
            "properties": {"transform-impl": "iceberg-spec-v1", **(properties or {})},
            "current_snapshot_id": None,
            "snapshots": [],
            "metadata_log": [],
            "column_renames": [],
            "column_defaults": [],
        }

    @staticmethod
    def create(
        spark: SparkSession,
        location: str,
        schema: SPT.StructType,
        partition_spec: list[dict] | None = None,
        sort_order: list[dict] | None = None,
        properties: dict | None = None,
        identifier: str = "",
        io: FileIO | None = None,
    ) -> "Table":
        t = Table(spark, location, identifier, io=io)
        if t.io.exists(t._hint_path()):
            raise ValueError(f"table already exists at {location}")
        t.io.mkdirs(t.metadata_dir)
        t.io.mkdirs(t.data_dir)
        meta = Table.new_table_metadata(
            t.location, schema, partition_spec, sort_order, properties
        )
        t._write_metadata(meta, expected_version=0)
        return t.refresh()

    def _write_metadata(self, meta: dict, expected_version: int) -> int:
        """CAS commit. The linearization point is the CREATE-EXCLUSIVE
        of vN+1.metadata.json (FileIO.create_exclusive — atomic, first
        committer wins, losers get CommitConflictError and retry on
        fresh metadata). The version hint is then updated best-effort;
        readers self-heal past a stale hint (current_version). This is
        the filesystem equivalent of the reference's etcd
        If(version==v).Then(put) transaction (EtcdCatalog.java:588-640)."""
        current = 0
        if self.io.exists(self._hint_path()):
            current = self.current_version()
        if current != expected_version:
            raise CommitConflictError(
                f"expected v{expected_version}, found v{current} at {self.location}"
            )
        new_version = expected_version + 1
        meta.setdefault("metadata_log", []).append(
            {"timestamp_ms": _now_ms(), "metadata_file": f"v{new_version}.metadata.json"}
        )
        path = self.metadata_path(new_version)
        try:
            self.io.create_exclusive(path, json.dumps(meta, indent=1))
        except FileExistsError:
            raise CommitConflictError(
                f"lost race for v{new_version} at {self.location}"
            )
        self.io.write_atomic(self._hint_path(), str(new_version))  # best-effort pointer
        self._version = new_version
        self._meta = meta
        return new_version

    def commit(
        self,
        mutate,
        retries: int = 10,
        backoff_ms: int = 50,
    ) -> int:
        """Optimistic commit loop: `mutate(meta) -> meta` is re-applied
        on conflict against freshly loaded metadata (mirrors the
        reference's jittered retry, Insert.java:883-888,937-1026)."""
        for attempt in range(retries + 1):
            self.refresh()
            meta = json.loads(json.dumps(self._meta))  # deep copy
            meta = mutate(meta)
            try:
                return self._write_metadata(meta, expected_version=self._version)
            except CommitConflictError:
                if attempt == retries:
                    raise
                time.sleep(min(backoff_ms * (2**attempt), 30_000) / 1000.0)
        raise AssertionError("unreachable")

    # ---------- snapshots / files ----------

    def snapshots(self) -> list[dict]:
        return list(self.meta.get("snapshots", []))

    def snapshot(self, snapshot_id: int | None = None) -> dict | None:
        snaps = self.snapshots()
        if snapshot_id is None:
            cur = self.meta.get("current_snapshot_id")
            return next((s for s in snaps if s["snapshot_id"] == cur), None)
        s = next((s for s in snaps if s["snapshot_id"] == snapshot_id), None)
        if s is None:
            raise ValueError(f"no snapshot {snapshot_id}")
        return s

    def snapshot_as_of(self, timestamp_ms: int) -> dict | None:
        """Latest snapshot committed at or before `timestamp_ms`
        (Iceberg `TIMESTAMP AS OF` analog; history timestamps come
        from list-snapshots parity, ListSnapshots.java:33-57)."""
        best = None
        for s in self.snapshots():
            if s["timestamp_ms"] <= timestamp_ms and (
                best is None or s["timestamp_ms"] > best["timestamp_ms"]
            ):
                best = s
        return best

    # -- manifest list / shard plumbing --

    def manifest_path(self, snapshot: dict) -> str:
        """Pre-sharding (format v1) snapshots: path of the single full
        manifest. Kept for reading tables written by older versions."""
        return os.path.join(self.metadata_dir, snapshot["manifest"])

    def manifest_list_entries(self, snapshot: dict | None) -> list[dict]:
        """Shard descriptors of a snapshot: [{path, file_count,
        record_count, size_bytes, partition_summary, bound_summary}].
        Old-format snapshots report a single pseudo-descriptor so
        callers never branch on format."""
        if snapshot is None:
            return []
        if "manifest_list" in snapshot:
            ml = json.loads(
                self.io.read_text(
                    os.path.join(self.metadata_dir, snapshot["manifest_list"])
                )
            )
            return ml["manifests"]
        # format v1: single full-list manifest, no summaries
        entries = self._read_shard(snapshot["manifest"], legacy=True)
        return [
            {
                "path": snapshot["manifest"],
                "file_count": len(entries),
                "record_count": sum(e.get("records", 0) for e in entries),
                "size_bytes": sum(e.get("size_bytes", 0) for e in entries),
                "partition_summary": {},
                "bound_summary": {},
                "legacy": True,
            }
        ]

    def _read_shard(self, name: str, legacy: bool = False) -> list[dict]:
        cached = self._shard_cache.get(name)
        if cached is not None:
            return cached
        data = json.loads(self.io.read_text(os.path.join(self.metadata_dir, name)))
        entries = data["files"]
        self._shard_cache[name] = entries
        return entries

    def _shard_descriptor(self, name: str, entries: list[dict]) -> dict:
        """Summaries for shard-level pruning: per-partition-field
        min/max (identity values) and per-column merged bounds. A
        field/column is summarized only when EVERY entry carries a
        comparable value — partial stats can't prove absence."""
        part_summary: dict = {}
        keys: set[str] = set()
        for e in entries:
            keys.update((e.get("partition") or {}).keys())
        for k in keys:
            vals = [
                (e.get("partition") or {}).get(k)
                for e in entries
            ]
            if any(v is None for v in vals):
                continue
            mm = _minmax(vals)
            if mm is not None:
                part_summary[k] = {"min": mm[0], "max": mm[1]}
        bound_summary: dict = {}
        cols: set[str] = set()
        for e in entries:
            cols.update((e.get("column_metrics") or {}).keys())
        for c in cols:
            lows, highs = [], []
            complete = bool(entries)
            for e in entries:
                m = (e.get("column_metrics") or {}).get(c)
                if not m or m.get("min") is None or m.get("max") is None:
                    complete = False
                    break
                lows.append(m["min"])
                highs.append(m["max"])
            if not complete:
                continue
            lo = _minmax(lows)
            hi = _minmax(highs)
            if lo is not None and hi is not None:
                bound_summary[c] = {"min": lo[0], "max": hi[1]}
        return {
            "path": name,
            "file_count": len(entries),
            "record_count": sum(e.get("records", 0) for e in entries),
            "size_bytes": sum(e.get("size_bytes", 0) for e in entries),
            "partition_summary": part_summary,
            "bound_summary": bound_summary,
        }

    def _write_shard(self, entries: list[dict]) -> dict:
        """Write one immutable manifest shard; returns its descriptor."""
        name = f"manifest-{uuid.uuid4().hex[:16]}.json"
        self.io.write_atomic(
            os.path.join(self.metadata_dir, name), json.dumps({"files": entries})
        )
        self._shard_cache[name] = entries
        return self._shard_descriptor(name, entries)

    def _write_shards_chunked(
        self, entries: list[dict], max_per_shard: int = MAX_ENTRIES_PER_SHARD
    ) -> list[dict]:
        """Write entries as one or more shards. Entries are sorted by
        partition value first so chunked shards carry disjoint, tight
        partition ranges — that's what makes shard pruning bite."""
        if not entries:
            return []
        ordered = sorted(
            entries,
            key=lambda e: json.dumps(e.get("partition") or {}, sort_keys=True),
        )
        return [
            self._write_shard(ordered[i : i + max_per_shard])
            for i in range(0, len(ordered), max_per_shard)
        ]

    def _write_manifest_list(self, snapshot_id: int, descriptors: list[dict]) -> str:
        name = f"ml-{snapshot_id}.json"
        self.io.write_atomic(
            os.path.join(self.metadata_dir, name),
            json.dumps({"manifests": descriptors}),
        )
        return name

    def snapshot_files(self, snapshot: dict | None) -> list[dict]:
        """All data-file entries of a snapshot (loads every shard)."""
        out: list[dict] = []
        for d in self.manifest_list_entries(snapshot):
            out.extend(self._read_shard(d["path"]))
        return out

    def snapshot_meta_files(self, snapshot: dict) -> list[str]:
        """Absolute paths of the metadata files this snapshot
        references: its manifest list (if sharded) plus every shard."""
        paths: list[str] = []
        if "manifest_list" in snapshot:
            paths.append(os.path.join(self.metadata_dir, snapshot["manifest_list"]))
        for d in self.manifest_list_entries(snapshot):
            paths.append(os.path.join(self.metadata_dir, d["path"]))
        return paths

    def files(self, snapshot_id: int | None = None) -> list[dict]:
        """Data-file entries of a snapshot: path, partition, records,
        size_bytes, source_path, schema_version."""
        return self.snapshot_files(self.snapshot(snapshot_id))

    def new_snapshot_id(self) -> int:
        return _now_ms() * 1000 + (uuid.uuid4().int % 1000)

    def _diff_shards(self, old_descriptors: list[dict], files: list[dict]) -> list[dict]:
        """Shard set for a replace/delete/overwrite whose full file
        list is `files`: every old shard whose entries all survive
        unchanged is reused by reference; everything else lands in
        fresh shards. A delete confined to one partition rewrites only
        the shards covering that partition."""
        new_by_path = {e["path"]: e for e in files}
        kept: list[dict] = []
        consumed: set[str] = set()
        for d in old_descriptors:
            if d.get("legacy"):
                continue  # old-format pseudo shard: always rewrite
            entries = self._read_shard(d["path"])
            if entries and all(
                new_by_path.get(e["path"]) == e for e in entries
            ):
                paths = {e["path"] for e in entries}
                if paths & consumed:
                    continue  # overlapping shard (shouldn't happen) — rewrite
                kept.append(d)
                consumed.update(paths)
        residual = [e for e in files if e["path"] not in consumed]
        return kept + self._write_shards_chunked(residual)

    def append_snapshot(
        self,
        files: list[dict],
        operation: str = "append",
        extra_summary: dict | None = None,
        set_properties: dict | None = None,
        branch: str | None = None,
    ) -> int:
        """Commit a snapshot. For `append`, the file list becomes
        current files + `files` and the commit writes exactly one new
        shard + one new manifest list — O(added + shard_count). For
        replace/delete/overwrite the caller passes the FULL list and
        unchanged shards are reused (see _diff_shards)."""
        sid = self.new_snapshot_id()

        def mutate(meta: dict) -> dict:
            cur = meta.get("current_snapshot_id")
            cur_snap = next(
                (s for s in meta.get("snapshots", []) if s["snapshot_id"] == cur), None
            )
            old = self.manifest_list_entries(cur_snap)
            if operation == "append":
                # migrate a legacy full-list manifest into a real shard once
                migrated = [
                    self._write_shard(self._read_shard(d["path"], legacy=True))
                    if d.get("legacy")
                    else d
                    for d in old
                ]
                descriptors = migrated + self._write_shards_chunked(files)
                added = len(files)
            else:  # replace / delete / overwrite / rollback: full list given
                descriptors = self._diff_shards(old, files)
                added = None
            manifest_list = self._write_manifest_list(sid, descriptors)
            total_files = sum(d["file_count"] for d in descriptors)
            total_records = sum(d["record_count"] for d in descriptors)
            meta["snapshots"].append(
                {
                    "snapshot_id": sid,
                    "parent_snapshot_id": cur,
                    "timestamp_ms": _now_ms(),
                    "operation": operation,
                    "manifest_list": manifest_list,
                    "summary": {
                        "total-data-files": total_files,
                        "total-records": total_records,
                        **({"added-data-files": added} if added is not None else {}),
                        **(extra_summary or {}),
                    },
                }
            )
            if branch is None:
                meta["current_snapshot_id"] = sid
            else:
                # write-audit-publish staging: the snapshot exists (and
                # is readable via the ref / snapshot id) but main does
                # NOT advance until publish_branch fast-forwards it
                meta.setdefault("refs", {})[branch] = sid
            if set_properties:
                # atomically with the snapshot: state + bookkeeping in
                # ONE commit (a crash between two commits must never
                # leave them disagreeing — e.g. a matview's folded data
                # vs its recorded base snapshot)
                meta.setdefault("properties", {}).update(set_properties)
            return meta

        self.commit(mutate)
        return sid

    def rewrite_manifests(self, target_entries_per_shard: int = MAX_ENTRIES_PER_SHARD) -> dict:
        """Merge the current snapshot's shards into the fewest shards
        that respect `target_entries_per_shard` (Iceberg
        rewriteManifests / ManifestCompaction.java:15-27 analog).
        Logical content is unchanged; commits a `replace` snapshot
        that incremental readers skip."""
        self.refresh()
        snap = self.snapshot()
        if snap is None:
            return {"merged": 0, "shards_before": 0, "shards_after": 0}
        before = self.manifest_list_entries(snap)
        small = [d for d in before if d["file_count"] < target_entries_per_shard]
        if len(small) <= 1 and not any(d.get("legacy") for d in before):
            return {
                "merged": 0,
                "shards_before": len(before),
                "shards_after": len(before),
            }
        sid = self.new_snapshot_id()

        def mutate(meta: dict) -> dict:
            cur = meta.get("current_snapshot_id")
            cur_snap = next(
                (s for s in meta.get("snapshots", []) if s["snapshot_id"] == cur), None
            )
            descriptors = self.manifest_list_entries(cur_snap)
            big = [
                d
                for d in descriptors
                if d["file_count"] >= target_entries_per_shard and not d.get("legacy")
            ]
            to_merge = [
                d
                for d in descriptors
                if d["file_count"] < target_entries_per_shard or d.get("legacy")
            ]
            merged_entries: list[dict] = []
            for d in to_merge:
                merged_entries.extend(self._read_shard(d["path"], legacy=d.get("legacy", False)))
            # chunk at the CALLER's target so full output shards stop
            # being re-selected by the next rewrite (no no-op churn)
            new_descriptors = big + self._write_shards_chunked(
                merged_entries, max_per_shard=target_entries_per_shard
            )
            manifest_list = self._write_manifest_list(sid, new_descriptors)
            meta["snapshots"].append(
                {
                    "snapshot_id": sid,
                    "parent_snapshot_id": cur,
                    "timestamp_ms": _now_ms(),
                    "operation": "replace",
                    "manifest_list": manifest_list,
                    "summary": {
                        "total-data-files": sum(d["file_count"] for d in new_descriptors),
                        "total-records": sum(d["record_count"] for d in new_descriptors),
                        "rewritten-manifests": len(to_merge),
                    },
                }
            )
            meta["current_snapshot_id"] = sid
            return meta

        self.commit(mutate)
        after = self.manifest_list_entries(self.snapshot())
        return {
            "merged": len(small),
            "shards_before": len(before),
            "shards_after": len(after),
        }

    # ---------- read path ----------

    def _align_to_current(
        self, df: DataFrame, file_schema_version: int, extra_cols: tuple = ()
    ) -> DataFrame:
        """Project a file-version DataFrame onto the current schema:
        apply renames that happened after the file was written, fill
        added columns (with their initial_default for pre-existing
        rows), drop removed columns, apply type promotions.
        extra_cols: passthrough columns (e.g. a _metadata capture) kept
        verbatim alongside the aligned schema."""
        for r in self.meta.get("column_renames", []):
            if r["at_version"] > file_schema_version and r["from"] in df.columns:
                df = df.withColumnRenamed(r["from"], r["to"])
        defaults = {
            d["column"]: d.get("initial_default")
            for d in self.meta.get("column_defaults", [])
            if d["at_version"] > file_schema_version
        }
        out = []
        for field in self.schema.fields:
            if field.name in df.columns:
                out.append(F.col(field.name).cast(field.dataType).alias(field.name))
            else:
                out.append(
                    F.lit(defaults.get(field.name)).cast(field.dataType).alias(field.name)
                )
        out.extend(F.col(c) for c in extra_cols)
        return df.select(*out)

    def read(
        self, snapshot_id: int | None = None, as_of_ms: int | None = None
    ) -> DataFrame:
        """DataFrame of the table at a snapshot (time travel via
        snapshot_id = `VERSION AS OF`, or as_of_ms = `TIMESTAMP AS
        OF`). Files are grouped by the schema version they were
        written under; each group is read with its own schema and
        aligned to the current one — honest schema evolution without
        a field-id format."""
        if as_of_ms is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or as_of_ms, not both")
            snap = self.snapshot_as_of(as_of_ms)
            if snap is None:
                return self.spark.createDataFrame([], self.schema)
            snapshot_id = snap["snapshot_id"]
        return self._read_entries(self.files(snapshot_id))

    def _read_entries(self, entries: list[dict]) -> DataFrame:
        if not entries:
            return self.spark.createDataFrame([], self.schema)
        by_ver: dict[int, list[str]] = {}
        for e in entries:
            by_ver.setdefault(e.get("schema_version", 1), []).append(
                os.path.join(self.location, e["path"])
            )
        parts: list[DataFrame] = []
        for ver, paths in sorted(by_ver.items()):
            df = self.spark.read.schema(self.schema_at(ver)).parquet(*paths)
            parts.append(self._align_to_current(df, ver))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def scan(self, limit: int = 10, snapshot_id: int | None = None) -> list[dict]:
        """Reference `scan` verb: first N rows as dicts
        (ice/.../cmd/Scan.java:37-65)."""
        return [r.asDict(recursive=True) for r in self.read(snapshot_id).limit(limit).collect()]

    def analyze(self, approx: bool = True) -> dict:
        """Compute table statistics (row count; per-column null count,
        distinct count, min/max for orderable types) in ONE aggregation
        pass and persist them as the `stats` table property — the
        ANALYZE TABLE analog. `approx` uses HyperLogLog distinct
        counts (constant memory per column — the only sane choice at
        100 TB); exact countDistinct is for tests."""
        df = self.read()
        ndv = F.approx_count_distinct if approx else F.countDistinct
        orderable = (
            "integer", "long", "double", "float", "date", "string", "short", "byte",
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for fl in self.schema.fields:
            c = fl.name
            aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}"))
            aggs.append(ndv(c).alias(f"__d_{c}"))
            if fl.dataType.typeName() in orderable:
                aggs.append(F.min(c).cast("string").alias(f"__lo_{c}"))
                aggs.append(F.max(c).cast("string").alias(f"__hi_{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        stats: dict = {"row_count": row["__rows"], "analyzed_at_ms": _now_ms(), "columns": {}}
        for fl in self.schema.fields:
            c = fl.name
            col_stats = {"nulls": row[f"__n_{c}"], "ndv": row[f"__d_{c}"]}
            if f"__lo_{c}" in row:
                col_stats["min"] = row[f"__lo_{c}"]
                col_stats["max"] = row[f"__hi_{c}"]
            stats["columns"][c] = col_stats

        def mutate(meta: dict) -> dict:
            meta.setdefault("properties", {})["stats"] = stats
            return meta

        self.commit(mutate)
        return stats

    # ---------- named refs (Iceberg tags analog) ----------

    def publish_branch(self, branch: str) -> int:
        """Fast-forward main to a staged branch (the publish half of
        write-audit-publish). Refuses if main moved since the stage —
        the staged snapshot's parent must BE the current snapshot, or
        the stage must be re-done against the new state (publishing
        anyway would silently drop the interleaved commit)."""

        def mutate(meta: dict) -> dict:
            refs = meta.get("refs", {})
            if branch not in refs:
                raise ValueError(f"no such branch: {branch}")
            sid = refs[branch]
            snap = next(
                (x for x in meta.get("snapshots", []) if x["snapshot_id"] == sid),
                None,
            )
            if snap is None:
                raise ValueError(f"branch {branch} points at a missing snapshot")
            if snap.get("parent_snapshot_id") != meta.get("current_snapshot_id"):
                raise CommitConflictError(
                    f"branch {branch} is not a fast-forward of main "
                    "(main advanced since the stage); re-stage against "
                    "the current state"
                )
            meta["current_snapshot_id"] = sid
            del refs[branch]
            return meta

        self.commit(mutate)
        self.refresh()
        return self.meta["current_snapshot_id"]

    def abort_branch(self, branch: str) -> None:
        """Drop a staged branch; its files become orphans (reclaimed
        by ORPHAN_CLEANUP after the retention window)."""
        self.drop_ref(branch)

    def set_ref(self, name: str, snapshot_id: int | None = None) -> int:
        """Tag a snapshot with a stable name (Iceberg tag analog —
        'the snapshot we trained run X on'). Defaults to current."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise ValueError("table has no snapshots to tag")
        sid = snap["snapshot_id"]

        def mutate(meta: dict) -> dict:
            meta.setdefault("refs", {})[name] = sid
            return meta

        self.commit(mutate)
        return sid

    def drop_ref(self, name: str) -> None:
        def mutate(meta: dict) -> dict:
            refs = meta.get("refs", {})
            if name not in refs:
                raise ValueError(f"no such ref: {name}")
            del refs[name]
            return meta

        self.commit(mutate)

    def refs(self) -> dict[str, int]:
        return dict(self.meta.get("refs", {}))

    def resolve_ref(self, name: str) -> int:
        refs = self.refs()
        if name not in refs:
            raise ValueError(f"no such ref: {name} (refs: {sorted(refs)})")
        return refs[name]

    def rollback(self, snapshot_id: int) -> int:
        """Roll the table back to an earlier snapshot's state (Iceberg
        `rollback_to_snapshot` procedure analog): commits a NEW
        snapshot whose file list equals the target's, preserving full
        history — nothing is deleted, so the rolled-back-over
        snapshots remain time-travelable until expiry. Shards of the
        target snapshot are reused by reference, not rewritten."""
        target_files = self.files(snapshot_id)  # validates the id
        sid = self.append_snapshot(
            target_files,
            operation="rollback",
            extra_summary={"rolled-back-to": snapshot_id},
        )
        return sid

    # ---------- filtered scan planning (manifest pruning) ----------
    #
    # Two-level pruning, the same structure Iceberg scan planning
    # walks and the reference prunes for deletes
    # (ice/.../cmd/Delete.java:87-97):
    #   1. manifest-LIST level: shard partition/bound summaries decide
    #      which shards to open at all;
    #   2. shard level: per-file partition values and column bounds
    #      decide which files survive.
    # At 100 TB the planner reads KBs of summaries, opens the few
    # shards covering the predicate's partitions, and never stats a
    # parquet footer.

    def _shard_might_match(self, descriptor: dict, flt: dict) -> bool:
        name, op_name = flt["name"], flt.get("op", "equals")
        values = flt.get("values", [])
        ps = (descriptor.get("partition_summary") or {}).get(name)
        if ps is not None:
            return _range_might_match(ps["min"], ps["max"], op_name, values)
        bs = (descriptor.get("bound_summary") or {}).get(name)
        if bs is not None:
            return _range_might_match(bs["min"], bs["max"], op_name, values)
        return True  # no summary — cannot prune

    def plan_files(
        self, filters: list[dict] | None = None, snapshot_id: int | None = None
    ) -> list[dict]:
        """Manifest entries that MIGHT match `filters` (same JSON
        format as delete: [{"name", "op", "values"}], OR across
        values, AND across filters). Conservative: a shard/file is
        kept unless its summaries PROVE no row can match. Populates
        `last_plan_stats` with shard-level pruning counts."""
        snap = self.snapshot(snapshot_id)
        descriptors = self.manifest_list_entries(snap)
        if not filters:
            self.last_plan_stats = {
                "shards_total": len(descriptors),
                "shards_opened": len(descriptors),
                "entries_scanned": None,
            }
            return self.snapshot_files(snap)
        opened = [
            d
            for d in descriptors
            if all(self._shard_might_match(d, f) for f in filters)
        ]
        entries: list[dict] = []
        scanned = 0
        for d in opened:
            shard_entries = self._read_shard(d["path"], legacy=d.get("legacy", False))
            scanned += len(shard_entries)
            entries.extend(
                e
                for e in shard_entries
                if all(self._file_might_match(e, f) for f in filters)
            )
        self.last_plan_stats = {
            "shards_total": len(descriptors),
            "shards_opened": len(opened),
            "entries_scanned": scanned,
        }
        return entries

    @staticmethod
    def _file_might_match(entry: dict, flt: dict) -> bool:
        from ice_spark.catalog.delete import _OPS, _coerce

        name, op_name = flt["name"], flt.get("op", "equals")
        op = _OPS[op_name]
        values = flt.get("values", [])
        part = entry.get("partition") or {}
        if name in part:
            # identity partition value: exact evaluation
            return any(op(*_coerce(part[name], v)) for v in values)
        if op_name == "equals" and entry.get("bloom", {}).get(name):
            from ice_spark.catalog.fileindex import might_contain

            if not any(might_contain(entry, name, v) for v in values):
                return False  # bloom miss on every value: provably absent
        m = (entry.get("column_metrics") or {}).get(name)
        if not m or m.get("min") is None or m.get("max") is None:
            return True  # no stats — cannot prune
        return _range_might_match(m["min"], m["max"], op_name, values)

    def read_filtered(
        self, filters: list[dict], snapshot_id: int | None = None
    ) -> DataFrame:
        """Filtered read: manifest-pruned file set + the exact row
        predicate on top (files may contain non-matching rows)."""
        entries = self.plan_files(filters, snapshot_id)
        df = self._read_entries(entries)
        cond = filters_to_column(filters)
        return df.where(cond) if cond is not None else df

    # ---------- incremental (CDC-style) reads ----------
    #
    # Iceberg-analog incremental append scan (Spark reads Iceberg
    # incrementally via `start-snapshot-id` scan options; the reference
    # exposes snapshot history through list-snapshots,
    # ice/.../cmd/ListSnapshots.java:33-57). Consumers checkpoint the
    # last snapshot id they processed and read only rows added since —
    # at 100 TB this is the difference between re-scanning the table
    # and scanning one day's files.

    def _snapshots_between(
        self, from_snapshot_id: int | None, to_snapshot_id: int | None
    ) -> list[dict]:
        """Snapshots strictly after `from` up to and including `to`,
        oldest first, following the PARENT CHAIN from `to` — not list
        order, which would include unpublished staged (branch)
        snapshots that were never part of main's lineage. None `from`
        = since table creation; None `to` = current."""
        snaps = self.snapshots()
        by_id = {s["snapshot_id"]: s for s in snaps}
        if to_snapshot_id is None:
            to_snapshot_id = self.meta.get("current_snapshot_id")
            if to_snapshot_id is None:
                return []
        if to_snapshot_id not in by_id:
            raise ValueError(f"no snapshot {to_snapshot_id}")
        if from_snapshot_id is not None and from_snapshot_id not in by_id:
            raise ValueError(f"no snapshot {from_snapshot_id}")
        chain: list[dict] = []
        cur = to_snapshot_id
        while cur is not None and cur != from_snapshot_id:
            snap = by_id.get(cur)
            if snap is None:
                break  # parent expired: treat as the start of history
            chain.append(snap)
            cur = snap.get("parent_snapshot_id")
        if from_snapshot_id is not None and cur != from_snapshot_id:
            raise ValueError(
                f"snapshot {from_snapshot_id} is not an ancestor of "
                f"{to_snapshot_id} (to_snapshot precedes from_snapshot, "
                "or the range crosses a rollback/branch)"
            )
        return list(reversed(chain))

    def changed_files(
        self,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
    ) -> dict:
        """File-level diff between two snapshots: manifest entries
        added and removed (by path). Metadata-only — no data reads."""
        before = (
            {e["path"]: e for e in self.files(from_snapshot_id)}
            if from_snapshot_id is not None
            else {}
        )
        after = {e["path"]: e for e in self.files(to_snapshot_id)}
        return {
            "added": [e for p, e in sorted(after.items()) if p not in before],
            "removed": [e for p, e in sorted(before.items()) if p not in after],
        }

    def read_incremental(
        self,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Rows appended after `from_snapshot_id` (exclusive) up to
        `to_snapshot_id` (inclusive). Walks the snapshot chain:
        `append` snapshots contribute their added files; `replace`
        snapshots (compaction/maintenance rewrites) are skipped — they
        change physical layout, not logical content; `delete` /
        `overwrite` snapshots make the range non-append-only and
        raise, exactly like Iceberg's incremental append scan."""
        entries: list[dict] = []
        seen: set[str] = set()
        prev = from_snapshot_id
        for snap in self._snapshots_between(from_snapshot_id, to_snapshot_id):
            op = snap.get("operation", "append")
            if op == "replace":
                prev = snap["snapshot_id"]
                continue
            if op != "append":
                raise ValueError(
                    f"snapshot {snap['snapshot_id']} is {op!r}: range is not "
                    "append-only; read a full snapshot instead"
                )
            prev_paths = (
                {e["path"] for e in self.files(prev)} if prev is not None else set()
            )
            for e in self.files(snap["snapshot_id"]):
                if e["path"] not in prev_paths and e["path"] not in seen:
                    entries.append(e)
                    seen.add(e["path"])
            prev = snap["snapshot_id"]
        return self._read_entries(entries)

    def read_changelog(
        self,
        from_snapshot_id: int | None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Row-level change events between two snapshots: the table's
        columns plus `_change_type` ('insert' | 'delete'). Extends the
        incremental scan to FILE-LEVEL DELETE snapshots: an `append`
        contributes its added files as inserts, a `delete` contributes
        its removed files' rows as deletes (readable while the files
        exist — a --purge delete destroys them, so consume the feed
        before purging), and compaction `replace` is no logical
        change. `overwrite` (merge) snapshots raise: rewritten files
        re-state every surviving row, so a file-level diff would emit
        false delete+insert pairs for unchanged rows — CDC for merges
        comes from the streaming upsert path, which knows the keys."""
        ins: list[dict] = []
        dels: list[dict] = []
        prev = from_snapshot_id
        for snap in self._snapshots_between(from_snapshot_id, to_snapshot_id):
            op = snap.get("operation", "append")
            sid = snap["snapshot_id"]
            if op == "replace":
                prev = sid
                continue
            if op not in ("append", "delete"):
                raise ValueError(
                    f"snapshot {sid} is {op!r}: file-level changelog "
                    "cannot attribute rewritten rows; read a full snapshot"
                )
            prev_by_path = {e["path"]: e for e in self.files(prev)} if prev is not None else {}
            cur_by_path = {e["path"]: e for e in self.files(sid)}
            if op == "append":
                ins.extend(
                    e for p, e in sorted(cur_by_path.items()) if p not in prev_by_path
                )
            else:  # delete
                dels.extend(
                    e for p, e in sorted(prev_by_path.items()) if p not in cur_by_path
                )
            prev = sid
        parts = []
        if ins:
            parts.append(
                self._read_entries(ins).withColumn("_change_type", F.lit("insert"))
            )
        if dels:
            parts.append(
                self._read_entries(dels).withColumn("_change_type", F.lit("delete"))
            )
        if not parts:
            schema = self.schema.add("_change_type", SPT.StringType())
            return self.spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def partitions(self) -> list[dict]:
        """Distinct partition tuples with file/record counts
        (ListPartitions.java:31-59)."""
        out: dict[tuple, dict] = {}
        for e in self.files():
            key = tuple(sorted((e.get("partition") or {}).items()))
            agg = out.setdefault(
                key, {"partition": dict(key), "files": 0, "records": 0}
            )
            agg["files"] += 1
            agg["records"] += e.get("records", 0)
        return sorted(out.values(), key=lambda d: json.dumps(d["partition"], sort_keys=True))

    def history(self) -> list[dict]:
        return [
            {
                "timestamp_ms": s["timestamp_ms"],
                "snapshot_id": s["snapshot_id"],
                "parent_id": s.get("parent_snapshot_id"),
                "operation": s.get("operation"),
            }
            for s in self.snapshots()
        ]

    def describe(
        self,
        show_schema: bool = False,
        show_properties: bool = False,
        show_metrics: bool = False,
    ) -> dict:
        """Reference `describe` verb (Describe.java:52-114)."""
        snap = self.snapshot()
        out: dict = {
            "identifier": self.identifier,
            "location": self.location,
            "current_version": self._version,
            "current_snapshot": (
                {
                    "snapshot_id": snap["snapshot_id"],
                    "parent_id": snap.get("parent_snapshot_id"),
                    "timestamp_ms": snap["timestamp_ms"],
                    "operation": snap.get("operation"),
                    "summary": snap.get("summary", {}),
                }
                if snap
                else None
            ),
        }
        if show_schema:
            out["schema"] = self.schema.jsonValue()
            out["partition_spec"] = self.meta.get("partition_spec", [])
            out["sort_order"] = self.meta.get("sort_order", [])
        if show_properties:
            out["properties"] = self.properties
        if show_metrics:
            # describe -m: per-file column metrics (Describe.java:155-238)
            out["file_metrics"] = [
                {
                    "path": e["path"],
                    "records": e.get("records"),
                    "columns": e.get("column_metrics", {}),
                }
                for e in self.files()
            ]
        return out

    def create_views(self, prefix: str = "") -> list[str]:
        """Register this table as a Spark temp view so spark.sql()
        queries (joins/aggs/windows — the whole point of the rebuild)
        work against catalog tables directly."""
        name = prefix + self.identifier.split(".")[-1] if self.identifier else "table"
        self.read().createOrReplaceTempView(name)
        return [name]
