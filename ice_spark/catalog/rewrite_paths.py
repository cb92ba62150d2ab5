"""Table relocation: rewrite absolute path prefixes in table metadata.

Reference parity: the reference documents Iceberg's
`rewrite_table_path` Spark procedure as its table-migration workflow
(/root/reference/docs/rewrite-table-path.md): copying a table to a new
location requires rewriting metadata, because metadata carries
absolute paths. Every absolute path with the `source_prefix` is
replaced by the `target_prefix`, the rewritten metadata files land in
a staging location, and the data files are then copied separately
"using an external tool like the AWS CLI", keeping the same directory
structure relative to the prefixes.

This module reproduces that workflow over this engine's JSON metadata
plane (metadata.json versions, manifest lists, manifest shards):

- Regular ingests store data paths RELATIVE to the table location
  (`data/...parquet`), so they survive relocation unchanged — only
  the `location` field in each metadata.json version changes.
- `insert --no-copy` registrations and `source_path` provenance carry
  ABSOLUTE paths; any of them under `source_prefix` is rewritten too
  (absolute paths outside the prefix are external by definition and
  are left alone, reported in the copy plan as `external`).
- EVERY metadata version is rewritten, not just the current one, so
  time travel (`--snapshot` / `--as-of`) works identically at the new
  location.

The rewrite is pure JSON-tree string replacement, applied to the
whole metadata tree; the copy plan (source → target pairs for the
data files) is returned and written as `copy-plan.json` next to the
staged metadata, exactly the role of the file list the Iceberg
procedure emits. `copy_data=True` performs the copies locally for
filesystem-backed tables (object-store deployments hand the plan to
their bulk-copy tool, per the reference doc).

Scale note: this is a metadata-plane operation — cost is proportional
to the number of metadata FILES (versions + shards), never to data
volume. The data copy is a flat file-pair list that any distributed
copy tool consumes; nothing here reads a data byte.
"""

from __future__ import annotations

import json
import os
import shutil

from ice_spark.catalog.fileio import FileIO
from ice_spark.catalog.table import Table


def _rewrite_tree(node, source_prefix: str, target_prefix: str, counter: list[int]):
    """Replace `source_prefix` at the START of any string value in a
    JSON tree (paths are always prefixes — substring replacement could
    corrupt data values that merely contain the path)."""
    if isinstance(node, str):
        if node == source_prefix or node.startswith(source_prefix.rstrip("/") + "/"):
            counter[0] += 1
            return target_prefix.rstrip("/") + node[len(source_prefix.rstrip("/")) :]
        return node
    if isinstance(node, list):
        return [_rewrite_tree(v, source_prefix, target_prefix, counter) for v in node]
    if isinstance(node, dict):
        return {
            k: _rewrite_tree(v, source_prefix, target_prefix, counter)
            for k, v in node.items()
        }
    return node


def rewrite_table_path(
    table: Table,
    target_prefix: str,
    source_prefix: str | None = None,
    staging_location: str | None = None,
    dry_run: bool = True,
    copy_data: bool = False,
    io: FileIO | None = None,
) -> dict:
    """Stage a relocated copy of `table`'s metadata with every absolute
    path under `source_prefix` rewritten to `target_prefix`.

    Returns {"new_location", "staging_location", "metadata_files",
    "replacements", "copy_plan", "external", "dry_run", "copied"}.
    `copy_plan` is the (source, target) data-file pair list; `external`
    are absolute paths outside the prefix, referenced but not moved.

    dry_run=True (the default, matching this CLI's delete verb and the
    reference's cautious-migration posture) computes everything and
    writes nothing.
    """
    io = io or table.io
    src = (source_prefix or table.location).rstrip("/")
    dst = target_prefix.rstrip("/")
    if not (table.location == src or table.location.startswith(src + "/")):
        raise ValueError(
            f"source_prefix {src!r} does not cover table location {table.location!r}"
        )
    counter = [0]
    new_location = _rewrite_tree(table.location, src, dst, [0])
    staging = (staging_location or os.path.join(new_location, "metadata")).rstrip("/")

    # ---- rewrite the full metadata tree (every version) ----
    rewritten: dict[str, str] = {}  # staged-name -> content
    names = sorted(io.list_dir(table.metadata_dir))
    n_meta = 0
    for name in names:
        path = os.path.join(table.metadata_dir, name)
        if name == "version-hint.text":
            rewritten[name] = io.read_text(path)
            continue
        if not name.endswith(".json"):
            continue  # locks/foreign files never belong to the copy
        tree = json.loads(io.read_text(path))
        rewritten[name] = json.dumps(
            _rewrite_tree(tree, src, dst, counter), separators=(",", ":")
        )
        n_meta += 1

    # ---- data-file copy plan across ALL versions ----
    # Every manifest shard in the metadata dir is a (possibly
    # historical) entry list; walking shards directly covers every
    # snapshot of every metadata version without re-parsing them.
    plan: list[tuple[str, str]] = []
    external: list[str] = []
    seen: set[str] = set()
    for name in names:
        if not name.startswith("manifest-"):
            continue
        entries = json.loads(io.read_text(os.path.join(table.metadata_dir, name)))[
            "files"
        ]
        for e in entries:
            p = e["path"]
            if p in seen:
                continue
            seen.add(p)
            if os.path.isabs(p):
                if p == src or p.startswith(src + "/"):
                    plan.append((p, dst + p[len(src) :]))
                else:
                    external.append(p)  # --no-copy file outside the prefix
            else:
                plan.append(
                    (
                        os.path.join(table.location, p),
                        os.path.join(new_location, p),
                    )
                )

    result = {
        "new_location": new_location,
        "staging_location": staging,
        "metadata_files": n_meta,
        "replacements": counter[0],
        "copy_plan": [{"source": s, "target": t} for s, t in sorted(plan)],
        "external": sorted(external),
        "dry_run": dry_run,
        "copied": 0,
    }
    if dry_run:
        return result

    io.mkdirs(staging)
    for name, content in rewritten.items():
        io.write_atomic(os.path.join(staging, name), content)
    io.write_atomic(
        os.path.join(staging, "copy-plan.json"),
        json.dumps({"files": result["copy_plan"]}, indent=1),
    )
    if copy_data:
        copied = 0
        for s, t in plan:
            os.makedirs(os.path.dirname(t), exist_ok=True)
            shutil.copyfile(s, t)
            copied += 1
        result["copied"] = copied
    return result
