"""250k-entry metadata-plane probe at the 100 TB design point (r11
verdict #4): 100 TB at the 512 MB DATA_COMPACTION target is ~200k
data files. This probe builds 250 days x 1000 files = 250k manifest
entries through pure metadata commits (InMemoryFileIO — no Spark, no
parquet) and measures the two properties a 100 TB metadata plane
must hold:

1. COMMIT COST stays O(delta), not O(table): wall time, files
   touched, and bytes written for an append at 10 shards vs at 250
   shards. The only O(#shards) component is the manifest LIST itself
   (one line per shard — the structure MANIFEST_COMPACTION /
   Table.rewrite_manifests bounds; reference posture:
   ManifestCompaction.java:15-27 rewriteManifests). Existing shards
   are referenced by name, never reopened or rewritten.
2. PLAN-PRUNE latency for a selective partition predicate on the
   cold 250-shard table: one shard opened, 1000 entries scanned,
   249 shards skipped on their partition summaries.

Prints one JSON line; exits 1 if the O(delta) assertions fail.
Companion regression test: tests/test_manifest_sharding.py
(test_commit_bytes_stay_o_delta) pins the bytes-per-commit bound in
CI at 100k entries.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import types as SPT  # noqa: E402

from ice_spark.catalog.fileio import InMemoryFileIO  # noqa: E402
from ice_spark.catalog.table import Table  # noqa: E402

SCHEMA = SPT.StructType(
    [
        SPT.StructField("id", SPT.LongType()),
        SPT.StructField("day", SPT.IntegerType()),
    ]
)

DAYS = 250
FILES_PER_DAY = 1000


def entries_for_day(day: int, n: int) -> list[dict]:
    return [
        {
            "path": f"data/day={day}/f{day}-{i}.parquet",
            "partition": {"day": day},
            "records": 100,
            "size_bytes": 10_000,
            "schema_version": 1,
            "column_metrics": {
                "id": {
                    "min": day * 100_000 + i * 10,
                    "max": day * 100_000 + i * 10 + 9,
                }
            },
        }
        for i in range(n)
    ]


def timed_commit(io: InMemoryFileIO, t: Table, day: int) -> dict:
    io.reset_counts()
    t0 = time.perf_counter()
    t.append_snapshot(entries_for_day(day, FILES_PER_DAY))
    return {
        "at_shards": day,
        "wall_sec": round(time.perf_counter() - t0, 4),
        "writes": io.counts["writes"],
        "reads": io.counts["reads"],
        "cas": io.counts["cas"],
        "bytes_written": io.bytes_written,
    }


def main() -> int:
    io = InMemoryFileIO()
    Table.create(
        None, "/wh/ns/events", SCHEMA, partition_spec=[{"column": "day"}], io=io
    )
    t = Table(None, "/wh/ns/events", io=io)

    early = late = None
    build_t0 = time.perf_counter()
    for day in range(DAYS):
        if day == 10:
            early = timed_commit(io, t, day)
        elif day == DAYS - 1:
            late = timed_commit(io, t, day)
        else:
            t.append_snapshot(entries_for_day(day, FILES_PER_DAY))
    build_sec = time.perf_counter() - build_t0

    n_files = len(t.files())
    assert n_files == DAYS * FILES_PER_DAY, n_files

    # cold-cache selective plan: one shard opened out of 250
    cold = Table(None, "/wh/ns/events", io=io).refresh()
    p0 = time.perf_counter()
    planned = cold.plan_files(
        [{"name": "day", "op": "equals", "values": [123]}]
    )
    plan_sec = time.perf_counter() - p0
    stats = dict(cold.last_plan_stats)

    # O(delta) checks. Shard + hint bytes are delta-sized; the
    # manifest list is the lone O(#shards) term (one line per shard),
    # so late/early growth must be explained ENTIRELY by the list
    # growing from 10 to 250 lines.
    problems = []
    if late["writes"] != early["writes"]:
        problems.append(f"files-touched grew: {early['writes']} -> {late['writes']}")
    list_growth = late["bytes_written"] - early["bytes_written"]
    per_shard = list_growth / (late["at_shards"] - early["at_shards"])
    if per_shard > 2048:
        problems.append(
            f"per-shard manifest-list cost {per_shard:.0f} B/shard > 2 KiB"
        )
    if late["bytes_written"] > 3 * early["bytes_written"]:
        problems.append(
            f"late commit bytes {late['bytes_written']} > 3x early "
            f"{early['bytes_written']} — O(table) component beyond the list"
        )
    if stats["shards_opened"] != 1 or len(planned) != FILES_PER_DAY:
        problems.append(f"prune failed: {stats}")

    print(
        json.dumps(
            {
                "entries": n_files,
                "shards": DAYS,
                "build_sec": round(build_sec, 2),
                "commit_early": early,
                "commit_late": late,
                "manifest_list_bytes_per_shard": round(per_shard, 1),
                "plan_prune": {
                    "wall_sec": round(plan_sec, 4),
                    "shards_total": stats["shards_total"],
                    "shards_opened": stats["shards_opened"],
                    "entries_scanned": stats["entries_scanned"],
                    "files_planned": len(planned),
                },
                "problems": problems,
            }
        )
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
