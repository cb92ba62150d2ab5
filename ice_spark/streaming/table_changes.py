"""Change feed: checkpointed incremental consumption OF a catalog
table — the consumption-side dual of the ingest-side watch
(streaming/watch.py mirrors InsertWatch.java; this mirrors what a
DOWNSTREAM pipeline needs from the table the watch fills).

Two surfaces:

- `TableChangeFeed`: a microbatch driver with the same delivery
  contract as the reference's SQS path (InsertWatch.java:317-342) but
  inverted — the checkpoint (last fully-processed snapshot id) is
  advanced only AFTER the handler returns, so delivery is
  at-least-once, and an idempotent sink (insert --skip-duplicates,
  MERGE upsert, dedup_stream) makes the pipeline exactly-once
  end-to-end. Each batch is `Table.read_incremental(last, current)` —
  O(new data), never a rescan; compaction `replace` snapshots are
  skipped by the incremental scan, and a delete/overwrite in the
  range raises rather than silently double- or under-delivering
  (callers reset() + reprocess deliberately).

- `stream_table_appends`: a genuine Structured Streaming source over
  the table's data directory (file-source discovery + checkpointing,
  ≤`max_files_per_trigger` per batch, the same 100-file batch cap as
  the watch path). Append-only tables only: the file source can't
  un-deliver a compacted/deleted file, so tables whose history holds
  non-append snapshots are rejected loudly.

Checkpoints are single-writer JSON files committed by atomic rename —
the same tmp+rename discipline the metadata plane uses.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Optional

from pyspark.sql import DataFrame


class TableChangeFeed:
    def __init__(self, table, checkpoint_path: str):
        self.table = table
        self.checkpoint_path = checkpoint_path

    # -- checkpoint ----------------------------------------------------
    def last_processed(self) -> Optional[int]:
        try:
            with open(self.checkpoint_path) as f:
                return json.load(f)["last_snapshot_id"]
        except FileNotFoundError:
            return None

    def commit(self, snapshot_id: int) -> None:
        d = os.path.dirname(os.path.abspath(self.checkpoint_path))
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".feed-")
        with os.fdopen(fd, "w") as f:
            json.dump({"last_snapshot_id": snapshot_id}, f)
        os.replace(tmp, self.checkpoint_path)

    def reset(self, snapshot_id: Optional[int] = None) -> None:
        """Move the checkpoint (None = reprocess from the beginning)."""
        if snapshot_id is None:
            try:
                os.remove(self.checkpoint_path)
            except FileNotFoundError:
                pass
        else:
            self.commit(snapshot_id)

    # -- consumption ---------------------------------------------------
    def pending(self) -> Optional[tuple[DataFrame, int]]:
        """(rows since the checkpoint, snapshot id to commit) or None
        when caught up. Raises ValueError if the range is not
        append-only (caller decides: reset + full reprocess)."""
        self.table.refresh()
        cur = self.table.meta.get("current_snapshot_id")
        last = self.last_processed()
        if cur is None or cur == last:
            return None
        if last is None:
            # No checkpoint: the first batch is the CURRENT snapshot
            # (not a replay of history — deletes/compactions before
            # now are already reflected in it).
            return self.table.read(snapshot_id=cur), cur
        df = self.table.read_incremental(last, cur)  # raises on bad range
        ops = {
            s.get("operation", "append")
            for s in self.table._snapshots_between(last, cur)
        }
        if ops <= {"replace"}:
            # compaction/index-only range: no logical change — advance
            # the checkpoint silently instead of delivering an empty batch
            self.commit(cur)
            return None
        return df, cur

    def process_available(
        self, fn: Callable[[DataFrame, int], None], max_batches: Optional[int] = None
    ) -> int:
        """Trigger.AvailableNow analog: drain everything pending, one
        handler call per catch-up batch, checkpoint AFTER each."""
        n = 0
        while max_batches is None or n < max_batches:
            batch = self.pending()
            if batch is None:
                break
            df, sid = batch
            fn(df, sid)
            self.commit(sid)
            n += 1
        return n


def stream_table_appends(
    spark,
    table,
    max_files_per_trigger: int = 100,
) -> DataFrame:
    """Structured Streaming DataFrame over an append-only catalog
    table's data files. Pair with writeStream + checkpointLocation for
    exactly-once downstream delivery."""
    for s in table.snapshots():
        if s.get("operation", "append") != "append":
            raise ValueError(
                f"table history has a {s.get('operation')!r} snapshot; the "
                "file-stream source cannot un-deliver rewritten files — use "
                "TableChangeFeed (which understands snapshots) instead"
            )
    if table.partition_spec:
        raise ValueError(
            "partitioned layouts keep partition values in metadata, not in "
            "data files; use TableChangeFeed for partitioned tables"
        )
    versions = {e.get("schema_version", 1) for e in table.files()}
    if table.meta.get("column_renames") or len(versions) > 1:
        raise ValueError(
            "table has schema evolution (renames or multiple file schema "
            "versions); the raw file-stream source reads files by CURRENT "
            "column names and would silently null renamed columns — use "
            "TableChangeFeed, which aligns each file's schema"
        )
    return (
        spark.readStream.schema(table.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(table.data_dir)
    )
