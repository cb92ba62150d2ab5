"""Queue-notification watch transport (SQS-shaped `insert --watch`).

The reference's streaming surface is a poll loop over an SQS queue of
S3 ObjectCreated events (/root/reference/ice/src/main/java/com/
altinity/ice/cli/internal/cmd/InsertWatch.java:71-238). Its contract,
reproduced here behind an injectable `QueuePoller`:

- long-poll batches of <=10 messages, drain a tail of up to 100 per
  cycle (InsertWatch.java:101-154);
- parse S3 `ObjectCreated:*` event JSON, URL-decode object keys,
  ignore s3:TestEvent handshakes (InsertWatch.java:240-315);
- filter keys against glob matchers (io/Matcher.java:24-118);
- ingest with no-copy + skip-duplicates — at-least-once delivery
  made idempotent by the table-level duplicate check
  (InsertWatch.java:83-86);
- delete messages ONLY after a successful commit (`confirmProcessed`,
  InsertWatch.java:317-342): a crash between commit and delete
  redelivers, and skip-duplicates absorbs the replay;
- `fire_once` = one drain cycle (the reference's --watch-fire-once
  test mode).

The poller is the seam: tests inject `FakeQueue`; production would
implement `QueuePoller.receive/delete` over boto3 (not available in
this sandbox — the three methods map 1:1 onto
sqs.receive_message(MaxNumberOfMessages=10, WaitTimeSeconds=20) and
sqs.delete_message_batch). The engine side — dedup, commit, matcher
semantics — is transport-independent and fully tested.

Scale note: the queue carries file NAMES, not data. One drain cycle
appends <=100 files in a single Spark job + one snapshot commit, so
queue pressure never multiplies commits — same batching the
reference uses to bound commit rate.
"""

from __future__ import annotations

import json
import urllib.parse
from dataclasses import dataclass, field

from ice_spark.catalog.table import Table
from ice_spark.ingest.insert import insert
from ice_spark.sources.matcher import Matcher


@dataclass
class QueueMessage:
    message_id: str
    receipt_handle: str
    body: str


class QueuePoller:
    """Transport interface. receive() may return fewer than
    max_messages (or []); delete() acknowledges processed messages."""

    def receive(self, max_messages: int = 10, wait_seconds: int = 20) -> list[QueueMessage]:
        raise NotImplementedError

    def delete(self, receipt_handles: list[str]) -> None:
        raise NotImplementedError


@dataclass
class FakeQueue(QueuePoller):
    """In-memory queue with SQS visibility semantics: a received
    message becomes invisible (in flight) until deleted or until its
    visibility timeout expires (`expire_visibility()` — time is
    explicit in tests); expired messages are redelivered
    (at-least-once)."""

    messages: list[QueueMessage] = field(default_factory=list)
    _in_flight: dict[str, QueueMessage] = field(default_factory=dict)
    _counter: int = 0

    def send(self, body: str) -> str:
        self._counter += 1
        mid = f"m{self._counter}"
        self.messages.append(QueueMessage(mid, f"rh-{mid}", body))
        return mid

    def receive(self, max_messages: int = 10, wait_seconds: int = 20) -> list[QueueMessage]:
        fresh = self.messages[:max_messages]
        self.messages = self.messages[max_messages:]
        for m in fresh:
            self._in_flight[m.receipt_handle] = m
        return fresh

    def delete(self, receipt_handles: list[str]) -> None:
        for rh in receipt_handles:
            self._in_flight.pop(rh, None)

    def expire_visibility(self) -> None:
        """Visibility timeout elapses: undeleted in-flight messages
        become receivable again (the crash-before-ack path)."""
        self.messages.extend(self._in_flight.values())
        self._in_flight.clear()

    def pending(self) -> int:
        return len(self.messages) + len(self._in_flight)


def s3_event_body(bucket: str, keys: list[str]) -> str:
    """Build an S3 ObjectCreated notification body (test helper —
    the same JSON shape InsertWatch parses)."""
    return json.dumps(
        {
            "Records": [
                {
                    "eventName": "ObjectCreated:Put",
                    "s3": {
                        "bucket": {"name": bucket},
                        "object": {"key": urllib.parse.quote(k)},
                    },
                }
                for k in keys
            ]
        }
    )


def parse_s3_events(body: str) -> list[tuple[str, str]]:
    """(bucket, url-decoded key) pairs from one message body.
    Non-ObjectCreated events and s3:TestEvent handshakes yield []
    (InsertWatch.java:240-315)."""
    try:
        data = json.loads(body)
    except (ValueError, TypeError):
        return []
    if not isinstance(data, dict) or data.get("Event") == "s3:TestEvent":
        return []
    out: list[tuple[str, str]] = []
    for rec in data.get("Records", []):
        if not str(rec.get("eventName", "")).startswith("ObjectCreated"):
            continue
        s3 = rec.get("s3", {})
        bucket = s3.get("bucket", {}).get("name")
        key = s3.get("object", {}).get("key")
        if bucket and key:
            out.append((bucket, urllib.parse.unquote_plus(key)))
    return out


def _default_path(bucket: str, key: str) -> str:
    return f"s3://{bucket}/{key}"


def watch_queue(
    table: Table | None,
    poller: QueuePoller,
    patterns: list[str] | None = None,
    path_for=None,
    fire_once: bool = False,
    max_cycles: int | None = None,
    max_drain: int = 100,
    receive_batch: int = 10,
    wait_seconds: int = 20,
    catalog=None,
    ident: str | None = None,
    partition_spec: list[dict] | None = None,
) -> dict:
    """Poll `poller` and append notified files to `table`.

    `path_for(bucket, key) -> local/FS path` maps event coordinates
    to readable paths (defaults to s3:// URIs; tests map to tmp
    dirs). Returns counters: cycles, files_added, files_skipped,
    messages_deleted, messages_ignored.

    table=None + catalog/ident = create-table-on-first-file: the
    table is created from the first matched file's parquet schema
    when the first notification arrives (InsertWatch.java:180-217,
    the reference's `-p` mode). Until then, messages stay queued.
    """
    if table is None and (catalog is None or ident is None):
        raise ValueError("pass a table, or catalog+ident for create-on-first-file")
    path_for = path_for or _default_path
    matcher = Matcher(patterns or [])
    # Prometheus counters, named after the reference's watch metrics
    # (ice/.../metrics/InsertWatchMetrics.java, grafana/METRICS.md).
    from ice_spark.metrics import default_registry

    reg = default_registry()
    wl = {
        "table": (ident or (table.identifier if table is not None else "")),
        "queue": type(poller).__name__,
        "queue_type": "sqs",
    }
    stats = {
        "cycles": 0,
        "files_added": 0,
        "files_skipped": 0,
        "messages_deleted": 0,
        "messages_ignored": 0,
    }
    while True:
        stats["cycles"] += 1
        reg.inc("ice_watch_poll_requests_total", wl, help_="queue poll requests")
        # drain tail: batches of <=receive_batch up to max_drain msgs
        drained: list[QueueMessage] = []
        while len(drained) < max_drain:
            batch = poller.receive(
                max_messages=min(receive_batch, max_drain - len(drained)),
                wait_seconds=wait_seconds,
            )
            if not batch:
                break
            drained.extend(batch)
            reg.inc(
                "ice_watch_messages_received_total", wl, len(batch),
                help_="messages received from queue",
            )
        if not drained:
            if fire_once or (max_cycles and stats["cycles"] >= max_cycles):
                return stats
            continue

        files: list[str] = []
        msg_of_file: dict[str, list[str]] = {}
        no_file_msgs: list[str] = []
        for msg in drained:
            events = parse_s3_events(msg.body)
            reg.inc(
                "ice_watch_events_received_total", wl, len(events),
                help_="S3 events received",
            )
            matched = [
                path_for(b, k) for b, k in events if matcher.matches(k)
            ]
            reg.inc(
                "ice_watch_events_matched_total", wl, len(matched),
                help_="S3 events matching the input patterns",
            )
            reg.inc(
                "ice_watch_events_not_matched_total", wl, len(events) - len(matched),
                help_="S3 events not matching any input pattern",
            )
            if not matched:
                # handshake / filtered-out: safe to ack immediately
                no_file_msgs.append(msg.receipt_handle)
                stats["messages_ignored"] += 1
                continue
            for p in matched:
                if p not in msg_of_file:
                    files.append(p)
                msg_of_file.setdefault(p, []).append(msg.receipt_handle)
        if no_file_msgs:
            poller.delete(no_file_msgs)
            stats["messages_deleted"] += len(no_file_msgs)

        if files and table is None:
            # create-on-first-file: schema from the first matched
            # parquet (InsertWatch.java:180-217); a failure here
            # leaves every message unacked for redelivery
            if catalog.table_exists(ident):
                table = catalog.load_table(ident)
            else:
                from ice_spark.ingest.insert import read_input

                table = catalog.create_table(
                    ident,
                    schema=read_input(catalog.spark, files[0], "parquet").schema,
                    partition_spec=partition_spec,
                )
        if files:
            # one insert = one Spark job + ONE snapshot commit for the
            # whole drain (bounded commit rate); skip_duplicates makes
            # redelivered messages no-ops; no_copy registers in place
            # exactly like the reference (InsertWatch.java:83-86)
            try:
                result = insert(
                    table,
                    files,
                    skip_duplicates=True,
                    no_copy=True,
                    force_no_copy=True,
                )
            except Exception:
                reg.inc(
                    "ice_watch_transactions_failed_total", wl,
                    help_="failed insert transactions",
                )
                raise
            reg.inc("ice_watch_transactions_total", wl, help_="insert transactions")
            reg.inc(
                "ice_watch_files_inserted_total", wl, result.get("added", 0),
                help_="files inserted from S3 events",
            )
            stats["files_added"] += result.get("added", 0)
            stats["files_skipped"] += result.get("skipped", 0)
            # commit succeeded -> NOW ack every contributing message
            handles = sorted({rh for rhs in msg_of_file.values() for rh in rhs})
            poller.delete(handles)
            stats["messages_deleted"] += len(handles)

        if fire_once or (max_cycles and stats["cycles"] >= max_cycles):
            return stats
