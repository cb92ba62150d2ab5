"""S3/SQS bindings: helpers, server-side copy, FileIO, queue poller.

Reference parity, written against the PUBLIC boto3 surface (the
reference uses the AWS Java SDK v2 for the same calls):

- `parse_s3_uri` / `list_wildcard` — S3.BucketPath + S3.listWildcard
  (/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/s3/S3.java:27-96):
  wildcard listing splits the key at the first `*`, lists by the
  literal prefix, and filters client-side with glob matching,
  paginated, capped at `limit`.
- `copy_object_multipart` — CopyObjectMultipart.run
  (s3/CopyObjectMultipart.java:36-133): HEAD for size; below the
  256 MiB part size a single server-side CopyObject; above it a
  multipart upload whose parts are UploadPartCopy byte ranges copied
  in a thread pool, aborted on failure. S3's CopyObject caps at
  5 GiB; the multipart path has no limit and never moves bytes
  through the client.
- `S3FileIO` — the metadata-plane FileIO over an object store.
  `create_exclusive` maps to conditional PutObject with
  `IfNoneMatch="*"` (atomic create-if-absent; S3 has supported this
  natively since 2024-08), which is the whole CAS the commit
  protocol in catalog/table.py needs. 412 PreconditionFailed ->
  FileExistsError.
- `SqsQueuePoller` — the production transport for
  streaming/queue_watch.py: receive_message(MaxNumberOfMessages<=10,
  WaitTimeSeconds=long-poll) and delete_message_batch, mapping 1:1
  onto the reference's poll loop (InsertWatch.java:101-154).

No AWS credentials or network exist in this environment, so every
function takes the CLIENT as an argument; `new_s3_client` /
`new_sqs_client` build real boto3 clients where boto3 is installed
and raise an instructive error where it isn't. All logic below the
client call is exercised by fake-client tests.
"""

from __future__ import annotations

import fnmatch
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from urllib.parse import urlparse

from ice_spark.catalog.fileio import FileIO
from ice_spark.streaming.queue_watch import QueueMessage, QueuePoller

DEFAULT_PART_SIZE = 256 * 1024 * 1024  # CopyObjectMultipart.java:38


def new_s3_client():
    """Real boto3 S3 client (anonymous fallback is the caller's
    choice via env/config, as in S3.newClient)."""
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - boto3 absent here
        raise RuntimeError(
            "boto3 is not installed in this environment; pass a "
            "client explicitly (any object with the boto3 S3 method "
            "surface works)"
        ) from e
    return boto3.client("s3")  # pragma: no cover


def new_sqs_client():
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - boto3 absent here
        raise RuntimeError("boto3 is not installed in this environment") from e
    return boto3.client("sqs")  # pragma: no cover


@dataclass(frozen=True)
class BucketPath:
    bucket: str
    key: str


def parse_s3_uri(uri: str) -> BucketPath:
    """s3://bucket/key/path -> BucketPath (S3.bucketPath semantics:
    missing key -> empty string)."""
    if uri.startswith("s3a://"):  # the reference normalizes s3a -> s3
        uri = "s3://" + uri[len("s3a://") :]
    if not uri.startswith("s3://"):
        raise ValueError(f"not an s3:// uri: {uri!r}")
    rest = uri[len("s3://") :]
    bucket, _, key = rest.partition("/")
    return BucketPath(bucket, key)


def list_wildcard(client, uri: str, limit: int = -1) -> list[str]:
    """Expand an s3://bucket/pre*fix pattern into matching object
    URIs (S3.listWildcard): list by the prefix before the first '*',
    glob-filter client-side, paginate until `limit`."""
    bp = parse_s3_uri(uri)
    if "*" not in bp.key:
        return [uri]
    if limit < 0:
        limit = float("inf")  # type: ignore[assignment]
    star = bp.key.index("*")
    prefix, pattern = bp.key[:star], bp.key[star:]
    out: list[str] = []
    token = None
    while True:
        kwargs = {"Bucket": bp.bucket, "Prefix": prefix, "MaxKeys": 100}
        if token:
            kwargs["ContinuationToken"] = token
        resp = client.list_objects_v2(**kwargs)
        for obj in resp.get("Contents", []):
            key = obj["Key"]
            if fnmatch.fnmatchcase(key[len(prefix) :], pattern):
                out.append(f"s3://{bp.bucket}/{key}")
                if len(out) >= limit:
                    return out
        token = resp.get("NextContinuationToken")
        if not token:
            return out


def copy_object_multipart(
    client,
    src_uri: str,
    dst_uri: str,
    part_size: int = DEFAULT_PART_SIZE,
    threads: int = 8,
) -> dict:
    """Server-side S3 copy with no object-size limit
    (CopyObjectMultipart.run): single CopyObject below `part_size`,
    else UploadPartCopy byte ranges in a thread pool; the multipart
    upload is aborted if any part fails. Bytes never transit the
    client."""
    src, dst = parse_s3_uri(src_uri), parse_s3_uri(dst_uri)
    size = client.head_object(Bucket=src.bucket, Key=src.key)["ContentLength"]
    if size < part_size:
        client.copy_object(
            CopySource={"Bucket": src.bucket, "Key": src.key},
            Bucket=dst.bucket,
            Key=dst.key,
        )
        return {"parts": 1, "bytes": size, "multipart": False}

    upload_id = client.create_multipart_upload(Bucket=dst.bucket, Key=dst.key)[
        "UploadId"
    ]
    n_parts = (size + part_size - 1) // part_size

    def copy_part(p: int) -> dict:
        lo = (p - 1) * part_size
        hi = min(lo + part_size - 1, size - 1)
        resp = client.upload_part_copy(
            CopySource={"Bucket": src.bucket, "Key": src.key},
            Bucket=dst.bucket,
            Key=dst.key,
            UploadId=upload_id,
            PartNumber=p,
            CopySourceRange=f"bytes={lo}-{hi}",
        )
        return {"PartNumber": p, "ETag": resp["CopyPartResult"]["ETag"]}

    try:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            parts = list(ex.map(copy_part, range(1, n_parts + 1)))
        client.complete_multipart_upload(
            Bucket=dst.bucket,
            Key=dst.key,
            UploadId=upload_id,
            MultipartUpload={"Parts": parts},
        )
    except Exception:
        client.abort_multipart_upload(
            Bucket=dst.bucket, Key=dst.key, UploadId=upload_id
        )
        raise
    return {"parts": n_parts, "bytes": size, "multipart": True}


class S3RangeFile:
    """Seekable read-only file over S3 ranged GETs — lets pyarrow read
    parquet FOOTERS (and row groups when asked) from an object without
    downloading it. This is how the s3-copy-object ingest registers
    footer metrics for a file whose bytes never left the object store
    (the reference gets the same via Iceberg's S3InputFile)."""

    def __init__(self, client, uri: str) -> None:
        bp = parse_s3_uri(uri)
        self.client, self.bucket, self.key = client, bp.bucket, bp.key
        self._size = client.head_object(Bucket=bp.bucket, Key=bp.key)["ContentLength"]
        self._pos = 0
        self.closed = False

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        if n <= 0 or self._pos >= self._size:
            return b""
        hi = min(self._pos + n, self._size) - 1
        body = self.client.get_object(
            Bucket=self.bucket, Key=self.key, Range=f"bytes={self._pos}-{hi}"
        )["Body"]
        data = body.read()
        self._pos += len(data)
        return data

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def size(self) -> int:
        return self._size

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        self.closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def _is_precondition_failed(exc: Exception) -> bool:
    """412 PreconditionFailed from a conditional put — boto3 raises
    botocore ClientError carrying the code in exc.response."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        code = (resp.get("Error") or {}).get("Code", "")
        status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
        return code == "PreconditionFailed" or status == 412
    return False


class S3FileIO(FileIO):
    """Metadata-plane FileIO over an S3-shaped client. Paths are
    s3:// URIs. Commit linearization = conditional PutObject."""

    def __init__(self, client) -> None:
        self.client = client

    def read_text(self, path: str) -> str:
        bp = parse_s3_uri(path)
        try:
            body = self.client.get_object(Bucket=bp.bucket, Key=bp.key)["Body"]
        except Exception as e:
            if _error_code(e) in ("NoSuchKey", "404"):
                raise FileNotFoundError(path) from e
            raise
        data = body.read()
        return data.decode("utf-8") if isinstance(data, bytes) else data

    def write_atomic(self, path: str, text: str) -> None:
        bp = parse_s3_uri(path)
        # single-key PUT is atomic on S3 (readers see old or new)
        self.client.put_object(Bucket=bp.bucket, Key=bp.key, Body=text.encode())

    def create_exclusive(self, path: str, text: str) -> None:
        bp = parse_s3_uri(path)
        try:
            self.client.put_object(
                Bucket=bp.bucket, Key=bp.key, Body=text.encode(), IfNoneMatch="*"
            )
        except Exception as e:
            if _is_precondition_failed(e):
                raise FileExistsError(path) from e
            raise

    def exists(self, path: str) -> bool:
        bp = parse_s3_uri(path)
        try:
            self.client.head_object(Bucket=bp.bucket, Key=bp.key)
            return True
        except Exception as e:
            if _error_code(e) in ("404", "NoSuchKey", "NotFound"):
                return False
            raise

    def delete(self, path: str) -> None:
        bp = parse_s3_uri(path)
        self.client.delete_object(Bucket=bp.bucket, Key=bp.key)

    def mkdirs(self, path: str) -> None:
        pass  # keys are flat

    def list_dir(self, path: str) -> list[str]:
        bp = parse_s3_uri(path)
        prefix = bp.key.rstrip("/") + "/" if bp.key else ""
        names: set[str] = set()
        token = None
        while True:
            kwargs = {"Bucket": bp.bucket, "Prefix": prefix, "Delimiter": "/"}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            for obj in resp.get("Contents", []):
                names.add(obj["Key"][len(prefix) :])
            for cp in resp.get("CommonPrefixes", []):
                names.add(cp["Prefix"][len(prefix) :].rstrip("/"))
            token = resp.get("NextContinuationToken")
            if not token:
                return sorted(names)

    def walk_files(self, root: str) -> list[str]:
        bp = parse_s3_uri(root)
        prefix = bp.key.rstrip("/") + "/" if bp.key else ""
        out: list[str] = []
        token = None
        while True:
            kwargs = {"Bucket": bp.bucket, "Prefix": prefix}
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            out.extend(f"s3://{bp.bucket}/{o['Key']}" for o in resp.get("Contents", []))
            token = resp.get("NextContinuationToken")
            if not token:
                return sorted(out)

    def mtime(self, path: str) -> float:
        bp = parse_s3_uri(path)
        lm = self.client.head_object(Bucket=bp.bucket, Key=bp.key)["LastModified"]
        return lm.timestamp() if hasattr(lm, "timestamp") else float(lm)

    def size(self, path: str) -> int:
        bp = parse_s3_uri(path)
        return self.client.head_object(Bucket=bp.bucket, Key=bp.key)["ContentLength"]


def _error_code(exc: Exception) -> str:
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        code = (resp.get("Error") or {}).get("Code", "")
        if code:
            return str(code)
        status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
        if status:
            return str(status)
    return type(exc).__name__


class SqsQueuePoller(QueuePoller):
    """QueuePoller over an SQS-shaped client (the production
    transport for watch_queue; InsertWatch.java:101-154 contract)."""

    def __init__(self, client, queue_url: str) -> None:
        self.client = client
        self.queue_url = queue_url

    def receive(self, max_messages: int = 10, wait_seconds: int = 20) -> list[QueueMessage]:
        resp = self.client.receive_message(
            QueueUrl=self.queue_url,
            MaxNumberOfMessages=min(10, max_messages),  # SQS hard cap
            WaitTimeSeconds=wait_seconds,
        )
        return [
            QueueMessage(m["MessageId"], m["ReceiptHandle"], m.get("Body", ""))
            for m in resp.get("Messages", [])
        ]

    def delete(self, receipt_handles: list[str]) -> None:
        # delete_message_batch caps at 10 entries per call
        for i in range(0, len(receipt_handles), 10):
            chunk = receipt_handles[i : i + 10]
            self.client.delete_message_batch(
                QueueUrl=self.queue_url,
                Entries=[
                    {"Id": str(j), "ReceiptHandle": rh} for j, rh in enumerate(chunk)
                ],
            )
