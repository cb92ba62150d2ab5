"""GCS / Azure (ADLS & Blob) FileIO bindings behind injectable clients.

Reference parity: the reference's SchemeFileIO routes gs/abfs(s)/
wasb(s) to Iceberg's GCSFileIO / ADLSFileIO
(ice/src/main/java/com/altinity/ice/internal/iceberg/io/
SchemeFileIO.java:61-197). This module gives those schemes concrete
FileIO implementations over this engine's metadata-plane seam
(catalog/fileio.py), mirroring sources/s3.py exactly:

- The CLIENT is injectable and speaks the provider SDK's own call
  shapes (google-cloud-storage `bucket().blob()` methods; azure
  BlobServiceClient `get_blob_client` methods), so binding a real
  deployment is zero-code — pass `google.cloud.storage.Client()` or
  `BlobServiceClient.from_connection_string(...)`. The SDKs and
  credentials are absent in this environment; tests run the full
  path against in-memory fakes that enforce the providers'
  CONDITIONAL-WRITE semantics, so everything except the HTTPS call
  itself is real and covered.
- Commit linearization maps onto each store's native
  compare-and-swap primitive, the same role the conditional PUT
  plays for S3FileIO:
    * GCS: `if_generation_match=0` upload — generation 0 means "the
      object must not exist"; a losing racer gets 412
      PreconditionFailed.
    * Azure Blob/ADLS: `upload_blob(..., overwrite=False)` — an
      `If-None-Match: *` ETag condition; a losing racer gets 409
      ResourceExistsError.
  Both surface as FileExistsError, which is all the Table commit
  protocol needs (catalog/table.py CAS loop runs unmodified — pinned
  by the mixed-writer test in tests/test_cloud_io.py).

URI shapes: `gs://bucket/key` and
`abfs[s]://container@account.dfs.core.windows.net/key` (wasb[s]://
ditto with the blob endpoint) — the Hadoop/ABFS convention the
reference's docs use.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlparse

from ice_spark.catalog.fileio import FileIO

# ---------------------------------------------------------------------------
# URI parsing
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GcsPath:
    bucket: str
    key: str


def parse_gs_uri(uri: str) -> GcsPath:
    p = urlparse(uri)
    if p.scheme != "gs" or not p.netloc:
        raise ValueError(f"not a gs:// URI: {uri!r}")
    return GcsPath(p.netloc, p.path.lstrip("/"))


@dataclass(frozen=True)
class AbfsPath:
    container: str
    account: str
    key: str
    scheme: str = "abfs"


def parse_abfs_uri(uri: str) -> AbfsPath:
    p = urlparse(uri)
    if p.scheme not in ("abfs", "abfss", "wasb", "wasbs") or "@" not in p.netloc:
        raise ValueError(f"not an abfs/wasb URI: {uri!r}")
    container, _, host = p.netloc.partition("@")
    account = host.split(".", 1)[0]
    if not container or not account:
        raise ValueError(f"not an abfs/wasb URI: {uri!r}")
    return AbfsPath(container, account, p.path.lstrip("/"), p.scheme)


# ---------------------------------------------------------------------------
# error classification (duck-typed: no SDK import needed)
# ---------------------------------------------------------------------------


def _gcs_status(exc: Exception):
    # google.api_core exceptions carry the HTTP status in .code
    code = getattr(exc, "code", None)
    return code if isinstance(code, int) else None


def _azure_status(exc: Exception):
    return getattr(exc, "status_code", None)


# ---------------------------------------------------------------------------
# GCS
# ---------------------------------------------------------------------------


class GcsFileIO(FileIO):
    """Metadata-plane FileIO over a google-cloud-storage-shaped
    client. Paths are gs:// URIs. Commit linearization =
    `if_generation_match=0` upload (contingent on object absence)."""

    def __init__(self, client) -> None:
        self.client = client

    def _blob(self, path: str):
        gp = parse_gs_uri(path)
        return self.client.bucket(gp.bucket).blob(gp.key)

    def read_text(self, path: str) -> str:
        try:
            data = self._blob(path).download_as_bytes()
        except Exception as e:
            if _gcs_status(e) == 404 or type(e).__name__ == "NotFound":
                raise FileNotFoundError(path) from e
            raise
        return data.decode("utf-8") if isinstance(data, bytes) else data

    def write_atomic(self, path: str, text: str) -> None:
        # single-object upload is atomic on GCS (readers see old or new)
        self._blob(path).upload_from_string(text.encode())

    def create_exclusive(self, path: str, text: str) -> None:
        try:
            self._blob(path).upload_from_string(
                text.encode(), if_generation_match=0
            )
        except Exception as e:
            if _gcs_status(e) == 412 or type(e).__name__ == "PreconditionFailed":
                raise FileExistsError(path) from e
            raise

    def exists(self, path: str) -> bool:
        return bool(self._blob(path).exists())

    def delete(self, path: str) -> None:
        try:
            self._blob(path).delete()
        except Exception as e:
            if _gcs_status(e) == 404 or type(e).__name__ == "NotFound":
                return
            raise

    def mkdirs(self, path: str) -> None:
        pass  # keys are flat

    def list_dir(self, path: str) -> list[str]:
        gp = parse_gs_uri(path)
        prefix = gp.key.rstrip("/") + "/" if gp.key else ""
        it = self.client.list_blobs(gp.bucket, prefix=prefix, delimiter="/")
        names = {b.name[len(prefix) :] for b in it}
        names.update(p[len(prefix) :].rstrip("/") for p in getattr(it, "prefixes", ()))
        return sorted(n for n in names if n)

    def walk_files(self, root: str) -> list[str]:
        gp = parse_gs_uri(root)
        prefix = gp.key.rstrip("/") + "/" if gp.key else ""
        it = self.client.list_blobs(gp.bucket, prefix=prefix)
        return sorted(f"gs://{gp.bucket}/{b.name}" for b in it)

    def _stat(self, path: str):
        blob = self._blob(path)
        blob.reload()
        return blob

    def mtime(self, path: str) -> float:
        updated = self._stat(path).updated
        return updated.timestamp() if hasattr(updated, "timestamp") else float(updated)

    def size(self, path: str) -> int:
        return int(self._stat(path).size)


# ---------------------------------------------------------------------------
# Azure Blob / ADLS
# ---------------------------------------------------------------------------


class AdlsFileIO(FileIO):
    """Metadata-plane FileIO over an azure-storage-blob-shaped
    BlobServiceClient. Paths are abfs[s]:// or wasb[s]:// URIs
    (container@account host form). Commit linearization =
    `upload_blob(..., overwrite=False)` (If-None-Match: * ETag CAS)."""

    def __init__(self, client) -> None:
        self.client = client

    def _bc(self, path: str):
        ap = parse_abfs_uri(path)
        return self.client.get_blob_client(container=ap.container, blob=ap.key)

    def read_text(self, path: str) -> str:
        try:
            data = self._bc(path).download_blob().readall()
        except Exception as e:
            if _azure_status(e) == 404 or type(e).__name__ == "ResourceNotFoundError":
                raise FileNotFoundError(path) from e
            raise
        return data.decode("utf-8") if isinstance(data, bytes) else data

    def write_atomic(self, path: str, text: str) -> None:
        self._bc(path).upload_blob(text.encode(), overwrite=True)

    def create_exclusive(self, path: str, text: str) -> None:
        try:
            self._bc(path).upload_blob(text.encode(), overwrite=False)
        except Exception as e:
            if _azure_status(e) == 409 or type(e).__name__ == "ResourceExistsError":
                raise FileExistsError(path) from e
            raise

    def exists(self, path: str) -> bool:
        return bool(self._bc(path).exists())

    def delete(self, path: str) -> None:
        try:
            self._bc(path).delete_blob()
        except Exception as e:
            if _azure_status(e) == 404 or type(e).__name__ == "ResourceNotFoundError":
                return
            raise

    def mkdirs(self, path: str) -> None:
        pass  # keys are flat

    def _list(self, path: str):
        ap = parse_abfs_uri(path)
        prefix = ap.key.rstrip("/") + "/" if ap.key else ""
        cc = self.client.get_container_client(ap.container)
        return ap, prefix, cc.list_blobs(name_starts_with=prefix)

    def list_dir(self, path: str) -> list[str]:
        _, prefix, blobs = self._list(path)
        names: set[str] = set()
        for b in blobs:
            rest = b.name[len(prefix) :]
            names.add(rest.split("/", 1)[0])
        return sorted(n for n in names if n)

    def walk_files(self, root: str) -> list[str]:
        ap, _, blobs = self._list(root)
        host = {
            "abfs": "dfs",
            "abfss": "dfs",
            "wasb": "blob",
            "wasbs": "blob",
        }[ap.scheme]
        return sorted(
            f"{ap.scheme}://{ap.container}@{ap.account}.{host}.core.windows.net/{b.name}"
            for b in blobs
        )

    def mtime(self, path: str) -> float:
        lm = self._bc(path).get_blob_properties().last_modified
        return lm.timestamp() if hasattr(lm, "timestamp") else float(lm)

    def size(self, path: str) -> int:
        return int(self._bc(path).get_blob_properties().size)


# ---------------------------------------------------------------------------
# ingest-source fetchers (fetch.register_scheme seam, like s3_fetcher)
# ---------------------------------------------------------------------------


def gcs_fetcher(client):
    """Adapt a google-cloud-storage client into an input fetcher:
    `register_scheme("gs", gcs_fetcher(client))`."""

    def fetch(url: str, out) -> None:
        gp = parse_gs_uri(url)
        out.write(client.bucket(gp.bucket).blob(gp.key).download_as_bytes())

    return fetch


def adls_fetcher(client):
    """Adapt an azure BlobServiceClient into an input fetcher:
    `register_scheme("abfs", adls_fetcher(client))` (and abfss/
    wasb/wasbs as needed)."""

    def fetch(url: str, out) -> None:
        ap = parse_abfs_uri(url)
        bc = client.get_blob_client(container=ap.container, blob=ap.key)
        out.write(bc.download_blob().readall())

    return fetch
