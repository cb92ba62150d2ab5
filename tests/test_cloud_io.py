"""GCS / Azure FileIO bindings (sources/cloud_io.py).

Reference parity: SchemeFileIO.java:61-197 routes gs/abfs(s)/wasb(s)
to Iceberg's GCSFileIO/ADLSFileIO. The real SDKs are absent in this
environment, so — exactly like the S3 suite — the tests run the full
path against in-memory fakes that speak the provider SDKs' own call
shapes AND enforce their conditional-write semantics (GCS
if_generation_match=0 → 412; Azure overwrite=False → 409). The
commit-protocol test proves the catalog's CAS loop runs unmodified
over each store.
"""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import types as T

from ice_spark.sources.cloud_io import (
    AdlsFileIO,
    GcsFileIO,
    adls_fetcher,
    gcs_fetcher,
    parse_abfs_uri,
    parse_gs_uri,
)

# ---------------------------------------------------------------------------
# fakes speaking the real SDK call shapes
# ---------------------------------------------------------------------------


class _GcsError(Exception):
    def __init__(self, code):
        super().__init__(f"http {code}")
        self.code = code


class FakeGcsBlob:
    def __init__(self, store, bucket, name):
        self._store, self._bucket, self.name = store, bucket, name
        self.size = None
        self.updated = None

    def _key(self):
        return (self._bucket, self.name)

    def download_as_bytes(self):
        try:
            return self._store[self._key()][0]
        except KeyError:
            raise _GcsError(404) from None

    def upload_from_string(self, data, if_generation_match=None):
        with_lock = self._store_lock()
        with with_lock:
            if if_generation_match == 0 and self._key() in self._store:
                raise _GcsError(412)
            self._store[self._key()] = (data, time.time())

    def _store_lock(self):
        return _FAKE_LOCK

    def exists(self):
        return self._key() in self._store

    def delete(self):
        if self._key() not in self._store:
            raise _GcsError(404)
        del self._store[self._key()]

    def reload(self):
        try:
            data, ts = self._store[self._key()]
        except KeyError:
            raise _GcsError(404) from None
        self.size, self.updated = len(data), ts


_FAKE_LOCK = threading.Lock()


class FakeGcsBucket:
    def __init__(self, store, name):
        self._store, self._name = store, name

    def blob(self, key):
        return FakeGcsBlob(self._store, self._name, key)


class _GcsListing(list):
    prefixes: set


class FakeGcsClient:
    def __init__(self):
        self.store: dict = {}

    def bucket(self, name):
        return FakeGcsBucket(self.store, name)

    def list_blobs(self, bucket, prefix="", delimiter=None):
        out = _GcsListing()
        out.prefixes = set()
        for (b, k), _ in sorted(self.store.items()):
            if b != bucket or not k.startswith(prefix):
                continue
            rest = k[len(prefix) :]
            if delimiter and delimiter in rest:
                out.prefixes.add(prefix + rest.split(delimiter, 1)[0] + delimiter)
            else:
                out.append(FakeGcsBlob(self.store, b, k))
        return out


class _AzureError(Exception):
    def __init__(self, code):
        super().__init__(f"http {code}")
        self.status_code = code


class _AzureDownload:
    def __init__(self, data):
        self._data = data

    def readall(self):
        return self._data


class _AzureProps:
    def __init__(self, name, size, last_modified):
        self.name, self.size, self.last_modified = name, size, last_modified


class FakeAzureBlobClient:
    def __init__(self, store, container, blob):
        self._store, self._container, self._blob = store, container, blob

    def _key(self):
        return (self._container, self._blob)

    def download_blob(self):
        try:
            return _AzureDownload(self._store[self._key()][0])
        except KeyError:
            raise _AzureError(404) from None

    def upload_blob(self, data, overwrite=False):
        with _FAKE_LOCK:
            if not overwrite and self._key() in self._store:
                raise _AzureError(409)
            self._store[self._key()] = (data, time.time())

    def exists(self):
        return self._key() in self._store

    def delete_blob(self):
        if self._key() not in self._store:
            raise _AzureError(404)
        del self._store[self._key()]

    def get_blob_properties(self):
        try:
            data, ts = self._store[self._key()]
        except KeyError:
            raise _AzureError(404) from None
        return _AzureProps(self._blob, len(data), ts)


class FakeAzureContainerClient:
    def __init__(self, store, container):
        self._store, self._container = store, container

    def list_blobs(self, name_starts_with=""):
        return [
            _AzureProps(k, len(d), ts)
            for (c, k), (d, ts) in sorted(self._store.items())
            if c == self._container and k.startswith(name_starts_with)
        ]


class FakeAzureServiceClient:
    def __init__(self):
        self.store: dict = {}

    def get_blob_client(self, container, blob):
        return FakeAzureBlobClient(self.store, container, blob)

    def get_container_client(self, container):
        return FakeAzureContainerClient(self.store, container)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_uri_parsing():
    gp = parse_gs_uri("gs://bkt/a/b.json")
    assert (gp.bucket, gp.key) == ("bkt", "a/b.json")
    ap = parse_abfs_uri("abfss://cont@acct.dfs.core.windows.net/t/metadata/v1.json")
    assert (ap.container, ap.account, ap.key) == ("cont", "acct", "t/metadata/v1.json")
    assert parse_abfs_uri("wasb://c@a.blob.core.windows.net/k").scheme == "wasb"
    for bad in ("s3://b/k", "gs://", "abfs://nohost/k"):
        with pytest.raises(ValueError):
            parse_gs_uri(bad) if bad.startswith("gs") else parse_abfs_uri(bad)


FIO_CASES = [
    ("gs", lambda: GcsFileIO(FakeGcsClient()), "gs://b/t"),
    (
        "abfs",
        lambda: AdlsFileIO(FakeAzureServiceClient()),
        "abfs://c@acct.dfs.core.windows.net/t",
    ),
]


@pytest.mark.parametrize("name,mk,root", FIO_CASES, ids=[c[0] for c in FIO_CASES])
def test_fileio_contract(name, mk, root):
    """Same contract the S3 suite pins: roundtrip, CAS single-winner,
    listing with subdirectories, stat, delete semantics."""
    fio = mk()
    fio.write_atomic(f"{root}/metadata/v1.metadata.json", "{}")
    assert fio.read_text(f"{root}/metadata/v1.metadata.json") == "{}"
    assert fio.exists(f"{root}/metadata/v1.metadata.json")
    fio.create_exclusive(f"{root}/metadata/v2.metadata.json", "a")
    with pytest.raises(FileExistsError):
        fio.create_exclusive(f"{root}/metadata/v2.metadata.json", "b")
    assert fio.read_text(f"{root}/metadata/v2.metadata.json") == "a"
    assert fio.list_dir(f"{root}/metadata") == [
        "v1.metadata.json",
        "v2.metadata.json",
    ]
    fio.write_atomic(f"{root}/data/Year=2020/f1.parquet", "x")
    fio.write_atomic(f"{root}/data/top.parquet", "x")
    assert fio.list_dir(f"{root}/data") == ["Year=2020", "top.parquet"]
    walked = fio.walk_files(f"{root}/data")
    assert len(walked) == 2 and all(w.startswith(name) for w in walked)
    assert fio.size(f"{root}/metadata/v1.metadata.json") == 2
    assert fio.mtime(f"{root}/metadata/v1.metadata.json") > 0
    fio.delete(f"{root}/metadata/v1.metadata.json")
    assert not fio.exists(f"{root}/metadata/v1.metadata.json")
    with pytest.raises(FileNotFoundError):
        fio.read_text(f"{root}/metadata/v1.metadata.json")
    fio.delete(f"{root}/metadata/v1.metadata.json")  # idempotent


@pytest.mark.parametrize("name,mk,root", FIO_CASES, ids=[c[0] for c in FIO_CASES])
def test_table_commit_protocol(name, mk, root, spark):
    """The catalog's CAS commit loop runs unmodified over each cloud
    FileIO: two writer handles, interleaved appends, every snapshot
    lands exactly once (the property the reference delegates to
    Iceberg's GCSFileIO/ADLSFileIO + catalog CAS)."""
    from ice_spark.catalog.table import Table

    fio = mk()
    t = Table.create(
        spark,
        f"{root}/ns/tab",
        T.StructType([T.StructField("id", T.LongType())]),
        io=fio,
    )
    t.append_snapshot(
        [
            {
                "path": f"{root}/ns/tab/data/a.parquet",
                "partition": {},
                "records": 5,
                "size_bytes": 10,
                "schema_version": 1,
                "external": True,
            }
        ],
        operation="append",
    )
    t2 = Table(spark, f"{root}/ns/tab", io=fio).refresh()
    t2.append_snapshot(
        [
            {
                "path": f"{root}/ns/tab/data/b.parquet",
                "partition": {},
                "records": 7,
                "size_bytes": 10,
                "schema_version": 1,
                "external": True,
            }
        ],
        operation="append",
    )
    t.refresh()
    assert len(t.snapshots()) == 2
    assert sum(e["records"] for e in t.files()) == 12


def test_cas_single_winner_under_contention():
    """8 threads race create_exclusive on one key per store — exactly
    one winner, everyone else FileExistsError."""
    for _, mk, root in FIO_CASES:
        fio = mk()
        wins, losses = [], []

        def worker(i, fio=fio, root=root):
            try:
                fio.create_exclusive(f"{root}/m/v7.json", f"writer-{i}")
                wins.append(i)
            except FileExistsError:
                losses.append(i)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        assert len(wins) == 1 and len(losses) == 7
        assert fio.read_text(f"{root}/m/v7.json") == f"writer-{wins[0]}"


def test_fetchers_feed_ingest_cache(tmp_path):
    """gs:// and abfs:// inputs resolve through the same cached-fetch
    seam as s3 (fetch.register_scheme)."""
    from ice_spark.sources.fetch import register_scheme, resolve_input, unregister_scheme

    gcs = FakeGcsClient()
    GcsFileIO(gcs).write_atomic("gs://b/in/doc.parquet", "GDATA")
    az = FakeAzureServiceClient()
    AdlsFileIO(az).write_atomic(
        "abfs://c@a.dfs.core.windows.net/in/doc.parquet", "ADATA"
    )
    register_scheme("gs", gcs_fetcher(gcs))
    register_scheme("abfs", adls_fetcher(az))
    try:
        p1 = resolve_input("gs://b/in/doc.parquet", cache_dir=str(tmp_path / "c1"))
        assert open(p1).read() == "GDATA"
        p2 = resolve_input(
            "abfs://c@a.dfs.core.windows.net/in/doc.parquet",
            cache_dir=str(tmp_path / "c2"),
        )
        assert open(p2).read() == "ADATA"
        # cache hit: same local path, no second download
        assert resolve_input("gs://b/in/doc.parquet", cache_dir=str(tmp_path / "c1")) == p1
    finally:
        unregister_scheme("gs")
        unregister_scheme("abfs")
