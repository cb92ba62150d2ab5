"""S3/SQS bindings over a boto3-shaped fake client: wildcard listing,
multipart server-side copy, FileIO CAS commit protocol, ranged-GET
footer reads, SQS poller, and the s3-copy-object ingest end to end
(S3.java:27-96, CopyObjectMultipart.java:36-133, Insert.java:529-554
parity — everything but the AWS SDK call itself)."""

from __future__ import annotations

import datetime
import io

import pytest

from ice_spark.sources.s3 import (
    S3FileIO,
    S3RangeFile,
    SqsQueuePoller,
    copy_object_multipart,
    list_wildcard,
    parse_s3_uri,
)


class FakeClientError(Exception):
    def __init__(self, code: str, status: int):
        super().__init__(code)
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    """Dict-backed S3 with the exact boto3 call shapes the bindings
    use; counts ops so tests can assert no-byte-transit properties."""

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.mtimes: dict[tuple[str, str], datetime.datetime] = {}
        self.ops: list[str] = []
        self.uploads: dict[str, dict] = {}
        self._uid = 0

    def _key(self, b, k):
        return (b, k)

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        self.ops.append("put")
        if IfNoneMatch == "*" and (Bucket, Key) in self.objects:
            raise FakeClientError("PreconditionFailed", 412)
        data = Body if isinstance(Body, bytes) else Body.encode()
        self.objects[(Bucket, Key)] = data
        self.mtimes[(Bucket, Key)] = datetime.datetime.now(datetime.timezone.utc)
        return {}

    def get_object(self, Bucket, Key, Range=None):
        self.ops.append("get")
        if (Bucket, Key) not in self.objects:
            raise FakeClientError("NoSuchKey", 404)
        data = self.objects[(Bucket, Key)]
        if Range:
            spec = Range.removeprefix("bytes=")
            lo, hi = (int(x) for x in spec.split("-"))
            data = data[lo : hi + 1]
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket, Key):
        self.ops.append("head")
        if (Bucket, Key) not in self.objects:
            raise FakeClientError("404", 404)
        return {
            "ContentLength": len(self.objects[(Bucket, Key)]),
            "LastModified": self.mtimes.get(
                (Bucket, Key), datetime.datetime.now(datetime.timezone.utc)
            ),
        }

    def delete_object(self, Bucket, Key):
        self.ops.append("delete")
        self.objects.pop((Bucket, Key), None)
        return {}

    def copy_object(self, CopySource, Bucket, Key):
        self.ops.append("copy")
        src = (CopySource["Bucket"], CopySource["Key"])
        if src not in self.objects:
            raise FakeClientError("NoSuchKey", 404)
        self.objects[(Bucket, Key)] = self.objects[src]
        self.mtimes[(Bucket, Key)] = datetime.datetime.now(datetime.timezone.utc)
        return {}

    def create_multipart_upload(self, Bucket, Key):
        self.ops.append("create_mpu")
        self._uid += 1
        uid = f"u{self._uid}"
        self.uploads[uid] = {"dst": (Bucket, Key), "parts": {}}
        return {"UploadId": uid}

    def upload_part_copy(
        self, CopySource, Bucket, Key, UploadId, PartNumber, CopySourceRange
    ):
        self.ops.append("part_copy")
        src = self.objects[(CopySource["Bucket"], CopySource["Key"])]
        spec = CopySourceRange.removeprefix("bytes=")
        lo, hi = (int(x) for x in spec.split("-"))
        self.uploads[UploadId]["parts"][PartNumber] = src[lo : hi + 1]
        return {"CopyPartResult": {"ETag": f"etag-{PartNumber}"}}

    def complete_multipart_upload(self, Bucket, Key, UploadId, MultipartUpload):
        self.ops.append("complete_mpu")
        up = self.uploads.pop(UploadId)
        nums = [p["PartNumber"] for p in MultipartUpload["Parts"]]
        assert nums == sorted(nums)
        self.objects[(Bucket, Key)] = b"".join(
            up["parts"][n] for n in sorted(up["parts"])
        )
        self.mtimes[(Bucket, Key)] = datetime.datetime.now(datetime.timezone.utc)
        return {}

    def abort_multipart_upload(self, Bucket, Key, UploadId):
        self.ops.append("abort_mpu")
        self.uploads.pop(UploadId, None)
        return {}

    def list_objects_v2(
        self, Bucket, Prefix="", Delimiter=None, MaxKeys=1000, ContinuationToken=None
    ):
        self.ops.append("list")
        keys = sorted(k for b, k in self.objects if b == Bucket and k.startswith(Prefix))
        start = int(ContinuationToken) if ContinuationToken else 0
        contents, prefixes = [], set()
        i = start
        while i < len(keys) and len(contents) + len(prefixes) < MaxKeys:
            k = keys[i]
            if Delimiter:
                rest = k[len(Prefix) :]
                if Delimiter in rest:
                    prefixes.add(Prefix + rest.split(Delimiter, 1)[0] + Delimiter)
                    i += 1
                    continue
            contents.append({"Key": k, "Size": len(self.objects[(Bucket, k)])})
            i += 1
        resp = {"Contents": contents}
        if prefixes:
            resp["CommonPrefixes"] = [{"Prefix": p} for p in sorted(prefixes)]
        if i < len(keys):
            resp["NextContinuationToken"] = str(i)
        return resp


class TestUriAndListing:
    def test_parse(self):
        assert parse_s3_uri("s3://b/a/c.parquet").key == "a/c.parquet"
        assert parse_s3_uri("s3://b").key == ""
        assert parse_s3_uri("s3a://b/k").bucket == "b"  # s3a normalized
        with pytest.raises(ValueError):
            parse_s3_uri("/local/path")

    def test_wildcard(self):
        c = FakeS3Client()
        for k in ["in/a1.parquet", "in/a2.parquet", "in/b.csv", "other/a3.parquet"]:
            c.put_object(Bucket="b", Key=k, Body=b"x")
        got = list_wildcard(c, "s3://b/in/a*.parquet")
        assert got == ["s3://b/in/a1.parquet", "s3://b/in/a2.parquet"]
        assert list_wildcard(c, "s3://b/in/a*.parquet", limit=1) == [
            "s3://b/in/a1.parquet"
        ]
        # no wildcard -> identity, no listing round-trip
        assert list_wildcard(c, "s3://b/in/b.csv") == ["s3://b/in/b.csv"]

    def test_wildcard_paginates(self):
        c = FakeS3Client()
        for i in range(250):
            c.put_object(Bucket="b", Key=f"p/f{i:04d}.parquet", Body=b"x")
        got = list_wildcard(c, "s3://b/p/*.parquet")
        assert len(got) == 250  # crossed 100-key pages


class TestCopyObjectMultipart:
    def test_small_object_single_copy(self):
        c = FakeS3Client()
        c.put_object(Bucket="src", Key="k", Body=b"hello world")
        res = copy_object_multipart(c, "s3://src/k", "s3://dst/k2", part_size=1024)
        assert res == {"parts": 1, "bytes": 11, "multipart": False}
        assert c.objects[("dst", "k2")] == b"hello world"
        assert "copy" in c.ops and "create_mpu" not in c.ops

    def test_large_object_multipart_ranges(self):
        c = FakeS3Client()
        data = bytes(range(256)) * 40  # 10240 bytes
        c.put_object(Bucket="src", Key="big", Body=data)
        res = copy_object_multipart(
            c, "s3://src/big", "s3://dst/big", part_size=4096, threads=4
        )
        assert res["multipart"] and res["parts"] == 3
        assert c.objects[("dst", "big")] == data  # byte-exact reassembly
        assert "copy" not in c.ops  # no single-shot path
        assert not c.uploads  # completed, not leaked

    def test_failed_part_aborts_upload(self):
        c = FakeS3Client()
        c.put_object(Bucket="src", Key="big", Body=b"x" * 10000)

        real = c.upload_part_copy

        def flaky(**kw):
            if kw["PartNumber"] == 2:
                raise FakeClientError("InternalError", 500)
            return real(**kw)

        c.upload_part_copy = flaky
        with pytest.raises(FakeClientError):
            copy_object_multipart(
                c, "s3://src/big", "s3://dst/big", part_size=4096, threads=1
            )
        assert "abort_mpu" in c.ops
        assert not c.uploads  # aborted upload cleaned up
        assert ("dst", "big") not in c.objects


class TestS3FileIO:
    def test_roundtrip_and_cas(self):
        c = FakeS3Client()
        fio = S3FileIO(c)
        fio.write_atomic("s3://b/t/metadata/v1.metadata.json", "{}")
        assert fio.read_text("s3://b/t/metadata/v1.metadata.json") == "{}"
        assert fio.exists("s3://b/t/metadata/v1.metadata.json")
        fio.create_exclusive("s3://b/t/metadata/v2.metadata.json", "{'a':1}")
        # second conditional put on the same key = commit conflict
        with pytest.raises(FileExistsError):
            fio.create_exclusive("s3://b/t/metadata/v2.metadata.json", "{'b':2}")
        assert fio.read_text("s3://b/t/metadata/v2.metadata.json") == "{'a':1}"
        assert sorted(fio.list_dir("s3://b/t/metadata")) == [
            "v1.metadata.json",
            "v2.metadata.json",
        ]
        assert fio.size("s3://b/t/metadata/v1.metadata.json") == 2
        assert fio.mtime("s3://b/t/metadata/v1.metadata.json") > 0
        fio.delete("s3://b/t/metadata/v1.metadata.json")
        assert not fio.exists("s3://b/t/metadata/v1.metadata.json")
        with pytest.raises(FileNotFoundError):
            fio.read_text("s3://b/t/metadata/v1.metadata.json")

    def test_list_dir_subdirs(self):
        c = FakeS3Client()
        fio = S3FileIO(c)
        fio.write_atomic("s3://b/t/data/Year=2020/f1.parquet", "x")
        fio.write_atomic("s3://b/t/data/Year=2021/f2.parquet", "x")
        fio.write_atomic("s3://b/t/data/top.parquet", "x")
        assert fio.list_dir("s3://b/t/data") == [
            "Year=2020",
            "Year=2021",
            "top.parquet",
        ]
        assert fio.walk_files("s3://b/t/data") == [
            "s3://b/t/data/Year=2020/f1.parquet",
            "s3://b/t/data/Year=2021/f2.parquet",
            "s3://b/t/data/top.parquet",
        ]

    def test_table_commit_protocol_over_s3(self, spark):
        """The catalog's full CAS commit loop runs unmodified over the
        S3 FileIO: two writers, one key, exactly one winner per
        version — the property the reference gets from its REST
        catalog's etcd CAS, here from conditional PUT."""
        from pyspark.sql import types as T

        from ice_spark.catalog.table import Table

        c = FakeS3Client()
        fio = S3FileIO(c)
        t = Table.create(
            spark,
            "s3://wh/ns/t",
            T.StructType([T.StructField("id", T.LongType())]),
            io=fio,
        )
        t.append_snapshot(
            [{"path": "s3://wh/ns/t/data/a.parquet", "partition": {}, "records": 5,
              "size_bytes": 10, "schema_version": 1, "external": True}],
            operation="append",
        )
        t2 = Table(spark, "s3://wh/ns/t", io=fio).refresh()
        t2.append_snapshot(
            [{"path": "s3://wh/ns/t/data/b.parquet", "partition": {}, "records": 7,
              "size_bytes": 10, "schema_version": 1, "external": True}],
            operation="append",
        )
        t.refresh()
        assert len(t.snapshots()) == 2
        assert sum(e["records"] for e in t.files()) == 12


class TestS3RangeFile:
    def test_parquet_footer_via_ranged_gets(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        src = str(tmp_path / "p.parquet")
        spark.range(0, 1000).selectExpr("id", "id * 2 as v").coalesce(
            1
        ).write.parquet(src)
        local = glob.glob(src + "/*.parquet")[0]
        with open(local, "rb") as f:
            data = f.read()
        c = FakeS3Client()
        c.put_object(Bucket="b", Key="p.parquet", Body=data)
        pf = pq.ParquetFile(S3RangeFile(c, "s3://b/p.parquet"))
        assert pf.metadata.num_rows == 1000
        assert [f.name for f in pf.schema_arrow] == ["id", "v"]
        # footer read must NOT have fetched the whole object
        total_get_bytes = sum(1 for op in c.ops if op == "get")
        assert total_get_bytes < 10  # a handful of ranged GETs


class TestSqsPoller:
    def test_receive_delete_shapes(self):
        class FakeSqs:
            def __init__(self):
                self.msgs = [
                    {"MessageId": f"m{i}", "ReceiptHandle": f"r{i}", "Body": "{}"}
                    for i in range(25)
                ]
                self.deleted = []
                self.receive_caps = []

            def receive_message(self, QueueUrl, MaxNumberOfMessages, WaitTimeSeconds):
                self.receive_caps.append(MaxNumberOfMessages)
                out, self.msgs = self.msgs[:MaxNumberOfMessages], self.msgs[MaxNumberOfMessages:]
                return {"Messages": out}

            def delete_message_batch(self, QueueUrl, Entries):
                assert len(Entries) <= 10  # SQS batch cap
                self.deleted.extend(e["ReceiptHandle"] for e in Entries)
                return {}

        sqs = FakeSqs()
        p = SqsQueuePoller(sqs, "https://sqs/q")
        got = p.receive(max_messages=99)  # clamped to the SQS cap of 10
        assert len(got) == 10 and sqs.receive_caps == [10]
        p.delete([m.receipt_handle for m in got] + ["r-extra"] * 5)
        assert len(sqs.deleted) == 15  # chunked into <=10 batches


class TestS3CopyObjectIngest:
    def test_end_to_end_on_fake_s3(self, spark, tmp_path):
        """insert(s3_copy_object=True) against a fake object store:
        metadata commits via conditional PUT, data bytes move by
        server-side copy only, footer metrics come from ranged GETs."""
        import glob

        from pyspark.sql import types as T

        from ice_spark.catalog.table import Table
        from ice_spark.ingest.insert import insert

        src_dir = str(tmp_path / "src.parquet")
        spark.range(0, 500).selectExpr("id", "id * 3 as v").coalesce(1).write.parquet(
            src_dir
        )
        with open(glob.glob(src_dir + "/*.parquet")[0], "rb") as f:
            data = f.read()
        c = FakeS3Client()
        c.put_object(Bucket="in", Key="drop/f1.parquet", Body=data)
        fio = S3FileIO(c)
        t = Table.create(
            spark,
            "s3://wh/ns/t",
            T.StructType(
                [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
            ),
            io=fio,
        )
        res = insert(
            t, ["s3://in/drop/f1.parquet"], s3_copy_object=True, s3_client=c
        )
        assert res["added"] == 1
        t.refresh()
        [e] = t.files()
        # RELATIVE path: consumers resolve against table.location, so
        # an absolute URI here would be double-joined on read/expiry
        assert e["path"].startswith("data/") and e["path"].endswith(".parquet")
        assert e["records"] == 500
        assert e["size_bytes"] == len(data)
        assert e["column_metrics"]["id"]["min"] == 0
        assert e["column_metrics"]["id"]["max"] == 499
        assert ("wh", f"ns/t/{e['path']}") in c.objects
        assert "copy" in c.ops  # server-side copy happened

    def test_rejects_non_s3(self, spark, tmp_path):
        from pyspark.sql import types as T

        from ice_spark.catalog import Catalog
        from ice_spark.ingest.insert import insert

        cat = Catalog(spark, str(tmp_path / "wh"))
        cat.create_namespace("ns")
        t = cat.create_table(
            "ns.local", schema=T.StructType([T.StructField("id", T.LongType())])
        )
        with pytest.raises(ValueError, match="only supported between s3:// buckets"):
            insert(t, ["s3://in/f.parquet"], s3_copy_object=True, s3_client=object())
        with pytest.raises(ValueError, match="only supported between s3:// buckets"):
            insert(t, ["/local/f.parquet"], s3_copy_object=True, s3_client=object())
