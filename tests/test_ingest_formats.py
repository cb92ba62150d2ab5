"""CSV/JSON ingestion (beyond-reference: the reference hardcodes
Parquet, Insert.java:658-665). Data always lands as Parquet; the
schema gate still applies to inferred input schemas."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from ice_spark.catalog import Catalog
from ice_spark.ingest import insert

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("ns")
    return c


def test_csv_ingest(cat, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,score\n1,alpha,0.5\n2,beta,1.5\n")
    t = cat.create_table("ns.c", schema=SCHEMA)
    res = insert(t, [str(p)], input_format="csv")
    assert res["added"] >= 1
    rows = {(r.id, r.name, r.score) for r in t.read().collect()}
    assert rows == {(1, "alpha", 0.5), (2, "beta", 1.5)}
    # table data files are parquet regardless of input format
    assert all(e["path"].endswith(".parquet") for e in t.files())


def test_json_ingest_and_gate(cat, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(json.dumps(d) for d in [{"id": 3, "name": "c", "score": 2.0}]) + "\n"
    )
    t = cat.create_table("ns.j", schema=SCHEMA)
    insert(t, [str(p)], input_format="json")
    assert t.read().count() == 1
    # extra field not in the table schema must be rejected by the gate
    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"id": 4, "name": "d", "score": 0.0, "extra": 1}) + "\n")
    with pytest.raises(Exception, match="extra|not in table|incompatible"):
        insert(t, [str(bad)], input_format="json")


AVRO_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ],
}

AVRO_ROWS = [
    {"id": 1, "name": "alpha", "score": 0.5},
    {"id": 2, "name": None, "score": 1.5},
    {"id": 3, "name": "gamma", "score": -2.0},
]


def test_avro_read_input_decodes_through_own_codec(spark, tmp_path):
    """--format avro runs the repo's pure-Python Avro codec
    EXECUTOR-side (binaryFile + mapInPandas); nullable unions map to
    nullable Spark fields."""
    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import write_container

    p = tmp_path / "in.avro"
    write_container(str(p), AVRO_SCHEMA, AVRO_ROWS)
    df = read_input(spark, str(p), "avro")
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    assert df.schema["name"].nullable
    rows = {(r.id, r.name, r.score) for r in df.collect()}
    assert rows == {(1, "alpha", 0.5), (2, None, 1.5), (3, "gamma", -2.0)}


def test_avro_ingest_end_to_end(cat, tmp_path):
    from ice_spark.sources.avro_io import write_container

    p = tmp_path / "in.avro"
    write_container(str(p), AVRO_SCHEMA, AVRO_ROWS)
    t = cat.create_table("ns.a", schema=SCHEMA)
    res = insert(t, [str(p)], input_format="avro")
    assert res["added"] >= 1
    rows = {(r.id, r.name, r.score) for r in t.read().collect()}
    assert rows == {(1, "alpha", 0.5), (2, None, 1.5), (3, "gamma", -2.0)}
    assert all(e["path"].endswith(".parquet") for e in t.files())


def test_avro_complex_types_round_trip(spark, tmp_path):
    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import write_container

    schema = {
        "type": "record",
        "name": "c",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "vals", "type": {"type": "array", "items": "double"}},
            {"name": "props", "type": {"type": "map", "values": "string"}},
        ],
    }
    rows = [
        {"id": 1, "vals": [1.0, 2.5], "props": {"a": "x"}},
        {"id": 2, "vals": [], "props": {}},
    ]
    p = tmp_path / "c.avro"
    write_container(str(p), schema, rows)
    got = {
        (r.id, tuple(r.vals), tuple(sorted(r.props.items())))
        for r in read_input(spark, str(p), "avro").collect()
    }
    assert got == {(1, (1.0, 2.5), (("a", "x"),)), (2, (), ())}


def test_avro_export_round_trips_through_ingest(cat, spark, tmp_path):
    """export_avro writes container shards executor-side through the
    same codec; re-ingesting them reproduces the table exactly."""
    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import export_avro, read_container, write_container

    src = tmp_path / "seed.avro"
    write_container(str(src), AVRO_SCHEMA, AVRO_ROWS)
    t = cat.create_table("ns.x", schema=SCHEMA)
    insert(t, [str(src)], input_format="avro")

    dest = tmp_path / "out_avro"
    n = export_avro(t.read(), str(dest))
    assert n >= 1
    shards = sorted(dest.glob("part-*.avro"))
    assert len(shards) == n
    # codec-level read back
    got = []
    for s in shards:
        _, _, recs = read_container(str(s))
        got.extend((r["id"], r["name"], r["score"]) for r in recs)
    assert sorted(got) == [(1, "alpha", 0.5), (2, None, 1.5), (3, "gamma", -2.0)]
    # and the exported shards are themselves ingestable
    df = read_input(spark, str(dest / "part-*.avro"), "avro")
    assert df.count() == 3


def test_no_copy_rejects_non_parquet(cat, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("id,name,score\n1,a,0.0\n")
    t = cat.create_table("ns.n", schema=SCHEMA)
    with pytest.raises(ValueError, match="no_copy requires parquet"):
        insert(t, [str(p)], input_format="csv", no_copy=True, force_no_copy=True)


def test_scheme_routing(tmp_path):
    import io

    from ice_spark.sources.fetch import resolve_input

    # file:// and plain paths pass through
    assert resolve_input("/x/y.parquet") == "/x/y.parquet"
    assert resolve_input("file:///x/y.parquet") == "/x/y.parquet"

    # http(s) downloads through the injected opener and caches by url
    calls = []

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(url):
        calls.append(url)
        return _Resp(b"PARQUETBYTES")

    cache = str(tmp_path / "cache")
    p1 = resolve_input("http://example.com/data/f.parquet", cache_dir=cache, opener=opener)
    assert open(p1, "rb").read() == b"PARQUETBYTES"
    assert p1.endswith("-f.parquet")
    # cached: second resolve does not re-download
    p2 = resolve_input("http://example.com/data/f.parquet", cache_dir=cache, opener=opener)
    assert p2 == p1 and len(calls) == 1
    # different url -> different cache entry
    p3 = resolve_input("http://example.com/data/g.parquet", cache_dir=cache, opener=opener)
    assert p3 != p1 and len(calls) == 2

    with pytest.raises(ValueError, match="requires a bound client"):
        resolve_input("s3://bucket/k.parquet")
    with pytest.raises(ValueError, match="unsupported input scheme"):
        resolve_input("gopher://bucket/k.parquet")


def test_preserve_original_file_naming(cat, tmp_path, spark):
    """PRESERVE_ORIGINAL naming on the copy path
    (Insert.DataFileNamingStrategy, Insert.java:835-881)."""
    import glob
    import os
    import shutil

    from ice_spark.catalog.table import Table

    stage = str(tmp_path / "stage")
    spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5)], schema=SCHEMA
    ).coalesce(1).write.parquet(stage)
    src = glob.glob(stage + "/*.parquet")[0]
    named = str(tmp_path / "batch-0001.parquet")
    shutil.copy(src, named)

    t = cat.create_table("ns.preserve", schema=SCHEMA)
    insert(t, [named], file_naming="preserve")
    paths = [e["path"] for e in t.files()]
    assert paths == ["data/batch-0001.parquet"]
    assert t.read().count() == 2

    # collision with the existing target is an error, not a rename
    named2 = str(tmp_path / "copy2" )
    os.makedirs(named2)
    named2 = os.path.join(named2, "batch-0001.parquet")
    shutil.copy(src, named2)
    with pytest.raises(Exception, match="collision|already ingested"):
        insert(t, [named2], file_naming="preserve", force_duplicates=True)
    # default naming unaffected
    insert(t, [named2], force_duplicates=True)
    assert t.read().count() == 4


def test_s3_scheme_seam(cat, tmp_path, spark):
    """s3:// routing: full path exercised with a fake boto3-shaped
    client (download_fileobj); unbound scheme raises instructively."""
    import glob

    from ice_spark.sources.fetch import (
        register_scheme,
        resolve_input,
        s3_fetcher,
        unregister_scheme,
    )

    stage = str(tmp_path / "stage")
    spark.createDataFrame([(1, "a", 0.5)], schema=SCHEMA).coalesce(1).write.parquet(
        stage
    )
    src = glob.glob(stage + "/*.parquet")[0]

    with pytest.raises(ValueError, match="requires a bound client"):
        resolve_input("s3://bucket/key.parquet", cache_dir=str(tmp_path / "c0"))

    calls = []

    class FakeS3Client:
        def download_fileobj(self, Bucket, Key, Fileobj):
            calls.append((Bucket, Key))
            with open(src, "rb") as f:
                Fileobj.write(f.read())

    register_scheme("s3", s3_fetcher(FakeS3Client()))
    try:
        cache = str(tmp_path / "cache")
        local = resolve_input("s3://my-bucket/data/part-0.parquet", cache_dir=cache)
        assert local.endswith("part-0.parquet")
        assert calls == [("my-bucket", "data/part-0.parquet")]
        # cache hit: no second download
        again = resolve_input("s3://my-bucket/data/part-0.parquet", cache_dir=cache)
        assert again == local and len(calls) == 1
        # the fetched object ingests like any local parquet
        t = cat.create_table("ns.s3t", schema=SCHEMA)
        insert(t, [local])
        assert t.read().count() == 1
    finally:
        unregister_scheme("s3")


def test_orc_ingest(cat, tmp_path, spark):
    """ORC read-side (--format orc): Hive-era corpora land via the
    same format seam as CSV/JSON; table files are still parquet."""
    src = tmp_path / "orc_dir"
    spark.createDataFrame(
        [(1, "alpha", 0.5), (2, "beta", 1.5)], schema=SCHEMA
    ).coalesce(1).write.orc(str(src))
    part = next(p for p in src.iterdir() if p.name.endswith(".orc"))
    t = cat.create_table("ns.o", schema=SCHEMA)
    res = insert(t, [str(part)], input_format="orc")
    assert res["added"] >= 1
    rows = {(r.id, r.name, r.score) for r in t.read().collect()}
    assert rows == {(1, "alpha", 0.5), (2, "beta", 1.5)}
    assert all(e["path"].endswith(".parquet") for e in t.files())


def test_orc_no_copy_rejected(cat, tmp_path, spark):
    src = tmp_path / "orc2"
    spark.createDataFrame([(1, "a", 0.0)], schema=SCHEMA).coalesce(1).write.orc(
        str(src)
    )
    part = next(p for p in src.iterdir() if p.name.endswith(".orc"))
    t = cat.create_table("ns.o2", schema=SCHEMA)
    with pytest.raises(ValueError, match="no_copy requires parquet"):
        insert(t, [str(part)], input_format="orc", no_copy=True)


def test_avro_export_overwrite_clears_stale_shards(cat, spark, tmp_path):
    """Re-exporting to the same dest with fewer partitions must not
    leave stale shards behind (Spark mode("overwrite") semantics) —
    re-ingest would silently see old or duplicate rows otherwise."""
    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import export_avro

    df4 = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(8)], SCHEMA
    ).repartition(4)
    dest = tmp_path / "re_out"
    n1 = export_avro(df4, str(dest))
    assert n1 >= 2  # empty/coalesced partitions write no shard
    assert len(sorted(dest.glob("part-*.avro"))) == n1
    df1 = spark.createDataFrame([(99, "only", 9.0)], SCHEMA).coalesce(1)
    n2 = export_avro(df1, str(dest))
    assert n2 == 1
    shards = sorted(dest.glob("part-*.avro"))
    assert len(shards) == 1
    assert read_input(spark, str(dest), "avro").count() == 1
    # overwrite=False refuses a dest that already has shards
    with pytest.raises(FileExistsError, match="shard"):
        export_avro(df1, str(dest), overwrite=False)


def test_avro_export_streams_one_block_per_arrow_batch(spark, tmp_path):
    """The mapInArrow path appends one Avro block per RecordBatch —
    executor memory is bounded by a batch, never the partition."""
    import io as _io

    from ice_spark.sources.avro_io import (
        MAGIC,
        export_avro,
        read_bytes,
        read_container,
        read_long,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(1000)], SCHEMA
        ).coalesce(1)
        dest = tmp_path / "blocks"
        assert export_avro(df, str(dest)) == 1
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    (shard,) = sorted(dest.glob("part-*.avro"))
    buf = _io.BytesIO(shard.read_bytes())
    assert buf.read(4) == MAGIC
    nmeta = read_long(buf)
    for _ in range(nmeta):
        read_bytes(buf), read_bytes(buf)
    assert read_long(buf) == 0
    buf.read(16)  # sync
    blocks = 0
    while buf.tell() < len(buf.getvalue()):
        read_long(buf)  # record count
        sz = read_long(buf)
        buf.seek(sz + 16, 1)  # payload + sync
        blocks += 1
    assert blocks == 10  # 1000 rows / 100-row arrow batches
    _, _, recs = read_container(str(shard))
    assert len(recs) == 1000


def test_avro_export_scheme_routing(cat, spark, tmp_path):
    """Non-local destinations are scheme-routed: the shard is spooled
    to executor-local tmp and handed to the registered put — `dest`
    is not executor-local disk on a real cluster. The put runs inside
    the executor's Python worker, so it must be self-contained."""
    from ice_spark.sources import avro_io
    from ice_spark.sources.avro_io import export_avro, read_container

    landing = tmp_path / "landing"
    landing.mkdir()
    cleared = tmp_path / "cleared.marker"

    def make_put(dest):
        prefix = str(landing)  # captured by value via cloudpickle

        def put(name, data):
            import os as _os

            out = _os.path.join(prefix, name)
            with open(out, "wb") as f:
                f.write(data)
            return "fake://" + name

        return put

    def clear(dest):
        cleared.write_text(dest)

    avro_io.register_export_scheme("fake", make_put, clear)
    try:
        df = spark.createDataFrame([(1, "a", 0.5), (2, "b", 1.5)], SCHEMA).coalesce(1)
        n = export_avro(df, "fake://bucket/out")
        assert n == 1
        assert cleared.read_text() == "fake://bucket/out"
        (shard,) = sorted(landing.glob("part-*.avro"))
        _, _, recs = read_container(str(shard))
        assert {(r["id"], r["name"], r["score"]) for r in recs} == {
            (1, "a", 0.5),
            (2, "b", 1.5),
        }
    finally:
        avro_io._EXPORT_SCHEMES.pop("fake", None)


def test_avro_export_timestamp_map_array_types(spark, tmp_path):
    """Arrow-side values (tz datetimes, tuple-list maps, arrays,
    nested nulls) normalize onto the codec's Avro subset."""
    import datetime

    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import export_avro, read_container

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampType()),
            T.StructField("d", T.DateType()),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
            T.StructField("props", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    rows = [
        (1, ts, datetime.date(2024, 3, 1), [1.0, 2.5], {"a": "x", "b": "y"}),
        (2, None, None, [], {}),
    ]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    dest = tmp_path / "typed"
    assert export_avro(df, str(dest)) == 1
    (shard,) = sorted(dest.glob("part-*.avro"))
    _, _, recs = read_container(str(shard))
    by_id = {r["id"]: r for r in recs}
    assert by_id[1]["d"] == (datetime.date(2024, 3, 1) - datetime.date(1970, 1, 1)).days
    assert by_id[1]["vals"] == [1.0, 2.5]
    assert by_id[1]["props"] == {"a": "x", "b": "y"}
    assert by_id[2]["ts"] is None and by_id[2]["props"] == {}
    # timestamp round-trips through the repo's own avro reader
    got = read_input(spark, str(dest), "avro").collect()
    assert {r.id: r.ts for r in got}[1] == ts


def test_avro_export_timestamp_ntz_round_trip(spark, tmp_path):
    """TIMESTAMP_NTZ (the testdata's native timestamp flavor) maps to
    Avro local-timestamp-micros — timezone-less wall time, never
    routed through the local zone — and round-trips with type
    fidelity through the repo's own reader."""
    import datetime

    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import export_avro

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    ts = datetime.datetime(2024, 6, 15, 23, 59, 59, 999999)
    df = spark.createDataFrame([(1, ts), (2, None)], schema).coalesce(1)
    dest = tmp_path / "ntz"
    assert export_avro(df, str(dest)) == 1
    rb = read_input(spark, str(dest), "avro")
    assert isinstance(rb.schema["ts"].dataType, T.TimestampNTZType)
    got = {r.id: r.ts for r in rb.collect()}
    assert got == {1: ts, 2: None}


def test_decode_logical_is_host_timezone_independent():
    """timestamp-micros/millis decode as naive UTC wall time, never
    through the host zone: the session pins
    spark.sql.session.timeZone=UTC and reinterprets the naive result
    as UTC, so a fromtimestamp()-style host-local decode silently
    shifts every ingested timestamp on a non-UTC host (r9 ADVICE,
    high: 2024-06-01 12:00 read back as 08:00 under
    TZ=America/New_York)."""
    import datetime
    import os as _os
    import time as _time

    from ice_spark.sources.avro_io import decode_logical

    want = datetime.datetime(2024, 6, 1, 12, 0, 0, 123456)
    micros = (want - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
        microseconds=1
    )
    millis_want = want.replace(microsecond=123000)
    millis = micros // 1000
    old_tz = _os.environ.get("TZ")
    _os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        got_us = decode_logical(
            micros, {"type": "long", "logicalType": "timestamp-micros"}
        )
        got_ms = decode_logical(
            millis, {"type": "long", "logicalType": "timestamp-millis"}
        )
    finally:
        if old_tz is None:
            del _os.environ["TZ"]
        else:
            _os.environ["TZ"] = old_tz
        _time.tzset()
    assert got_us == want
    assert got_ms == millis_want


def test_avro_normalize_timestamp_micros_integer_exact():
    """Epoch-micros encoding is integer arithmetic, not
    int(ts.timestamp()*1e6): float seconds at current epochs cannot
    always represent microseconds exactly and int() truncates 1 us
    low (r9 ADVICE)."""
    import datetime

    from ice_spark.sources.avro_io import _avro_normalize

    s = {"type": "long", "logicalType": "timestamp-micros"}
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    for base_us in (1717243200000001, 1700000000000007, 946684800000003):
        v = epoch + datetime.timedelta(microseconds=base_us)
        assert _avro_normalize(v, s) == base_us
        # naive datetimes are UTC wall time (decode_logical's convention)
        assert _avro_normalize(v.replace(tzinfo=None), s) == base_us


def test_avro_export_overwrite_false_refuses_on_registered_scheme(
    spark, tmp_path
):
    """overwrite=False refuses an occupied dest on EVERY scheme, via
    the scheme's exists probe; a scheme registered without one makes
    overwrite=False an error instead of silently skipping the check
    (r9 ADVICE, medium)."""
    import pytest

    from ice_spark.sources import avro_io
    from ice_spark.sources.avro_io import export_avro

    landing = tmp_path / "landing"
    landing.mkdir()

    def make_put(dest):
        prefix = str(landing)

        def put(name, data):
            import os as _os

            out = _os.path.join(prefix, name)
            with open(out, "wb") as f:
                f.write(data)
            return "probed://" + name

        return put

    def clear(dest):
        for p in landing.glob("part-*.avro"):
            p.unlink()

    def exists(dest):
        return bool(list(landing.glob("part-*.avro")))

    df = spark.createDataFrame([(1, "a", 0.5)], SCHEMA).coalesce(1)
    avro_io.register_export_scheme("probed", make_put, clear, exists)
    avro_io.register_export_scheme("unprobed", make_put, clear)
    try:
        # empty dest: overwrite=False writes fine through the probe
        assert export_avro(df, "probed://bucket/out", overwrite=False) == 1
        # occupied dest: refused
        with pytest.raises(FileExistsError):
            export_avro(df, "probed://bucket/out", overwrite=False)
        # scheme without a probe: overwrite=False is an error, never
        # a silent skip
        with pytest.raises(ValueError, match="existence probe"):
            export_avro(df, "unprobed://bucket/out", overwrite=False)
        # overwrite=True still works for both
        assert export_avro(df, "unprobed://bucket/out", overwrite=True) == 1
    finally:
        avro_io._EXPORT_SCHEMES.pop("probed", None)
        avro_io._EXPORT_SCHEMES.pop("unprobed", None)


def test_avro_export_scheme_shards_deterministic(spark, tmp_path):
    """Scheme-routed shards spool through mkstemp but the sync marker
    derives from the FINAL destination URL, so exported bytes are
    identical across runs — matching local exports (r9 ADVICE)."""
    from ice_spark.sources import avro_io
    from ice_spark.sources.avro_io import export_avro

    landing = tmp_path / "landing"
    landing.mkdir()

    def make_put(dest):
        prefix = str(landing)

        def put(name, data):
            import os as _os

            out = _os.path.join(prefix, name)
            with open(out, "wb") as f:
                f.write(data)
            return "det://" + name

        return put

    def clear(dest):
        for p in landing.glob("part-*.avro"):
            p.unlink()

    df = spark.createDataFrame([(1, "a", 0.5), (2, "b", 1.5)], SCHEMA).coalesce(1)
    avro_io.register_export_scheme("det", make_put, clear)
    try:
        assert export_avro(df, "det://bucket/out") == 1
        first = (landing / "part-00000.avro").read_bytes()
        assert export_avro(df, "det://bucket/out") == 1
        second = (landing / "part-00000.avro").read_bytes()
    finally:
        avro_io._EXPORT_SCHEMES.pop("det", None)
    assert first == second


def test_avro_glob_matching_directory_skips_non_avro(cat, spark, tmp_path):
    """A glob pattern that matches only DIRECTORIES reads those
    directories' *.avro through the same glob that picked the header —
    _SUCCESS/.crc files inside must never reach the decoder (r9
    ADVICE: the fallback branch used to load the bare directory with
    no pathGlobFilter and fail with a bad-magic error)."""
    from ice_spark.ingest.insert import read_input
    from ice_spark.sources.avro_io import export_avro

    d = tmp_path / "shard-0"
    df = spark.createDataFrame([(1, "a", 0.5), (2, "b", 1.5)], SCHEMA).coalesce(1)
    assert export_avro(df, str(d)) == 1
    (d / "_SUCCESS").write_text("")
    (d / "part-00000.avro.crc").write_bytes(b"\x00" * 8)
    got = read_input(spark, str(tmp_path / "shard-*"), "avro").collect()
    assert {(r.id, r.name, r.score) for r in got} == {(1, "a", 0.5), (2, "b", 1.5)}


def test_export_avro_stats_surface_encoder_path(spark, tmp_path):
    """The encoder fallback used to be silent from the caller's view;
    stats={} now returns the vectorized/fallback batch split (VERDICT
    r10 #6)."""
    from ice_spark.sources.avro_io import export_avro

    df = spark.createDataFrame([(i, f"d{i}") for i in range(50)], "id long, s string").coalesce(2)
    st = {}
    n = export_avro(df, str(tmp_path / "vec"), stats=st)
    assert n == 2
    assert st["fallback_batches"] == 0
    assert st["vectorized_batches"] >= 2
    assert len(st["shards"]) == 2 and all(r["rows"] > 0 for r in st["shards"])

    st2 = {}
    export_avro(df, str(tmp_path / "pd"), vectorized=False, stats=st2)
    assert st2["vectorized_batches"] == 0
    assert st2["fallback_batches"] >= 2


def test_avro_decode_report_routes(spark, tmp_path):
    """Driver-side decode-path report: same-schema fleets are fully
    vectorized; a reordered-field shard is counted as the per-shard
    fallback; an unsupported fleet schema reports per-datum wholesale."""
    from ice_spark.ingest.insert import avro_decode_report
    from ice_spark.sources.avro_io import write_container

    fields = [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
    ]
    sch = {"type": "record", "name": "row", "fields": fields}
    d = tmp_path / "fleet"
    d.mkdir()
    write_container(str(d / "a.avro"), sch, [{"id": 1, "s": "x"}])
    write_container(str(d / "b.avro"), sch, [{"id": 2, "s": None}])
    rep = avro_decode_report(str(d))
    assert rep["mode"] == "vectorized"
    assert (rep["shards"], rep["fast_shards"], rep["fallback_shards"]) == (2, 2, 0)

    sch_r = {"type": "record", "name": "row", "fields": fields[::-1]}
    write_container(str(d / "c.avro"), sch_r, [{"id": 3, "s": "y"}])
    rep = avro_decode_report(str(d))
    assert (rep["shards"], rep["fast_shards"], rep["fallback_shards"]) == (3, 2, 1)
    assert rep["fallback_paths"] == [str(d / "c.avro")]

    # 3-branch union: outside the compiled subset -> per-datum wholesale
    sch_u = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "u", "type": ["null", "long", "string"]}],
    }
    d2 = tmp_path / "unsup"
    d2.mkdir()
    write_container(str(d2 / "a.avro"), sch_u, [{"u": 1}])
    rep = avro_decode_report(str(d2))
    assert rep["mode"] == "per-datum" and rep["fallback_shards"] == 1


def test_insert_avro_summary_reports_decode_path(cat, tmp_path):
    """insert --format avro surfaces the decode routing per input in
    its summary (the return-rows half of the observability ask)."""
    from ice_spark.sources.avro_io import write_container

    p = str(tmp_path / "in.avro")
    write_container(p, AVRO_SCHEMA, AVRO_ROWS)
    t = cat.create_table("ns.obs", schema=SCHEMA)
    res = insert(t, [p], input_format="avro")
    rep = res["avro_decode"][p]
    assert rep == {
        "mode": "vectorized",
        "shards": 1,
        "fast_shards": 1,
        "fallback_shards": 0,
    }
    assert res["added"] >= 1
