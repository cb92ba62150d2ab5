"""The vectorized Avro encoder (sources/avro_vec.py) must be
byte-identical to the per-datum reference path it replaces
(`_avro_normalize` + `write_datum` over `batch.to_pylist()`), across
the full schema subset `spark_schema_to_avro` emits. Hypothesis
drives the comparison; edge tests pin the Unsupported guards and the
export-side fallback."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ice_spark.sources.avro_io import _avro_normalize, write_datum
from ice_spark.sources.avro_vec import Unsupported, encode_batch

# One field per encoder branch: dense + nullable primitives, strings,
# bytes, temporals, array-of-float (the embeddings shape), map, and a
# nullable nested record with a nullable child.
AVRO_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "opt_l", "type": ["null", "long"]},
        {"name": "i", "type": "int"},
        {"name": "flag", "type": ["null", "boolean"]},
        {"name": "f", "type": ["null", "float"]},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "opt_s", "type": ["null", "string"]},
        {"name": "by", "type": ["null", "bytes"]},
        {"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "day", "type": ["null", {"type": "int", "logicalType": "date"}]},
        {"name": "emb", "type": ["null", {"type": "array", "items": "float"}]},
        {"name": "arr", "type": {"type": "array", "items": ["null", "long"]}},
        {"name": "kv", "type": ["null", {"type": "map", "values": ["null", "long"]}]},
        {
            "name": "nested",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "a", "type": "int"},
                        {"name": "b", "type": ["null", "string"]},
                    ],
                },
            ],
        },
    ],
}

ARROW_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("opt_l", pa.int64()),
        ("i", pa.int32()),
        ("flag", pa.bool_()),
        ("f", pa.float32()),
        ("d", pa.float64()),
        ("s", pa.string()),
        ("opt_s", pa.string()),
        ("by", pa.binary()),
        ("ts", pa.timestamp("us", tz="UTC")),
        ("day", pa.date32()),
        ("emb", pa.list_(pa.float32())),
        ("arr", pa.list_(pa.int64())),
        ("kv", pa.map_(pa.string(), pa.int64())),
        ("nested", pa.struct([("a", pa.int32()), ("b", pa.string())])),
    ]
)

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
floats = st.floats(width=32, allow_nan=False)
text = st.text(max_size=20)

row_st = st.fixed_dictionaries(
    {
        "id": longs,
        "opt_l": st.none() | longs,
        "i": ints,
        "flag": st.none() | st.booleans(),
        "f": st.none() | floats,
        "d": st.floats(allow_nan=False),
        "s": text,
        "opt_s": st.none() | text,
        "by": st.none() | st.binary(max_size=16),
        # timestamp('us') covers a huge range; stay in sane bounds so
        # to_pylist -> datetime round-trips for the reference path
        "ts": st.none() | st.integers(min_value=-(2**52), max_value=2**52),
        "day": st.none() | st.integers(min_value=-100_000, max_value=100_000),
        "emb": st.none() | st.lists(floats, max_size=6),
        "arr": st.lists(st.none() | longs, max_size=5),
        "kv": st.none()
        | st.dictionaries(st.text(max_size=8), st.none() | longs, max_size=4),
        "nested": st.none()
        | st.fixed_dictionaries({"a": ints, "b": st.none() | text}),
    }
)


def reference_bytes(batch: pa.RecordBatch) -> bytes:
    fields = [(f["name"], f["type"]) for f in AVRO_SCHEMA["fields"]]
    out = io.BytesIO()
    for r in batch.to_pylist():
        write_datum(
            out, AVRO_SCHEMA, {k: _avro_normalize(r.get(k), s) for k, s in fields}
        )
    return out.getvalue()


@given(st.lists(row_st, max_size=20))
@settings(max_examples=60, deadline=None)
def test_encode_batch_matches_per_datum(rows):
    batch = pa.RecordBatch.from_pylist(rows, schema=ARROW_SCHEMA)
    n, payload = encode_batch(batch, AVRO_SCHEMA)
    assert n == len(rows)
    assert payload == reference_bytes(batch)


def test_empty_batch():
    batch = pa.RecordBatch.from_pylist([], schema=ARROW_SCHEMA)
    assert encode_batch(batch, AVRO_SCHEMA) == (0, b"")


def test_sliced_batch_matches():
    rows = [
        {"id": i, "opt_l": None if i % 2 else i, "i": -i, "flag": bool(i % 3),
         "f": float(i), "d": i / 3.0, "s": "x" * i, "opt_s": None, "by": b"b" * i,
         "ts": i * 1_000_000, "day": i, "emb": [float(i)] * (i % 4),
         "arr": list(range(i % 3)), "kv": {"k": i}, "nested": {"a": i, "b": None}}
        for i in range(10)
    ]
    batch = pa.RecordBatch.from_pylist(rows, schema=ARROW_SCHEMA)
    sliced = batch.slice(3, 5)
    n, payload = encode_batch(sliced, AVRO_SCHEMA)
    assert n == 5
    assert payload == reference_bytes(sliced)


def test_wrong_timestamp_unit_refused():
    batch = pa.RecordBatch.from_pydict(
        {"ts": pa.array([1000], type=pa.timestamp("ms"))}
    )
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}}
        ],
    }
    with pytest.raises(Unsupported):
        encode_batch(batch, schema)


def test_null_in_non_nullable_field_refused():
    batch = pa.RecordBatch.from_pydict({"id": pa.array([1, None], type=pa.int64())})
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "long"}],
    }
    with pytest.raises(Unsupported):
        encode_batch(batch, schema)


# ["T","null"] is legal Avro (null branch at index 1); foreign writers
# emit it. The branch byte is the zigzag of the branch INDEX, so the
# compiled decoder must not assume byte 0 means null.
NULL_LAST_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "a", "type": ["long", "null"]},
        {"name": "b", "type": "long"},
        {"name": "s", "type": ["string", "null"]},
    ],
}


def test_compiled_decoder_null_last_union(tmp_path):
    """A ["long","null"] container (written by the branch-correct
    per-datum writer) must decode to the same values on the compiled
    fast path — previously byte 0 was misread as null, silently
    corrupting a=5 into None and shifting b."""
    from ice_spark.sources.avro_io import read_container, write_container
    from ice_spark.sources.avro_vec import decode_container_bytes_arrow

    rows = [
        {"a": 5, "b": 10, "s": "x"},
        {"a": None, "b": 20, "s": None},
        {"a": 0, "b": 30, "s": ""},
    ]
    p = str(tmp_path / "nl.avro")
    write_container(p, NULL_LAST_SCHEMA, rows)
    _, _, ref = read_container(p)
    assert ref == rows  # per-datum path is the ground truth
    with open(p, "rb") as f:
        batch = decode_container_bytes_arrow(f.read(), NULL_LAST_SCHEMA)
    assert batch.to_pylist() == rows


def test_encode_null_last_union_matches_per_datum():
    """Null-last ["T","null"] unions (legal Avro; foreign fleet
    schemas emit them) must encode on the vectorized path with the
    SWAPPED branch bytes — value zigzag(0)=0, null zigzag(1)=2 —
    byte-identical to the branch-correct per-datum writer. Covers the
    folded-marker primitives AND the _union_wrap composites
    (record/array/map)."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a", "type": ["long", "null"]},
            {"name": "s", "type": ["string", "null"]},
            {
                "name": "arr",
                "type": [{"type": "array", "items": "long"}, "null"],
            },
            {
                "name": "rec",
                "type": [
                    {
                        "type": "record",
                        "name": "inner2",
                        "fields": [{"name": "x", "type": "int"}],
                    },
                    "null",
                ],
            },
        ],
    }
    arrow = pa.schema(
        [
            ("a", pa.int64()),
            ("s", pa.string()),
            ("arr", pa.list_(pa.int64())),
            ("rec", pa.struct([("x", pa.int32())])),
        ]
    )
    rows = [
        {"a": 5, "s": "x", "arr": [1, 2], "rec": {"x": 7}},
        {"a": None, "s": None, "arr": None, "rec": None},
        {"a": 0, "s": "", "arr": [], "rec": {"x": 0}},
    ]
    batch = pa.RecordBatch.from_pylist(rows, schema=arrow)
    n, payload = encode_batch(batch, schema)
    assert n == 3
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    out = io.BytesIO()
    for r in batch.to_pylist():
        write_datum(
            out, schema, {k: _avro_normalize(r.get(k), s) for k, s in fields}
        )
    assert payload == out.getvalue()
    # first byte of row 0 is field a's branch byte: value at index 0
    assert payload[0] == 0


def test_export_paths_byte_identical(spark, tmp_path):
    """Full-stack check: export_avro through the vectorized encoder
    and through the per-datum path (vectorized=False) write
    byte-identical shards — same sync (path-derived), same blocks —
    so the fallback is interchangeable, not just decodable."""
    from ice_spark.sources.avro_io import export_avro

    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0], None), (2, None, [], 3.5), (3, "c", None, -1.0)],
        "id long, s string, emb array<float>, x double",
    ).coalesce(1)
    import hashlib

    fast, slow = tmp_path / "fast", tmp_path / "slow"
    assert export_avro(df, str(fast)) == 1
    assert export_avro(df, str(slow), vectorized=False) == 1
    fb = (fast / "part-00000.avro").read_bytes()
    sb = (slow / "part-00000.avro").read_bytes()
    # the sync marker hashes the shard path, which differs between the
    # two dest dirs — normalize it, then the files must be identical
    fsync = hashlib.sha256(str(fast / "part-00000.avro").encode()).digest()[:16]
    ssync = hashlib.sha256(str(slow / "part-00000.avro").encode()).digest()[:16]
    assert fb.replace(fsync, b"\x00" * 16) == sb.replace(ssync, b"\x00" * 16)


# --- compiled decoder (read path) ---

raw_row_st = st.fixed_dictionaries(
    {
        "id": longs,
        "opt_l": st.none() | longs,
        "i": ints,
        "flag": st.none() | st.booleans(),
        "f": st.none() | floats,
        "d": st.floats(allow_nan=False),
        "s": text,
        "opt_s": st.none() | text,
        "by": st.none() | st.binary(max_size=16),
        "ts": st.none() | st.integers(min_value=-(2**52), max_value=2**52),
        "day": st.none() | st.integers(min_value=-100_000, max_value=100_000),
        "emb": st.none() | st.lists(floats, max_size=6),
        "arr": st.lists(st.none() | longs, max_size=5),
        "kv": st.none()
        | st.dictionaries(st.text(max_size=8), st.none() | longs, max_size=4),
        "nested": st.none()
        | st.fixed_dictionaries({"a": ints, "b": st.none() | text}),
    }
)


@given(st.lists(raw_row_st, max_size=15))
@settings(max_examples=40, deadline=None)
def test_compiled_decoder_matches_read_datum(tmp_path_factory, rows):
    """decode_container_bytes_arrow must recover exactly what the
    reference reader (read_container -> read_datum) recovers, for a
    container written by the reference writer — raw values compared
    (temporals stay epoch ints on the reference side too)."""
    import numpy as np

    from ice_spark.sources.avro_io import read_container, write_container
    from ice_spark.sources.avro_vec import decode_container_bytes_arrow

    td = tmp_path_factory.mktemp("avrodec")
    p = str(td / "t.avro")
    write_container(p, AVRO_SCHEMA, rows)
    with open(p, "rb") as f:
        batch = decode_container_bytes_arrow(f.read(), AVRO_SCHEMA)
    _, _, ref = read_container(p)
    assert batch.num_rows == len(rows)
    # temporal columns: compare the raw epoch ints losslessly (a
    # float .timestamp() round-trip drops microseconds near zero)
    import pyarrow as pa

    ts_raw = batch.column("ts").cast(pa.int64()).to_pylist()
    day_raw = batch.column("day").cast(pa.int32()).to_pylist()
    got = batch.to_pylist()
    for g, t, dy in zip(got, ts_raw, day_raw):
        g["ts"] = t
        g["day"] = dy
    for g, r in zip(got, ref):
        for k, v in r.items():
            gv = g[k]
            if k == "kv" and gv is not None:
                gv = dict(gv)
            if k in ("f", "emb") and gv is not None and v is not None:
                if k == "f":
                    assert gv == np.float32(v) or gv == v
                    continue
                assert [np.float32(x) for x in v] == gv or v == gv
                continue
            assert gv == v, (k, gv, v)


def test_read_avro_mixed_field_order_falls_back(spark, tmp_path):
    """A shard whose header schema reorders fields decodes through
    the per-shard fallback (read_datum by name), not the compiled
    decoder — and the combined read still yields every row."""
    from ice_spark.ingest.insert import _read_avro
    from ice_spark.sources.avro_io import write_container

    s1 = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "long"}, {"name": "s", "type": "string"}],
    }
    s2 = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "s", "type": "string"}, {"name": "id", "type": "long"}],
    }
    write_container(str(tmp_path / "a.avro"), s1, [{"id": 1, "s": "x"}])
    write_container(str(tmp_path / "b.avro"), s2, [{"id": 2, "s": "y"}])
    out = _read_avro(spark, str(tmp_path)).orderBy("id").collect()
    assert [(r.id, r.s) for r in out] == [(1, "x"), (2, "y")]


def test_all_testdata_schemas_on_fast_paths(spark):
    """Every testdata table must stay on BOTH fast paths — the
    vectorized encoder and the compiled decoder. A change that
    silently narrows the supported subset turns a 9x/6x path into
    the per-datum fallback without failing anything else."""
    from ice_spark.sources.avro_io import spark_schema_to_avro
    from ice_spark.sources.avro_vec import compile_decoder, encode_batch
    from ice_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        df = load_table(spark, "/root/testdata/sf0.001", t).limit(20)
        schema = spark_schema_to_avro(df.schema)
        compile_decoder(schema)  # raises Unsupported on regression
        tbl = df.toArrow()
        if tbl.num_rows:
            batch = tbl.to_batches()[0]
            n, payload = encode_batch(batch, schema)
            assert n == batch.num_rows


def test_decoder_field_names_that_sanitize_identically():
    """"a b" and "a_b" sanitize to the same Python identifier; the
    generated locals must still address the right columns."""
    from ice_spark.sources.avro_io import write_datum
    from ice_spark.sources.avro_vec import compile_decoder

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a b", "type": "long"},
            {"name": "a_b", "type": "long"},
        ],
    }
    buf = io.BytesIO()
    write_datum(buf, schema, {"a b": 1, "a_b": 2})
    write_datum(buf, schema, {"a b": 3, "a_b": 4})
    cols = {"a b": [], "a_b": []}
    decode = compile_decoder(schema)
    decode(memoryview(buf.getvalue()), 0, 2, cols)
    assert cols == {"a b": [1, 3], "a_b": [2, 4]}


def test_jvm_cross_reads_vectorized_export_shard(spark, tmp_path):
    """The JVM's org.apache.avro reader — a fully independent second
    implementation — must parse a shard written by the VECTORIZED
    encoder end-to-end (values, nulls, arrays, temporals), not just
    the per-datum containers the Iceberg metadata tests cover."""
    from ice_spark.sources.avro_io import export_avro

    df = spark.createDataFrame(
        [
            (1, "alpha", [1.0, 2.5], 3.5, True),
            (2, None, [], None, False),
            (3, "unicodé→", None, -0.0, None),
        ],
        "id long, s string, emb array<float>, x double, flag boolean",
    ).coalesce(1)
    dest = tmp_path / "out"
    assert export_avro(df, str(dest)) == 1
    shard = str(dest / "part-00000.avro")

    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(shard), reader)
    rows = {}
    while dfr.hasNext():
        r = dfr.next()
        rows[r.get("id")] = r
    dfr.close()
    assert set(rows) == {1, 2, 3}
    assert rows[1].get("s").toString() == "alpha"
    assert rows[2].get("s") is None
    assert rows[3].get("s").toString() == "unicodé→"
    assert [float(v) for v in rows[1].get("emb")] == [1.0, 2.5]
    assert list(rows[2].get("emb")) == []
    assert rows[3].get("emb") is None
    assert rows[1].get("x") == 3.5
    assert rows[2].get("x") is None
    assert rows[1].get("flag") is True and rows[2].get("flag") is False


def test_ms_timestamp_fast_path(spark, tmp_path):
    """timestamp-millis / local-timestamp-millis containers decode on
    the compiled fast path, upconverted *1000 to micros (the reference
    semantics for ms inputs) — end-to-end through _read_avro and
    directly against the per-datum reference reader."""
    import datetime

    from ice_spark.ingest.insert import _read_avro
    from ice_spark.sources.avro_io import write_container
    from ice_spark.sources.avro_vec import (
        avro_schema_to_arrow,
        decode_container_bytes_arrow,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {
                "name": "lts",
                "type": ["null", {"type": "long", "logicalType": "local-timestamp-millis"}],
            },
        ],
    }
    rows = [
        {"id": 1, "ts": 86_400_000, "lts": 1_500},  # 1970-01-02, 1.5s
        {"id": 2, "ts": 123, "lts": None},
    ]
    p = str(tmp_path / "ms.avro")
    write_container(p, schema, rows)

    # the schema is on the fast path at all (would have been
    # wholesale-fallback before): arrow type is upconverted micros
    assert str(avro_schema_to_arrow(schema["fields"][1]["type"])) == "timestamp[us, tz=UTC]"
    with open(p, "rb") as f:
        batch = decode_container_bytes_arrow(f.read(), schema)
    assert batch.column("ts").cast(pa.int64()).to_pylist() == [
        86_400_000_000, 123_000
    ]
    assert batch.column("lts").cast(pa.int64()).to_pylist() == [1_500_000, None]

    got = {r.id: r for r in _read_avro(spark, p).collect()}
    assert got[1].ts == datetime.datetime(1970, 1, 2)
    assert got[1].lts == datetime.datetime(1970, 1, 1, 0, 0, 1, 500000)
    assert got[2].ts == datetime.datetime(1970, 1, 1, 0, 0, 0, 123000)
    assert got[2].lts is None


def test_ms_timestamp_per_shard_fallback(spark, tmp_path):
    """A reordered-field ms shard takes the per-shard fallback, which
    must apply the same ms->datetime conversion (raw ms ints under a
    micros arrow type would be 1000x off)."""
    import datetime

    from ice_spark.ingest.insert import _read_avro
    from ice_spark.sources.avro_io import write_container

    fields_a = [
        {"name": "id", "type": "long"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
    ]
    schema_a = {"type": "record", "name": "row", "fields": fields_a}
    schema_b = {"type": "record", "name": "row", "fields": fields_a[::-1]}
    d = tmp_path / "shards"
    d.mkdir()
    write_container(str(d / "a.avro"), schema_a, [{"id": 1, "ts": 86_400_000}])
    write_container(str(d / "b.avro"), schema_b, [{"id": 2, "ts": 500}])

    got = {r.id: r.ts for r in _read_avro(spark, str(d)).collect()}
    assert got == {
        1: datetime.datetime(1970, 1, 2),
        2: datetime.datetime(1970, 1, 1, 0, 0, 0, 500000),
    }


# --- decimal / enum / fixed fast-path coverage (r11 verdict #5) ---

DEF_SCHEMA = {
    "type": "record",
    "name": "defrow",
    "fields": [
        {"name": "id", "type": "long"},
        {
            "name": "amt",
            "type": {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 18,
                "scale": 2,
            },
        },
        {
            "name": "famt",
            "type": {
                "type": "fixed",
                "name": "famt16",
                "size": 16,
                "logicalType": "decimal",
                "precision": 38,
                "scale": 6,
            },
        },
        {
            "name": "color",
            "type": {
                "type": "enum",
                "name": "color_e",
                "symbols": ["RED", "GREEN", "BLUE"],
            },
        },
        {
            "name": "sync",
            "type": {"type": "fixed", "name": "sync16", "size": 16},
        },
        {
            "name": "opt_amt",
            "type": [
                "null",
                {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 3,
                },
            ],
        },
    ],
}


@st.composite
def def_rows(draw):
    import decimal

    n = draw(st.integers(min_value=1, max_value=40))
    out = []
    for i in range(n):
        amt = decimal.Decimal(
            draw(st.integers(min_value=-(10**16), max_value=10**16))
        ).scaleb(-2)
        # exact scaling context: a bare .scaleb would round >28-digit
        # unscaled ints under the default prec=28 thread context,
        # pre-rounding the fixture the same way the r12 decode bug did
        famt = decimal.Decimal(
            draw(st.integers(min_value=-(10**37), max_value=10**37))
        ).scaleb(-6, decimal.Context(prec=76))
        opt = draw(
            st.one_of(
                st.none(),
                st.integers(min_value=-(10**9), max_value=10**9),
            )
        )
        out.append(
            {
                "id": i,
                "amt": amt,
                "famt": famt,
                "color": draw(st.sampled_from(["RED", "GREEN", "BLUE"])),
                "sync": bytes(draw(st.binary(min_size=16, max_size=16))),
                "opt_amt": None
                if opt is None
                else decimal.Decimal(opt).scaleb(-3),
            }
        )
    return out


@settings(max_examples=20, deadline=None)
@given(def_rows())
def test_decimal_enum_fixed_fast_path_matches_per_datum(tmp_path_factory, rows):
    """The compiled decoder's decimal/enum/fixed output must equal the
    per-datum reference path (read_container -> read_datum ->
    decode_logical) value-for-value, including the nullable decimal
    union and sign/scale edge cases."""
    from ice_spark.sources.avro_io import decode_logical, read_container, write_container
    from ice_spark.sources.avro_vec import (
        avro_schema_to_arrow,
        compile_decoder,
        decode_container_bytes_arrow,
    )

    # all three constructs compile (no Unsupported fallback)
    compile_decoder(DEF_SCHEMA)
    for f in DEF_SCHEMA["fields"]:
        avro_schema_to_arrow(f["type"])

    td = tmp_path_factory.mktemp("avrodef")
    p = str(td / "t.avro")
    write_container(p, DEF_SCHEMA, rows)
    with open(p, "rb") as f:
        batch = decode_container_bytes_arrow(f.read(), DEF_SCHEMA)
    _, _, raw = read_container(p)
    ref = [decode_logical(r, DEF_SCHEMA) for r in raw]
    got = batch.to_pylist()
    assert len(got) == len(ref) == len(rows)
    for g, r, orig in zip(got, ref, rows):
        for k in ("id", "amt", "famt", "color", "sync", "opt_amt"):
            assert g[k] == r[k] == orig[k], (k, g[k], r[k], orig[k])


def test_decimal_avro_ingest_end_to_end(spark, tmp_path):
    """insert-path plumbing: a decimal/enum/fixed container lands as
    DecimalType/StringType/BinaryType through _read_avro's fast path,
    and avro_decode_report says 'vectorized'."""
    import decimal

    from ice_spark.ingest.insert import avro_decode_report, read_input
    from ice_spark.sources.avro_io import write_container

    rows = [
        {
            "id": i,
            "amt": decimal.Decimal(i * 7 - 3).scaleb(-2),
            "famt": decimal.Decimal(-i).scaleb(-6),
            "color": ["RED", "GREEN", "BLUE"][i % 3],
            "sync": bytes(range(i % 10, i % 10 + 16)),
            "opt_amt": None if i % 3 == 0 else decimal.Decimal(i).scaleb(-3),
        }
        for i in range(50)
    ]
    p = str(tmp_path / "d.avro")
    write_container(p, DEF_SCHEMA, rows)
    rep = avro_decode_report(p)
    assert rep["mode"] == "vectorized", rep
    df = read_input(spark, p, "avro")
    sch = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert sch["amt"] == "decimal(18,2)"
    assert sch["famt"] == "decimal(38,6)"
    assert sch["opt_amt"] == "decimal(10,3)"
    assert sch["color"] == "string"
    assert sch["sync"] == "binary"
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == 50
    for r in rows:
        g = got[r["id"]]
        assert g["amt"] == r["amt"] and g["famt"] == r["famt"]
        assert g["color"] == r["color"] and bytes(g["sync"]) == r["sync"]
        assert g["opt_amt"] == r["opt_amt"]


def test_decimal_over_28_digits_exact_round_trip(tmp_path):
    """Decimals with >28 significant digits must round-trip EXACTLY
    through write_container -> compiled decoder AND the per-datum
    path. The default decimal thread context (prec=28) silently
    half-even-rounds such values during scaleb; r12 ADVICE reproduced
    12345678901.123456789012345678 coming back ...68 instead of ...678
    (decode at avro_vec + avro_io, encode at _decimal_bytes)."""
    import decimal

    from ice_spark.sources.avro_io import (
        decode_logical,
        read_container,
        write_container,
    )
    from ice_spark.sources.avro_vec import decode_container_bytes_arrow

    schema = {
        "type": "record",
        "name": "bigdec",
        "fields": [
            {
                "name": "v",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 38,
                    "scale": 18,
                },
            },
            {
                "name": "vf",
                "type": {
                    "type": "fixed",
                    "name": "vf16",
                    "size": 16,
                    "logicalType": "decimal",
                    "precision": 38,
                    "scale": 18,
                },
            },
        ],
    }
    # string construction is context-free (exact); 29 significant digits
    vals = [
        decimal.Decimal("12345678901.123456789012345678"),
        decimal.Decimal("-12345678901.123456789012345678"),
        decimal.Decimal("99999999999999999999.999999999999999999"),
        decimal.Decimal("0.000000000000000001"),
    ]
    rows = [{"v": v, "vf": v} for v in vals]
    p = str(tmp_path / "big.avro")
    write_container(p, schema, rows)
    with open(p, "rb") as f:
        fast = decode_container_bytes_arrow(f.read(), schema).to_pylist()
    _, _, raw = read_container(p)
    slow = [decode_logical(r, schema) for r in raw]
    for got_f, got_s, v in zip(fast, slow, vals):
        assert got_f["v"] == v, (got_f["v"], v)
        assert got_f["vf"] == v
        assert got_s["v"] == v
        assert got_s["vf"] == v


def test_decimal_write_rejects_excess_fractional_digits(tmp_path):
    """_decimal_bytes must FAIL LOUDLY (ValueError) when a datum has
    more fractional digits than the schema scale, not silently
    half-even-round it on write (ANSI fail-loudly posture)."""
    import decimal

    import pytest

    from ice_spark.sources.avro_io import _decimal_bytes

    sch = {"logicalType": "decimal", "precision": 18, "scale": 2}
    # exact fit: fine
    assert _decimal_bytes(decimal.Decimal("12.34"), sch)
    assert _decimal_bytes(decimal.Decimal("12.3"), sch)
    with pytest.raises(ValueError, match="scale"):
        _decimal_bytes(decimal.Decimal("12.345"), sch)


def test_compiled_decoder_multibranch_numeric_union(tmp_path):
    """A >=2-non-null-branch numeric union (["null","int","long"],
    ["int","long","float","double"]) — legal Avro that foreign
    writers emit for promoted numerics — must decode on the compiled
    fast path by BRANCH-INDEX dispatch, matching the per-datum
    read_datum ground truth, with the promoted Arrow column type
    ({int,long} -> int64, any float/double -> float64). The container
    is hand-assembled because our own writer always picks the first
    fitting branch."""
    import json
    import struct as _struct

    from ice_spark.sources.avro_io import (
        MAGIC,
        read_container,
        write_long,
    )
    from ice_spark.sources.avro_vec import (
        avro_schema_to_arrow,
        decode_container_bytes_arrow,
    )

    schema = {
        "type": "record",
        "name": "mb",
        "fields": [
            {"name": "a", "type": ["null", "int", "long"]},
            {"name": "b", "type": ["int", "long", "float", "double"]},
        ],
    }
    assert avro_schema_to_arrow(["null", "int", "long"]) == pa.int64()
    assert avro_schema_to_arrow(["int", "long", "float", "double"]) == pa.float64()

    # (branch_idx, value) per field per row — exercises EVERY branch
    rows = [
        ((0, None), (0, 7)),          # a: null branch; b: int branch
        ((1, 42), (1, 1 << 40)),      # a: int;  b: long
        ((2, 1 << 50), (2, 2.5)),     # a: long; b: float
        ((1, -3), (3, -0.125)),       # a: int;  b: double
    ]

    def enc_value(out, t, v):
        if t in ("int", "long"):
            write_long(out, v)
        elif t == "float":
            out.write(_struct.pack("<f", v))
        elif t == "double":
            out.write(_struct.pack("<d", v))

    payload = io.BytesIO()
    for (ia, va), (ib, vb) in rows:
        write_long(payload, ia)
        if va is not None:
            enc_value(payload, ["null", "int", "long"][ia], va)
        write_long(payload, ib)
        enc_value(payload, ["int", "long", "float", "double"][ib], vb)
    body = payload.getvalue()

    sync = b"\x01" * 16
    out = io.BytesIO()
    out.write(MAGIC)
    write_long(out, 2)  # metadata map: 2 entries
    for k, v in [
        ("avro.schema", json.dumps(schema).encode()),
        ("avro.codec", b"null"),
    ]:
        kb = k.encode()
        write_long(out, len(kb)); out.write(kb)
        write_long(out, len(v)); out.write(v)
    write_long(out, 0)  # end of map
    out.write(sync)
    write_long(out, len(rows)); write_long(out, len(body))
    out.write(body); out.write(sync)
    data = out.getvalue()

    p = tmp_path / "mb.avro"
    p.write_bytes(data)
    _, _, ref = read_container(str(p))  # per-datum ground truth
    batch = decode_container_bytes_arrow(data, schema)
    assert batch.schema.field("a").type == pa.int64()
    assert batch.schema.field("b").type == pa.float64()
    got = batch.to_pylist()
    assert [r["a"] for r in got] == [r["a"] for r in ref] == [None, 42, 1 << 50, -3]
    want_b = [7.0, float(1 << 40), 2.5, -0.125]
    assert [r["b"] for r in got] == want_b
    assert [float(r["b"]) for r in ref] == want_b


def test_string_plus_long_union_still_unsupported():
    """Non-numeric multi-branch unions have no single faithful column
    type — must stay Unsupported (per-shard fallback), not guess."""
    from ice_spark.sources.avro_vec import avro_schema_to_arrow, compile_decoder

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": ["null", "string", "long"]}],
    }
    with pytest.raises(Unsupported):
        compile_decoder(schema)
    with pytest.raises(Unsupported):
        avro_schema_to_arrow(["null", "string", "long"])


def test_foreign_order_corpus_decodes_vectorized(spark, tmp_path):
    """End-to-end ingest pin for the r12 verdict-#4 gap: a container
    whose schema uses null-LAST unions and a multi-branch numeric
    union — the legal-Avro shapes foreign writers emit — must decode
    through _read_avro's FAST path (avro_decode_report mode
    'vectorized', zero fallback shards) and land the right Spark
    types and values."""
    from ice_spark.ingest.insert import avro_decode_report, read_input
    from ice_spark.sources.avro_io import write_container

    schema = {
        "type": "record",
        "name": "foreign",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "a", "type": ["long", "null"]},
            {"name": "s", "type": ["string", "null"]},
            {"name": "n", "type": ["null", "int", "long"]},
        ],
    }
    rows = [
        {"id": 1, "a": 5, "s": "x", "n": 7},
        {"id": 2, "a": None, "s": None, "n": None},
        {"id": 3, "a": 0, "s": "", "n": -2},
    ]
    p = str(tmp_path / "foreign.avro")
    write_container(p, schema, rows)
    rep = avro_decode_report(p)
    assert rep["mode"] == "vectorized", rep
    assert rep.get("fallback_shards") in (0, [], None), rep
    df = read_input(spark, p, "avro")
    sch = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert sch == {"id": "bigint", "a": "bigint", "s": "string", "n": "bigint"}
    got = {r["id"]: r for r in df.collect()}
    assert (got[1]["a"], got[1]["s"], got[1]["n"]) == (5, "x", 7)
    assert (got[2]["a"], got[2]["s"], got[2]["n"]) == (None, None, None)
    assert (got[3]["a"], got[3]["s"], got[3]["n"]) == (0, "", -2)


NL_PROP_SCHEMA = {
    "type": "record",
    "name": "nlrow",
    "fields": [
        {"name": "a", "type": ["long", "null"]},
        {"name": "s", "type": ["string", "null"]},
        {"name": "f", "type": ["float", "null"]},
        {"name": "arr", "type": [{"type": "array", "items": "long"}, "null"]},
    ],
}
NL_ARROW = pa.schema(
    [
        ("a", pa.int64()),
        ("s", pa.string()),
        ("f", pa.float32()),
        ("arr", pa.list_(pa.int64())),
    ]
)
nl_row_st = st.fixed_dictionaries(
    {
        "a": st.none() | longs,
        "s": st.none() | text,
        "f": st.none() | floats,
        "arr": st.none() | st.lists(longs, max_size=4),
    }
)


@given(st.lists(nl_row_st, max_size=15))
@settings(max_examples=40, deadline=None)
def test_encode_null_last_property(rows):
    """Property form of the null-last encode fix: arbitrary rows under
    a ["T","null"] schema must encode byte-identical to the
    branch-correct per-datum writer (folded markers AND _union_wrap
    composites, nulls in every position)."""
    batch = pa.RecordBatch.from_pylist(rows, schema=NL_ARROW)
    n, payload = encode_batch(batch, NL_PROP_SCHEMA)
    assert n == len(rows)
    fields = [(f["name"], f["type"]) for f in NL_PROP_SCHEMA["fields"]]
    out = io.BytesIO()
    for r in batch.to_pylist():
        write_datum(
            out,
            NL_PROP_SCHEMA,
            {k: _avro_normalize(r.get(k), s) for k, s in fields},
        )
    assert payload == out.getvalue()
