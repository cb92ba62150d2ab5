"""Property-based tests for the from-scratch Avro codec
(sources/avro_io.py): arbitrary datums round-trip bit-exactly through
the binary encoding and the object container format, under both
codecs. The Iceberg export rides on this codec — fuzzing it is the
cheapest insurance the bridge has.
"""

from __future__ import annotations

import io
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ice_spark.sources.avro_io import (
    read_container,
    read_datum,
    read_long,
    write_container,
    write_datum,
    write_long,
)

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(longs)
@settings(max_examples=200)
def test_varint_roundtrip(n):
    buf = io.BytesIO()
    write_long(buf, n)
    buf.seek(0)
    assert read_long(buf) == n


# A schema exercising every branch the Iceberg manifests use:
# records, nullable unions, int/long/float/double/bool/string/bytes,
# arrays (incl. the k/v map-as-array shape), and maps.
SCHEMA = {
    "type": "record",
    "name": "fuzz",
    "fields": [
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "b", "type": "boolean"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "opt_s", "type": ["null", "string"], "default": None},
        {
            "name": "arr",
            "type": {"type": "array", "items": "long"},
        },
        {
            "name": "kv",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "kv_item",
                        "fields": [
                            {"name": "key", "type": "int"},
                            {"name": "value", "type": "bytes"},
                        ],
                    },
                    "logicalType": "map",
                },
            ],
            "default": None,
        },
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": ["null", "double"], "default": None}],
            },
        },
    ],
}

ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
floats64 = st.floats(allow_nan=False, width=64)
floats32 = st.floats(allow_nan=False, width=32)
text = st.text(max_size=40)
blobs = st.binary(max_size=40)

datums = st.fixed_dictionaries(
    {
        "i": ints,
        "l": longs,
        "d": floats64,
        "f": floats32,
        "b": st.booleans(),
        "s": text,
        "by": blobs,
        "opt": st.none() | longs,
        "opt_s": st.none() | text,
        "arr": st.lists(longs, max_size=8),
        "kv": st.none()
        | st.lists(
            st.fixed_dictionaries({"key": ints, "value": blobs}), max_size=5
        ),
        "m": st.dictionaries(text, longs, max_size=5),
        "nested": st.fixed_dictionaries({"x": st.none() | floats64}),
    }
)


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6) or (a == b)
    if isinstance(a, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@given(datums)
@settings(max_examples=100, deadline=None)
def test_datum_roundtrip(datum):
    buf = io.BytesIO()
    write_datum(buf, SCHEMA, datum)
    buf.seek(0)
    back = read_datum(buf, SCHEMA)
    # float32 loses precision by design; compare with tolerance there
    assert back["i"] == datum["i"] and back["l"] == datum["l"]
    assert back["s"] == datum["s"] and back["by"] == datum["by"]
    assert back["arr"] == datum["arr"] and back["m"] == datum["m"]
    assert back["opt"] == datum["opt"] and back["opt_s"] == datum["opt_s"]
    assert back["kv"] == datum["kv"]
    assert _eq(back["f"], datum["f"]) and back["d"] == datum["d"]
    assert _eq(back["nested"], datum["nested"])


@given(st.lists(datums, max_size=10), st.sampled_from(["null", "deflate"]))
@settings(max_examples=30, deadline=None)
def test_container_roundtrip(tmp_path_factory, records, codec):
    path = str(tmp_path_factory.mktemp("avro") / "f.avro")
    write_container(path, SCHEMA, records, codec=codec)
    schema, meta, back = read_container(path)
    assert schema == SCHEMA
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert _eq(b, a)
