"""Pure-Python Apache Avro binary codec (writer + reader).

Iceberg's manifest-list and manifest files are Avro object container
files (Iceberg spec "Manifests" / "Manifest Lists"; the reference
reads and writes them through the Iceberg Java library in every
commit, e.g. ice/.../cmd/Insert.java:253-267). No Avro Python library
is available in this environment, so this module implements the
subset of the Avro 1.11 specification those files need, from the
public spec (https://avro.apache.org/docs/1.11.1/specification/):

- binary encoding: zigzag-varint ints/longs, little-endian
  float/double, length-prefixed bytes/strings, records, arrays,
  maps, unions, fixed, enums;
- object container files: magic `Obj\\x01`, file-metadata map
  (avro.schema / avro.codec), 16-byte sync marker, data blocks
  (count + byte length + payload + sync), `null` and `deflate`
  codecs.

Interop is proven two ways in tests/test_iceberg_export.py: the
Python reader round-trips the writer, AND the JVM's own
org.apache.avro library (avro-1.12.1.jar on Spark's classpath) reads
the files via py4j — a genuine cross-implementation check.

This is metadata-plane code: manifests are KBs-to-MBs. The data
plane stays parquet via Spark.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive encoders
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _unzigzag(acc)
        shift += 7


def write_bytes(out: io.BytesIO, data: bytes) -> None:
    write_long(out, len(data))
    out.write(data)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven datum encoder / decoder
# ---------------------------------------------------------------------------


def _resolve(schema, named: dict):
    """Return the concrete schema dict/str, registering named types."""
    if isinstance(schema, str) and schema in named:
        return named[schema]
    return schema


def _register(schema, named: dict) -> None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "fixed", "enum"):
        name = schema.get("name")
        if name:
            named[name] = schema


def write_datum(out: io.BytesIO, schema, datum, named: dict | None = None) -> None:
    named = named if named is not None else {}
    schema = _resolve(schema, named)
    _register(schema, named)
    if isinstance(schema, list):  # union
        for idx, branch in enumerate(schema):
            b = _resolve(branch, named)
            t = b if isinstance(b, str) else b.get("type")
            if datum is None and t == "null":
                write_long(out, idx)
                return
            if datum is not None and t != "null":
                write_long(out, idx)
                write_datum(out, b, datum, named)
                return
        raise ValueError(f"datum {datum!r} fits no union branch of {schema!r}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(datum))
    elif t == "float":
        out.write(struct.pack("<f", float(datum)))
    elif t == "double":
        out.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        write_bytes(out, bytes(datum))
    elif t == "string":
        write_bytes(out, datum.encode("utf-8"))
    elif t == "fixed":
        if len(datum) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(bytes(datum))
    elif t == "enum":
        write_long(out, schema["symbols"].index(datum))
    elif t == "record":
        for field in schema["fields"]:
            try:
                write_datum(out, field["type"], datum.get(field["name"]), named)
            except ValueError as exc:
                raise ValueError(f"field {field['name']!r}: {exc}") from exc
    elif t == "array":
        items = list(datum or [])
        if items:
            write_long(out, len(items))
            for item in items:
                write_datum(out, schema["items"], item, named)
        write_long(out, 0)
    elif t == "map":
        entries = dict(datum or {})
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                write_bytes(out, k.encode("utf-8"))
                write_datum(out, schema["values"], v, named)
        write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def read_datum(buf: io.BytesIO, schema, named: dict | None = None):
    named = named if named is not None else {}
    schema = _resolve(schema, named)
    _register(schema, named)
    if isinstance(schema, list):  # union
        idx = read_long(buf)
        return read_datum(buf, schema[idx], named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][read_long(buf)]
    if t == "record":
        return {
            f["name"]: read_datum(buf, f["type"], named) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_datum(buf, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"], named)
    raise ValueError(f"unsupported avro type: {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> None:
    """Write an Avro object container file. `sync` is derivable from
    the path for deterministic output (tests); callers that need
    uniqueness pass their own."""
    if sync is None:
        # deterministic but path-dependent; any 16 bytes are legal
        import hashlib

        sync = hashlib.sha256(path.encode()).digest()[:16]
    header = io.BytesIO()
    header.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    meta.update(metadata or {})
    write_long(header, len(meta))
    for k, v in meta.items():
        write_bytes(header, k.encode("utf-8"))
        write_bytes(header, v.encode("utf-8") if isinstance(v, str) else v)
    write_long(header, 0)
    header.write(sync)

    payload = io.BytesIO()
    named: dict = {}
    for rec in records:
        write_datum(payload, schema, rec, named)
    raw = payload.getvalue()
    if codec == "deflate":
        raw = zlib.compress(raw)[2:-4]  # avro: raw deflate, no zlib header/crc
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")

    body = io.BytesIO()
    if records:
        write_long(body, len(records))
        write_long(body, len(raw))
        body.write(raw)
        body.write(sync)

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(header.getvalue())
        f.write(body.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an Avro object container file -> (schema, metadata, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records: list[dict] = []
    named: dict = {}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(read_datum(bbuf, schema, named))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: bad sync marker")
    return schema, meta, records


def read_container_bytes(data: bytes) -> tuple[dict, dict[str, bytes], list[dict]]:
    """read_container over in-memory bytes (executor-side decode path:
    ingest --format avro ships file bytes to tasks via binaryFile and
    decodes there, keeping the driver out of the data plane)."""
    import tempfile

    # reuse the file reader's logic without duplicating it
    with tempfile.NamedTemporaryFile(suffix=".avro") as tmp:
        tmp.write(data)
        tmp.flush()
        return read_container(tmp.name)


def avro_schema_to_spark(schema):
    """Map the codec's Avro schema subset onto a Spark type.

    Supports what write_datum/read_datum support: primitives,
    record/array/map/fixed/enum, and 2-branch unions with null
    (nullable fields). Anything else raises — the ingest gate should
    fail loudly, not guess.
    """
    from pyspark.sql import types as T

    def conv(s):
        if isinstance(s, list):  # union
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise ValueError(f"unsupported avro union: {s}")
            t, _ = conv(branches[0])
            return t, True
        if isinstance(s, dict):
            typ = s["type"]
            if typ == "record":
                fields = []
                for f in s["fields"]:
                    t, nullable = conv(f["type"])
                    fields.append(T.StructField(f["name"], t, nullable))
                return T.StructType(fields), False
            if typ == "array":
                t, nullable = conv(s["items"])
                return T.ArrayType(t, containsNull=nullable), False
            if typ == "map":
                t, nullable = conv(s["values"])
                return T.MapType(T.StringType(), t, valueContainsNull=nullable), False
            if typ == "fixed":
                return T.BinaryType(), False
            if typ == "enum":
                return T.StringType(), False
            return conv(typ)
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if s in prim:
            return prim[s], s == "null"
        raise ValueError(f"unsupported avro type: {s!r}")

    t, _ = conv(schema)
    return t


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Reverse of avro_schema_to_spark: map a Spark StructType onto
    the codec's Avro subset. Nullable fields become ["null", T]
    unions; timestamps/dates become long/int with the standard
    logicalType annotations (annotation-only for this codec — the
    binary encoding is the underlying primitive)."""
    from pyspark.sql import types as T

    counter = [0]

    def conv(t, nullable: bool):
        if isinstance(t, T.StructType):
            counter[0] += 1
            s = {
                "type": "record",
                "name": f"{name}_{counter[0]}",
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable)}
                    for f in t.fields
                ],
            }
        elif isinstance(t, T.ArrayType):
            s = {"type": "array", "items": conv(t.elementType, t.containsNull)}
        elif isinstance(t, T.MapType):
            if not isinstance(t.keyType, T.StringType):
                raise ValueError("avro maps need string keys")
            s = {"type": "map", "values": conv(t.valueType, t.valueContainsNull)}
        elif isinstance(t, T.LongType):
            s = "long"
        elif isinstance(t, T.IntegerType) or isinstance(t, T.ShortType):
            s = "int"
        elif isinstance(t, T.DoubleType):
            s = "double"
        elif isinstance(t, T.FloatType):
            s = "float"
        elif isinstance(t, T.BooleanType):
            s = "boolean"
        elif isinstance(t, T.StringType):
            s = "string"
        elif isinstance(t, T.BinaryType):
            s = "bytes"
        elif isinstance(t, T.TimestampType):
            s = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(t, T.DateType):
            s = {"type": "int", "logicalType": "date"}
        else:
            raise ValueError(f"unsupported spark type for avro export: {t}")
        return ["null", s] if nullable else s

    fields = [
        {"name": f.name, "type": conv(f.dataType, f.nullable)} for f in schema.fields
    ]
    return {"type": "record", "name": name, "fields": fields}


def export_avro(df, dest: str) -> int:
    """Write a DataFrame as Avro container shards through this codec
    (no spark-avro package). EXECUTOR-side: each partition writes its
    own `part-<pid>.avro` under `dest` — the driver never holds row
    data; shard count = partition count, the usual Spark sink
    contract. Returns the number of shards written."""
    import datetime
    import os as _os

    schema = spark_schema_to_avro(df.schema)
    _os.makedirs(dest, exist_ok=True)

    def _plain(v):
        if isinstance(v, datetime.datetime):
            return int(v.timestamp() * 1_000_000)
        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days
        if isinstance(v, dict):
            return {k: _plain(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [_plain(x) for x in v]
        return v

    def write_shard(pid, rows):
        records = [
            {k: _plain(v) for k, v in r.asDict(recursive=True).items()} for r in rows
        ]
        if not records:
            return iter([])
        path = _os.path.join(dest, f"part-{pid:05d}.avro")
        write_container(path, schema, records)
        return iter([path])

    written = df.rdd.mapPartitionsWithIndex(write_shard).collect()
    return len(written)
