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
        write_bytes(out, _decimal_bytes(datum, schema))
    elif t == "string":
        write_bytes(out, datum.encode("utf-8"))
    elif t == "fixed":
        datum = _decimal_bytes(datum, schema, size=schema["size"])
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


def _decimal_bytes(datum, schema, size: int | None = None) -> bytes:
    """Encode a Decimal datum for a decimal-logical bytes/fixed field
    as the Avro-spec two's-complement big-endian unscaled int (minimal
    length for bytes, exactly `size` for fixed). Non-Decimal data pass
    through unchanged."""
    import decimal

    if not isinstance(datum, decimal.Decimal):
        return bytes(datum)
    scale = int(schema.get("scale", 0)) if isinstance(schema, dict) else 0
    # prec=76 keeps >28-significant-digit values exact; trapping
    # Inexact makes a datum with more fractional digits than the
    # schema scale fail loudly instead of half-even rounding on write
    ctx = decimal.Context(prec=76, traps=[decimal.Inexact])
    try:
        unscaled = int(datum.scaleb(scale, ctx).to_integral_exact(context=ctx))
    except decimal.Inexact:
        raise ValueError(
            f"decimal {datum} does not fit schema scale {scale} "
            "without rounding"
        ) from None
    length = size or max(1, (unscaled.bit_length() + 8) // 8)
    return unscaled.to_bytes(length, "big", signed=True)


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


class ContainerWriter:
    """Streaming Avro object-container writer: header up front, then
    one data block per `append_block` call, close() publishes the file
    atomically (tmp + rename). Memory is bounded by one block's
    records — the whole point for executor-side data exports, where a
    partition can be hundreds of MBs but an Arrow batch is ~10k rows.

    `sync` is derivable from the path for deterministic output
    (tests); callers that need uniqueness pass their own."""

    def __init__(
        self,
        path: str,
        schema: dict,
        metadata: dict[str, str] | None = None,
        codec: str = "deflate",
        sync: bytes | None = None,
    ) -> None:
        if codec not in ("deflate", "null"):
            raise ValueError(f"unsupported codec {codec!r}")
        if sync is None:
            # deterministic but path-dependent; any 16 bytes are legal
            import hashlib

            sync = hashlib.sha256(path.encode()).digest()[:16]
        self.path = path
        self.schema = schema
        self.codec = codec
        self.sync = sync
        self._named: dict = {}
        self._tmp = f"{path}.tmp.{os.getpid()}"
        self._f = open(self._tmp, "wb")
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
        self._f.write(header.getvalue())

    def append_block(self, records: list[dict]) -> None:
        if not records:
            return
        payload = io.BytesIO()
        for rec in records:
            write_datum(payload, self.schema, rec, self._named)
        self.append_encoded(len(records), payload.getvalue())

    def append_encoded(self, count: int, raw: bytes) -> None:
        """Append a data block from already-encoded record bytes (the
        vectorized avro_vec.encode_batch path)."""
        if not count:
            return
        if self.codec == "deflate":
            raw = zlib.compress(raw)[2:-4]  # avro: raw deflate, no zlib wrapper
        block = io.BytesIO()
        write_long(block, count)
        write_long(block, len(raw))
        block.write(raw)
        block.write(self.sync)
        self._f.write(block.getvalue())

    def close(self) -> None:
        self._f.close()
        os.replace(self._tmp, self.path)

    def abort(self) -> None:
        self._f.close()
        try:
            os.unlink(self._tmp)
        except OSError:
            pass


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> None:
    """Write an Avro object container file in one block (metadata-plane
    convenience over ContainerWriter; manifests are KBs-to-MBs)."""
    w = ContainerWriter(path, schema, metadata=metadata, codec=codec, sync=sync)
    try:
        w.append_block(records)
    except BaseException:
        w.abort()
        raise
    w.close()


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
            nullable = len(branches) != len(s)
            if len(branches) == 1:
                t, _ = conv(branches[0])
                return t, nullable
            # >=2 non-null branches: readable when all are plain
            # numeric primitives (Avro promotion chain) — one column
            # type, {int,long} -> long, any float/double -> double.
            # Mirrors avro_vec._union_promote; anything else fails
            # loudly below.
            from ice_spark.sources.avro_vec import Unsupported, _union_promote

            try:
                import pyarrow as pa

                promoted = _union_promote(s)
            except Unsupported:
                raise ValueError(f"unsupported avro union: {s}")
            t = (
                T.LongType()
                if promoted == pa.int64()
                else T.DoubleType()
            )
            return t, nullable
        if isinstance(s, dict):
            typ = s["type"]
            lt = s.get("logicalType")
            if lt in ("timestamp-micros", "timestamp-millis") and typ == "long":
                return T.TimestampType(), False
            if lt in ("local-timestamp-micros", "local-timestamp-millis") and typ == "long":
                return T.TimestampNTZType(), False
            if lt == "date" and typ == "int":
                return T.DateType(), False
            if lt == "decimal" and typ in ("bytes", "fixed"):
                return (
                    T.DecimalType(int(s["precision"]), int(s.get("scale", 0))),
                    False,
                )
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


def has_logical_types(s) -> bool:
    """True when the schema carries any timestamp/date logicalType the
    reader must decode (lets hot paths skip the converter entirely)."""
    if isinstance(s, list):
        return any(has_logical_types(b) for b in s)
    if isinstance(s, dict):
        if s.get("logicalType") in (
            "timestamp-micros",
            "timestamp-millis",
            "local-timestamp-micros",
            "local-timestamp-millis",
            "date",
            "decimal",
        ):
            return True
        typ = s["type"]
        if typ == "record":
            return any(has_logical_types(f["type"]) for f in s["fields"])
        if typ == "array":
            return has_logical_types(s["items"])
        if typ == "map":
            return has_logical_types(s["values"])
        return has_logical_types(typ)
    return False


def decode_logical(v, s):
    """Recursively convert logical-typed raw values (epoch micros/
    millis longs, epoch-day ints) into datetime/date objects, guided
    by the schema. Identity for everything else.

    timestamp-micros/millis decode as naive UTC wall time — NEVER
    through the host zone (fromtimestamp without tz): the session pins
    spark.sql.session.timeZone=UTC and reinterprets the naive result
    as UTC, so a host-local decode silently shifts every ingested
    timestamp on any non-UTC host."""
    import datetime

    if v is None:
        return None
    if isinstance(s, list):
        s = next(x for x in s if x != "null")
    if isinstance(s, dict):
        lt = s.get("logicalType")
        if lt == "timestamp-micros":
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=v
            )
        if lt == "local-timestamp-micros":
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=v)
        if lt in ("timestamp-millis", "local-timestamp-millis"):
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                milliseconds=v
            )
        if lt == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        if lt == "decimal":
            # read_datum yields the raw big-endian two's-complement
            # bytes (for both bytes- and fixed-backed decimals)
            import decimal

            # scale under an explicit prec=76 context: the default
            # thread context (prec=28) would silently round decimals
            # with >28 significant digits (ADVICE r12)
            return decimal.Decimal(
                int.from_bytes(v, "big", signed=True)
            ).scaleb(-int(s.get("scale", 0)), decimal.Context(prec=76))
        typ = s["type"]
        if typ == "record":
            return {
                f["name"]: decode_logical(v.get(f["name"]), f["type"])
                for f in s["fields"]
            }
        if typ == "array":
            return [decode_logical(x, s["items"]) for x in v]
        if typ == "map":
            return {k: decode_logical(x, s["values"]) for k, x in v.items()}
        return decode_logical(v, typ)
    return v


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
        elif isinstance(t, T.TimestampNTZType):
            # Avro spec: local-timestamp-micros = timezone-less wall
            # time, micros since 1970-01-01T00:00:00 (no zone)
            s = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif isinstance(t, T.DateType):
            s = {"type": "int", "logicalType": "date"}
        elif isinstance(t, T.DecimalType):
            s = {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": t.precision,
                "scale": t.scale,
            }
        else:
            raise ValueError(f"unsupported spark type for avro export: {t}")
        return ["null", s] if nullable else s

    fields = [
        {"name": f.name, "type": conv(f.dataType, f.nullable)} for f in schema.fields
    ]
    return {"type": "record", "name": name, "fields": fields}


def _avro_normalize(v, s):
    """Map an Arrow-materialized Python value onto what write_datum
    expects, guided by the Avro schema node: pyarrow 16 yields maps as
    [(k, v), ...] tuple lists, timestamps as datetimes, dates as
    date objects."""
    import datetime

    if v is None:
        return None
    if isinstance(s, list):  # union — normalize against the non-null branch
        s = next(x for x in s if x != "null")
    t = s["type"] if isinstance(s, dict) else s
    if t == "record":
        return {
            f["name"]: _avro_normalize(v.get(f["name"]), f["type"])
            for f in s["fields"]
        }
    if t == "array":
        return [_avro_normalize(x, s["items"]) for x in v]
    if t == "map":
        items = v.items() if isinstance(v, dict) else v
        return {k: _avro_normalize(x, s["values"]) for k, x in items}
    if t == "long" and isinstance(v, datetime.datetime):
        if isinstance(s, dict) and s.get("logicalType") == "local-timestamp-micros":
            # timezone-less wall time: micros since the naive epoch,
            # never interpreted through the local zone
            delta = v.replace(tzinfo=None) - datetime.datetime(1970, 1, 1)
            return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
        # integer-safe epoch micros: float .timestamp()*1e6 cannot always
        # represent microseconds at current epochs and int() truncates
        # (values written 1 us low). Arrow hands tz-aware UTC datetimes;
        # a naive datetime is treated as UTC wall time, matching
        # decode_logical's naive-UTC convention.
        if v.tzinfo is not None:
            delta = v - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        else:
            delta = v - datetime.datetime(1970, 1, 1)
        return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
    if t == "int" and isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    return v


# Export destination routing: scheme -> (make_put, clear, exists).
#   make_put(dest) -> put(shard_name, data: bytes) -> url   (or None for
#   direct local writes); the returned put must be PICKLABLE and build
#   any provider client lazily INSIDE the call — it runs in the
#   executor's Python worker, which re-imports this module fresh.
#   clear(dest) removes pre-existing part-*.avro shards (Spark
#   mode("overwrite") semantics — without it a re-export with fewer
#   partitions leaves stale shards that re-ingest as duplicate rows).
#   exists(dest) -> bool probes for pre-existing shards so
#   overwrite=False can refuse; a scheme registered without one makes
#   overwrite=False an error (refusing silently-stale re-exports).
_EXPORT_SCHEMES: dict = {}


def register_export_scheme(scheme: str, make_put, clear, exists=None) -> None:
    _EXPORT_SCHEMES[scheme] = (make_put, clear, exists)


def _local_dir(dest: str) -> str:
    return dest[len("file://") :] if dest.startswith("file://") else dest


def _clear_local(dest: str) -> None:
    import glob as _glob

    for p in _glob.glob(os.path.join(_local_dir(dest), "part-*.avro")):
        os.unlink(p)


def _s3_put_factory(dest: str):
    def put(name: str, data: bytes) -> str:
        from ice_spark.sources.s3 import new_s3_client, parse_s3_uri

        url = dest.rstrip("/") + "/" + name
        bp = parse_s3_uri(url)
        new_s3_client().put_object(Bucket=bp.bucket, Key=bp.key, Body=data)
        return url

    return put


def _s3_clear(dest: str) -> None:
    from ice_spark.sources.s3 import list_wildcard, new_s3_client, parse_s3_uri

    client = new_s3_client()
    for url in list_wildcard(client, dest.rstrip("/") + "/part-*.avro"):
        bp = parse_s3_uri(url)
        client.delete_object(Bucket=bp.bucket, Key=bp.key)


def _s3_exists(dest: str) -> bool:
    from ice_spark.sources.s3 import list_wildcard, new_s3_client

    return bool(list_wildcard(new_s3_client(), dest.rstrip("/") + "/part-*.avro"))


def export_avro(
    df,
    dest: str,
    codec: str = "deflate",
    overwrite: bool = True,
    vectorized: bool = True,
    stats: dict | None = None,
) -> int:
    """Write a DataFrame as Avro container shards through this codec
    (no spark-avro package). Arrow path end to end: `mapInArrow`
    streams each partition's RecordBatches into a ContainerWriter —
    one Avro block per Arrow batch, so executor memory is bounded by a
    batch, never the partition — and the driver only ever sees one
    (path, rows) row per shard. Record encoding is the vectorized
    avro_vec.encode_batch (numpy varints + C++ binary_join, zero
    per-row Python; byte-identical by property test), with a
    per-datum fallback for constructs outside its subset. Destination is scheme-routed: bare /
    file:// paths write executor-locally (single-node or shared-fs
    deployments), s3:// (and any register_export_scheme scheme)
    spools the shard to executor-local tmp then uploads, so `dest`
    is NOT executor-local disk on a real cluster. `overwrite=True`
    clears pre-existing part-*.avro first (Spark mode("overwrite")
    semantics); overwrite=False refuses a dest that already has
    shards. Returns the number of shards written (empty partitions
    write none).

    Pass `stats={}` to receive encoder-path observability: per-run
    totals `vectorized_batches` / `fallback_batches` (a fallback was
    previously silent from the caller's view) plus the per-shard
    `shards` rows."""
    scheme = dest.split("://", 1)[0] if "://" in dest else "file"
    if scheme in _EXPORT_SCHEMES:
        make_put, clear, exists = _EXPORT_SCHEMES[scheme]
    elif scheme == "file":
        make_put, clear, exists = None, _clear_local, None
    elif scheme == "s3":
        make_put, clear, exists = _s3_put_factory, _s3_clear, _s3_exists
    else:
        raise ValueError(
            f"unsupported avro export scheme {scheme!r} "
            "(register one with register_export_scheme)"
        )
    if overwrite:
        clear(dest)
    else:
        # every scheme must refuse a dest that already has shards —
        # otherwise a re-export with fewer partitions leaves stale
        # part-*.avro that re-ingest as duplicate rows
        if make_put is None:
            import glob as _glob

            occupied = bool(_glob.glob(os.path.join(_local_dir(dest), "part-*.avro")))
        elif exists is not None:
            occupied = exists(dest)
        else:
            raise ValueError(
                f"scheme {scheme!r} was registered without an existence "
                "probe; overwrite=False cannot be honored — pass "
                "exists= to register_export_scheme or use overwrite=True"
            )
        if occupied:
            raise FileExistsError(
                f"{dest} already has avro shard(s); "
                "pass overwrite=True to replace them"
            )

    schema = spark_schema_to_avro(df.schema)
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    local_dir = _local_dir(dest) if make_put is None else None
    put = make_put(dest) if make_put is not None else None

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        from ice_spark.sources import avro_vec

        name = f"part-{TaskContext.get().partitionId():05d}.avro"
        writer = None
        target = None
        n = 0
        vec_batches = 0
        fb_batches = 0
        vec_ok = vectorized  # per-batch fallback: one Unsupported disables
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if writer is None:
                if put is None:
                    os.makedirs(local_dir, exist_ok=True)
                    target = os.path.join(local_dir, name)
                    writer = ContainerWriter(target, schema, codec=codec)
                else:
                    import hashlib
                    import tempfile

                    fd, target = tempfile.mkstemp(suffix=".avro")
                    os.close(fd)
                    # derive the sync marker from the FINAL destination
                    # URL, not the random mkstemp path — exported shard
                    # bytes stay deterministic across runs (matching
                    # local exports, whose sync hashes the stable path)
                    sync = hashlib.sha256(
                        (dest.rstrip("/") + "/" + name).encode()
                    ).digest()[:16]
                    writer = ContainerWriter(target, schema, codec=codec, sync=sync)
            if vec_ok:
                try:
                    count, payload = avro_vec.encode_batch(batch, schema)
                    writer.append_encoded(count, payload)
                    n += count
                    vec_batches += 1
                    continue
                except avro_vec.Unsupported:
                    vec_ok = False  # per-datum path from here on
            rows = batch.to_pylist()
            writer.append_block(
                [{k: _avro_normalize(r.get(k), s) for k, s in fields} for r in rows]
            )
            n += len(rows)
            fb_batches += 1
        if writer is None:
            return
        writer.close()
        url = target
        if put is not None:
            with open(target, "rb") as f:
                url = put(name, f.read())
            os.unlink(target)
        yield pa.RecordBatch.from_pylist(
            [
                {
                    "path": url,
                    "rows": n,
                    "vectorized_batches": vec_batches,
                    "fallback_batches": fb_batches,
                }
            ]
        )

    out = df.mapInArrow(
        write_partition,
        "path string, rows long, vectorized_batches long, fallback_batches long",
    )
    # one row per shard — bounded driver collect, and it carries the
    # encoder-path counts a silent fallback used to hide
    shard_rows = out.collect()
    if stats is not None:
        stats["vectorized_batches"] = sum(r.vectorized_batches for r in shard_rows)
        stats["fallback_batches"] = sum(r.fallback_batches for r in shard_rows)
        stats["shards"] = [r.asDict() for r in shard_rows]
    return len(shard_rows)
