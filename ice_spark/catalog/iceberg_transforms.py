"""Iceberg-spec bucket and truncate transforms.

The reference applies the Iceberg library's real transforms
client-side when building partition values
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/iceberg/Partitioning.java:84-145),
so tables it writes are prunable by any Iceberg reader. This module
gives our engine the same property: bucket[N] and truncate[W] follow
the public Iceberg Table Spec (Appendix B, "Bucket Transform details"
and "Truncate Transform details"), so exported partition specs can
keep those fields and foreign readers prune correctly.

Two implementations of the same math, cross-checked in tests:

- Pure Python (`murmur3_32`, `bucket_value`, `truncate_value`) —
  used by the Iceberg export/import bridge and as the oracle in
  tests. Verified against the spec's reference hash values AND
  against the JVM's own Murmur3_x86_32 (via the Spark gateway).
- Spark Column expressions (`bucket_expr`, `truncate_expr`) — the
  ingest hot path. For fixed-8-byte inputs (int/long/date/timestamp)
  the murmur3 rounds are unrolled into pure JVM-side integer
  expressions (whole-stage codegen, no Python in the 100-TB write
  path). Variable-length inputs (string/binary/decimal) fall back to
  an Arrow-batched pandas_udf.

Bucket id = (murmur3_x86_32(serialize(v), seed=0) & 0x7FFFFFFF) % N.
Serialization per spec Appendix B: int/long -> 8-byte little-endian
long; date -> days-from-epoch as long; timestamp -> micros as long;
string -> UTF-8 bytes; binary -> raw; decimal -> minimal big-endian
two's-complement of the unscaled value.

Truncate: ints  v - (((v % W) + W) % W)   (floor toward -inf),
          string/binary first W chars/bytes,
          decimal truncates the unscaled value the same way.
"""

from __future__ import annotations

import datetime
import decimal
import struct

import pandas as pd  # noqa: F401 - resolves pandas_udf type hints

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as SPT

_MASK32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


# ---------------------------------------------------------------------------
# pure-Python murmur3_x86_32 (public algorithm; written from the
# published reference description, verified against the JVM impl)
# ---------------------------------------------------------------------------


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 of `data`; returns a SIGNED 32-bit int (to match
    JVM semantics, which is what the Iceberg spec's reference values
    use)."""
    h = seed & _MASK32
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * _C1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * _C2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    # tail
    k = 0
    tail = data[n_blocks * 4 :]
    for i in range(len(tail) - 1, -1, -1):
        k = (k << 8) | tail[i]
    if tail:
        k = (k * _C1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * _C2) & _MASK32
        h ^= k
    # finalization
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _decimal_unscaled_bytes(unscaled: int) -> bytes:
    """Minimal two's-complement big-endian bytes of an int (Java
    BigInteger.toByteArray), per spec Appendix B decimal hashing."""
    if unscaled == 0:
        return b"\x00"
    # Java bitLength(): for negatives, the bit length of ~x (so -128
    # needs 7 bits -> ONE byte b'\x80', not b'\xff\x80'); +1 sign bit
    bit_len = unscaled.bit_length() if unscaled > 0 else (-unscaled - 1).bit_length()
    length = bit_len // 8 + 1
    return unscaled.to_bytes(length, "big", signed=True)


def serialize_for_bucket(value, dt: SPT.DataType) -> bytes:
    """Iceberg Appendix-B byte serialization of a value for hashing."""
    if isinstance(dt, (SPT.IntegerType, SPT.LongType, SPT.ShortType, SPT.ByteType)):
        return struct.pack("<q", int(value))
    if isinstance(dt, SPT.DateType):
        if isinstance(value, datetime.date):
            value = (value - _EPOCH_DATE).days
        return struct.pack("<q", int(value))
    if isinstance(dt, (SPT.TimestampType, SPT.TimestampNTZType)):
        if isinstance(value, datetime.datetime):
            if value.tzinfo is None:
                value = value.replace(tzinfo=datetime.timezone.utc)
            value = round((value - _EPOCH_TS).total_seconds() * 1_000_000)
        return struct.pack("<q", int(value))
    if isinstance(dt, SPT.StringType):
        return str(value).encode("utf-8")
    if isinstance(dt, SPT.BinaryType):
        return bytes(value)
    if isinstance(dt, SPT.DecimalType):
        d = decimal.Decimal(value).scaleb(dt.scale)
        return _decimal_unscaled_bytes(int(d))
    raise ValueError(f"bucket transform does not support type {dt}")


def bucket_value(value, n: int, dt: SPT.DataType) -> int | None:
    if value is None:
        return None
    return (murmur3_32(serialize_for_bucket(value, dt)) & 0x7FFFFFFF) % n


def truncate_value(value, w: int, dt: SPT.DataType):
    if value is None:
        return None
    if isinstance(dt, (SPT.IntegerType, SPT.LongType, SPT.ShortType, SPT.ByteType)):
        v = int(value)
        return v - (((v % w) + w) % w)
    if isinstance(dt, SPT.StringType):
        return str(value)[:w]
    if isinstance(dt, SPT.BinaryType):
        return bytes(value)[:w]
    if isinstance(dt, SPT.DecimalType):
        d = decimal.Decimal(value)
        unscaled = int(d.scaleb(dt.scale))
        trunc = unscaled - (((unscaled % w) + w) % w)
        return decimal.Decimal(trunc).scaleb(-dt.scale)
    raise ValueError(f"truncate transform does not support type {dt}")


# ---------------------------------------------------------------------------
# Spark Column expressions
# ---------------------------------------------------------------------------


def _mul32(x: Column, c: int) -> Column:
    """(x * c) mod 2^32 without signed-64 overflow (ANSI-safe): split
    x into 16-bit halves; each partial product stays < 2^48."""
    lo = x.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
    hi = (F.shiftright(x, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF))
    return (lo + F.shiftleft(hi, 16)).bitwiseAND(F.lit(_MASK32))


def _rotl32(x: Column, r: int) -> Column:
    # x is pre-masked to 32 bits (non-negative), so shifts are logical
    return F.shiftleft(x, r).bitwiseAND(F.lit(_MASK32)).bitwiseOR(F.shiftright(x, 32 - r))


def _let(col: Column, fn) -> Column:
    """Bind `col` to a lambda variable so `fn` can reference it many
    times without duplicating its expression tree (naive Column
    composition re-inlines subtrees, which grows the murmur3 rounds
    exponentially — a ~180KB plan string; with lambda bindings the
    tree stays linear in the number of rounds)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def _murmur3_of_long_expr(v: Column) -> Column:
    """murmur3_x86_32(little-endian 8 bytes of bigint `v`), seed 0 —
    JVM-side integer expression (aggregate over the two 4-byte
    blocks + final mix), matching `murmur3_32(struct.pack('<q', v))`.
    Returns the UNSIGNED 32-bit hash as bigint. No Python in the
    path: the per-row work is a fixed ~60 JVM expression ops."""

    def mix_k(k: Column) -> Column:
        return _let(
            _mul32(k, _C1),
            lambda a: _let(_rotl32(a, 15), lambda b: _mul32(b, _C2)),
        )

    def round_(h: Column, k: Column) -> Column:
        return _let(
            h.bitwiseXOR(mix_k(k)),
            lambda hx: _let(
                _rotl32(hx, 13),
                lambda hr: (hr * F.lit(5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_MASK32)),
            ),
        )

    def fmix(h: Column) -> Column:
        h = _let(h.bitwiseXOR(F.lit(8)), lambda a: a.bitwiseXOR(F.shiftright(a, 16)))
        h = _let(h, lambda a: _mul32(a, 0x85EBCA6B))
        h = _let(h, lambda a: a.bitwiseXOR(F.shiftright(a, 13)))
        h = _let(h, lambda a: _mul32(a, 0xC2B2AE35))
        return _let(h, lambda a: a.bitwiseXOR(F.shiftright(a, 16)))

    v = _let(v.cast("long"), lambda x: x)  # evaluate the source once
    blocks = F.array(
        v.bitwiseAND(F.lit(_MASK32)),
        F.shiftright(v, 32).bitwiseAND(F.lit(_MASK32)),
    )
    return F.aggregate(blocks, F.lit(0).cast("long"), round_, fmix)


def _bucket_udf(n: int, dt: SPT.DataType):
    from pyspark.sql.functions import pandas_udf

    def _bucket(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: None if v is None else bucket_value(v, n, dt),
            na_action="ignore",
        ).astype("Int32")

    return pandas_udf(_bucket, returnType="int")


def bucket_expr(col: Column, dt: SPT.DataType, n: int) -> Column:
    """Iceberg bucket[n] as a Column. JVM-side for fixed-width types;
    Arrow-batched pandas_udf for variable-length ones."""
    if isinstance(dt, (SPT.IntegerType, SPT.LongType, SPT.ShortType, SPT.ByteType)):
        as_long = col.cast("long")
    elif isinstance(dt, SPT.DateType):
        as_long = F.unix_date(col).cast("long")
    elif isinstance(dt, (SPT.TimestampType, SPT.TimestampNTZType)):
        if isinstance(dt, SPT.TimestampNTZType):
            # NTZ micros are defined timezone-free, but the only route
            # to unix_micros is a cast that interprets the wall time in
            # the SESSION zone — pin it to UTC or the hashed value (and
            # thus the written bucket id) shifts by the zone offset,
            # diverging from the spec and from bucket_value's oracle.
            sess = SparkSession.getActiveSession()
            tz = sess.conf.get("spark.sql.session.timeZone", "") if sess else "UTC"
            if tz != "UTC":
                raise ValueError(
                    "bucket[] on timestamp_ntz requires "
                    f"spark.sql.session.timeZone=UTC (session has {tz!r})"
                )
        as_long = F.unix_micros(col.cast("timestamp"))
    elif isinstance(dt, (SPT.StringType, SPT.BinaryType, SPT.DecimalType)):
        return _bucket_udf(n, dt)(col)
    else:
        raise ValueError(f"bucket transform does not support type {dt}")
    hashed = _murmur3_of_long_expr(as_long)
    return (
        F.when(col.isNull(), F.lit(None))
        .otherwise(hashed.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(n))
        .cast("int")
    )


def truncate_expr(col: Column, dt: SPT.DataType, w: int) -> Column:
    """Iceberg truncate[w] as a Column (floor semantics for numerics:
    pmod gives the always-positive remainder the spec requires)."""
    if isinstance(dt, (SPT.IntegerType, SPT.LongType, SPT.ShortType, SPT.ByteType)):
        return col - F.pmod(col, F.lit(w))
    if isinstance(dt, SPT.StringType):
        return F.substring(col, 1, w)
    if isinstance(dt, SPT.BinaryType):
        return F.substring(col, 1, w)
    if isinstance(dt, SPT.DecimalType):
        from pyspark.sql.functions import pandas_udf

        def _trunc(c: pd.Series) -> pd.Series:
            return c.map(lambda v: None if v is None else truncate_value(v, w, dt))

        return pandas_udf(_trunc, returnType=dt)(col)
    raise ValueError(f"truncate transform does not support type {dt}")
