"""Vectorized Avro binary encoding over Arrow RecordBatches.

The pure-Python datum encoder in avro_io.py is correct but per-core
bound at ~19k rows/s on export (PERF.md): every row pays
`to_pylist` + `_avro_normalize` + a recursive `write_datum` with
BytesIO writes and a Python varint loop. This module encodes the
SAME bytes with zero per-row Python:

- each field becomes a `large_binary` Arrow array holding that
  field's per-row Avro encoding, built column-at-a-time with numpy
  (zigzag-varints via a (n, 10) byte matrix + boolean-mask
  flattening; fixed-width floats/doubles/bools via `.view(uint8)`
  reshape) and `pyarrow.compute` casts;
- rows are stitched JVM^WC++-side with
  `pc.binary_join_element_wise(field1, ..., fieldN, b"")`, and
  variable-length children (array items, map entries) with
  `pc.binary_join(list_of_encoded_items, b"")`;
- the block payload is then a single contiguous slice of the join
  result's data buffer.

Output is byte-identical to `avro_io.write_datum` over the schema
subset `spark_schema_to_avro` emits (records, 2-branch null unions,
primitives, string/bytes, timestamp/date logical types, arrays,
maps) — pinned by a hypothesis property test in
tests/test_avro_vec.py. Constructs outside that subset raise
`Unsupported`; callers fall back to the per-datum path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LB = pa.large_binary()
_SEP = pa.scalar(b"", type=_LB)
_NULL_BYTE = pa.scalar(b"\x00", type=_LB)


class Unsupported(ValueError):
    """Schema/array construct the vectorized encoder does not cover."""


def _lb(data: bytes, offsets: np.ndarray) -> pa.Array:
    """large_binary array from a contiguous data blob + int64 offsets."""
    return pa.Array.from_buffers(
        _LB,
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64, copy=False).tobytes()), pa.py_buffer(data)],
    )


def _offsets_from_lengths(lengths: np.ndarray) -> np.ndarray:
    off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    return off


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return ((v << np.int64(1)) ^ (v >> np.int64(63))).view(np.uint64)


def _varint_lb(
    z: np.ndarray,
    marker: np.ndarray | None = None,
    live: np.ndarray | None = None,
) -> pa.Array:
    """Per-row varint encodings of zigzagged uint64 `z` as large_binary.

    marker: optional per-row uint8 prepended before the varint (the
    union branch byte). live: optional bool mask; dead rows emit the
    marker alone (or nothing when marker is None) — used both for
    null-union fields and for empty-array/map counts, where Avro
    writes no count varint at all.
    """
    n = len(z)
    if live is not None:
        z = np.where(live, z, np.uint64(0))
    shifts = np.arange(10, dtype=np.uint64) * np.uint64(7)
    m = ((z[:, None] >> shifts[None, :]) & np.uint64(0x7F)).astype(np.uint8)
    m |= 0x80
    nb = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nb += z >= (np.uint64(1) << np.uint64(7 * k))
    if n:
        m[np.arange(n), nb - 1] &= 0x7F
    if marker is not None:
        m = np.concatenate([marker.reshape(n, 1), m], axis=1)
        total = nb + 1 if live is None else np.where(live, nb + 1, 1)
        cols = 11
    else:
        total = nb if live is None else np.where(live, nb, 0)
        cols = 10
    mask = np.arange(cols)[None, :] < total[:, None]
    if marker is not None and live is not None:
        # dead rows keep only the marker byte
        mask[:, 1:] &= live[:, None]
    return _lb(m[mask].tobytes(), _offsets_from_lengths(total))


def _fixed_lb(
    raw: np.ndarray,
    marker: np.ndarray | None = None,
    live: np.ndarray | None = None,
) -> pa.Array:
    """Fixed-width per-row encodings from a (n, w) uint8 matrix."""
    n, w = raw.shape
    if marker is None:
        return _lb(
            np.ascontiguousarray(raw).tobytes(),
            np.arange(n + 1, dtype=np.int64) * w,
        )
    m = np.concatenate([marker.reshape(n, 1), raw], axis=1)
    total = np.full(n, w + 1, dtype=np.int64)
    if live is not None:
        total = np.where(live, w + 1, 1)
    mask = np.arange(w + 1)[None, :] < total[:, None]
    return _lb(m[mask].tobytes(), _offsets_from_lengths(total))


def _validity(
    arr: pa.Array, vm: np.uint8 = np.uint8(2), nm: np.uint8 = np.uint8(0)
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """(live bool array, marker uint8 array) or (None, None) if dense.

    vm/nm are the value/null branch marker bytes (zigzag of the branch
    INDEX): null-first unions use (2, 0), null-last ["T","null"] —
    legal Avro that foreign writers emit — use (0, 2)."""
    if arr.null_count == 0:
        return None, None
    live = arr.is_valid().to_numpy(zero_copy_only=False)
    return live, np.where(live, vm, nm)


def _ints_np(arr: pa.Array) -> np.ndarray:
    # cast(int64) exposes the raw temporal payload, so only the units
    # spark_schema_to_avro annotates are safe: micros timestamps
    # (timestamp-micros / local-timestamp-micros) and day dates. A
    # ms/ns batch would silently encode the wrong magnitude — refuse.
    if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
        raise Unsupported(f"timestamp unit {arr.type.unit!r} (need us)")
    if pa.types.is_date64(arr.type):
        raise Unsupported("date64 (need date32 epoch days)")
    if pa.types.is_date32(arr.type):
        arr = arr.cast(pa.int32())
    elif pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return pc.fill_null(arr.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)


def _union_wrap(
    arr: pa.Array,
    payload: pa.Array,
    vm: np.uint8 = np.uint8(2),
    nm: np.uint8 = np.uint8(0),
) -> pa.Array:
    """Generic null-union wrapper for payloads built without a folded
    marker (records, arrays, maps): branch byte + payload-or-empty."""
    live, marker = _validity(arr, vm, nm)
    if live is None:
        n = len(arr)
        marker = np.full(n, vm)
        return pc.binary_join_element_wise(
            _lb(marker.tobytes(), np.arange(n + 1, dtype=np.int64)), payload, _SEP
        )
    n = len(arr)
    payload = pc.if_else(arr.is_valid(), payload, _SEP)
    return pc.binary_join_element_wise(
        _lb(marker.tobytes(), np.arange(n + 1, dtype=np.int64)), payload, _SEP
    )


def _is_null_schema(s) -> bool:
    return s == "null" or (isinstance(s, dict) and s.get("type") == "null")


def _union_promote(schema: list) -> "pa.DataType":
    """Arrow column type for a union with >=2 non-null branches.

    Readable only when every non-null branch is a plain numeric
    primitive (no logicalType), following the Avro-spec promotion
    chain int->long->float->double: {int,long} -> int64, any float/
    double in the mix -> float64. Anything else (string+long, named
    types, logical types) has no single faithful column type — raise
    Unsupported so the caller falls back / fails loudly."""
    prims = set()
    for b in schema:
        if _is_null_schema(b):
            continue
        t = b if isinstance(b, str) else None
        if isinstance(b, dict) and not b.get("logicalType"):
            t = b.get("type")
        if t not in ("int", "long", "float", "double"):
            raise Unsupported(f"union {schema!r}")
        prims.add(t)
    if not prims:
        raise Unsupported(f"union {schema!r}")
    if prims <= {"int", "long"}:
        return pa.int64()
    return pa.float64()


def _encode(arr: pa.Array, schema) -> pa.Array:
    """Per-row Avro encoding of `arr` under `schema` as large_binary.

    Null-union schemas fold the branch byte in; everything the
    subset does not cover raises Unsupported (caller falls back)."""
    if isinstance(schema, list):  # union — 2-branch with null supported
        branches = [b for b in schema if not _is_null_schema(b)]
        if len(schema) != 2 or len(branches) != 1:
            raise Unsupported(f"union {schema!r}")
        # Branch bytes are zigzag of the branch INDEX, so null-last
        # ["T","null"] (legal Avro, emitted by foreign writers) swaps
        # the markers: value byte zigzag(0)=0, null byte zigzag(1)=2.
        null_idx = 0 if _is_null_schema(schema[0]) else 1
        vm = np.uint8(2 * (1 - null_idx))
        nm = np.uint8(2 * null_idx)
        return _encode_nullable(arr, branches[0], vm, nm)
    if arr.null_count != 0:
        raise Unsupported("nulls in a non-nullable avro field")
    return _encode_dense(arr, schema, None, None)


def _encode_nullable(
    arr: pa.Array,
    schema,
    vm: np.uint8 = np.uint8(2),
    nm: np.uint8 = np.uint8(0),
) -> pa.Array:
    live, marker = _validity(arr, vm, nm)
    if live is None:
        n = len(arr)
        live, marker = None, np.full(n, vm)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t in ("record", "array", "map"):
        return _union_wrap(arr, _encode_dense(arr, schema, None, None), vm, nm)
    return _encode_dense(arr, schema, marker, live)


def _encode_dense(
    arr: pa.Array, schema, marker: np.ndarray | None, live: np.ndarray | None
) -> pa.Array:
    t = schema["type"] if isinstance(schema, dict) else schema
    n = len(arr)
    if t in ("int", "long"):
        return _varint_lb(_zigzag(_ints_np(arr)), marker, live)
    if t == "boolean":
        raw = pc.fill_null(arr.cast(pa.uint8()), 0).to_numpy(zero_copy_only=False)
        return _fixed_lb(raw.reshape(n, 1), marker, live)
    if t == "float":
        raw = pc.fill_null(arr.cast(pa.float32()), 0.0).to_numpy(zero_copy_only=False)
        return _fixed_lb(raw.astype("<f4", copy=False).view(np.uint8).reshape(n, 4), marker, live)
    if t == "double":
        raw = pc.fill_null(arr.cast(pa.float64()), 0.0).to_numpy(zero_copy_only=False)
        return _fixed_lb(raw.astype("<f8", copy=False).view(np.uint8).reshape(n, 8), marker, live)
    if t in ("string", "bytes"):
        data = arr.cast(_LB)
        off = np.frombuffer(data.buffers()[1], dtype=np.int64)[
            data.offset : data.offset + n + 1
        ]
        lengths = np.diff(off)
        if live is not None:
            lengths = np.where(live, lengths, 0)
        prefix = _varint_lb(_zigzag(lengths), marker, live)
        if data.null_count:
            data = pc.fill_null(data, b"")
        return pc.binary_join_element_wise(prefix, data, _SEP)
    if t == "record":
        if not isinstance(arr.type, pa.StructType):
            raise Unsupported(f"record field backed by {arr.type}")
        fields = [
            _encode(arr.field(f["name"]), f["type"]) for f in schema["fields"]
        ]
        if not fields:
            raise Unsupported("empty record")
        if len(fields) == 1:
            return fields[0]
        return pc.binary_join_element_wise(*fields, _SEP)
    if t == "array":
        if not pa.types.is_list(arr.type) and not pa.types.is_large_list(arr.type):
            raise Unsupported(f"array field backed by {arr.type}")
        counts = pc.fill_null(pc.list_value_length(arr), 0).cast(pa.int64())
        counts_np = counts.to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(arr)
        items = _encode(flat, schema["items"])
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(_offsets_from_lengths(counts_np)), items
            ),
            _SEP,
        )
        prefix = _varint_lb(_zigzag(counts_np), None, counts_np > 0)
        suffix = _lb(b"\x00" * n, np.arange(n + 1, dtype=np.int64))
        return pc.binary_join_element_wise(prefix, joined, suffix, _SEP)
    if t == "map":
        if not pa.types.is_map(arr.type):
            raise Unsupported(f"map field backed by {arr.type}")
        if not pa.types.is_string(arr.type.key_type):
            raise Unsupported("avro maps need string keys")
        as_list = arr.cast(
            pa.list_(
                pa.struct(
                    [("key", arr.type.key_type), ("value", arr.type.item_type)]
                )
            )
        )
        counts_np = (
            pc.fill_null(pc.list_value_length(as_list), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        flat = pc.list_flatten(as_list)
        key_enc = _encode(flat.field("key"), "string")
        val_enc = _encode(flat.field("value"), schema["values"])
        entries = pc.binary_join_element_wise(key_enc, val_enc, _SEP)
        joined = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(_offsets_from_lengths(counts_np)), entries
            ),
            _SEP,
        )
        prefix = _varint_lb(_zigzag(counts_np), None, counts_np > 0)
        suffix = _lb(b"\x00" * n, np.arange(n + 1, dtype=np.int64))
        return pc.binary_join_element_wise(prefix, joined, suffix, _SEP)
    raise Unsupported(f"avro type {t!r}")


def encode_batch(batch: pa.RecordBatch, schema: dict) -> tuple[int, bytes]:
    """Encode an Arrow RecordBatch as concatenated Avro binary records
    under a top-level record `schema` (spark_schema_to_avro output).
    Returns (row_count, payload). Raises Unsupported outside the
    covered subset — callers fall back to the per-datum encoder."""
    if schema.get("type") != "record":
        raise Unsupported("top-level schema must be a record")
    n = batch.num_rows
    if n == 0:
        return 0, b""
    cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
    fields = []
    for f in schema["fields"]:
        if f["name"] not in cols:
            raise Unsupported(f"batch is missing field {f['name']!r}")
        fields.append(_encode(cols[f["name"]], f["type"]))
    joined = (
        fields[0]
        if len(fields) == 1
        else pc.binary_join_element_wise(*fields, _SEP)
    )
    off = np.frombuffer(joined.buffers()[1], dtype=np.int64)[
        joined.offset : joined.offset + n + 1
    ]
    payload = bytes(memoryview(joined.buffers()[2])[off[0] : off[-1]])
    return n, payload


# ---------------------------------------------------------------------------
# schema-compiled decoder (read path)
# ---------------------------------------------------------------------------
#
# Decoding Avro's row-major binary cannot be numpy-vectorized the way
# encoding can (every offset is data-dependent), but the per-value
# constant can be collapsed: compile_decoder() generates ONE flat
# Python function per schema — inlined varint loops, memoryview
# slicing, no recursion, no per-value schema dispatch, no BytesIO —
# that decodes a whole block into per-FIELD columns (lists), ready to
# become Arrow arrays without ever materializing row dicts or
# datetime objects (temporal columns stay epoch ints; Arrow applies
# the logical type).


def _dec_varint(p_var: str, out_var: str, lines: list, ind: str) -> None:
    lines += [
        f"{ind}_b = mv[{p_var}]; {p_var} += 1",
        f"{ind}if _b < 128:",
        f"{ind}    _z = _b",
        f"{ind}else:",
        f"{ind}    _z = _b & 127; _sh = 7",
        f"{ind}    _b = mv[{p_var}]; {p_var} += 1",
        f"{ind}    while _b >= 128:",
        f"{ind}        _z |= (_b & 127) << _sh; _sh += 7",
        f"{ind}        _b = mv[{p_var}]; {p_var} += 1",
        f"{ind}    _z |= _b << _sh",
        f"{ind}{out_var} = (_z >> 1) ^ -(_z & 1)",
    ]


class _Emitter:
    def __init__(self) -> None:
        self.n = 0
        #: constants (enum symbol tables) injected into the compiled
        #: function's namespace
        self.consts: dict[str, object] = {}

    def tmp(self) -> str:
        self.n += 1
        return f"_v{self.n}"

    def const(self, value) -> str:
        name = f"_k{len(self.consts)}"
        self.consts[name] = value
        return name

    def emit(self, schema, out: str, lines: list, ind: str) -> None:
        """Append code that decodes one datum of `schema` from mv at p
        into the variable `out` (p advances)."""
        if isinstance(schema, list):
            branches = [b for b in schema if not _is_null_schema(b)]
            if len(schema) == 2 and len(branches) == 1:
                # Branch indexes are zigzag varints; for a 2-branch union
                # the byte is 0 (index 0) or 2 (index 1). The null branch
                # may sit at either index — ["long","null"] is legal Avro
                # — so derive the null byte from the schema instead of
                # assuming null-first.
                null_idx = 0 if _is_null_schema(schema[0]) else 1
                lines.append(f"{ind}if mv[p] == {null_idx * 2}:")
                lines.append(f"{ind}    p += 1; {out} = None")
                lines.append(f"{ind}else:")
                lines.append(f"{ind}    p += 1")
                self.emit(branches[0], out, lines, ind + "    ")
                return
            # >=2 non-null branches: foreign writers emit e.g.
            # ["null","int","long"] or ["null","float","double"].
            # Readable when every non-null branch is a plain numeric
            # primitive (the Avro-spec promotion chain int->long->
            # float->double gives one Arrow column type:
            # avro_schema_to_arrow maps {int,long}->int64, else
            # float64). Dispatch on the decoded branch INDEX — per-row
            # branch bytes are data, not schema, so each row picks its
            # own decode.
            _union_promote(schema)  # raises Unsupported if unmappable
            idx = self.tmp()
            _dec_varint("p", idx, lines, ind)
            kw = "if"
            for i, b in enumerate(schema):
                lines.append(f"{ind}{kw} {idx} == {i}:")
                kw = "elif"
                if _is_null_schema(b):
                    lines.append(f"{ind}    {out} = None")
                else:
                    self.emit(b, out, lines, ind + "    ")
            lines.append(f"{ind}else:")
            lines.append(
                f"{ind}    raise ValueError('bad union branch ' + repr({idx}))"
            )
            return
        t = schema["type"] if isinstance(schema, dict) else schema
        if t in ("int", "long"):
            _dec_varint("p", out, lines, ind)
            # ms-precision timestamps upconvert to micros on decode
            # (reference semantics: Partitioning.java's ms*1000), so
            # the Arrow column is uniformly timestamp('us')
            if (
                isinstance(schema, dict)
                and schema.get("logicalType")
                in ("timestamp-millis", "local-timestamp-millis")
            ):
                lines.append(f"{ind}{out} *= 1000")
        elif t == "boolean":
            lines.append(f"{ind}{out} = mv[p] == 1; p += 1")
        elif t == "float":
            lines.append(f"{ind}{out} = _upf('<f', mv, p)[0]; p += 4")
        elif t == "double":
            lines.append(f"{ind}{out} = _upf('<d', mv, p)[0]; p += 8")
        elif t in ("string", "bytes"):
            n = self.tmp()
            _dec_varint("p", n, lines, ind)
            if t == "string":
                lines.append(f"{ind}{out} = str(mv[p:p+{n}], 'utf-8'); p += {n}")
            elif (
                isinstance(schema, dict)
                and schema.get("logicalType") == "decimal"
            ):
                # Avro decimal-on-bytes: two's-complement big-endian
                # unscaled int; scaleb under _DCTX (prec=76, not the
                # default-28 thread context) keeps all digits of a
                # decimal(38,*) exact instead of half-even rounding
                scale = int(schema.get("scale", 0))
                lines.append(
                    f"{ind}{out} = _DEC(int.from_bytes(mv[p:p+{n}], "
                    f"'big', signed=True)).scaleb(-{scale}, _DCTX); p += {n}"
                )
            else:
                lines.append(f"{ind}{out} = bytes(mv[p:p+{n}]); p += {n}")
        elif t == "fixed":
            size = int(schema["size"])
            if schema.get("logicalType") == "decimal":
                scale = int(schema.get("scale", 0))
                lines.append(
                    f"{ind}{out} = _DEC(int.from_bytes(mv[p:p+{size}], "
                    f"'big', signed=True)).scaleb(-{scale}, _DCTX); p += {size}"
                )
            else:
                lines.append(f"{ind}{out} = bytes(mv[p:p+{size}]); p += {size}")
        elif t == "enum":
            # enum index is a zigzag varint into the symbol table; the
            # table rides the compiled function's namespace
            syms = self.const(tuple(schema["symbols"]))
            idx = self.tmp()
            _dec_varint("p", idx, lines, ind)
            lines.append(f"{ind}{out} = {syms}[{idx}]")
        elif t == "record":
            vals = []
            for f in schema["fields"]:
                v = self.tmp()
                self.emit(f["type"], v, lines, ind)
                vals.append((f["name"], v))
            kv = ", ".join(f"{name!r}: {v}" for name, v in vals)
            lines.append(f"{ind}{out} = {{{kv}}}")
        elif t == "array":
            cnt = self.tmp()
            item = self.tmp()
            lines.append(f"{ind}{out} = []")
            lines.append(f"{ind}while True:")
            _dec_varint("p", cnt, lines, ind + "    ")
            lines.append(f"{ind}    if {cnt} == 0: break")
            lines.append(f"{ind}    if {cnt} < 0:")
            _dec_varint("p", "_skip", lines, ind + "        ")
            lines.append(f"{ind}        {cnt} = -{cnt}")
            lines.append(f"{ind}    for _ in range({cnt}):")
            self.emit(schema["items"], item, lines, ind + "        ")
            lines.append(f"{ind}        {out}.append({item})")
        elif t == "map":
            cnt = self.tmp()
            klen = self.tmp()
            key = self.tmp()
            val = self.tmp()
            lines.append(f"{ind}{out} = {{}}")
            lines.append(f"{ind}while True:")
            _dec_varint("p", cnt, lines, ind + "    ")
            lines.append(f"{ind}    if {cnt} == 0: break")
            lines.append(f"{ind}    if {cnt} < 0:")
            _dec_varint("p", "_skip", lines, ind + "        ")
            lines.append(f"{ind}        {cnt} = -{cnt}")
            lines.append(f"{ind}    for _ in range({cnt}):")
            _dec_varint("p", klen, lines, ind + "        ")
            lines.append(
                f"{ind}        {key} = str(mv[p:p+{klen}], 'utf-8'); p += {klen}"
            )
            self.emit(schema["values"], val, lines, ind + "        ")
            lines.append(f"{ind}        {out}[{key}] = {val}")
        else:
            raise Unsupported(f"avro type {t!r}")


def compile_decoder(schema: dict):
    """Generate `decode(mv, p, count, cols) -> p` for a top-level
    record schema: decodes `count` records from memoryview `mv`
    starting at offset `p`, appending each field's raw value
    (temporals stay epoch ints) to cols[field_name]. Raises
    Unsupported outside the covered subset."""
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise Unsupported("top-level schema must be a record")
    em = _Emitter()
    lines = [
        "def _decode(mv, p, count, cols):",
        "    _skip = 0",
    ]
    # locals carry the field INDEX so two names that sanitize to the
    # same identifier ("a b" vs "a_b") cannot collide
    for fi, f in enumerate(schema["fields"]):
        lines.append(f"    _c{fi}_{_ident(f['name'])} = cols[{f['name']!r}]")
    lines.append("    for _ in range(count):")
    for fi, f in enumerate(schema["fields"]):
        v = em.tmp()
        em.emit(f["type"], v, lines, "        ")
        lines.append(f"        _c{fi}_{_ident(f['name'])}.append({v})")
    lines.append("    return p")
    src = "\n".join(lines)
    import decimal
    import struct

    ns = {
        "_upf": struct.unpack_from,
        "_DEC": decimal.Decimal,
        # scaleb context: default thread context is prec=28 and would
        # silently round >28-significant-digit decimals (ADVICE r12)
        "_DCTX": decimal.Context(prec=76),
    }
    ns.update(em.consts)
    exec(compile(src, "<avro_vec.compile_decoder>", "exec"), ns)  # noqa: S102
    return ns["_decode"]


def _ident(name: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in name)


def avro_schema_to_arrow(schema) -> "pa.DataType":
    """Arrow type for the codec's Avro subset, logical types applied
    (timestamp-micros -> timestamp('us', tz='UTC') to match Spark's
    TimestampType arrow representation; local-timestamp-micros ->
    naive timestamp('us'); date -> date32)."""
    def conv(s):
        if isinstance(s, list):
            branches = [b for b in s if not _is_null_schema(b)]
            if len(branches) == 1:
                return conv(branches[0])
            return _union_promote(s)
        if isinstance(s, dict):
            t = s["type"]
            lt = s.get("logicalType")
            if lt == "timestamp-micros" and t == "long":
                return pa.timestamp("us", tz="UTC")
            if lt == "local-timestamp-micros" and t == "long":
                return pa.timestamp("us")
            # ms timestamps: the compiled decoder upconverts values
            # *1000, so the column type is micros here too
            if lt == "timestamp-millis" and t == "long":
                return pa.timestamp("us", tz="UTC")
            if lt == "local-timestamp-millis" and t == "long":
                return pa.timestamp("us")
            if lt == "date" and t == "int":
                return pa.date32()
            if lt == "decimal" and t in ("bytes", "fixed"):
                return pa.decimal128(
                    int(s["precision"]), int(s.get("scale", 0))
                )
            if t == "fixed":
                # variable-width binary on the Arrow side: Spark's
                # BinaryType round-trips it; fixed_size_binary would
                # not survive the mapInArrow boundary
                return pa.binary()
            if t == "enum":
                return pa.string()
            if t == "record":
                return pa.struct(
                    [(f["name"], conv(f["type"])) for f in s["fields"]]
                )
            if t == "array":
                return pa.list_(conv(s["items"]))
            if t == "map":
                return pa.map_(pa.string(), conv(s["values"]))
            return conv(t)
        prim = {
            "boolean": pa.bool_(),
            "int": pa.int32(),
            "long": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
            "bytes": pa.binary(),
            "string": pa.string(),
        }
        if s in prim:
            return prim[s]
        raise Unsupported(f"avro type {s!r}")

    return conv(schema)


def decode_container_bytes_arrow(data: bytes, schema: dict) -> "pa.RecordBatch":
    """Decode a whole Avro container's records into ONE Arrow
    RecordBatch via the compiled decoder — the executor-side ingest
    fast path. The container's own header schema is ignored in favor
    of the caller's `schema` (ingest reads a consistent fleet of
    shards; the gate checked the header already)."""
    import io as _io
    import json as _json

    from ice_spark.sources.avro_io import MAGIC, read_bytes, read_long

    buf = _io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro container file")
    meta: dict = {}
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
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    header_schema = _json.loads(meta["avro.schema"].decode("utf-8"))
    if header_schema != schema:
        # field order / unions must match what the decoder was
        # compiled for; a differing shard falls back per-datum
        raise Unsupported("shard schema differs from compiled schema")
    buf.read(16)  # sync
    decode = compile_decoder(schema)
    names = [f["name"] for f in schema["fields"]]
    cols: dict[str, list] = {n: [] for n in names}
    total = 0
    import zlib as _zlib

    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = read_long(buf)
        size = read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = _zlib.decompress(block, -15)
        decode(memoryview(block), 0, count, cols)
        total += count
        buf.read(16)  # sync
    arrow_fields = [
        (f["name"], avro_schema_to_arrow(f["type"])) for f in schema["fields"]
    ]
    arrays = [
        pa.array(cols[name], type=typ, from_pandas=True)
        for name, typ in arrow_fields
    ]
    return pa.RecordBatch.from_arrays(
        arrays, schema=pa.schema(arrow_fields)
    )
