"""Schema-evolution compatibility gate.

Exact re-expression of the reference's rules over Spark StructTypes
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/iceberg/SchemaEvolution.java):

A file schema is accepted against a table schema iff
(a) every required table field exists in the file and its
    required-ness matches (SchemaEvolution.java:22-36);
(b) the file has no fields the table lacks (…:37-47);
(c) primitive promotion is limited to int→long, float→double,
    decimal(P,S)→decimal(P',S) with P'≥P (…:159-170);
(d) rules apply recursively through struct/list/map (…:50-145).

Spark's own mergeSchema/cast rules are laxer — do not substitute.
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaIncompatibleError(ValueError):
    pass


def _type_promotable(file_t: T.DataType, table_t: T.DataType, path: str) -> None:
    if file_t == table_t:
        return
    if isinstance(file_t, T.IntegerType) and isinstance(table_t, T.LongType):
        return
    if isinstance(file_t, T.FloatType) and isinstance(table_t, T.DoubleType):
        return
    if isinstance(file_t, T.DecimalType) and isinstance(table_t, T.DecimalType):
        if file_t.scale == table_t.scale and file_t.precision <= table_t.precision:
            return
        raise SchemaIncompatibleError(
            f"{path}: decimal promotion only widens precision at equal scale "
            f"({file_t.simpleString()} vs {table_t.simpleString()})"
        )
    if isinstance(file_t, T.StructType) and isinstance(table_t, T.StructType):
        _check_struct(file_t, table_t, path)
        return
    if isinstance(file_t, T.ArrayType) and isinstance(table_t, T.ArrayType):
        # element nullability: file may not contain nulls where table
        # forbids them
        if file_t.containsNull and not table_t.containsNull:
            raise SchemaIncompatibleError(f"{path}: element nullability mismatch")
        _type_promotable(file_t.elementType, table_t.elementType, path + ".element")
        return
    if isinstance(file_t, T.MapType) and isinstance(table_t, T.MapType):
        if file_t.valueContainsNull and not table_t.valueContainsNull:
            raise SchemaIncompatibleError(f"{path}: value nullability mismatch")
        _type_promotable(file_t.keyType, table_t.keyType, path + ".key")
        _type_promotable(file_t.valueType, table_t.valueType, path + ".value")
        return
    raise SchemaIncompatibleError(
        f"{path}: type {file_t.simpleString()} not promotable to {table_t.simpleString()}"
    )


def _check_struct(file_s: T.StructType, table_s: T.StructType, path: str = "") -> None:
    table_fields = {f.name: f for f in table_s.fields}
    file_fields = {f.name: f for f in file_s.fields}

    # (b) no extra fields
    for name in file_fields:
        if name not in table_fields:
            raise SchemaIncompatibleError(f"{path or 'root'}: extra field '{name}'")

    for name, tf in table_fields.items():
        ff = file_fields.get(name)
        fpath = f"{path}.{name}" if path else name
        if ff is None:
            # (a) required table fields must be present
            if not tf.nullable:
                raise SchemaIncompatibleError(f"{fpath}: required field missing")
            continue
        # required-ness: a nullable file field can't feed a required
        # table field
        if ff.nullable and not tf.nullable:
            raise SchemaIncompatibleError(f"{fpath}: optional file field, required in table")
        _type_promotable(ff.dataType, tf.dataType, fpath)


def check_compatible(file_schema: T.StructType, table_schema: T.StructType) -> None:
    """Raise SchemaIncompatibleError unless file_schema is an
    acceptable subset of table_schema (reference semantics)."""
    _check_struct(file_schema, table_schema)


def is_compatible(file_schema: T.StructType, table_schema: T.StructType) -> bool:
    try:
        check_compatible(file_schema, table_schema)
        return True
    except SchemaIncompatibleError:
        return False
