"""ALTER TABLE operation family.

Parity with the reference's 7 JSON ops
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/AlterTable.java:42-212):

- add_column: positioning first/before/after, required +
  initial_default, complex types; adding a REQUIRED column to a
  non-empty table requires an initial_default (guard at
  AlterTable.java:214-254)
- alter_column: type promotion only (int→long, float→double,
  decimal widening) — same rule set as the schema gate
- rename_column, drop_column
- set_tblproperty (null value ⇒ remove)
- rename_to (handled by Catalog.rename_table)
- drop_partition_field

Schema history: renames and defaults are recorded with the metadata
version at which they happened, so Table.read can align files written
under older schemas (see table.py _align_to_current).
"""

from __future__ import annotations

from pyspark.sql import types as SPT

from ice_spark.catalog.schema import SchemaIncompatibleError, _type_promotable
from ice_spark.catalog.table import Table


def _parse_type(s: str) -> SPT.DataType:
    """Parse a DDL type string ('bigint', 'struct<a:int>', ...) —
    covers the reference's IcebergTypeParser surface via Spark's own
    DDL parser (ice/.../util/IcebergTypeParser.java:30-100)."""
    return SPT._parse_datatype_string(s)


def add_column(
    table: Table,
    name: str,
    type_ddl: str,
    required: bool = False,
    initial_default=None,
    position: str | None = None,  # "first" | "after:<col>" | "before:<col>"
) -> None:
    dt = _parse_type(type_ddl)
    table.refresh()
    if required and initial_default is None and table.files():
        # AlterTable.java:214-254 guard
        raise ValueError(
            f"cannot add required column {name!r} to non-empty table without initial_default"
        )
    new_field = SPT.StructField(name, dt, nullable=not required)

    def mutate(meta: dict) -> dict:
        schema = SPT.StructType.fromJson(meta["schema"])
        if name in schema.fieldNames():
            raise ValueError(f"column exists: {name}")
        fields = list(schema.fields)
        if position is None:
            fields.append(new_field)
        elif position == "first":
            fields.insert(0, new_field)
        elif position.startswith("after:") or position.startswith("before:"):
            kind, _, ref = position.partition(":")
            idx = next((i for i, f in enumerate(fields) if f.name == ref), None)
            if idx is None:
                raise ValueError(f"no such column: {ref}")
            fields.insert(idx + (1 if kind == "after" else 0), new_field)
        else:
            raise ValueError(f"bad position: {position}")
        meta["schema"] = SPT.StructType(fields).jsonValue()
        meta.setdefault("column_defaults", []).append(
            {
                "column": name,
                "at_version": table.current_version() + 1,
                "initial_default": initial_default,
            }
        )
        return meta

    table.commit(mutate)


def alter_column(table: Table, name: str, type_ddl: str) -> None:
    new_t = _parse_type(type_ddl)

    def mutate(meta: dict) -> dict:
        schema = SPT.StructType.fromJson(meta["schema"])
        fields = []
        found = False
        for f in schema.fields:
            if f.name == name:
                found = True
                _type_promotable(f.dataType, new_t, name)  # promotion-only
                f = SPT.StructField(name, new_t, f.nullable)
            fields.append(f)
        if not found:
            raise ValueError(f"no such column: {name}")
        meta["schema"] = SPT.StructType(fields).jsonValue()
        return meta

    table.commit(mutate)


def rename_column(table: Table, name: str, new_name: str) -> None:
    def mutate(meta: dict) -> dict:
        schema = SPT.StructType.fromJson(meta["schema"])
        if name not in schema.fieldNames():
            raise ValueError(f"no such column: {name}")
        if new_name in schema.fieldNames():
            raise ValueError(f"column exists: {new_name}")
        fields = [
            SPT.StructField(new_name, f.dataType, f.nullable) if f.name == name else f
            for f in schema.fields
        ]
        meta["schema"] = SPT.StructType(fields).jsonValue()
        meta.setdefault("column_renames", []).append(
            {"from": name, "to": new_name, "at_version": table.current_version() + 1}
        )
        # keep rename lineage consistent for later-added defaults
        for d in meta.get("column_defaults", []):
            if d["column"] == name:
                d["column"] = new_name
        return meta

    table.refresh()
    table.commit(mutate)


def drop_column(table: Table, name: str) -> None:
    def mutate(meta: dict) -> dict:
        schema = SPT.StructType.fromJson(meta["schema"])
        if name not in schema.fieldNames():
            raise ValueError(f"no such column: {name}")
        part_cols = {p["column"] for p in meta.get("partition_spec", [])}
        if name in part_cols:
            raise ValueError(f"cannot drop partition source column {name!r}")
        fields = [f for f in schema.fields if f.name != name]
        meta["schema"] = SPT.StructType(fields).jsonValue()
        return meta

    table.commit(mutate)


def set_tblproperty(table: Table, key: str, value: str | None) -> None:
    def mutate(meta: dict) -> dict:
        props = meta.setdefault("properties", {})
        if value is None:
            props.pop(key, None)  # null ⇒ remove (AlterTable.java)
        else:
            props[key] = value
        return meta

    table.commit(mutate)


def add_partition_field(
    table: Table, column: str, transform: str = "identity", name: str | None = None
) -> None:
    """Partition evolution (beyond the reference, which only syncs the
    spec while the table is empty, Insert.java:339-363, and drops
    fields, AlterTable.java). Iceberg semantics: existing files keep
    their old partition values in the manifest; only new writes use
    the evolved spec. Reads are unaffected (partition values are
    per-file metadata); deletes on the new field simply cannot prune
    pre-evolution files (conservative keep)."""

    def mutate(meta: dict) -> dict:
        from ice_spark.catalog.transforms import parse_partition_spec

        if column not in {f["name"] for f in meta["schema"]["fields"]}:
            raise ValueError(f"no such column: {column}")
        spec = meta.get("partition_spec", [])
        entry = {"column": column, "transform": transform}
        if name is not None:
            entry["name"] = name
        fields = parse_partition_spec(spec + [entry])  # validates
        if len({f.field_name for f in fields}) != len(fields):
            raise ValueError(f"duplicate partition field name for {column!r}")
        meta["partition_spec"] = spec + [entry]
        return meta

    table.commit(mutate)


def drop_partition_field(table: Table, field_name: str) -> None:
    def mutate(meta: dict) -> dict:
        spec = meta.get("partition_spec", [])
        from ice_spark.catalog.transforms import parse_partition_spec

        fields = parse_partition_spec(spec)
        keep = [s for s, f in zip(spec, fields) if f.field_name != field_name]
        if len(keep) == len(spec):
            raise ValueError(f"no such partition field: {field_name}")
        meta["partition_spec"] = keep
        return meta

    table.commit(mutate)


def apply_operations(table: Table, ops: list[dict]) -> None:
    """Apply the reference's JSON op list format
    (AlterTable.java:144-212). Each op dict has exactly one key."""
    from ice_spark.catalog.catalog import Catalog  # noqa: F401  (rename_to needs catalog)

    for op in ops:
        if len(op) != 1:
            raise ValueError(f"op must have exactly one key: {op}")
        kind, spec = next(iter(op.items()))
        if kind == "add_column":
            add_column(
                table,
                spec["name"],
                spec["type"],
                required=spec.get("required", False),
                initial_default=spec.get("initial_default"),
                position=spec.get("position"),
            )
        elif kind == "alter_column":
            alter_column(table, spec["name"], spec["type"])
        elif kind == "rename_column":
            rename_column(table, spec["name"], spec["new_name"])
        elif kind == "drop_column":
            drop_column(table, spec["name"])
        elif kind == "set_tblproperty":
            set_tblproperty(table, spec["key"], spec.get("value"))
        elif kind == "add_partition_field":
            add_partition_field(
                table,
                spec["column"],
                transform=spec.get("transform", "identity"),
                name=spec.get("name"),
            )
        elif kind == "drop_partition_field":
            drop_partition_field(table, spec["name"])
        else:
            raise ValueError(f"unknown alter op: {kind}")
