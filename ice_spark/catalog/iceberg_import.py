"""Import / query a foreign Apache Iceberg v2 table.

The reverse half of the interop bridge (iceberg_export.py): given any
Iceberg table's metadata.json, register its CURRENT snapshot as a
catalog table whose manifest entries reference the Iceberg data files
in place (external, no copy) — the engine-side analog of the
reference's pyiceberg cross-client scan
(/root/reference/ice-rest-catalog/src/test/pyiceberg/ice_scan.py) and
of `register_table` (CatalogImport.java:23-33).

What is imported, honestly:
- the CURRENT snapshot's live data files (status != DELETED), with
  record counts, sizes, identity partition values, and column bounds
  decoded from the spec's single-value serialization (Appendix D) so
  filtered scans prune imported files exactly like native ones;
- the schema, converted Iceberg -> Spark (field ids drop away — this
  catalog resolves by name, the property the reference forces via
  name-mapping, CreateTable.java:104-108).
Snapshot HISTORY is not replayed: the import is a registration of
current state, not a migration of lineage. Time travel starts fresh.

v2 deletes caveat: a table with positional/equality delete files
(content != 0 manifests) would need merge-on-read; such tables are
REJECTED loudly rather than silently over-returning rows.

Metadata-only and O(metadata): no data file is opened at import time.
"""

from __future__ import annotations

import os
import re
import struct

from pyspark.sql import types as SPT

from ice_spark.catalog.iceberg_export import (
    read_iceberg_manifest,
    read_iceberg_manifest_list,
    read_iceberg_metadata,
)

_DECIMAL_RE = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_FIXED_RE = re.compile(r"^fixed\[\d+\]$")


def iceberg_to_spark_type(t) -> SPT.DataType:
    if isinstance(t, str):
        prim = {
            "boolean": SPT.BooleanType(),
            "int": SPT.IntegerType(),
            "long": SPT.LongType(),
            "float": SPT.FloatType(),
            "double": SPT.DoubleType(),
            "date": SPT.DateType(),
            "timestamp": SPT.TimestampNTZType(),
            "timestamptz": SPT.TimestampType(),
            "string": SPT.StringType(),
            "uuid": SPT.StringType(),
            "binary": SPT.BinaryType(),
        }
        if t in prim:
            return prim[t]
        m = _DECIMAL_RE.match(t)
        if m:
            return SPT.DecimalType(int(m.group(1)), int(m.group(2)))
        if _FIXED_RE.match(t):
            return SPT.BinaryType()
        raise ValueError(f"unsupported Iceberg type: {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return SPT.StructType(
            [
                SPT.StructField(
                    f["name"],
                    iceberg_to_spark_type(f["type"]),
                    nullable=not f.get("required", False),
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return SPT.ArrayType(
            iceberg_to_spark_type(t["element"]),
            containsNull=not t.get("element-required", False),
        )
    if kind == "map":
        return SPT.MapType(
            iceberg_to_spark_type(t["key"]),
            iceberg_to_spark_type(t["value"]),
            valueContainsNull=not t.get("value-required", False),
        )
    raise ValueError(f"unsupported Iceberg type: {t!r}")


def iceberg_to_spark_schema(ice_schema: dict) -> SPT.StructType:
    return iceberg_to_spark_type({"type": "struct", "fields": ice_schema["fields"]})


def _deserialize_bound(ice_type, raw: bytes):
    """Reverse of iceberg_export.serialize_bound for the types our
    column_metrics pruning understands; None for the rest."""
    if raw is None:
        return None
    try:
        if ice_type == "int":
            return struct.unpack("<i", raw)[0]
        if ice_type == "long":
            return struct.unpack("<q", raw)[0]
        if ice_type == "float":
            return float(struct.unpack("<f", raw)[0])
        if ice_type == "double":
            return struct.unpack("<d", raw)[0]
        if ice_type == "string":
            return raw.decode("utf-8")
    except (struct.error, UnicodeDecodeError):
        return None
    return None


def _local_path(p: str, base: str) -> str:
    """Resolve an Iceberg metadata path to a local filesystem path.
    Real Iceberg writers emit full URIs (file:///..., s3://...);
    file: URIs strip to local paths, bare paths resolve against the
    table base, and remote schemes are rejected loudly (this import
    reads metadata locally — no object-store client here)."""
    from urllib.parse import urlparse

    scheme = urlparse(p).scheme
    if scheme == "file":
        return urlparse(p).path
    # Windows-style 'C:' drive letters aside, a one-letter scheme is a path
    if scheme and len(scheme) > 1:
        raise ValueError(
            f"cannot read {scheme}:// metadata path {p!r} locally; "
            "download the table's metadata directory first"
        )
    return p if os.path.isabs(p) else os.path.join(base, p)


def iceberg_table_entries(metadata_file: str) -> tuple[SPT.StructType, list[dict]]:
    """(spark schema, manifest entries) for an Iceberg table's current
    snapshot, in this catalog's entry format."""
    meta = read_iceberg_metadata(metadata_file)
    schemas = {s.get("schema-id", 0): s for s in meta.get("schemas", [])}
    ice_schema = schemas.get(meta.get("current-schema-id", 0)) or next(
        iter(schemas.values())
    )
    schema = iceberg_to_spark_schema(ice_schema)
    fields_by_id = {
        f["id"]: (f["name"], f["type"])
        for f in ice_schema["fields"]
        if isinstance(f["type"], str)
    }

    sid = meta.get("current-snapshot-id")
    snap = next(
        (s for s in meta.get("snapshots", []) if s["snapshot-id"] == sid), None
    )
    entries: list[dict] = []
    if snap is None:
        return schema, entries
    base = os.path.dirname(os.path.dirname(os.path.abspath(metadata_file)))
    ml_path = _local_path(snap["manifest-list"], base)
    for mf in read_iceberg_manifest_list(ml_path):
        if mf.get("content", 0) != 0:
            raise ValueError(
                "Iceberg table has delete manifests (merge-on-read); "
                "import would over-return rows — refusing"
            )
        m_path = _local_path(mf["manifest_path"], base)
        for entry in read_iceberg_manifest(m_path):
            if entry["status"] == 2:  # DELETED
                continue
            d = entry["data_file"]
            if d.get("content", 0) != 0:
                raise ValueError("delete file in data manifest — refusing")
            metrics: dict = {}
            lowers = {kv["key"]: kv["value"] for kv in (d.get("lower_bounds") or [])}
            uppers = {kv["key"]: kv["value"] for kv in (d.get("upper_bounds") or [])}
            for fid, (name, ice_t) in fields_by_id.items():
                lo = _deserialize_bound(ice_t, lowers.get(fid))
                hi = _deserialize_bound(ice_t, uppers.get(fid))
                if lo is not None and hi is not None:
                    metrics[name] = {"min": lo, "max": hi}
            entries.append(
                {
                    "path": _local_path(d["file_path"], base),
                    "partition": {
                        k: v for k, v in (d.get("partition") or {}).items()
                    },
                    "records": d.get("record_count", 0),
                    "size_bytes": d.get("file_size_in_bytes", 0),
                    "schema_version": 1,
                    "external": True,  # never deleted by purge/expiry
                    **({"column_metrics": metrics} if metrics else {}),
                }
            )
    return schema, entries


def register_iceberg_table(catalog, ident: str, metadata_file: str):
    """Create a catalog table serving an Iceberg table's current
    snapshot in place. Returns the Table."""
    from ice_spark.catalog.table import Table

    schema, entries = iceberg_table_entries(metadata_file)
    path, _ = catalog._table_path(ident)
    t = Table.create(catalog.spark, path, schema, identifier=ident,
                     properties={"iceberg-import-source": os.path.abspath(metadata_file)})
    t.append_snapshot(entries, operation="append")
    return t
