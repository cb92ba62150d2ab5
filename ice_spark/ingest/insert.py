"""Parquet → table ingestion.

Reference behavior reproduced (per-feature citations to
/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/Insert.java):

- schema-subset gate per input file (Insert.java:504-509 → our
  catalog.schema.check_compatible)
- duplicate-input detection against paths already in the table
  (Insert.java:172-178,425-438)
- partitioned fan-out + sort (Partitioning.partition 318-391 +
  copySorted 755-833) — HERE as ONE declarative Spark job:
  repartition on the transform expressions, sortWithinPartitions,
  partitionBy write. This is the write-distribution-mode=range
  intent the reference sets as a table property (Insert.java:391-404)
  executed by Spark instead of an in-memory Map<PartitionKey,List<…>>.
- --no-copy: register files in place, metrics from footers
  (Insert.java:510-528,654-665) via pyarrow.
- compression option incl. default gzip (Insert.java:118-130,556-568)
- spec/sort sync only while table is empty (Insert.java:339-389)
- single atomic commit for all files (Insert.java:145,199,273-307);
  --no-commit stages files without committing.

Scale note: the fan-out write is a single shuffle sized by the
partition expressions; skewed partition values are AQE's problem
(skew-join/partition-coalescing handle it at runtime). Nothing here
collects data to the driver — only footer metadata.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import functions as F

from ice_spark.catalog.schema import SchemaIncompatibleError, check_compatible
from ice_spark.catalog.table import Table

COMPRESSIONS = {"gzip", "zstd", "snappy", "lz4", "uncompressed", "none"}

# Input formats. The reference ingests Parquet only (PARQUET is
# hardcoded at Insert.java:658-665); CSV/JSON/ORC ingestion is
# beyond-reference convenience for landing raw exports (large-scale
# corpora routinely arrive as ORC from Hive-era pipelines). Data
# always lands in the table as Parquet regardless of input format.
FORMATS = {"parquet", "csv", "json", "orc", "avro"}


def read_input(spark, path: str, fmt: str = "parquet"):
    """Read one input file in the given format with schema inference."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "avro":
        return _read_avro(spark, path)
    raise ValueError(f"unsupported input format {fmt!r} (one of {sorted(FORMATS)})")


def _resolve_avro_shards(path: str) -> tuple[list[str], str]:
    """Resolve an avro input (file / directory / glob pattern) to its
    sorted shard list plus the load path binaryFile should read. The
    ONE resolver shared by _read_avro and avro_decode_report — the
    report's routing claims are only honest if both walk the same
    shards and pick the same fleet header (shards[0])."""
    import glob as _glob

    if os.path.isfile(path):
        return [path], path
    load_path = path
    if os.path.isdir(path):
        # a directory input may hold non-avro files (_SUCCESS markers,
        # .crc) — only *.avro reach the decoder (binaryFile applies
        # the same filter via pathGlobFilter)
        shards = sorted(_glob.glob(os.path.join(path, "*.avro")))
    else:
        shards = [p for p in sorted(_glob.glob(path)) if os.path.isfile(p)]
        if not shards:
            # the pattern matched only directories — read their
            # *.avro through the SAME glob that picks the header
            shards = sorted(_glob.glob(os.path.join(path, "*.avro")))
            load_path = os.path.join(path, "*.avro")
    if not shards:
        raise FileNotFoundError(f"no avro input matches {path!r}")
    return shards, load_path


def _avro_fleet_schema(shards: list[str]) -> dict:
    """The fleet schema is the FIRST shard's header schema (ingest
    inputs share a schema — the schema gate enforces it downstream);
    shards whose header differs decode via the per-datum fallback."""
    schema_json, _, _ = _avro_header(shards[0])
    return schema_json


def _read_avro(spark, path: str):
    """Avro container ingest through the repo's own pure-Python codec
    (sources/avro_io.py — no spark-avro package in this environment).
    The schema comes from the container header on the driver (KBs);
    record decode runs EXECUTOR-side: binaryFile ships each file's
    bytes to a task and mapInPandas decodes there, so the driver
    never holds row data and multiple input files decode in
    parallel. One file = one decode task (fine for the ingest
    surface, where inputs are file-sized; the data plane stays
    parquet after ingest)."""
    import pandas as pd

    from ice_spark.sources.avro_io import avro_schema_to_spark, read_container_bytes

    shards, load_path = _resolve_avro_shards(path)
    schema_json = _avro_fleet_schema(shards)
    spark_schema = avro_schema_to_spark(schema_json)
    names = [f.name for f in spark_schema.fields]
    from ice_spark.sources.avro_io import has_logical_types

    logical = has_logical_types(schema_json)

    reader = spark.read.format("binaryFile")
    if os.path.isdir(path):
        # match the header-selection glob: a directory input may hold
        # non-avro files (_SUCCESS markers, .crc) that would fail the
        # whole decode with a bad-magic error
        reader = reader.option("pathGlobFilter", "*.avro")
    src = reader.load(load_path).select("content")

    # Fast path: schema-compiled decoder into Arrow columns (no row
    # dicts, no datetime objects — temporals stay epoch ints and the
    # Arrow type applies the logical type). ~5x the per-datum path;
    # compile-checked DRIVER-side so unsupported schemas fall back
    # wholesale, and per SHARD executor-side (a shard whose header
    # schema differs from the fleet's decodes via read_datum).
    from ice_spark.sources import avro_vec

    try:
        avro_vec.compile_decoder(schema_json)
        arrow_fields = [
            (f["name"], avro_vec.avro_schema_to_arrow(f["type"]))
            for f in schema_json["fields"]
        ]
    except avro_vec.Unsupported:
        arrow_fields = None

    if arrow_fields is not None:

        def decode_arrow(batches):
            import pyarrow as pa

            from ice_spark.sources import avro_vec as _vec
            from ice_spark.sources.avro_io import decode_logical as _dl

            for batch in batches:
                for content in batch.column(0):
                    data = content.as_py()
                    try:
                        yield _vec.decode_container_bytes_arrow(data, schema_json)
                    except _vec.Unsupported:
                        _, _, records = read_container_bytes(data)
                        if logical:
                            # raw epoch ints are NOT uniformly in the
                            # arrow column units (ms fields upconvert
                            # on the fast path) — go through datetime
                            # objects, fallback shards only
                            records = [_dl(r, schema_json) for r in records]
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(
                                    [r.get(n) for r in records],
                                    type=t,
                                    from_pandas=True,
                                )
                                for n, t in arrow_fields
                            ],
                            schema=pa.schema(arrow_fields),
                        )

        return src.mapInArrow(decode_arrow, schema=spark_schema)

    def decode(batches):
        from ice_spark.sources.avro_io import decode_logical

        for pdf in batches:
            for _, row in pdf.iterrows():
                _, _, records = read_container_bytes(bytes(row["content"]))
                if logical:
                    records = [decode_logical(r, schema_json) for r in records]
                yield pd.DataFrame(
                    {n: [r.get(n) for r in records] for n in names}
                )

    return src.mapInPandas(decode, schema=spark_schema)


def avro_decode_report(path: str) -> dict:
    """Driver-side observability for the Avro ingest decode routing
    (the fallbacks are otherwise silent from the caller's view): which
    path _read_avro will take wholesale ('vectorized' when the fleet
    schema compiles, else 'per-datum'), and per shard how many decode
    fast vs fall back (a shard falls back iff its header schema
    differs byte-for-byte from the fleet's — the same check
    decode_container_bytes_arrow applies executor-side). Header reads
    only (KBs per shard), no record decode. Shard/glob resolution and
    the fleet-schema pick go through the SAME helpers _read_avro uses
    (_resolve_avro_shards / _avro_fleet_schema) so the report's
    routing claims can't drift from what the reader actually does."""
    from ice_spark.sources import avro_vec

    shards, _ = _resolve_avro_shards(path)
    fleet_schema = _avro_fleet_schema(shards)
    try:
        avro_vec.compile_decoder(fleet_schema)
        for f in fleet_schema["fields"]:
            avro_vec.avro_schema_to_arrow(f["type"])
        mode = "vectorized"
    except avro_vec.Unsupported as ex:
        return {
            "mode": "per-datum",
            "reason": str(ex),
            "shards": len(shards),
            "fast_shards": 0,
            "fallback_shards": len(shards),
        }
    fallback = [p for p in shards[1:] if _avro_header(p)[0] != fleet_schema]
    return {
        "mode": mode,
        "shards": len(shards),
        "fast_shards": len(shards) - len(fallback),
        "fallback_shards": len(fallback),
        "fallback_paths": fallback,
    }


def _avro_header(path: str):
    """Container header only (schema + metadata) — no record decode."""
    import io as _io
    import json as _json

    from ice_spark.sources.avro_io import MAGIC, read_bytes, read_long

    with open(path, "rb") as f:
        head = f.read(1 << 20)  # header is KBs; 1MB is generous
    buf = _io.BytesIO(head)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an avro container file")
    meta = {}
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
    return _json.loads(meta["avro.schema"].decode("utf-8")), meta, None


class DuplicateInputError(ValueError):
    pass


def _footer_stats(path: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    return md.num_rows, os.path.getsize(path)


def _s3_footer_schema(client, uri: str):
    """Spark schema of an s3:// parquet object, from its footer via
    ranged GETs (no download; the reference's schema gate reads the
    footer through Iceberg's S3InputFile the same way)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    from ice_spark.sources.s3 import S3RangeFile

    return from_arrow_schema(
        pq.ParquetFile(S3RangeFile(client, uri)).schema_arrow
    )


def _s3_copy_entries(
    table: Table, files: list[str], client, version: int, assume_sorted: bool
) -> list[dict]:
    """Server-side copy each source object under <table>/data/ and
    build manifest entries with footer metrics read via ranged GETs
    (Insert.java:529-554 + CopyObjectMultipart.java). O(metadata)
    client-side: bytes move bucket-to-bucket inside S3."""
    import pyarrow.parquet as pq

    from ice_spark.ingest.inspect import check_sorted, infer_partition
    from ice_spark.sources.s3 import S3RangeFile, copy_object_multipart, parse_s3_uri

    entries: list[dict] = []
    ts = int(time.time() * 1000)
    for f in files:
        base = os.path.basename(parse_s3_uri(f).key)
        rel = f"data/{ts}-{uuid.uuid4().hex[:16]}-{base}"
        dst = f"{table.location}/{rel}"
        copy_object_multipart(client, f, dst)
        # ONE ranged-file handle (one HEAD) reused for partition
        # inference, the sortedness gate, and footer metrics — each
        # S3RangeFile construction costs a head_object and each
        # ParquetFile open re-fetches the footer.
        fobj = S3RangeFile(client, dst)
        partition = infer_partition(fobj, table.partition_spec)
        if table.sort_order and not assume_sorted:
            if not check_sorted(fobj, table.sort_order):
                raise ValueError(
                    f"{f} is not sorted by the table sort order; "
                    "rewrite (copy insert) or pass assume_sorted"
                )
        md = pq.ParquetFile(fobj).metadata
        entries.append(
            {
                # RELATIVE path: every consumer joins against
                # table.location (an absolute URI here would be
                # double-joined by _read_entries / maintenance)
                "path": rel,
                "partition": partition,
                "records": md.num_rows,
                "size_bytes": fobj.size(),
                "source_path": f,
                "schema_version": version,
                "column_metrics": _column_metrics_from_metadata(md),
            }
        )
    return entries


def _footer_column_metrics(path: str) -> dict:
    """Per-column value/null counts and lower/upper bounds from the
    Parquet footer — the reference builds Iceberg metrics the same way
    (ParquetUtil.footerMetrics, Insert.java:654-655; rendered by
    describe -m, Describe.java:155-238)."""
    import pyarrow.parquet as pq

    return _column_metrics_from_metadata(pq.ParquetFile(path).metadata)


def _column_metrics_from_metadata(md) -> dict:
    cols: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            s = c.statistics
            agg = cols.setdefault(
                c.path_in_schema, {"nulls": 0, "values": 0, "min": None, "max": None}
            )
            agg["values"] += g.num_rows
            if s is None:
                continue
            if s.null_count is not None:
                agg["nulls"] += s.null_count
            if s.has_min_max:
                mn, mx = s.min, s.max
                if agg["min"] is None or (mn is not None and mn < agg["min"]):
                    agg["min"] = mn
                if agg["max"] is None or (mx is not None and mx > agg["max"]):
                    agg["max"] = mx
    # stringify for JSON manifests (bytes/timestamps aren't JSON-safe)
    for agg in cols.values():
        for k in ("min", "max"):
            if agg[k] is not None and not isinstance(agg[k], (int, float, bool)):
                agg[k] = str(agg[k])
    return cols


def sniff_compression(path: str) -> str:
    """--compression as-source: codec of the first column chunk
    (Insert.java:556-568)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if md.num_row_groups == 0 or md.row_group(0).num_columns == 0:
        return "gzip"
    codec = md.row_group(0).column(0).compression.lower()
    return {"uncompressed": "none", "brotli": "gzip"}.get(codec, codec)


def insert(
    table: Table,
    files: list[str],
    *,
    skip_duplicates: bool = False,
    force_duplicates: bool = False,
    no_copy: bool = False,
    force_no_copy: bool = False,
    compression: str = "gzip",
    partition_spec: list[dict] | None = None,
    sort_order: list[dict] | None = None,
    no_commit: bool = False,
    retry_list: str | None = None,
    assume_sorted: bool = False,
    input_format: str = "parquet",
    file_naming: str = "default",
    s3_copy_object: bool = False,
    s3_client=None,
    stage_branch: str | None = None,
    avro_decode_summary: bool = True,
) -> dict:
    """Ingest parquet files; returns a summary dict.

    retry_list: path of a file to append the inputs to if the insert
    fails, for later re-run (Insert.java:202-251 / RetryLog.java).

    file_naming: "default" = <ts>-<unique>.parquet (the reference's
    DataFileNamingStrategy.DEFAULT, Insert.java:835-881); "preserve"
    = keep each source file's basename (PRESERVE_ORIGINAL) — copies
    per input file (one output per input per partition), erroring on
    basename collisions instead of silently renaming.

    s3_copy_object: server-side S3 CopyObject instead of
    download+rewrite, valid only when source AND table live in
    s3:// buckets (Insert.java:529-554). Bytes never transit the
    client; footer metrics are read via ranged GETs
    (sources/s3.S3RangeFile). Requires `s3_client` (boto3-shaped;
    sources.s3.new_s3_client() in production, a fake in tests).
    """
    if file_naming not in ("default", "preserve"):
        raise ValueError(f"unsupported file_naming {file_naming!r}")
    if compression == "as-source":
        compression = sniff_compression(files[0]) if files else "gzip"
    if compression not in COMPRESSIONS:
        raise ValueError(f"unsupported compression {compression!r}")
    if retry_list is not None:
        try:
            return insert(
                table,
                files,
                skip_duplicates=skip_duplicates,
                force_duplicates=force_duplicates,
                no_copy=no_copy,
                force_no_copy=force_no_copy,
                compression=compression,
                partition_spec=partition_spec,
                sort_order=sort_order,
                no_commit=no_commit,
                assume_sorted=assume_sorted,
                input_format=input_format,
            )
        except Exception:
            with open(retry_list, "a") as f:
                for x in files:
                    f.write(x + "\n")
            raise
    if len(set(files)) != len(files):
        # duplicate-input rejection (Insert.java:150-168)
        raise DuplicateInputError("duplicate input paths given")
    if s3_copy_object:
        if no_copy:
            raise ValueError("s3_copy_object and no_copy are mutually exclusive")
        # Insert.java:530-533 parity, same constraint text
        if not table.location.startswith("s3://") or any(
            not f.startswith(("s3://", "s3a://")) for f in files
        ):
            raise ValueError(
                "--s3-copy-object is only supported between s3:// buckets"
            )
        if s3_client is None:
            raise ValueError(
                "s3_copy_object needs an S3 client (sources.s3.new_s3_client())"
            )

    table.refresh()
    spark = table.spark

    # --- spec/sort sync: only while table is empty (Insert.java:339-389)
    existing_files = table.files()
    for kind, requested, current in (
        ("partition", partition_spec, table.meta.get("partition_spec", [])),
        ("sort", sort_order, table.meta.get("sort_order", [])),
    ):
        if requested is not None and requested != current:
            if existing_files:
                raise ValueError(f"cannot change {kind} spec of a non-empty table")

            def mutate(meta, kind=kind, requested=requested):
                meta["partition_spec" if kind == "partition" else "sort_order"] = requested
                return meta

            table.commit(mutate)
            table.refresh()

    # --- dedup against already-ingested source paths: file entries
    # plus snapshot-level source-path lineage (multi-file copy writes
    # merge inputs into one job, so lineage lives on the snapshot).
    known = {e.get("source_path") for e in table.files() if e.get("source_path")}
    for s in table.snapshots():
        known.update(s.get("summary", {}).get("source-paths", []))
    dupes = [f for f in files if f in known]
    if dupes and not (skip_duplicates or force_duplicates):
        raise DuplicateInputError(f"already ingested: {dupes}")
    if skip_duplicates:
        files = [f for f in files if f not in known]
    summary = {"inputs": len(files), "skipped": len(dupes) if skip_duplicates else 0}
    if input_format == "avro" and files and avro_decode_summary:
        # decode-path observability (header reads only): which route
        # each shard takes through _read_avro — a silent per-shard
        # fallback becomes a visible count in the insert summary.
        # Opt out (avro_decode_summary=False) for very large fleets:
        # the report reads every shard header on the driver, which is
        # one ranged read per shard — cheap per file, but a 100k-shard
        # ingest shouldn't pay it twice just for the summary line.
        summary["avro_decode"] = {
            f: {
                k: v
                for k, v in avro_decode_report(f).items()
                if k in ("mode", "shards", "fast_shards", "fallback_shards")
            }
            for f in files
        }
    if not files:
        summary["added"] = 0
        return summary

    if input_format not in FORMATS:
        raise ValueError(f"unsupported input format {input_format!r}")
    if no_copy and input_format != "parquet":
        raise ValueError("no_copy requires parquet inputs (footer metrics)")

    # --- schema gate per file (Insert.java:504-509)
    for f in files:
        if s3_copy_object:
            fschema = _s3_footer_schema(s3_client, f)
        else:
            fschema = read_input(spark, f, input_format).schema
        try:
            check_compatible(fschema, table.schema)
        except SchemaIncompatibleError as e:
            raise SchemaIncompatibleError(
                f"{f}: {e}\nfile schema: {fschema.simpleString()}\n"
                f"table schema: {table.schema.simpleString()}"
            ) from e

    version = table.current_version()
    entries: list[dict] = []

    if no_copy:
        from ice_spark.ingest.inspect import check_sorted, infer_partition

        # register in place (add_files analog)
        for f in files:
            absf = os.path.abspath(f)
            if not absf.startswith(table.location + os.sep) and not force_no_copy:
                raise ValueError(
                    f"--no-copy input outside table location: {f} (use force_no_copy)"
                )
            # partition inference from row-group stats: the whole file
            # must map to one partition (Partitioning.java:189-271)
            partition = infer_partition(absf, table.partition_spec)
            # sorted-table guard: a no-copy file must already be
            # sorted, since it won't be rewritten (Sorting.checkSorted,
            # Insert.java:464-480); --assume-sorted skips the scan.
            if table.sort_order and not assume_sorted:
                if not check_sorted(absf, table.sort_order):
                    raise ValueError(
                        f"{f} is not sorted by the table sort order; "
                        "rewrite (copy insert) or pass assume_sorted"
                    )
            rows, size = _footer_stats(absf)
            entries.append(
                {
                    "path": absf,
                    "partition": partition,
                    "records": rows,
                    "size_bytes": size,
                    "source_path": f,
                    "schema_version": version,
                    "external": True,
                    "column_metrics": _footer_column_metrics(absf),
                }
            )
    elif s3_copy_object:
        entries = _s3_copy_entries(table, files, s3_client, version, assume_sorted)
    else:
        entries = _copy_write(
            table, files, compression, version, input_format, file_naming
        )

    if no_commit:
        summary["staged"] = len(entries)
        return summary

    # table-property-driven Bloom indexing of the new files
    from ice_spark.catalog.fileindex import attach_ingest_blooms

    entries = attach_ingest_blooms(table, entries)

    # write-audit-publish: commit onto a branch ref; main does not
    # advance until Table.publish_branch fast-forwards it
    sid = table.append_snapshot(
        entries,
        "append",
        extra_summary={"source-paths": files},
        branch=stage_branch,
    )
    # post-commit verification (Insert.java:901-931): every staged file
    # visible in the committed snapshot.
    committed = {e["path"] for e in table.files(sid)}
    missing = [e["path"] for e in entries if e["path"] not in committed]
    if missing:
        raise RuntimeError(f"DATA LOSS: committed snapshot missing staged files: {missing}")
    summary.update({"added": len(entries), "snapshot_id": sid})
    return summary


def append_dataframe(
    table: Table, df, compression: str = "gzip", operation: str = "append"
) -> int:
    """Append an arbitrary DataFrame to the table (used by streaming
    foreachBatch and programmatic writers). Aligns to the table
    schema, applies partition/sort, commits one snapshot."""
    table.refresh()
    sel = [
        (F.col(fl.name) if fl.name in df.columns else F.lit(None))
        .cast(fl.dataType)
        .alias(fl.name)
        for fl in table.schema.fields
    ]
    entries = _write_df(table, df.select(*sel), compression, table.current_version())
    return table.append_snapshot(entries, operation)


def _copy_write(
    table: Table,
    files: list[str],
    compression: str,
    schema_version: int,
    input_format: str = "parquet",
    file_naming: str = "default",
) -> list[dict]:
    """Read inputs (each with its own schema, aligned to the table
    schema), apply partition transforms + sort order, write parquet,
    collect manifest entries. Default naming unions every input into
    ONE Spark job; preserve naming copies per input file (1:1 names
    require 1:1 jobs — the reference's own per-file worker model,
    Insert.java:209-271)."""
    spark = table.spark

    def align(f: str):
        df = read_input(spark, f, input_format)
        sel = [
            (F.col(fl.name) if fl.name in df.columns else F.lit(None))
            .cast(fl.dataType)
            .alias(fl.name)
            for fl in table.schema.fields
        ]
        return df.select(*sel)

    if file_naming == "preserve":
        basenames = [os.path.basename(f) for f in files]
        if len(set(basenames)) != len(basenames):
            raise ValueError(f"duplicate basenames under preserve naming: {basenames}")
        entries: list[dict] = []
        for f in files:
            entries.extend(
                _write_df(
                    table,
                    align(f).coalesce(1),
                    compression,
                    schema_version,
                    source_files=[f],
                    name_override=os.path.basename(f),
                )
            )
        return entries

    aligned = None
    for f in files:
        part = align(f)
        aligned = part if aligned is None else aligned.unionByName(part)
    return _write_df(table, aligned, compression, schema_version, source_files=files)


def _write_df(
    table: Table,
    aligned,
    compression: str,
    schema_version: int,
    source_files: list[str] | None = None,
    name_override: str | None = None,
) -> list[dict]:
    pspec = table.partition_spec
    sorder = table.sort_order
    files = source_files or []

    part_cols = [f"__p_{p.field_name}" for p in pspec]
    for p, c in zip(pspec, part_cols):
        src_type = aligned.schema[p.column].dataType if p.column in aligned.columns else None
        aligned = aligned.withColumn(c, p.expr(src_type).cast("string"))

    if pspec:
        aligned = aligned.repartition(*[F.col(c) for c in part_cols])
    if sorder:
        aligned = aligned.sortWithinPartitions(
            *[F.col(c) for c in part_cols], *[s.expr() for s in sorder]
        )

    tmpdir = tempfile.mkdtemp(prefix="ice_spark_ingest_", dir=table.location)
    try:
        writer = aligned.write.mode("overwrite").option("compression", compression)
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(tmpdir)

        entries: list[dict] = []
        ts = int(time.time() * 1000)
        for root, _dirs, fnames in os.walk(tmpdir):
            for fn in fnames:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                rel = os.path.relpath(root, tmpdir)
                partition: dict[str, str] = {}
                part_dirs = []
                if rel != ".":
                    for comp in rel.split(os.sep):
                        k, _, v = comp.partition("=")
                        name = k.removeprefix("__p_")
                        partition[name] = v
                        part_dirs.append(f"{name}={v}")
                # DataFileNamingStrategy.DEFAULT analog: ts-unique name
                # under data/[partition dirs] (Insert.java:835-881)
                dst_dir = os.path.join(table.data_dir, *part_dirs)
                os.makedirs(dst_dir, exist_ok=True)
                if name_override is not None:
                    # PRESERVE_ORIGINAL: basename per partition dir;
                    # collisions are an error, never a silent rename
                    new_name = name_override
                    if os.path.exists(os.path.join(dst_dir, new_name)):
                        raise ValueError(
                            f"preserve naming collision: {os.path.join(dst_dir, new_name)}"
                        )
                else:
                    new_name = f"{ts}-{uuid.uuid4().hex[:16]}.parquet"
                dst = os.path.join(dst_dir, new_name)
                shutil.move(src, dst)
                rows, size = _footer_stats(dst)
                entries.append(
                    {
                        "path": os.path.relpath(dst, table.location),
                        "partition": partition,
                        "records": rows,
                        "size_bytes": size,
                        "source_path": files[0] if len(files) == 1 else None,
                        "schema_version": schema_version,
                        "column_metrics": _footer_column_metrics(dst),
                    }
                )
        return entries
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
