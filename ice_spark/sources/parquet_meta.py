"""Raw Parquet footer inspection.

Parity with the reference's `describe-parquet`
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/cmd/DescribeParquet.java:76-190
and its Hadoop-free footer reader iceberg/parquet/Metadata.java:35-111)
— implemented over pyarrow as SURVEY.md §2.3 recommends (don't
reimplement footer parsing).
"""

from __future__ import annotations


def describe_parquet(path: str) -> dict:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    out = {
        "file": path,
        "created_by": md.created_by,
        "num_rows": md.num_rows,
        "num_row_groups": md.num_row_groups,
        "serialized_footer_size": md.serialized_size,
        "schema": [
            {
                "name": md.schema.column(i).name,
                "physical_type": md.schema.column(i).physical_type,
                "logical_type": str(md.schema.column(i).logical_type),
            }
            for i in range(md.num_columns)
        ],
        "row_groups": [],
    }
    total_compressed = total_uncompressed = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        cols = []
        for ci in range(g.num_columns):
            c = g.column(ci)
            total_compressed += c.total_compressed_size
            total_uncompressed += c.total_uncompressed_size
            stats = c.statistics
            cols.append(
                {
                    "path": c.path_in_schema,
                    "codec": c.compression,
                    "encodings": list(c.encodings),
                    "compressed_size": c.total_compressed_size,
                    "uncompressed_size": c.total_uncompressed_size,
                    "null_count": stats.null_count if stats else None,
                    "min": stats.min if stats and stats.has_min_max else None,
                    "max": stats.max if stats and stats.has_min_max else None,
                }
            )
        out["row_groups"].append(
            {"num_rows": g.num_rows, "total_byte_size": g.total_byte_size, "columns": cols}
        )
    out["total_compressed_size"] = total_compressed
    out["total_uncompressed_size"] = total_uncompressed
    return out
