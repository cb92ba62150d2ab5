"""ice_spark — a PySpark-native lakehouse engine.

A from-scratch re-expression of the capabilities of Altinity/ice
(an Apache Iceberg CLI + REST catalog toolchain) as an idiomatic
PySpark engine:

- ``ice_spark.session`` — tuned SparkSession factory (AQE, Arrow,
  shuffle sizing) designed for 1000-executor clusters but testable
  on ``local[*]``.
- ``ice_spark.catalog`` — a Python-native snapshot-based table
  format over Parquet (namespaces, tables, snapshots, hidden
  partitioning transforms, sort orders, schema-evolution gate),
  mirroring the reference's Iceberg data model
  (see /root/reference/ice, SURVEY.md §1).
- ``ice_spark.ingest`` — the reference's ``insert`` verb family
  re-expressed as declarative DataFrame writes.
- ``ice_spark.queries`` — the relational query surface (TPC-H-ish
  analytics, windows, set-ops, rollups) that the reference delegates
  to Spark.
- ``ice_spark.operators`` — large-scale training-data pipeline
  operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity search, text analysis, multimodal.
- ``ice_spark.streaming`` — Structured Streaming ingest (the
  reference's ``insert --watch``).
"""

__version__ = "0.1.0"
