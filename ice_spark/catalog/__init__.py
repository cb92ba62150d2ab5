"""Python-native lakehouse catalog: namespaces, snapshot-versioned
Parquet tables, hidden partitioning, sort orders, schema evolution.

Re-expresses the reference's Iceberg data model (SURVEY.md §1) without
the Iceberg runtime (not available in this environment): metadata is
JSON (one metadata.json per version + one manifest per snapshot),
data is Parquet written by Spark. Commits are atomic via
version-hint swap, mirroring Iceberg's hadoop-catalog protocol.

Reference parity map (files under /root/reference):
- catalog/DDL verbs        ice/.../cli/Main.java:79-86
- schema-subset gate       ice/.../iceberg/SchemaEvolution.java
- partition transforms     ice/.../iceberg/Partitioning.java:84-145
- sort orders              ice/.../iceberg/Sorting.java:37-52
- snapshots/metadata       ice/.../cmd/ListSnapshots.java, DescribeMetadata.java
"""

from ice_spark.catalog.catalog import Catalog  # noqa: F401
from ice_spark.catalog.table import Table  # noqa: F401
