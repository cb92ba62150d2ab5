"""Write path: the reference's `insert` verb family as declarative
Spark jobs (SURVEY.md §2.2)."""

from ice_spark.ingest.insert import insert  # noqa: F401
