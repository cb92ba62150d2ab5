"""Streaming ingest (the reference's `insert --watch`, SURVEY.md §2.9)."""
