"""Source-level utilities (Parquet footer inspection, file listing)."""
