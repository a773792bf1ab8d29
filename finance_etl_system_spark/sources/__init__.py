"""Batch sources/sinks beyond parquet (SURVEY §2.1)."""
