"""Structured Streaming ingest + windowed aggregation (SURVEY §2.8)."""
