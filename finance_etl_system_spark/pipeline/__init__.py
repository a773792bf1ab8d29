"""Batch ETL pipeline: clean/prepare, technical indicators, incremental
watermark processing, idempotent sinks — the reference's
spark-job/etl_job.py re-expressed as composable transforms."""
