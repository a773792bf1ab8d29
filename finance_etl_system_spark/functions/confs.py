"""Scoped SparkSession conf overrides.

Engine code must work on an arbitrary driver-provided SparkSession
(CLAUDE.md contract), which forces runtime ``spark.conf.set`` calls —
but a bare set LEAKS: a writer that switches
``spark.sql.sources.partitionOverwriteMode`` to dynamic and returns
silently changes the semantics of the CALLER's next partitioned
overwrite. Every writer in this repo therefore scopes the override
with :func:`session_conf`, which captures the prior effective value
and restores it on exit (success or exception).

Restoring the *effective* value (rather than unset-if-previously-
unset) is deliberate: it is observationally identical for the caller
and avoids racing Spark's default-resolution machinery.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def session_conf(spark, key: str, value: str):
    """Set ``key`` for the duration of the block, then restore the
    prior effective value — even if the block raises."""
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@contextmanager
def partition_overwrite(spark, mode: str):
    """Scoped ``spark.sql.sources.partitionOverwriteMode`` — the one
    conf every partitioned writer here needs to pin (static for full
    rebuilds, dynamic for idempotent per-partition replays)."""
    with session_conf(
        spark, "spark.sql.sources.partitionOverwriteMode", mode
    ):
        yield
