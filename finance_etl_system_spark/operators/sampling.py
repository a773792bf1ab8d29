"""Deterministic sampling for training-data pipelines.

`df.sample(fraction, seed)` is reproducible only within one Spark
version/partitioning — the sampled SET changes when the data is
repartitioned, which poisons incremental pipelines (yesterday's 10%
sample and today's disagree on yesterday's rows). These operators
sample by CONTENT hash instead: a row is in the sample iff
md5(natural key) falls below a threshold, so membership is a pure
function of the row — stable across engines, partitionings, runs, and
scale factors, and joinable (the same key samples identically in two
tables, giving consistent fact/dim subsamples).

The hex-string-prefix comparison (`substr(md5(k),1,4) < threshold`)
is deliberately chosen over hex→int conversion because lexicographic
compare of lowercase hex behaves identically in Spark and DuckDB —
the property the oracle gate checks.

Scale notes: the filter is a pure map-side predicate (no shuffle, no
state); md5 is JVM-side, whole-stage-codegen'd. Granularity is 16^4 =
65,536 buckets → requested fractions land within 1/65536.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 16**4  # 4 hex chars


def _hex_threshold(fraction: float) -> str:
    """Exclusive upper bound on the 4-char lowercase-hex prefix for
    `fraction`. For fraction=1.0 the bound must sort ABOVE every hex
    string — 'g' does; the naive format() result '10000' does NOT
    ('ffff' > '10000' lexicographically)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * _BUCKETS)
    return "g" if n >= _BUCKETS else format(n, "04x")


def hash_bucket(*key_cols: str, sep: str = "§") -> Column:
    """The 4-hex-char md5 prefix of the concatenated key — the
    sampling coordinate. Exposed so callers can persist it once and
    reuse it for many fractions (nested samples: a 1% sample is a
    subset of the 10% sample by construction)."""
    key = F.concat_ws(sep, *[F.col(c).cast("string") for c in key_cols])
    return F.substring(F.md5(key), 1, 4)


def hash_sample(df: DataFrame, key_cols: list[str], fraction: float) -> DataFrame:
    """Keep ~`fraction` of rows, membership determined by key hash."""
    return df.filter(hash_bucket(*key_cols) < F.lit(_hex_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample the majority class,
    keep all of the rare one). Strata absent from `fractions` are
    dropped — the common rebalancing contract. `key_cols` defaults to
    every non-stratum column."""
    if key_cols is None:
        key_cols = [c for c in df.columns if c != strata_col]
    bucket = hash_bucket(*key_cols)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = keep | (
            (F.col(strata_col) == stratum) & (bucket < F.lit(_hex_threshold(frac)))
        )
    return df.filter(keep)


def train_test_split_by_key(
    df: DataFrame, key_cols: list[str], test_fraction: float = 0.2
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe split: every row of one key lands wholly in train
    or wholly in test (group-aware splitting — the property random
    row-level splits violate when keys repeat across rows)."""
    bucket = hash_bucket(*key_cols)
    thresh = F.lit(_hex_threshold(test_fraction))
    return df.filter(bucket >= thresh), df.filter(bucket < thresh)
