"""Schema-contract validation (SURVEY §1.2).

The reference checks required columns at runtime and logs-and-limps
when they're missing (reference spark-job/etl_job.py:218-221), and
force-casts numerics hoping for the best (etl_job.py:240-243). The
engine inverts that: an explicit contract, applied in one declarative
pass, with three enforcement modes:

- ``fail``:   missing columns / uncastable rows raise (fail fast)
- ``reject``: non-conforming ROWS are dropped (returned separately)
- ``null``:   non-conforming VALUES become NULL, rows survive

An ``infer`` escape hatch stays available for ad-hoc ingest — but
nothing downstream of the catalog accepts an unvalidated frame.

Scale notes: validation is a projection (try_cast + boolean flags) —
no shuffle, fully codegen'd. The reject path tags rows instead of
re-scanning, so good+bad splits share one scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ValidationResult:
    valid: DataFrame
    rejected: DataFrame | None  # None unless mode="reject"


def validate_contract(
    df: DataFrame,
    contract: T.StructType,
    *,
    mode: str = "reject",
    extra_columns: str = "drop",
) -> ValidationResult:
    """Enforce ``contract`` on ``df``.

    Each contract field is ``try_cast`` to its target type; a non-null
    input that casts to null is a violation. Non-nullable fields also
    reject/fail on null input. ``extra_columns``: 'drop' | 'keep' |
    'fail'.
    """
    if mode not in ("fail", "reject", "null"):
        raise ValueError(f"unknown mode {mode!r}")

    missing = [f.name for f in contract.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"contract violation: missing columns {missing}")

    extras = [c for c in df.columns if c not in contract.names]
    if extras and extra_columns == "fail":
        raise ValueError(f"contract violation: unexpected columns {extras}")
    keep_extras = extras if extra_columns == "keep" else []

    cast_cols = []
    violation = F.lit(False)
    for field in contract.fields:
        src = F.col(field.name)
        casted = src.try_cast(field.dataType)
        bad_cast = src.isNotNull() & casted.isNull()
        null_violation = (
            src.isNull() if not field.nullable else F.lit(False)
        )
        violation = violation | bad_cast | null_violation
        cast_cols.append(casted.alias(field.name))

    shaped = df.select(*cast_cols, *keep_extras, violation.alias("_invalid"))

    if mode == "fail":
        n_bad = shaped.filter("_invalid").count()
        if n_bad:
            raise ValueError(f"contract violation: {n_bad} non-conforming rows")
        return ValidationResult(shaped.drop("_invalid"), None)
    if mode == "reject":
        return ValidationResult(
            shaped.filter(~F.col("_invalid")).drop("_invalid"),
            shaped.filter(F.col("_invalid")).drop("_invalid"),
        )
    # mode == "null": keep rows; individual bad values are already null
    # from try_cast; null-violations on non-nullable fields stay null.
    return ValidationResult(shaped.drop("_invalid"), None)
