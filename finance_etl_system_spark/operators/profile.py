"""Single-pass column profiler (Deequ/Glue-crawler analogue) — the
"what is in this table" report a pipeline runs before writing
expectations (queries/expectations.py consumes thresholds; this
produces the numbers to pick them from).

Every per-column metric rides ONE aggregate over the table: the plan
is scan → partial HashAggregate → exchange(1) → final HashAggregate,
and adding a profiled column adds expressions to the same pass, not a
scan. Exact ``countDistinct`` per column makes Spark plan an Expand
(rows × profiled-columns before the partial agg) — right for the
oracle-exact tier; at 100 TB swap in ``approx_count_distinct`` and
the Expand disappears (documented, SCALE.md).

The long-format result separates numeric min/max (double, rounded)
from lexical min/max (string) so every value compares engine-exactly:
double→string formatting is NOT portable across engines
(Java's 1.0E7 vs DuckDB's 10000000.0), numeric doubles and ISO date
strings are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind: "num" (numeric min/max/avg) or "str" (lexical min/max; dates
# cast to ISO strings first)
ProfileSpec = list[tuple[str, str]]


def profile_columns(df: DataFrame, spec: ProfileSpec) -> DataFrame:
    """Profile the given (column, kind) pairs in one aggregate pass.

    Returns long format: (column_name, n, null_count, n_distinct,
    min_num, max_num, avg_num, min_str, max_str) with the unused
    min/max family NULL per row.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, kind in spec:
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(col).alias(f"{c}__distinct"))
        if kind == "num":
            aggs.append(F.round(F.min(col).cast("double"), 6).alias(f"{c}__min_num"))
            aggs.append(F.round(F.max(col).cast("double"), 6).alias(f"{c}__max_num"))
            aggs.append(
                # exact for fixed-point columns (keys/4dp money): the
                # decimal sum is order-free; arbitrary floats are
                # 6dp-quantized identically on both engines
                F.round(
                    F.sum(col.cast("decimal(28,6)")).cast("double")
                    / F.count(col),
                    6,
                ).alias(f"{c}__avg_num")
            )
        else:
            aggs.append(F.min(col.cast("string")).alias(f"{c}__min_str"))
            aggs.append(F.max(col.cast("string")).alias(f"{c}__max_str"))
    wide = df.agg(*aggs)

    # melt via explode(array(struct...)) — NOT a self-union of `wide`:
    # a union would duplicate the whole aggregate subtree (and its
    # scan) once per profiled column, which is exactly the multi-pass
    # shape this operator exists to avoid (plan-asserted in
    # tests/test_plans.py::test_profile_single_aggregate_pass)
    structs = []
    for c, kind in spec:
        num = kind == "num"
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n"),
                F.col(f"{c}__nulls").alias("null_count"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (
                    F.col(f"{c}__min_num")
                    if num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"{c}__max_num")
                    if num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"{c}__avg_num")
                    if num
                    else F.lit(None).cast("double")
                ).alias("avg_num"),
                (
                    F.lit(None).cast("string")
                    if num
                    else F.col(f"{c}__min_str")
                ).alias("min_str"),
                (
                    F.lit(None).cast("string")
                    if num
                    else F.col(f"{c}__max_str")
                ).alias("max_str"),
            )
        )
    return (
        wide.select(F.explode(F.array(*structs)).alias("m"))
        .select("m.*")
        .orderBy("column_name")
    )
