"""Reusable DataFrame shapes.

``ranked_topk`` encodes the repo's top-k policy: a global
``row_number()`` window ranks the WHOLE frame through one
single-partition WindowExec — the classic hidden scale-killer — while
``orderBy(...).limit(k)`` plans as a distributed
TakeOrderedAndProject (per-partition heaps, driver merges k rows).
The rank column is assigned AFTER the limit, so the only
single-partition window in the plan runs over k rows. Output is
bit-identical to the window form whenever the sort key is total
(callers follow the oracle policy: rounded score + unique id
tiebreak).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def literal_frame(
    spark: SparkSession, rows: list, schema: str
) -> DataFrame:
    """A driver-built literal DataFrame that plans as
    ``LocalTableScan`` — the node the plan lints (plans/lint.py) can
    PROVE bounded — instead of ``Scan ExistingRDD``, which is
    indistinguishable from checkpointed data-scale output and is
    therefore no longer blessed by the lints (advisor finding r10).
    Use this for every sanctioned driver-sized frame (band tables,
    centroid frames, bucket offsets, kNN query sets) that feeds a
    global window or a broadcast-nested-loop join.

    Implementation: ``createDataFrame(python_list)`` takes the RDD
    path, and the ``pandas.DataFrame`` round-trip takes the Arrow
    local-relation path ONLY when
    ``spark.sql.execution.arrow.pyspark.enabled`` is true (PySpark
    default: false) — on a stock driver-provided session it silently
    degrades to ``Scan ExistingRDD`` (advisor finding r11). Building
    a ``pyarrow.Table`` instead hits the createDataFrame overload
    that bypasses that conf entirely and always plans
    LocalTableScan, empty frames included — verified here by
    asserting the analyzed node is ``LocalRelation`` so any future
    degradation fails loudly rather than tripping downstream lints.
    The column order comes from ``schema`` (a DDL string), so
    callers pass rows as tuples in schema order exactly as with
    createDataFrame.
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    st = spark.createDataFrame([], schema).schema
    names = [f.name for f in st.fields]
    tbl = pa.Table.from_pylist(
        [dict(zip(names, r)) for r in rows], schema=to_arrow_schema(st)
    )
    df = spark.createDataFrame(tbl, schema=st)
    # Fail-loudly contract (advisor r12): an `assert` vanishes under
    # python -O, and `_jdf` does not exist on a Spark Connect session
    # (the CLAUDE.md arbitrary-session contract) — so raise explicitly
    # and skip the plan probe when the JVM handle is unavailable.
    jdf = getattr(df, "_jdf", None)
    if jdf is not None:
        node = jdf.queryExecution().analyzed().getClass().getSimpleName()
        if node != "LocalRelation":
            raise RuntimeError(
                f"literal_frame degraded to {node}; the plan lints "
                "require LocalTableScan — see plans/lint.py"
            )
    return df


def ranked_topk(df: DataFrame, key: list[Column], k: int) -> DataFrame:
    """Top-``k`` rows of ``df`` by ``key`` (a total order), with a
    1-based ``rnk`` column — TakeOrderedAndProject, not a global
    window."""
    w = Window.orderBy(*key)
    return (
        df.orderBy(*key).limit(k).withColumn("rnk", F.row_number().over(w))
    )
