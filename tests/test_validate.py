"""Schema-contract validation + compaction tests (SURVEY §1.2)."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from finance_etl_system_spark.operators.validate import validate_contract
from finance_etl_system_spark.pipeline.etl import compact_partitions

CONTRACT = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("price", T.DoubleType(), nullable=True),
        T.StructField("tag", T.StringType(), nullable=True),
    ]
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("1", "10.5", "a"),
            ("2", "oops", "b"),   # price fails cast
            (None, "3.5", "c"),   # id null on non-nullable
            ("4", None, "d"),     # nullable null: OK
        ],
        "id STRING, price STRING, tag STRING",
    )


def test_reject_mode_splits_good_and_bad(spark):
    res = validate_contract(_df(spark), CONTRACT, mode="reject")
    good = {r["id"] for r in res.valid.collect()}
    assert good == {1, 4}
    assert res.rejected.count() == 2
    assert dict(res.valid.dtypes)["price"] == "double"


def test_null_mode_keeps_rows(spark):
    res = validate_contract(_df(spark), CONTRACT, mode="null")
    rows = {r["tag"]: r for r in res.valid.collect()}
    assert len(rows) == 4
    assert rows["b"]["price"] is None  # bad cast nulled, row kept
    assert rows["c"]["id"] is None


def test_fail_mode_raises(spark):
    with pytest.raises(ValueError, match="non-conforming"):
        validate_contract(_df(spark), CONTRACT, mode="fail")


def test_missing_column_always_raises(spark):
    df = spark.createDataFrame([("1",)], "id STRING")
    with pytest.raises(ValueError, match="missing columns"):
        validate_contract(df, CONTRACT)


def test_extra_columns_modes(spark):
    base = _df(spark)
    df = base.withColumn("extra", base.id)
    assert "extra" not in validate_contract(df, CONTRACT).valid.columns
    kept = validate_contract(df, CONTRACT, extra_columns="keep").valid
    assert "extra" in kept.columns
    with pytest.raises(ValueError, match="unexpected columns"):
        validate_contract(df, CONTRACT, extra_columns="fail")


def test_compaction_reduces_files(spark, tmp_path):
    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("A", i, float(i)) for i in range(50)] + [("B", i, float(i)) for i in range(50)],
        "symbol STRING, trading_date INT, v DOUBLE",
    )
    # simulate many small appends
    for chunk in range(5):
        df.filter(f"trading_date % 5 = {chunk}").repartition(4).write.mode(
            "append"
        ).partitionBy("symbol").parquet(out)
    import glob

    before = len(glob.glob(f"{out}/**/*.parquet", recursive=True))
    after = compact_partitions(spark, out)
    assert after < before
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert got.select("symbol").distinct().count() == 2


def test_data_expectations_approx_estimate_and_verdicts(spark):
    """The HLL twin of the expectation suite: the sketch's distinct
    estimate must sit within 3×rsd of the exact count, every verdict
    must agree with the exact suite's on the fixture, and a heavily
    duplicated key must FAIL the tolerance check while a unique one
    passes."""
    from pyspark.sql import functions as F

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.queries.expectations import (
        APPROX_RSD,
        APPROX_TOL,
        q_data_expectations,
        q_data_expectations_approx,
    )

    sf = "/root/testdata/sf0.001"
    o = load_table(spark, sf, "orders")
    exact = o.select(F.countDistinct("o_orderkey")).first()[0]
    est = o.select(
        F.approx_count_distinct("o_orderkey", APPROX_RSD)
    ).first()[0]
    assert abs(est - exact) / exact <= 3 * APPROX_RSD

    a = {r.check_name: r for r in q_data_expectations_approx(spark, sf).collect()}
    e = {r.check_name: r for r in q_data_expectations(spark, sf).collect()}
    assert a["uniqueness_o_orderkey_approx"].passed
    assert a["uniqueness_o_orderkey_approx"].metric is None
    for name, row in e.items():
        if name != "uniqueness_o_orderkey":
            assert a[name].passed == row.passed
            assert a[name].metric == row.metric

    # tolerance semantics: ~50% duplication must fail, unique passes
    dup = spark.range(1000).select((F.col("id") % 500).alias("k"))
    n, d = dup.agg(
        F.count(F.lit(1)), F.approx_count_distinct("k", APPROX_RSD)
    ).first()
    assert d / n < 1.0 - APPROX_TOL  # the gate the approx check applies
