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
