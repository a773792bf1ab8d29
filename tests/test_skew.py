"""Salted-join / two-phase-agg correctness: results must equal the
plain operators on skewed inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_system_spark.operators.skew import salted_join, two_phase_agg


def _skewed(spark):
    # one hot key (90%) + tail
    rows = [("hot", i * 1.0) for i in range(900)] + [
        (f"k{i}", i * 1.0) for i in range(100)
    ]
    return spark.createDataFrame(rows, "key STRING, v DOUBLE")


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key STRING, tag STRING"
    )
    plain = left.join(right, "key").groupBy("key", "tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(left, right, "key", salt=8).groupBy("key", "tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    a = {(r["key"], r["tag"]): (r["n"], r["s"]) for r in plain.collect()}
    b = {(r["key"], r["tag"]): (r["n"], r["s"]) for r in salted.collect()}
    assert a == b


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([("hot", "H")], "key STRING, tag STRING")
    out = salted_join(left, right, "key", salt=4, how="left")
    assert out.count() == 1000
    assert out.filter("tag IS NULL").count() == 100


def test_salted_join_rejects_right_replicating_hows(spark):
    import pytest

    left = spark.createDataFrame([("a", 1.0)], "key STRING, v DOUBLE")
    right = spark.createDataFrame([("a", "A"), ("b", "B")], "key STRING, tag STRING")
    for how in ("right", "rightouter", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, "key", salt=4, how=how)


def test_two_phase_agg_stable_under_repartition(spark):
    """Salts are content-derived, so the result must be identical no
    matter how the input rows are laid out across partitions."""
    df = _skewed(spark)
    base = {
        r["key"]: (r["n"], r["s"])
        for r in two_phase_agg(df, "key", [("v", "count", "n"), ("v", "sum", "s")]).collect()
    }
    shuffled = {
        r["key"]: (r["n"], r["s"])
        for r in two_phase_agg(
            df.repartition(7, "v"), "key", [("v", "count", "n"), ("v", "sum", "s")]
        ).collect()
    }
    assert base == shuffled


def test_two_phase_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["key"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("key")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["key"]: (r["n"], r["s"], r["mx"])
        for r in two_phase_agg(
            df, "key", [("v", "count", "n"), ("v", "sum", "s"), ("v", "max", "mx")]
        ).collect()
    }
    assert plain == salted
