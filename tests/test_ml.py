"""ML-tier tests (SURVEY §2.9): applyInPandas OLS vs closed form,
scoring, registry, monitoring."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from pyspark.sql import Window

from finance_etl_system_spark.catalog import load_table
from finance_etl_system_spark.pipeline.ml import (
    best_model_per_group,
    chronological_split,
    monitoring_rules,
    save_model_registry,
    score_ols,
    standardize,
    train_ols_per_group,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def series(spark):
    e = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.withColumn("lag1", F.lag("value", 1).over(w))


def test_chrono_split_fractions(spark, series):
    split = chronological_split(series, group_col="user_id", time_col="ts")
    counts = (
        split.groupBy("user_id")
        .pivot("split", ["train", "test"])
        .count()
        .na.fill(0)
        .collect()
    )
    for r in counts:
        total = r["train"] + r["test"]
        if total >= 5:
            assert r["train"] / total >= 0.6  # ~80% train


def test_standardize_moments(spark, series):
    z = standardize(series, ["value"], group_col="user_id")
    stats = (
        z.groupBy("user_id")
        .agg(F.avg("value_z").alias("mu"), F.stddev("value_z").alias("sd"),
             F.count(F.lit(1)).alias("n"))
        .filter("n > 3")
        .collect()
    )
    for r in stats:
        assert abs(r["mu"]) < 1e-9
        assert abs(r["sd"] - 1.0) < 1e-6


def test_ols_trainer_matches_closed_form(spark, series):
    """Single-feature applyInPandas OLS must equal the covariance
    formula (same math sklearn LinearRegression uses)."""
    models = {
        r["group_key"]: r
        for r in train_ols_per_group(
            series, group_col="user_id", feature_cols=["lag1"],
            target_col="value", min_rows=5,
        ).collect()
    }
    closed = (
        series.dropna(subset=["lag1"])
        .groupBy("user_id")
        .agg(
            F.covar_pop("lag1", "value").alias("cov"),
            F.var_pop("lag1").alias("var"),
            F.avg("value").alias("my"),
            F.avg("lag1").alias("mx"),
        )
        .collect()
    )
    for r in closed:
        key = str(r["user_id"])
        if key in models and r["var"] and r["var"] > 0:
            slope = r["cov"] / r["var"]
            assert models[key]["coefficients"][0] == pytest.approx(slope, rel=1e-6)
            assert models[key]["intercept"] == pytest.approx(
                r["my"] - slope * r["mx"], rel=1e-6
            )


def test_scoring_and_registry_roundtrip(spark, series, tmp_path):
    models = train_ols_per_group(
        series, group_col="user_id", feature_cols=["lag1"],
        target_col="value", min_rows=5,
    )
    path = str(tmp_path / "registry")
    save_model_registry(models, path)
    loaded = spark.read.parquet(path)
    assert loaded.count() == models.count()
    assert "created_at" in loaded.columns

    best = best_model_per_group(loaded)
    assert best.groupBy("group_key").count().filter("count > 1").count() == 0

    scored = score_ols(
        series.dropna(subset=["lag1"]), loaded,
        group_col="user_id", feature_cols=["lag1"],
    )
    row = scored.select("prediction").first()
    assert row["prediction"] is not None


def test_monitoring_flags(spark, series):
    models = train_ols_per_group(
        series, group_col="user_id", feature_cols=["lag1"],
        target_col="value", min_rows=5,
    )
    flagged = monitoring_rules(models)
    pdf = flagged.toPandas()
    # random-walk-ish lag regression on noise → low r2 alerts exist
    assert pdf["alert_low_r2"].any()
    assert (pdf["needs_attention"] == (pdf["alert_low_r2"] | pdf["alert_insufficient_data"])).all()


def test_ridge_grid_selects_and_shrinks(spark):
    """Grid-search parity (reference GridSearchCV+TimeSeriesSplit):
    clean linear data selects lambda=0 and recovers the coefficients;
    forcing a large lambda shrinks them toward zero; output is
    deterministic across runs."""
    import numpy as np

    from finance_etl_system_spark.pipeline.ml import train_ridge_grid_per_group

    rng = np.random.RandomState(0)
    rows = []
    for g in ("A", "B"):
        for t in range(120):
            x1, x2 = rng.randn(), rng.randn()
            y = 3.0 * x1 - 2.0 * x2 + 5.0 + 0.01 * rng.randn()
            rows.append((g, t, float(x1), float(x2), float(y)))
    df = spark.createDataFrame(rows, "g STRING, t INT, x1 DOUBLE, x2 DOUBLE, y DOUBLE")

    kw = dict(group_col="g", feature_cols=["x1", "x2"], target_col="y", time_col="t")
    out = {r["group_key"]: r for r in train_ridge_grid_per_group(df, **kw).collect()}
    assert set(out) == {"A", "B"}
    for r in out.values():
        assert r["best_lambda"] == 0.0  # clean data: OLS wins the grid
        assert r["coefficients"][0] == pytest.approx(3.0, abs=0.05)
        assert r["coefficients"][1] == pytest.approx(-2.0, abs=0.05)
        assert r["intercept"] == pytest.approx(5.0, abs=0.05)
        assert r["r2"] > 0.99

    # determinism
    again = {r["group_key"]: r for r in train_ridge_grid_per_group(df, **kw).collect()}
    assert all(again[k]["coefficients"] == out[k]["coefficients"] for k in out)

    # heavy penalty shrinks coefficients, intercept unpenalized
    heavy = {
        r["group_key"]: r
        for r in train_ridge_grid_per_group(df, lambdas=(1000.0,), **kw).collect()
    }
    for k in out:
        assert abs(heavy[k]["coefficients"][0]) < abs(out[k]["coefficients"][0])
        assert heavy[k]["intercept"] == pytest.approx(5.0, abs=0.5)


@pytest.fixture(scope="module")
def nonlinear_df(spark):
    """Two groups with a strongly nonlinear response — a linear model
    cannot fit it, a depth-3 GBT can."""
    import numpy as np

    rows = []
    for g, shift in (("g1", 0.0), ("g2", 0.5)):
        xs = np.linspace(-2.0, 2.0, 200)
        for t, x in enumerate(xs):
            y = float(np.sin(3.0 * x) + (x + shift) ** 2)
            rows.append((g, t, float(x), y))
    return spark.createDataFrame(rows, "g string, t int, x double, y double")


def test_gbt_beats_ols_on_nonlinear_series(spark, nonlinear_df):
    from finance_etl_system_spark.pipeline.trees import train_gbt_per_group

    gbt = {
        r["group_key"]: r["r2"]
        for r in train_gbt_per_group(
            nonlinear_df,
            group_col="g",
            feature_cols=["x"],
            target_col="y",
            time_col="t",
        ).collect()
    }
    ols = {
        r["group_key"]: r["r2"]
        for r in train_ols_per_group(
            nonlinear_df, group_col="g", feature_cols=["x"], target_col="y"
        ).collect()
    }
    assert set(gbt) == {"g1", "g2"}
    for g in gbt:
        assert gbt[g] > 0.9  # trees capture the curvature
        assert gbt[g] > ols[g] + 0.2  # and clearly beat the linear fit


def test_gbt_blob_registry_roundtrip(spark, nonlinear_df, tmp_path):
    """Score from a RELOADED parquet blob — the GridFS-equivalent
    contract: the blob alone reconstructs the model."""
    from finance_etl_system_spark.pipeline.trees import (
        score_from_blob,
        train_gbt_per_group,
    )

    models = train_gbt_per_group(
        nonlinear_df, group_col="g", feature_cols=["x"], target_col="y",
        time_col="t",
    )
    path = str(tmp_path / "registry")
    save_model_registry(models, path)
    reloaded = spark.read.parquet(path)
    assert dict(reloaded.dtypes)["model_blob"] == "binary"

    scored = score_from_blob(
        nonlinear_df, reloaded, group_col="g", feature_cols=["x"]
    )
    out = scored.toPandas()
    assert len(out) == nonlinear_df.count()
    # the train-set MSE recomputed from reloaded-blob predictions must
    # equal the MSE the trainer reported — bit-for-bit model recovery
    reported = {r["group_key"]: r["mse"] for r in models.collect()}
    for g, grp in out.groupby("g"):
        mse = float(((grp["y"] - grp["prediction"]) ** 2).mean())
        assert abs(mse - reported[g]) < 1e-12
    # unmodeled groups are dropped (inner-join semantics)
    extra = spark.createDataFrame([("zz", 0, 0.1, 0.2)], nonlinear_df.schema)
    scored2 = score_from_blob(
        nonlinear_df.union(extra), reloaded, group_col="g", feature_cols=["x"]
    )
    assert scored2.filter("g = 'zz'").count() == 0


def test_gbt_metrics_deterministic_across_runs(spark, nonlinear_df):
    from finance_etl_system_spark.pipeline.trees import train_gbt_per_group

    def run():
        return sorted(
            (r["group_key"], r["r2"], r["mse"], len(r["model_blob"]))
            for r in train_gbt_per_group(
                nonlinear_df.repartition(7),  # partitioning must not matter
                group_col="g",
                feature_cols=["x"],
                target_col="y",
                time_col="t",
            ).collect()
        )

    assert run() == run()


def test_gbt_monitoring_composes_with_tree_models(spark, nonlinear_df):
    """The tree tier plugs into the same registry helpers as the
    linear tier (shared r2/mse/n_rows contract)."""
    from finance_etl_system_spark.pipeline.trees import train_gbt_per_group

    models = train_gbt_per_group(
        nonlinear_df, group_col="g", feature_cols=["x"], target_col="y",
        time_col="t",
    )
    flagged = monitoring_rules(models).collect()
    assert all(not r["alert_low_r2"] for r in flagged)
    best = best_model_per_group(models.union(models)).collect()
    assert len(best) == 2


def test_holt_forecast_matches_pure_python(spark):
    """Holt recursion parity: the applyInPandas operator reproduces a
    pure-pandas/numpy recomputation exactly, and forecasts extrapolate
    linearly (yhat_{h+1} - yhat_h = trend)."""
    import numpy as np
    import pandas as pd

    from finance_etl_system_spark.pipeline.forecast import (
        holt_forecast,
        holt_numpy,
    )

    e = load_table(spark, SF_SMOKE, "events")
    out = holt_forecast(
        e, group_col="user_id", time_col="ts", value_col="value",
        alpha=0.5, beta=0.3, horizon=5,
    ).collect()
    assert out

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.dropna(subset=["value"]).sort_values("ts")
    by_user = {}
    for uid, g in pdf.groupby("user_id"):
        by_user[uid] = holt_numpy(
            g["value"].to_numpy(dtype=np.float64), 0.5, 0.3
        )
    got_users = {r.user_id for r in out}
    assert got_users == set(by_user)
    for r in out:
        level, trend = by_user[r.user_id]
        assert r.level == level and r.trend == trend
        assert r.forecast == level + r.h * trend
    # linear extrapolation between consecutive horizons
    rows = sorted(out, key=lambda r: (r.user_id, r.h))
    for a, b in zip(rows, rows[1:]):
        if a.user_id == b.user_id:
            assert np.isclose(b.forecast - a.forecast, a.trend)


def test_holt_forecast_carry_across_arrow_batches(spark):
    """Force tiny Arrow batches so series SPLIT across mapInPandas
    batches — the carry buffer must stitch them back to the same
    result as one-batch execution."""
    import numpy as np
    import pandas as pd

    from finance_etl_system_spark.pipeline.forecast import (
        holt_forecast,
        holt_numpy,
    )

    e = load_table(spark, SF_SMOKE, "events")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")  # events per user >> 7 -> guaranteed splits
    try:
        out = holt_forecast(
            e, group_col="user_id", time_col="ts", value_col="value"
        ).collect()
    finally:
        spark.conf.set(key, old)

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf.dropna(subset=["value"]).sort_values("ts")
    want = {
        uid: holt_numpy(g["value"].to_numpy(dtype=np.float64), 0.5, 0.3)
        for uid, g in pdf.groupby("user_id")
    }
    assert {r.user_id for r in out} == set(want)
    for r in out:
        level, trend = want[r.user_id]
        assert r.level == level and r.trend == trend
