"""ML-tier queries over ``events`` (SURVEY §2.9).

The per-user value series stands in for the per-symbol close series.
Chronological split, standardization, and closed-form OLS + monitoring
are oracle-checked (the OLS uses exact integer-tick covariance algebra
so both engines produce bit-identical doubles); the applyInPandas
multi-feature trainer is rows-only (validated against the closed form
in tests/test_ml.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import money_sum
from ..pipeline.ml import (
    chronological_split,
    train_ols_per_group,
    train_ridge_grid_per_group,
)
from ..pipeline.trees import train_gbt_per_group, train_rf_per_group

_TRAIN_FRAC = 0.8


def q_ml_chrono_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: per-user chronological 80/20 split — row counts per side."""
    e = load_table(spark, sf_dir, "events")
    split = chronological_split(
        e, group_col="user_id", time_col="ts", train_frac=_TRAIN_FRAC
    )
    return split.groupBy("user_id", "split").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("value").alias("value_sum"),
    )


_ML_CHRONO_SPLIT_SQL = f"""
WITH ranked AS (
  SELECT *,
    PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY ts) AS pr
  FROM events
)
SELECT
  user_id,
  CASE WHEN pr < {_TRAIN_FRAC} THEN 'train' ELSE 'test' END AS split,
  COUNT(*) AS n,
  ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS value_sum
FROM ranked
GROUP BY user_id, CASE WHEN pr < {_TRAIN_FRAC} THEN 'train' ELSE 'test' END
"""


def q_ml_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: per-user z-score of value — integer-tick moments so both
    engines compute identical doubles (no float accumulation drift)."""
    e = load_table(spark, sf_dir, "events")
    t = F.round(F.col("value") * 100, 0).cast("long")
    w = Window.partitionBy("user_id")
    df = e.withColumn("_t", t)
    s = F.sum("_t").over(w).cast("double")
    sq = F.sum(F.col("_t") * F.col("_t")).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    mu = s / n
    var = (sq - s * s / n) / (n - 1)
    sd = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(0.0))
    return df.select(
        "event_id",
        "user_id",
        F.round(
            F.when(sd > 0, (F.col("_t") - mu) / sd).otherwise(F.lit(0.0)), 6
        ).alias("value_z"),
    )


_ML_STANDARDIZE_SQL = """
WITH t AS (
  SELECT event_id, user_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS tv
  FROM events
),
m AS (
  SELECT *,
    CAST(SUM(tv) OVER w AS DOUBLE) AS s,
    CAST(SUM(tv * tv) OVER w AS DOUBLE) AS sq,
    COUNT(*) OVER w AS n
  FROM t
  WINDOW w AS (PARTITION BY user_id)
)
SELECT
  event_id,
  user_id,
  ROUND(
    CASE WHEN n > 1 AND sqrt(greatest((sq - s * s / n) / (n - 1), 0.0)) > 0
         THEN (tv - s / n) / sqrt(greatest((sq - s * s / n) / (n - 1), 0.0))
         ELSE 0.0 END, 6) AS value_z
FROM m
"""


def q_ml_linreg_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/M7/M10: closed-form per-user OLS (value ~ prev value) with
    R², plus monitoring alert flags — exact integer covariance algebra,
    bit-identical across engines.

    The Spark side is pure aggregates (map-side combinable — at 100 TB
    this is ONE pass, no Python); slope/intercept/r2 come from
    (n·Σxy − ΣxΣy) / (n·Σxx − Σx²) on tick-scaled longs.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.round(F.col("value") * 100, 0).cast("long")
    pairs = (
        e.withColumn("_y", t)
        .withColumn("_x", F.lag(t.alias("t"), 1).over(w))
        .filter(F.col("_x").isNotNull())
    )
    agg = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = F.when(den_x != 0, num / den_x).otherwise(F.lit(0.0))
    intercept = (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n") / 100.0
    r2 = F.when(
        (den_x != 0) & (den_y != 0), (num * num) / (den_x * den_y)
    ).otherwise(F.lit(0.0))
    out = agg.select(
        "user_id",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
    return out.select(
        "*",
        (F.col("r2") < 0.1).alias("alert_low_r2"),
        (F.col("n") < 30).alias("alert_insufficient_data"),
    )


_ML_LINREG_MONITORING_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y,
         LAG(CAST(ROUND(value * 100, 0) AS BIGINT), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x
  FROM events
),
p AS (SELECT * FROM t WHERE x IS NOT NULL),
agg AS (
  SELECT user_id,
    COUNT(*) AS n,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM p GROUP BY user_id
),
calc AS (
  SELECT user_id, n,
    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
    CAST(n * sxx - sx * sx AS DOUBLE) AS den_x,
    CAST(n * syy - sy * sy AS DOUBLE) AS den_y,
    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM agg
),
res AS (
  SELECT user_id, n,
    CASE WHEN den_x <> 0 THEN num / den_x ELSE 0.0 END AS slope,
    (syd - (CASE WHEN den_x <> 0 THEN num / den_x ELSE 0.0 END) * sxd) / n / 100.0 AS intercept,
    CASE WHEN den_x <> 0 AND den_y <> 0 THEN (num * num) / (den_x * den_y) ELSE 0.0 END AS r2
  FROM calc
)
SELECT
  user_id, n,
  ROUND(slope, 6) AS slope,
  ROUND(intercept, 6) AS intercept,
  ROUND(r2, 6) AS r2,
  r2 < 0.1 AS alert_low_r2,
  n < 30 AS alert_insufficient_data
FROM res
"""


def q_ml_train_ols_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 scale path: multi-feature OLS per user via applyInPandas
    (numpy lstsq). Rows-only driver check; parity with the closed form
    asserted in tests."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = (
        e.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn(
            "sma5", F.avg("value").over(w.rowsBetween(-4, 0))
        )
    )
    models = train_ols_per_group(
        feats,
        group_col="user_id",
        feature_cols=["lag1", "lag2", "sma5"],
        target_col="value",
        min_rows=20,
    )
    return models.select(
        "group_key",
        "model_name",
        "n_rows",
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        F.round("mse", 6).alias("mse"),
        F.round(F.col("coefficients")[0], 6).alias("coef_lag1"),
        F.round(F.col("coefficients")[1], 6).alias("coef_lag2"),
        F.round(F.col("coefficients")[2], 6).alias("coef_sma5"),
    ).orderBy("group_key")


def q_ml_train_ridge_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 grid-search parity: per-user ridge with λ chosen by
    expanding-window time-series CV inside applyInPandas (the
    reference's GridSearchCV+TimeSeriesSplit, ml_pipeline.py:182-192).
    Rows-only driver check; estimator properties pinned in
    tests/test_ml.py::test_ridge_grid_selects_and_shrinks."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = (
        e.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn("sma5", F.avg("value").over(w.rowsBetween(-4, 0)))
        .withColumn("t", F.row_number().over(w))
    )
    models = train_ridge_grid_per_group(
        feats,
        group_col="user_id",
        feature_cols=["lag1", "lag2", "sma5"],
        target_col="value",
        time_col="t",
        min_rows=30,
    )
    return models.select(
        "group_key",
        "model_name",
        "n_rows",
        "best_lambda",
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        F.round("cv_mse", 6).alias("cv_mse"),
    ).orderBy("group_key")


def q_ml_train_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 nonlinear family: per-user histogram gradient-boosted trees
    via applyInPandas (pipeline/trees.py) — the reference's
    RandomForest/LightGBM tier (ml-service/ml_pipeline.py:90-104)
    re-expressed without sklearn. Rows-only driver check (tree fitting
    is not SQL-expressible); accuracy vs the linear baseline and the
    registry blob roundtrip are pinned in tests/test_ml.py.

    The trainer is fully deterministic (quantile-binned splits, no
    subsampling, groups sorted by time before fitting), so the metric
    columns reproduce bit-identically across runs."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = (
        e.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn("sma5", F.avg("value").over(w.rowsBetween(-4, 0)))
        .withColumn("t", F.row_number().over(w))
    )
    models = train_gbt_per_group(
        feats,
        group_col="user_id",
        feature_cols=["lag1", "lag2", "sma5"],
        target_col="value",
        time_col="t",
        n_trees=10,
        max_depth=3,
        min_rows=30,
    )
    return models.select(
        "group_key",
        "model_name",
        "n_rows",
        "n_trees",
        F.round("r2", 6).alias("r2"),
        F.round("mse", 6).alias("mse"),
        F.length("model_blob").alias("blob_bytes"),
    ).orderBy("group_key")


def q_ml_train_tree_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 grid-search for the tree tier: per-user histogram-GBT with
    (depth, trees, lr) chosen by expanding-window chronological CV —
    the reference's GridSearchCV(cv=TimeSeriesSplit(3)) over the
    RF/LightGBM grids (ml-service/ml_pipeline.py:90-104,182-192).
    Rows-only driver check (tree fitting is not SQL-expressible);
    CV-selected-beats-fixed on a held-out tail is pinned in
    tests/test_ml.py. Fully deterministic — no subsampling, fixed
    tie-breaks — so metrics reproduce bit-identically."""
    from ..pipeline.trees import train_gbt_grid_per_group

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = (
        e.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn("sma5", F.avg("value").over(w.rowsBetween(-4, 0)))
        .withColumn("t", F.row_number().over(w))
    )
    models = train_gbt_grid_per_group(
        feats,
        group_col="user_id",
        feature_cols=["lag1", "lag2", "sma5"],
        target_col="value",
        time_col="t",
        min_rows=30,
    )
    return models.select(
        "group_key",
        "model_name",
        "n_rows",
        "n_trees",
        "best_depth",
        "best_lr",
        F.round("r2", 6).alias("r2"),
        F.round("cv_mse", 6).alias("cv_mse"),
    ).orderBy("group_key")


def q_ml_train_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 bagged-forest family: per-user random forest (bootstrap rows
    + per-tree feature subsets over the histogram tree,
    pipeline/trees.py::train_rf_per_group) — the RandomForestRegressor
    member of the reference's model trio (ml-service/
    ml_pipeline.py:90-104), completing OLS / GBT / RF. Rows-only
    driver check (forest fitting is not SQL-expressible);
    variance-reduction vs a single tree and replay determinism are
    pinned in tests/test_ml.py. Seeded per-group PRNG ⇒ bit-identical
    metrics across runs."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = (
        e.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn("sma5", F.avg("value").over(w.rowsBetween(-4, 0)))
        .withColumn("t", F.row_number().over(w))
    )
    models = train_rf_per_group(
        feats,
        group_col="user_id",
        feature_cols=["lag1", "lag2", "sma5"],
        target_col="value",
        time_col="t",
        n_trees=10,
        max_depth=4,
        min_rows=30,
    )
    return models.select(
        "group_key",
        "model_name",
        "n_rows",
        "n_trees",
        F.round("r2", 6).alias("r2"),
        F.round("mse", 6).alias("mse"),
        F.round("oob_mse", 6).alias("oob_mse"),
        F.length("model_blob").alias("blob_bytes"),
    ).orderBy("group_key")


def q_ml_best_of_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 unified cross-family registry end-to-end: per-user OLS,
    histogram-GBT AND bagged forest trained on the same features,
    unioned into ONE registry (pipeline/ml.py unify_registries),
    argmax-r2 winner per user — the reference's get_best_model across
    its three families RF/LightGBM/LinearRegression
    (ml-service/ml_pipeline.py:279-301). Rows-only driver check (the
    tree branches are not SQL-expressible); family-crossing selection
    is pinned in tests/test_ml.py::test_unified_registry_best_of_any_family.
    Deterministic: every trainer is exact or PRNG-seeded and r2 ties
    break on model_name."""
    from ..pipeline.ml import best_model_per_group, unify_registries

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = (
        e.withColumn("lag1", F.lag("value", 1).over(w))
        .withColumn("lag2", F.lag("value", 2).over(w))
        .withColumn("sma5", F.avg("value").over(w.rowsBetween(-4, 0)))
        .withColumn("t", F.row_number().over(w))
    )
    fcols = ["lag1", "lag2", "sma5"]
    ols = train_ols_per_group(
        feats, group_col="user_id", feature_cols=fcols,
        target_col="value", min_rows=30,
    )
    gbt = train_gbt_per_group(
        feats, group_col="user_id", feature_cols=fcols,
        target_col="value", time_col="t", n_trees=10, min_rows=30,
    )
    rf = train_rf_per_group(
        feats, group_col="user_id", feature_cols=fcols,
        target_col="value", time_col="t", n_trees=10, max_depth=4,
        min_rows=30,
    )
    # both tree families share the blob schema (oob_mse is RF-only
    # diagnostics) — one union, then the linear/blob unify;
    # get_best_model spans all three
    best = best_model_per_group(
        unify_registries(ols, gbt.unionByName(rf.drop("oob_mse")))
    )
    return best.select(
        "group_key",
        "model_name",
        "n_rows",
        F.round("r2", 6).alias("r2"),
        F.round("mse", 6).alias("mse"),
        F.col("model_blob").isNotNull().alias("is_blob_family"),
    ).orderBy("group_key")


def q_ml_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast, 5 steps ahead per symbol
    (pipeline/forecast.py). Rows-only driver check (the smoothing
    recursion is sequential, not SQL-expressible); exact parity vs a
    pure-numpy reference is pinned in tests/test_ml.py.

    Floats are rounded 6dp for a stable driver hash — the recursion
    itself is bit-deterministic (the worker sorts each series by ts,
    which is unique per user in the fixtures — SCALE.md invariant —
    so the fold order is fixed)."""
    from ..pipeline.forecast import holt_forecast

    e = load_table(spark, sf_dir, "events")
    out = holt_forecast(
        e, group_col="user_id", time_col="ts", value_col="value"
    )
    return out.select(
        "user_id",
        "h",
        F.round("forecast", 6).alias("forecast"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
    ).orderBy("user_id", "h")


_WF_FOLDS = ((0.5, 0.75), (0.75, 1.0))  # (train-prefix frac, test-end frac)


def q_ml_walk_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest (rolling retrain) of the per-user lag-1
    OLS: for each fold, the model trains on the chronological PREFIX
    and is evaluated out-of-sample on the NEXT slice — the batch twin
    of the reference's scheduled-retrain loop (ml-service
    ml_scheduler.py periodic retrain + eval), and the honest metric a
    serving alarm should threshold (train r2 flatters).

    Fully closed-form, hence oracle-checked: per (user, fold), train
    slope/intercept come from prefix integer-tick moments, and the
    out-of-sample SSE expands algebraically as
    Σ(y−ax−b)² = Syy + a²Sxx + m·b² − 2a·Sxy − 2b·Sy + 2ab·Sx
    over TEST-slice moments — so the whole backtest is ONE window pass
    (chronological index) + ONE groupBy collecting train+test moments
    per fold, with zero joins and no per-row scoring pass.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.round(F.col("value") * 100, 0).cast("long")
    base = (
        e.withColumn("_y", t)
        .withColumn("_x", F.lag(t.alias("t"), 1).over(w))
        .withColumn("_idx", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter(F.col("_x").isNotNull())
    )
    aggs = []
    for k, (f0, f1) in enumerate(_WF_FOLDS):
        cut = F.floor(F.col("_n") * F.lit(f0))
        hi = F.floor(F.col("_n") * F.lit(f1))
        tr = F.col("_idx") <= cut
        te = (F.col("_idx") > cut) & (F.col("_idx") <= hi)
        for tag, cond in ((f"tr{k}", tr), (f"te{k}", te)):
            aggs += [
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"{tag}_n"),
                F.sum(F.when(cond, F.col("_x"))).alias(f"{tag}_sx"),
                F.sum(F.when(cond, F.col("_y"))).alias(f"{tag}_sy"),
                F.sum(F.when(cond, F.col("_x") * F.col("_y"))).alias(f"{tag}_sxy"),
                F.sum(F.when(cond, F.col("_x") * F.col("_x"))).alias(f"{tag}_sxx"),
                F.sum(F.when(cond, F.col("_y") * F.col("_y"))).alias(f"{tag}_syy"),
            ]
    agg = base.groupBy("user_id").agg(*aggs)

    folds = []
    for k in range(len(_WF_FOLDS)):
        n = F.col(f"tr{k}_n").cast("double")
        num = (F.col(f"tr{k}_n") * F.col(f"tr{k}_sxy") - F.col(f"tr{k}_sx") * F.col(f"tr{k}_sy")).cast("double")
        den = (F.col(f"tr{k}_n") * F.col(f"tr{k}_sxx") - F.col(f"tr{k}_sx") * F.col(f"tr{k}_sx")).cast("double")
        a = num / den
        b = (F.col(f"tr{k}_sy").cast("double") - a * F.col(f"tr{k}_sx")) / n
        m = F.col(f"te{k}_n").cast("double")
        sse = (
            F.col(f"te{k}_syy")
            + a * a * F.col(f"te{k}_sxx")
            + m * b * b
            - 2 * a * F.col(f"te{k}_sxy")
            - 2 * b * F.col(f"te{k}_sy")
            + 2 * a * b * F.col(f"te{k}_sx")
        )
        folds.append(
            F.struct(
                F.lit(k + 1).alias("fold"),
                F.col(f"tr{k}_n").alias("train_n"),
                F.col(f"te{k}_n").alias("test_n"),
                F.when(den != 0, F.round(a, 6)).alias("slope"),
                F.when(den != 0, F.round(b / 100.0, 6)).alias("intercept"),
                F.when(
                    (den != 0) & (F.col(f"te{k}_n") > 0),
                    F.round(sse / m / 10000.0, 6),
                ).alias("test_mse"),
            )
        )
    out = agg.select(
        "user_id", F.explode(F.array(*folds)).alias("f")
    ).select("user_id", "f.*")
    return out.filter(
        F.col("slope").isNotNull() & F.col("test_mse").isNotNull()
    ).orderBy("user_id", "fold")


def _wf_fold_sql(k: int, f0: float, f1: float) -> str:
    c = f"CAST(FLOOR(n * {f0}) AS BIGINT)"
    h = f"CAST(FLOOR(n * {f1}) AS BIGINT)"
    tr = f"idx <= {c}"
    te = f"idx > {c} AND idx <= {h}"
    return f"""
  SELECT user_id, {k + 1} AS fold,
    CAST(SUM(CASE WHEN {tr} THEN 1 ELSE 0 END) AS BIGINT) AS train_n,
    CAST(SUM(CASE WHEN {te} THEN 1 ELSE 0 END) AS BIGINT) AS test_n,
    SUM(CASE WHEN {tr} THEN x END) AS tr_sx,
    SUM(CASE WHEN {tr} THEN y END) AS tr_sy,
    SUM(CASE WHEN {tr} THEN x * y END) AS tr_sxy,
    SUM(CASE WHEN {tr} THEN x * x END) AS tr_sxx,
    SUM(CASE WHEN {te} THEN x END) AS te_sx,
    SUM(CASE WHEN {te} THEN y END) AS te_sy,
    SUM(CASE WHEN {te} THEN x * y END) AS te_sxy,
    SUM(CASE WHEN {te} THEN x * x END) AS te_sxx,
    SUM(CASE WHEN {te} THEN y * y END) AS te_syy
  FROM base GROUP BY user_id"""


_ML_WALK_FORWARD_SQL = f"""
WITH nn AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y0
  FROM events WHERE value IS NOT NULL
),
win AS (
  SELECT user_id, y0 AS y,
         LAG(y0, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM nn
),
base AS (SELECT * FROM win WHERE x IS NOT NULL),
m0 AS ({_wf_fold_sql(0, *_WF_FOLDS[0])}),
m1 AS ({_wf_fold_sql(1, *_WF_FOLDS[1])}),
moments AS (SELECT * FROM m0 UNION ALL SELECT * FROM m1),
calc AS (
  SELECT user_id, fold, train_n, test_n,
    CAST(train_n * tr_sxy - tr_sx * tr_sy AS DOUBLE)
      / CAST(train_n * tr_sxx - tr_sx * tr_sx AS DOUBLE) AS a,
    CAST(train_n * tr_sxx - tr_sx * tr_sx AS DOUBLE) AS den,
    te_sx, te_sy, te_sxy, te_sxx, te_syy
  FROM moments
),
calc2 AS (
  SELECT *, (CAST(tr2.tr_sy AS DOUBLE) - a * tr2.tr_sx)
            / CAST(train_n AS DOUBLE) AS b
  FROM (
    SELECT c.*, m.tr_sx, m.tr_sy
    FROM calc c JOIN moments m USING (user_id, fold)
  ) tr2
)
SELECT user_id, fold, train_n, test_n,
  CASE WHEN den <> 0 THEN ROUND(a, 6) END AS slope,
  CASE WHEN den <> 0 THEN ROUND(b / 100.0, 6) END AS intercept,
  CASE WHEN den <> 0 AND test_n > 0 THEN
    ROUND((te_syy + a * a * te_sxx + CAST(test_n AS DOUBLE) * b * b
           - 2 * a * te_sxy - 2 * b * te_sy + 2 * a * b * te_sx)
          / CAST(test_n AS DOUBLE) / 10000.0, 6)
  END AS test_mse
FROM calc2
WHERE den <> 0 AND test_n > 0
ORDER BY user_id, fold
"""



def q_model_performance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of GET /models/performance (reference
    ml-service/prediction_api.py:270-357: per (symbol, model) the
    LATEST trained version plus how many versions exist, sorted by
    performance): the walk-forward folds are the retrain history —
    each fold is one training run — so the report is argmax-fold per
    user joined to the per-user version count, ranked by out-of-sample
    MSE. Pure composition of audited shapes over the oracle-checked
    walk-forward frame."""
    wf = q_ml_walk_forward(spark, sf_dir)
    # ONE aggregation: argmax-fold via max_by(struct) + the version
    # count — a window + self-join would derive the walk-forward
    # subplan twice (Spark does not share it across the join)
    agg = wf.groupBy("user_id").agg(
        F.max_by(
            F.struct("fold", "slope", "intercept", "test_mse"), "fold"
        ).alias("m"),
        F.count(F.lit(1)).alias("model_count"),
    )
    return agg.select(
        "user_id",
        F.lit("linear_lag").alias("model_name"),
        "model_count",
        F.col("m.fold").alias("latest_fold"),
        F.col("m.slope").alias("slope"),
        F.col("m.intercept").alias("intercept"),
        F.col("m.test_mse").alias("test_mse"),
    ).orderBy("test_mse", "user_id")


_MODEL_PERFORMANCE_REPORT_SQL = f"""
WITH wf AS ({_ML_WALK_FORWARD_SQL.replace("ORDER BY user_id, fold", "")}),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY fold DESC) AS rn
    FROM wf
  ) WHERE rn = 1
),
counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS model_count
  FROM wf GROUP BY user_id
)
SELECT l.user_id, 'linear_lag' AS model_name, model_count,
       fold AS latest_fold, slope, intercept, test_mse
FROM latest l JOIN counts c ON l.user_id = c.user_id
ORDER BY test_mse, l.user_id
"""


def q_model_fleet_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fleet-health footer of /models/performance (total models,
    average metric): one row over the walk-forward history. The MSEs
    are summed as exact MICRO-units (they are 6dp-rounded), so the
    average is engine-identical regardless of accumulation order."""
    wf = q_ml_walk_forward(spark, sf_dir)
    micro = F.round(F.col("test_mse") * 1e6).cast("long")
    return wf.agg(
        F.count(F.lit(1)).alias("total_models"),
        F.countDistinct("user_id").alias("n_symbols"),
        F.round(
            F.sum(micro).cast("double") / F.count(F.lit(1)) / 1e6, 6
        ).alias("avg_test_mse"),
    )


_MODEL_FLEET_SUMMARY_SQL = f"""
WITH wf AS ({_ML_WALK_FORWARD_SQL.replace("ORDER BY user_id, fold", "")})
SELECT CAST(COUNT(*) AS BIGINT) AS total_models,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_symbols,
       ROUND(CAST(SUM(CAST(ROUND(test_mse * 1e6) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1e6, 6) AS avg_test_mse
FROM wf
"""



_RETRAIN_MIN_NEW = 10  # events beyond the last training cutoff


def q_training_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scheduler's work queue (reference ml-service
    ml_scheduler.py:46-66 get_symbols_needing_training: symbols with
    data but no model, or a model older than the retrain interval) —
    re-expressed deterministically against the DATA instead of
    wall-clock: a user needs (re)training if they have non-null
    events but no qualifying walk-forward model ('no_model'), or if
    at least _RETRAIN_MIN_NEW events arrived after the last fold's
    training cutoff (the 75% prefix) — 'stale'.

    Plan: one count aggregate over events + a left join to the
    group-sized model-user set; no window, no wall-clock."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    modeled = (
        q_ml_walk_forward(spark, sf_dir)
        .select("user_id")
        .distinct()
        .withColumn("has_model", F.lit(True))
    )
    j = counts.join(modeled, "user_id", "left").withColumn(
        "has_model", F.coalesce("has_model", F.lit(False))
    )
    new_since = (F.col("n_events") - F.floor(F.col("n_events") * 0.75)).cast(
        "long"
    )
    reason = F.when(~F.col("has_model"), F.lit("no_model")).when(
        new_since >= _RETRAIN_MIN_NEW, F.lit("stale")
    )
    return (
        j.select(
            "user_id",
            "n_events",
            "has_model",
            new_since.alias("new_since_training"),
            reason.alias("reason"),
        )
        .filter(F.col("reason").isNotNull())
        .orderBy("user_id")
    )


_TRAINING_BACKLOG_SQL = f"""
WITH wf AS ({_ML_WALK_FORWARD_SQL.replace("ORDER BY user_id, fold", "")}),
counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
modeled AS (SELECT DISTINCT user_id FROM wf),
j AS (
  SELECT c.user_id, c.n_events,
         m.user_id IS NOT NULL AS has_model,
         CAST(c.n_events - FLOOR(c.n_events * 0.75) AS BIGINT)
           AS new_since_training
  FROM counts c LEFT JOIN modeled m ON c.user_id = m.user_id
)
SELECT user_id, n_events, has_model, new_since_training,
       CASE WHEN NOT has_model THEN 'no_model'
            WHEN new_since_training >= {_RETRAIN_MIN_NEW} THEN 'stale' END
         AS reason
FROM j
WHERE (NOT has_model) OR new_since_training >= {_RETRAIN_MIN_NEW}
ORDER BY user_id
"""


def q_serve_latest_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's serving path (SURVEY §3.3, GET /predict/{symbol}:
    fetch latest indicators → get_best_model ACROSS families → predict
    next value, ml-service/ml_pipeline.py:279-301) as ONE driver-checked
    batch query. Two closed-form families compete per user — lag-1 OLS
    (value ~ prev value) and trend OLS (value ~ chronological index) —
    the winner is the argmax-r2 row (tie → model_name asc), and the
    prediction arithmetic is a CASE over the winning family: lag serves
    slope·latest + b, trend extrapolates slope·(n+1) + b.

    All moments are exact integer-tick algebra and every float is
    rounded before the cross-family comparison, so the argmax and the
    CASE arithmetic are engine-identical.

    Plan shape: ONE scan, ONE window pass (the shared per-user
    chronological order carries the lag tick AND the non-null row
    index the trend family regresses on), ONE groupBy computing both
    families' integer moments plus the latest observation
    (max(struct)) — no self-join, no second shuffle. The per-family
    models then compete as columns of the same group-sized row."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.round(F.col("value") * 100, 0).cast("long")
    nn = F.col("value").isNotNull()
    base = (
        e.withColumn("_y", t)
        .withColumn("_x", F.lag(t.alias("t"), 1).over(w))
        # row index among NON-NULL values in chronological order ==
        # row_number over the null-filtered frame (same sort)
        .withColumn(
            "_idx",
            F.sum(F.when(nn, 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
    )
    has_x = F.col("_x").isNotNull()
    agg = base.groupBy("user_id").agg(
        # lag family: pairs where the lagged tick exists (the _y-null
        # rows still count toward n, matching q_ml_linreg_monitoring)
        F.sum(F.when(has_x, 1).otherwise(0)).alias("ln"),
        F.sum(F.when(has_x, F.col("_x"))).alias("lsx"),
        F.sum(F.when(has_x, F.col("_y"))).alias("lsy"),
        F.sum(F.when(has_x, F.col("_x") * F.col("_y"))).alias("lsxy"),
        F.sum(F.when(has_x, F.col("_x") * F.col("_x"))).alias("lsxx"),
        F.sum(F.when(has_x, F.col("_y") * F.col("_y"))).alias("lsyy"),
        # trend family: non-null values against their chrono index
        F.sum(F.when(nn, 1).otherwise(0)).alias("tn"),
        F.sum(F.when(nn, F.col("_idx"))).alias("tsx"),
        F.sum(F.when(nn, F.col("_y"))).alias("tsy"),
        F.sum(F.when(nn, F.col("_idx") * F.col("_y"))).alias("tsxy"),
        F.sum(F.when(nn, F.col("_idx") * F.col("_idx"))).alias("tsxx"),
        F.sum(F.when(nn, F.col("_y") * F.col("_y"))).alias("tsyy"),
        # latest non-null observation: lexicographic max over
        # (ts, event_id) == ORDER BY ts DESC, event_id DESC pick
        F.max(
            F.when(nn, F.struct("ts", "event_id", F.round("value", 2).alias("v")))
        )["v"].alias("latest_value"),
    )

    def fam(p: str):
        num = (F.col(f"{p}n") * F.col(f"{p}sxy") - F.col(f"{p}sx") * F.col(f"{p}sy")).cast("double")
        den_x = (F.col(f"{p}n") * F.col(f"{p}sxx") - F.col(f"{p}sx") * F.col(f"{p}sx")).cast("double")
        den_y = (F.col(f"{p}n") * F.col(f"{p}syy") - F.col(f"{p}sy") * F.col(f"{p}sy")).cast("double")
        slope = F.when(den_x != 0, num / den_x).otherwise(F.lit(0.0))
        r2 = F.when(
            (den_x != 0) & (den_y != 0), (num * num) / (den_x * den_y)
        ).otherwise(F.lit(0.0))
        return slope, r2

    l_slope_raw, l_r2 = fam("l")
    t_slope_raw, t_r2 = fam("t")
    # lag family: slope unitless, intercept in dollars (ticks/100)
    l_slope = F.round(l_slope_raw, 6)
    l_int = F.round(
        (F.col("lsy").cast("double") - l_slope_raw * F.col("lsx"))
        / F.col("ln")
        / 100.0,
        6,
    )
    # trend family: ticks/step and tick intercept, both → dollars
    t_slope = F.round(t_slope_raw / 100.0, 6)
    t_int = F.round(
        (F.col("tsy").cast("double") - t_slope_raw * F.col("tsx"))
        / F.col("tn")
        / 100.0,
        6,
    )
    models = agg.filter(F.col("latest_value").isNotNull()).select(
        "user_id",
        "latest_value",
        F.round(l_r2, 6).alias("lag_r2"),
        l_slope.alias("lag_slope"),
        l_int.alias("lag_int"),
        F.round(t_r2, 6).alias("trend_r2"),
        t_slope.alias("trend_slope"),
        t_int.alias("trend_int"),
        F.col("tn").alias("n"),
        F.col("ln").alias("has_lag"),
    )
    # argmax over the two families: r2 desc, model_name asc tiebreak
    # ('linear_lag' < 'linear_trend'); a 1-event user has no lag model
    lag_wins = (F.col("has_lag") > 0) & (
        F.col("lag_r2") >= F.col("trend_r2")
    )
    model_name = F.when(lag_wins, F.lit("linear_lag")).otherwise(
        F.lit("linear_trend")
    )
    r2 = F.when(lag_wins, F.col("lag_r2")).otherwise(F.col("trend_r2"))
    pred = F.when(
        lag_wins,
        F.col("lag_slope") * F.col("latest_value") + F.col("lag_int"),
    ).otherwise(
        F.col("trend_slope") * (F.col("n") + 1) + F.col("trend_int")
    )
    return models.select(
        "user_id",
        model_name.alias("model_name"),
        "latest_value",
        r2.alias("r2"),
        F.round(pred, 4).alias("prediction"),
        (r2 < 0.1).alias("alert_low_r2"),
    ).orderBy("user_id")


_TREND_MODELS_SQL = """
WITH nn AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
idx AS (
  SELECT user_id, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS x
  FROM nn
),
agg AS (
  SELECT user_id, COUNT(*) AS n,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM idx GROUP BY user_id
),
calc AS (
  SELECT user_id, n,
    CAST(n * sxy - sx * sy AS DOUBLE) AS num,
    CAST(n * sxx - sx * sx AS DOUBLE) AS den_x,
    CAST(n * syy - sy * sy AS DOUBLE) AS den_y,
    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM agg
)
SELECT user_id, n,
  ROUND((CASE WHEN den_x <> 0 THEN num / den_x ELSE 0.0 END) / 100.0, 6) AS slope,
  ROUND((syd - (CASE WHEN den_x <> 0 THEN num / den_x ELSE 0.0 END) * sxd) / n / 100.0, 6) AS intercept,
  ROUND(CASE WHEN den_x <> 0 AND den_y <> 0 THEN (num * num) / (den_x * den_y) ELSE 0.0 END, 6) AS r2
FROM calc
"""


def _serve_latest_sql() -> str:
    return f"""
WITH latest AS (
  SELECT user_id, ROUND(value, 2) AS latest_value FROM (
    SELECT user_id, value, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE value IS NOT NULL
  ) WHERE rn = 1
),
lag_fam AS (
  SELECT user_id, 'linear_lag' AS model_name,
         CAST(NULL AS BIGINT) AS n, slope, intercept, r2
  FROM ({_ML_LINREG_MONITORING_SQL})
),
trend_fam AS (
  SELECT user_id, 'linear_trend' AS model_name,
         CAST(n AS BIGINT) AS n, slope, intercept, r2
  FROM ({_TREND_MODELS_SQL})
),
united AS (
  SELECT * FROM lag_fam UNION ALL SELECT * FROM trend_fam
),
best AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY r2 DESC, model_name ASC) AS rn
    FROM united
  ) WHERE rn = 1
)
SELECT l.user_id, model_name, latest_value, r2,
       ROUND(CASE WHEN model_name = 'linear_lag'
                  THEN slope * latest_value + intercept
                  ELSE slope * (n + 1) + intercept END, 4) AS prediction,
       r2 < 0.1 AS alert_low_r2
FROM latest l JOIN best ON l.user_id = best.user_id
ORDER BY l.user_id
"""


_TE_SMOOTH = 50  # pseudo-observations toward the global prior


def q_ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of c_mktsegment against order value —
    the category→number feature transform every tabular model tier
    needs (enc = (Σy + prior·m) / (n + m), shrinking rare categories
    toward the global mean).

    Determinism: target sums are integer CENTS (exact in any
    accumulation order — the SCALE.md money policy), the smoothing is
    one double expression over exact longs, identical on both
    engines. Scale: orders⋈customer is the audited big-big equi join;
    the encoding table is |categories| rows — broadcast-sized on the
    way back to any feature matrix."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    glob = j.agg(
        F.sum("cents").alias("g_cents"), F.count(F.lit(1)).alias("g_n")
    )
    per = j.groupBy("c_mktsegment").agg(
        F.sum("cents").alias("s_cents"), F.count(F.lit(1)).alias("n")
    )
    m = F.lit(_TE_SMOOTH)
    prior = F.col("g_cents") / F.col("g_n")  # cents, double
    enc = (F.col("s_cents") + prior * m) / (F.col("n") + m) / F.lit(100.0)
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "c_mktsegment",
            "n",
            F.round(F.col("s_cents") / F.col("n") / 100.0, 4).alias(
                "raw_mean"
            ),
            F.round(enc, 4).alias("encoded"),
        )
        .orderBy("c_mktsegment")
    )


_ML_TARGET_ENCODE_SQL = f"""
WITH j AS (
  SELECT c_mktsegment,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
gtot AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS g_cents, COUNT(*) AS g_n FROM j
),
per AS (
  SELECT c_mktsegment, CAST(SUM(cents) AS BIGINT) AS s_cents, COUNT(*) AS n
  FROM j GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       ROUND(s_cents / CAST(n AS DOUBLE) / 100.0, 4) AS raw_mean,
       ROUND((s_cents + (g_cents / CAST(g_n AS DOUBLE)) * {_TE_SMOOTH})
             / (n + {_TE_SMOOTH}) / 100.0, 4) AS encoded
FROM per CROSS JOIN gtot
ORDER BY c_mktsegment
"""


def q_accuracy_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ONLY declarative view, as an engine query:
    prediction_accuracy_timeseries (mongo-setup/mongo_init.py:112-137)
    projects predictions matched to actuals into a per-row
    accuracy_percent = 100·(1 − |pred − actual| / actual) timeseries.

    Engine twin: the prediction store is the persistence forecast
    (each symbol-day's close predicts the NEXT calendar day), joined
    to the actuals frame by (symbol, target_date) — a genuine
    predictions⋈actuals equi join like the view's $match, not a
    window lag; days without a matched actual drop out exactly as the
    view's {actual_price: {$ne: null}} does.

    Scale shape: one scan → one groupBy(symbol, day) argmax close →
    a self equi join of the daily frame on (symbol, date+1) — both
    sides pre-shrunk to |symbol×day|, AQE-handled. All closes are
    integer ticks; the accuracy ratio is the only float, computed
    with the identical expression on both engines and rounded 6dp."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    s = e.select(
        F.col("user_id").alias("symbol"),
        F.to_date("ts").alias("d"),
        F.unix_micros(F.col("ts")).alias("k"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("ticks"),
    )
    daily = s.groupBy("symbol", "d").agg(
        F.max(F.struct("k", "event_id", "ticks"))["ticks"].alias("close_ticks")
    )
    preds = daily.select(
        "symbol",
        F.col("d").alias("prediction_date"),
        F.date_add("d", 1).alias("target_date"),
        F.col("close_ticks").alias("pred_ticks"),
    )
    actuals = daily.select(
        "symbol",
        F.col("d").alias("target_date"),
        F.col("close_ticks").alias("actual_ticks"),
    )
    j = preds.join(actuals, ["symbol", "target_date"]).filter(
        F.col("actual_ticks") != 0
    )
    acc = F.lit(100) * (
        F.lit(1)
        - F.abs(F.col("pred_ticks") - F.col("actual_ticks"))
        / F.col("actual_ticks").cast("double")
    )
    return j.select(
        "symbol",
        "prediction_date",
        "target_date",
        F.round(F.col("pred_ticks") / 100.0, 2).alias("predicted_price"),
        F.round(F.col("actual_ticks") / 100.0, 2).alias("actual_price"),
        F.round(acc, 6).alias("accuracy_percent"),
    ).orderBy("symbol", "target_date")


_ACCURACY_TIMESERIES_SQL = """
WITH s AS (
  SELECT user_id AS symbol, CAST(ts AS DATE) AS d, epoch_us(ts) AS k,
         event_id, CAST(ROUND(value * 100) AS BIGINT) AS ticks
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
daily AS (
  SELECT symbol, d, ticks AS close_ticks FROM (
    SELECT symbol, d, ticks,
           ROW_NUMBER() OVER (PARTITION BY symbol, d
                              ORDER BY k DESC, event_id DESC) AS rn
    FROM s) WHERE rn = 1
),
p AS (
  SELECT symbol, d AS prediction_date, d + 1 AS target_date,
         close_ticks AS pred_ticks
  FROM daily
)
SELECT p.symbol, p.prediction_date, a.d AS target_date,
       ROUND(pred_ticks / 100.0, 2) AS predicted_price,
       ROUND(a.close_ticks / 100.0, 2) AS actual_price,
       ROUND(100 * (1 - ABS(pred_ticks - a.close_ticks)
                        / CAST(a.close_ticks AS DOUBLE)), 6)
         AS accuracy_percent
FROM p JOIN daily a ON p.symbol = a.symbol AND p.target_date = a.d
WHERE a.close_ticks <> 0
ORDER BY p.symbol, a.d
"""


QUERIES = {
    "accuracy_timeseries": q_accuracy_timeseries,
    "ml_chrono_split": q_ml_chrono_split,
    "ml_forecast_holt": q_ml_forecast_holt,
    "ml_target_encode": q_ml_target_encode,
    "serve_latest_prediction": q_serve_latest_prediction,
    "ml_standardize": q_ml_standardize,
    "ml_linreg_monitoring": q_ml_linreg_monitoring,
    "ml_train_ols_pandas": q_ml_train_ols_pandas,
    "ml_train_ridge_grid": q_ml_train_ridge_grid,
    "ml_train_tree": q_ml_train_tree,
    "ml_train_tree_grid": q_ml_train_tree_grid,
    "ml_train_rf": q_ml_train_rf,
    "ml_best_of_family": q_ml_best_of_family,
    "ml_walk_forward": q_ml_walk_forward,
    "model_performance_report": q_model_performance_report,
    "model_fleet_summary": q_model_fleet_summary,
    "training_backlog": q_training_backlog,
}

ORACLE = {
    "accuracy_timeseries": _ACCURACY_TIMESERIES_SQL,
    "ml_chrono_split": _ML_CHRONO_SPLIT_SQL,
    "ml_target_encode": _ML_TARGET_ENCODE_SQL,
    "serve_latest_prediction": _serve_latest_sql(),
    "ml_standardize": _ML_STANDARDIZE_SQL,
    "ml_linreg_monitoring": _ML_LINREG_MONITORING_SQL,
    "ml_walk_forward": _ML_WALK_FORWARD_SQL,
    "model_performance_report": _MODEL_PERFORMANCE_REPORT_SQL,
    "model_fleet_summary": _MODEL_FLEET_SUMMARY_SQL,
    "training_backlog": _TRAINING_BACKLOG_SQL,
}
