"""ML tier (SURVEY §2.9): chronological split, standardization,
per-group model training, metrics, registry, monitoring rules.

The reference trains sklearn models per symbol in a driver loop
(reference ml-service/ml_pipeline.py:154-208) with
TimeSeriesSplit + StandardScaler + RF/LightGBM/LinearRegression and
stores models + metadata in GridFS/Mongo
(ml_pipeline.py:223-244). Spark-first re-expression:

- the *structure* (per-key many small models) maps to ONE
  ``applyInPandas`` job — each key group trains in a worker, models
  distribute horizontally (idiomatic for millions of small models;
  SURVEY §2.9 M6);
- closed-form OLS is ALSO provided as pure aggregates (covariance
  algebra over integer ticks) — deterministic, oracle-checkable, and
  at 100 TB it is a single map-side-combinable aggregation with no
  Python at all;
- the registry is a small parquet table; "best model per symbol" is
  the argmax window (reference ml_pipeline.py:288-291);
- monitoring thresholds (reference ml_scheduler.py:152-218) are
  ``when()`` rule columns.

sklearn is not available in this environment; the trainer uses
numpy ``lstsq`` (identical math for LinearRegression) and records the
model family it emulates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def chronological_split(
    df: DataFrame,
    *,
    group_col: str = "symbol",
    time_col: str = "trading_date",
    train_frac: float = 0.8,
    split_col: str = "split",
) -> DataFrame:
    """M4: last-fold time split via percent_rank — no shuffle beyond
    the one window partitioning (reference ml_pipeline.py:170-174)."""
    w = Window.partitionBy(group_col).orderBy(time_col)
    return df.withColumn(
        split_col,
        F.when(F.percent_rank().over(w) < train_frac, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def standardize(
    df: DataFrame,
    cols: list[str],
    *,
    group_col: str = "symbol",
    suffix: str = "_z",
) -> DataFrame:
    """M5: per-group z-score (StandardScaler.fit_transform per key,
    reference ml_pipeline.py:176-179) as window aggregates."""
    w = Window.partitionBy(group_col)
    out = df
    for c in cols:
        mu = F.avg(c).over(w)
        sd = F.stddev(c).over(w)
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(sd > 0, (F.col(c) - mu) / sd).otherwise(F.lit(0.0)),
        )
    return out


_OLS_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("model_name", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("coefficients", T.ArrayType(T.DoubleType())),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("r2", T.DoubleType()),
        T.StructField("mse", T.DoubleType()),
    ]
)


def train_ols_per_group(
    df: DataFrame,
    *,
    group_col: str,
    feature_cols: list[str],
    target_col: str,
    min_rows: int = 20,
) -> DataFrame:
    """M6: per-group multi-feature OLS via Arrow-batched applyInPandas.

    Each group's frame fits in one worker (bounded per-key state);
    numpy ``lstsq`` is the same math as sklearn LinearRegression.
    Groups below ``min_rows`` are skipped (reference floor of 252
    points, ml_pipeline.py:56-58, scaled down for fixtures).
    """
    fcols = list(feature_cols)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=fcols + [target_col])
        n = len(pdf)
        key = str(pdf[group_col].iloc[0]) if n else ""
        if n < min_rows:
            return pd.DataFrame(columns=[f.name for f in _OLS_SCHEMA.fields])
        X = np.column_stack([pdf[c].to_numpy(float) for c in fcols] + [np.ones(n)])
        y = pdf[target_col].to_numpy(float)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ beta
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        return pd.DataFrame(
            {
                "group_key": [key],
                "model_name": ["linear_regression"],
                "n_rows": [n],
                "coefficients": [[float(b) for b in beta[:-1]]],
                "intercept": [float(beta[-1])],
                "r2": [1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0],
                "mse": [ss_res / n],
            }
        )

    return df.groupBy(group_col).applyInPandas(fit, schema=_OLS_SCHEMA)


_RIDGE_SCHEMA = T.StructType(
    _OLS_SCHEMA.fields
    + [
        T.StructField("best_lambda", T.DoubleType()),
        T.StructField("cv_mse", T.DoubleType()),
    ]
)


def train_ridge_grid_per_group(
    df: DataFrame,
    *,
    group_col: str,
    feature_cols: list[str],
    target_col: str,
    time_col: str,
    lambdas: tuple[float, ...] = (0.0, 0.1, 1.0, 10.0),
    n_folds: int = 3,
    min_rows: int = 30,
) -> DataFrame:
    """M6 grid-search parity: per-group ridge regression with the
    hyperparameter chosen by expanding-window time-series CV — the
    reference's GridSearchCV(cv=TimeSeriesSplit(3)) (reference
    ml-service/ml_pipeline.py:182-192), re-expressed as closed-form
    ridge inside ONE applyInPandas pass (sklearn is not in this
    environment; (XᵀX + λI)⁻¹Xᵀy with an unpenalized intercept is the
    same estimator). Each fold trains on rows up to a chronological
    cut and validates on the next slice; the λ minimizing mean
    validation MSE is refit on the full group.

    Scale shape: still one shuffle on ``group_col`` — the grid (folds
    × λ values) runs inside the worker on the group's frame, so
    hyperparameter search adds zero extra Spark stages.
    """
    fcols = list(feature_cols)
    lams = tuple(float(x) for x in lambdas)

    def _ridge(X: np.ndarray, y: np.ndarray, lam: float) -> np.ndarray:
        k = X.shape[1]
        pen = lam * np.eye(k)
        pen[-1, -1] = 0.0  # never penalize the intercept column
        return np.linalg.solve(X.T @ X + pen, X.T @ y)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=fcols + [target_col]).sort_values(time_col)
        n = len(pdf)
        key = str(pdf[group_col].iloc[0]) if n else ""
        if n < min_rows:
            return pd.DataFrame(columns=[f.name for f in _RIDGE_SCHEMA.fields])
        X = np.column_stack([pdf[c].to_numpy(float) for c in fcols] + [np.ones(n)])
        y = pdf[target_col].to_numpy(float)
        # expanding-window folds: cut points at (i+1)/(n_folds+1) … —
        # train on [:cut], validate on [cut:next_cut]
        cuts = [int(n * (i + 1) / (n_folds + 1)) for i in range(n_folds + 1)]
        cv: dict[float, list[float]] = {lam: [] for lam in lams}
        for i in range(n_folds):
            tr, va = slice(0, cuts[i]), slice(cuts[i], cuts[i + 1])
            if cuts[i] < len(fcols) + 1 or cuts[i] == cuts[i + 1]:
                continue
            for lam in lams:
                beta = _ridge(X[tr], y[tr], lam)
                resid = y[va] - X[va] @ beta
                cv[lam].append(float((resid**2).mean()))
        mean_cv = {
            lam: (sum(v) / len(v) if v else float("inf")) for lam, v in cv.items()
        }
        best = min(lams, key=lambda lam: (mean_cv[lam], lam))
        beta = _ridge(X, y, best)
        pred = X @ beta
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        return pd.DataFrame(
            {
                "group_key": [key],
                "model_name": ["ridge_grid"],
                "n_rows": [n],
                "coefficients": [[float(b) for b in beta[:-1]]],
                "intercept": [float(beta[-1])],
                "r2": [1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0],
                "mse": [ss_res / n],
                "best_lambda": [best],
                "cv_mse": [mean_cv[best]],
            }
        )

    return df.groupBy(group_col).applyInPandas(fit, schema=_RIDGE_SCHEMA)


def score_ols(
    df: DataFrame,
    models: DataFrame,
    *,
    group_col: str,
    feature_cols: list[str],
    prediction_col: str = "prediction",
) -> DataFrame:
    """M8 batch scoring: join the (small) model table broadcast, apply
    coefficients as column arithmetic — no Python, no model object."""
    m = models.select(
        F.col("group_key").alias(group_col), "coefficients", "intercept"
    )
    scored = df.join(F.broadcast(m), group_col, "inner")
    expr = F.col("intercept")
    for i, c in enumerate(feature_cols):
        expr = expr + F.col("coefficients")[i] * F.col(c)
    return scored.withColumn(prediction_col, expr).drop("coefficients", "intercept")


def save_model_registry(models: DataFrame, path: str) -> None:
    """M9: registry as parquet keyed by (group, model); overwrite =
    the reference's update_one(upsert=True) (ml_pipeline.py:240-244)."""
    models.withColumn("created_at", F.current_timestamp()).write.mode(
        "overwrite"
    ).parquet(path)


def best_model_per_group(models: DataFrame) -> DataFrame:
    """M8/W10: argmax by r2 per group (reference ml_pipeline.py:288-291)."""
    w = Window.partitionBy("group_key").orderBy(
        F.col("r2").desc(), F.col("model_name").asc()
    )
    return models.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).drop("rn")


def unify_registries(
    linear_models: DataFrame, blob_models: DataFrame
) -> DataFrame:
    """Union the coefficient registry (train_ols/train_ridge output)
    and the blob registry (pipeline/trees.py train_gbt output) into ONE
    schema with nullable family-specific columns — the reference keeps
    RF/LightGBM/LinearRegression rows in one Mongo collection and
    get_best_model spans all families (ml-service/ml_pipeline.py:279-301).

    Shared columns: group_key, model_name, n_rows, r2, mse. Linear rows
    carry (coefficients, intercept) with a NULL model_blob; tree rows
    carry model_blob with NULL coefficients. best_model_per_group works
    unchanged on the union, so "best of ANY family per symbol" is one
    call."""
    lin = linear_models.select(
        "group_key",
        "model_name",
        "n_rows",
        "r2",
        "mse",
        "coefficients",
        "intercept",
        F.lit(None).cast(T.BinaryType()).alias("model_blob"),
    )
    blob = blob_models.select(
        "group_key",
        "model_name",
        "n_rows",
        "r2",
        "mse",
        F.lit(None).cast(T.ArrayType(T.DoubleType())).alias("coefficients"),
        F.lit(None).cast(T.DoubleType()).alias("intercept"),
        "model_blob",
    )
    return lin.unionByName(blob)


def serve_best_model(
    df: DataFrame,
    registry: DataFrame,
    *,
    group_col: str,
    feature_cols: list[str],
    prediction_col: str = "prediction",
    blob_strategy: str = "auto",
) -> DataFrame:
    """Best-of-ANY-family serving over a unified registry: per group,
    the highest-r2 model wins regardless of family (reference
    get_best_model, ml-service/ml_pipeline.py:279-301), and each row is
    scored by the winner — linear winners as pure column arithmetic
    (score_ols), tree winners by deserializing the blob worker-side
    (score_from_blob). Output carries ``model_name`` so callers see
    which family served each group.

    Scale shape: the argmax is one window over the group-sized
    registry; the two family branches score disjoint group sets, so the
    union does no duplicate work. The winner table joined back for
    model_name is group-sized (broadcast)."""
    from .trees import score_from_blob

    best = best_model_per_group(registry)
    lin = best.filter(F.col("model_blob").isNull()).select(
        "group_key", "coefficients", "intercept"
    )
    blob = best.filter(F.col("model_blob").isNotNull()).select(
        "group_key", "model_blob"
    )
    lin_scored = score_ols(
        df,
        lin,
        group_col=group_col,
        feature_cols=feature_cols,
        prediction_col=prediction_col,
    )
    blob_scored = score_from_blob(
        df,
        blob,
        group_col=group_col,
        feature_cols=feature_cols,
        prediction_col=prediction_col,
        strategy=blob_strategy,
    )
    names = best.select(F.col("group_key").alias(group_col), "model_name")
    return lin_scored.unionByName(blob_scored).join(
        F.broadcast(names), group_col, "left"
    )


def monitoring_rules(
    models: DataFrame,
    *,
    low_r2: float = 0.1,
    high_mse: float | None = None,
) -> DataFrame:
    """M10: threshold alert columns (reference ml_scheduler.py:152-218
    val_r2<0.1 → low-accuracy alert), as pure ``when()`` rules."""
    out = models.withColumn(
        "alert_low_r2", (F.col("r2") < low_r2).cast("boolean")
    ).withColumn(
        "alert_insufficient_data", (F.col("n_rows") < 60).cast("boolean")
    )
    if high_mse is not None:
        out = out.withColumn("alert_high_mse", F.col("mse") > high_mse)
    return out.withColumn(
        "needs_attention",
        F.col("alert_low_r2") | F.col("alert_insufficient_data"),
    )
