"""Technical-indicator engine (SURVEY §2.5 W1-W8).

Re-expresses the reference's ``calculate_technical_indicators``
(reference spark-job/etl_job.py:271-356): SMA 5/20/50/200, "EMA" 12/26,
MACD + signal + histogram, Bollinger bands, RSI-14, OBV, and
day/week/month percent change — over a generic
``partitionBy(symbol).orderBy(date)`` window
(reference etl_job.py:265-269).

Two semantics modes (SURVEY §7):
- ``reference``: bit-for-bit quirk parity with the reference —
  * EMA 12/26 are ROLLING MEANS, not true EMAs (etl_job.py:294-295)
  * RSI sets rs=100 when avg_loss == 0 (etl_job.py:312)
  * pct-change null-guards to 0, not NULL (etl_job.py:324-333)
  * Bollinger uses sample stddev (etl_job.py:301)
- ``exact``: true recursive EMA (pandas ``ewm(adjust=False)``) via
  ``applyInPandas`` — the one indicator Catalyst windows can't express.

Scale notes: the whole reference-mode transform is ONE window family
over one partitioning (symbol) → a single shuffle; all arithmetic is
JVM-side whole-stage codegen. The reference instead looped symbols on
the driver, one Spark job each (etl_job.py:548) — the anti-pattern this
module exists to replace. Exact mode's per-symbol state is bounded
(one pandas frame per symbol), so it scales horizontally with symbol
cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def technical_indicators(
    df: DataFrame,
    *,
    symbol_col: str = "symbol",
    date_col: str = "trading_date",
    close_col: str = "close",
    volume_col: str = "volume",
    semantics: str = "reference",
    order_tiebreak: str | None = None,
    decimal_exact: bool = False,
    price_scale: int = 100,
) -> DataFrame:
    """Append the 15 indicator columns to ``df``.

    ``order_tiebreak``: optional unique column appended to the window
    ordering so results stay deterministic when ``date_col`` has
    duplicates (the reference implicitly assumed unique dates).

    ``decimal_exact``: compute rolling means/stddevs over prices scaled
    to integer ticks (``close * price_scale``) and summed as longs.
    Integer sums are exact in ANY accumulation order, so results are
    bit-identical regardless of partitioning, engine, or plan — float
    window sums are not (their association order varies with the
    executor layout, which at 100 TB means a rerun can hash
    differently). Use for replay-stable pipelines and oracle checks;
    requires prices quantized to 1/price_scale.
    """
    if semantics not in ("reference", "exact"):
        raise ValueError(f"unknown semantics {semantics!r}")

    order_cols = [F.col(date_col).asc()]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(symbol_col).orderBy(*order_cols)

    def rolling(n: int):
        return w.rowsBetween(-(n - 1), 0)

    close = F.col(close_col)
    out = df
    scale = float(price_scale)

    if decimal_exact:
        # integer ticks: exact long sums -> one final double division
        out = out.withColumn(
            "_ticks", F.round(close * scale, 0).cast("long")
        )

        def rolling_mean(n: int):
            s = F.sum("_ticks").over(rolling(n)).cast("double")
            c = F.count(F.lit(1)).over(rolling(n))
            return s / c / scale

        def rolling_std(n: int):
            # naive variance formula is safe here: sums are EXACT
            # integers, so no cancellation noise enters before the
            # final double ops (which are identical everywhere).
            s = F.sum("_ticks").over(rolling(n)).cast("double")
            sq = F.sum(F.col("_ticks") * F.col("_ticks")).over(rolling(n)).cast(
                "double"
            )
            c = F.count(F.lit(1)).over(rolling(n))
            var = (sq - s * s / c) / (c - 1)
            return F.when(
                c > 1, F.sqrt(F.greatest(var, F.lit(0.0))) / scale
            ).otherwise(F.lit(None).cast("double"))

    else:

        def rolling_mean(n: int):
            return F.avg(close).over(rolling(n))

        def rolling_std(n: int):
            return F.stddev(close).over(rolling(n))

    # --- SMA family (etl_job.py:289-292)
    for n in (5, 20, 50, 200):
        out = out.withColumn(f"sma_{n}", rolling_mean(n))

    # --- EMA 12/26 (reference quirk: rolling mean, etl_job.py:294-295)
    if semantics == "reference":
        out = out.withColumn("ema_12", rolling_mean(12))
        out = out.withColumn("ema_26", rolling_mean(26))
    else:
        out = _exact_ema(
            out,
            symbol_col=symbol_col,
            date_col=date_col,
            close_col=close_col,
            spans=(12, 26),
            order_tiebreak=order_tiebreak,
        )

    # --- MACD + signal + histogram (etl_job.py:296-298); the signal
    # line is a window over the derived macd column — second pass.
    out = out.withColumn("macd", F.col("ema_12") - F.col("ema_26"))
    out = out.withColumn("signal_line", F.avg("macd").over(rolling(9)))
    out = out.withColumn("macd_histogram", F.col("macd") - F.col("signal_line"))

    # --- Bollinger bands: mid ± 2 * sample stddev (etl_job.py:300-303)
    out = out.withColumn("bb_middle", rolling_mean(20))
    bb_std = rolling_std(20)
    out = out.withColumn("bb_upper", F.col("bb_middle") + 2 * bb_std)
    out = out.withColumn("bb_lower", F.col("bb_middle") - 2 * bb_std)

    # --- RSI-14, SMA variant (etl_job.py:305-313)
    if decimal_exact:
        prev_t = F.lag("_ticks", 1).over(w)
        change_t = F.col("_ticks") - prev_t
        out = out.withColumn(
            "_gain_t", F.when(change_t > 0, change_t).otherwise(F.lit(0))
        )
        out = out.withColumn(
            "_loss_t", F.when(change_t < 0, -change_t).otherwise(F.lit(0))
        )
        avg_gain = (
            F.sum("_gain_t").over(rolling(14)).cast("double")
            / F.count(F.lit(1)).over(rolling(14))
            / scale
        )
        avg_loss = (
            F.sum("_loss_t").over(rolling(14)).cast("double")
            / F.count(F.lit(1)).over(rolling(14))
            / scale
        )
        change = change_t.cast("double")
    else:
        prev = F.lag(close, 1).over(w)
        change = close - prev
        out = out.withColumn(
            "_gain", F.when(change > 0, change).otherwise(F.lit(0.0))
        )
        out = out.withColumn(
            "_loss", F.when(change < 0, -change).otherwise(F.lit(0.0))
        )
        avg_gain = F.avg("_gain").over(rolling(14))
        avg_loss = F.avg("_loss").over(rolling(14))
    # reference quirk: rs=100 (→ rsi≈99.0099) when avg_loss == 0
    rs = F.when(avg_loss != 0, avg_gain / avg_loss).otherwise(F.lit(100.0))
    out = out.withColumn("rsi", F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + rs))

    # --- OBV: signed-volume running total (etl_job.py:315-319)
    signed_vol = (
        F.when(change > 0, F.col(volume_col))
        .when(change < 0, -F.col(volume_col))
        .otherwise(F.lit(0.0))
    )
    if decimal_exact:
        signed_vol = signed_vol.cast("long")
    out = out.withColumn("_signed_vol", signed_vol)
    obv = F.sum("_signed_vol").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("obv", obv.cast("double") if decimal_exact else obv)

    # --- day/week/month % change, 0-filled (etl_job.py:321-333)
    for name, k in (("day_change_pct", 1), ("week_change_pct", 5), ("month_change_pct", 20)):
        lagged = F.lag(close, k).over(w)
        out = out.withColumn(
            name,
            F.when(
                lagged.isNotNull() & (lagged != 0), (close - lagged) / lagged * 100.0
            ).otherwise(F.lit(0.0)),
        )

    # drop temp columns like the reference's `_`-prefix sweep
    # (etl_job.py:335-336)
    return out.drop(
        "_gain", "_loss", "_signed_vol", "_ticks", "_gain_t", "_loss_t"
    )


def _exact_ema(
    df: DataFrame,
    *,
    symbol_col: str,
    date_col: str,
    close_col: str,
    spans: tuple[int, ...],
    order_tiebreak: str | None,
) -> DataFrame:
    """True recursive EMA per symbol via Arrow-batched applyInPandas.

    ``y_t = (1-α) y_{t-1} + α x_t`` (pandas ``ewm(span, adjust=False)``)
    is inherently sequential — not expressible as a Catalyst window
    frame — so each symbol's series is handled in one pandas group.
    State per group is one series; groups distribute across executors.
    """
    import pandas as pd  # noqa: F401 — worker-side import

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"ema_{s}", T.DoubleType()) for s in spans]
    )
    sort_cols = [date_col] + ([order_tiebreak] if order_tiebreak else [])

    def compute(pdf):
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        for s in spans:
            pdf[f"ema_{s}"] = (
                pdf[close_col].ewm(span=s, adjust=False).mean().astype("float64")
            )
        return pdf

    return df.groupBy(symbol_col).applyInPandas(compute, schema=schema)


def exact_indicator_suite(
    df: DataFrame,
    *,
    symbol_col: str = "symbol",
    date_col: str = "trading_date",
    close_col: str = "close",
    order_tiebreak: str | None = None,
    ema_fast: int = 12,
    ema_slow: int = 26,
    signal_span: int = 9,
    rsi_n: int = 14,
) -> DataFrame:
    """The EXACT recursive-indicator family the reference's ``ta``
    library pin gestured at (reference spark-job/requirements.txt:9,
    ta==0.10.2) but its own code approximated with rolling means
    (etl_job.py:294-295): true EMA fast/slow, true-EMA MACD (signal =
    EMA-9 of the MACD line, not its rolling mean), and Wilder-smoothed
    RSI (gains/losses under the recursive α=1/n smoothing — pandas
    ``ewm(alpha=1/n, adjust=False, min_periods=n)``, the ``ta``
    RSIIndicator formula; avg_loss==0 → RSI=100 by convention).

    All recursions are inherently sequential per symbol, so the whole
    family is computed in ONE ``applyInPandas`` pass — one shuffle on
    ``symbol_col``, bounded per-group state, identical scale shape to
    ``_exact_ema``. Parity with independently-computed pandas
    formulas is pinned in tests/test_indicators.py.
    """
    import pandas as pd  # noqa: F401 — worker-side import

    from pyspark.sql import types as T

    added = [
        f"ema_{ema_fast}",
        f"ema_{ema_slow}",
        "macd",
        "signal_line",
        "macd_histogram",
        "rsi_wilder",
    ]
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType()) for c in added]
    )
    sort_cols = [date_col] + ([order_tiebreak] if order_tiebreak else [])

    def compute(pdf):
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        close = pdf[close_col].astype("float64")
        fast = close.ewm(span=ema_fast, adjust=False).mean()
        slow = close.ewm(span=ema_slow, adjust=False).mean()
        macd = fast - slow
        signal = macd.ewm(span=signal_span, adjust=False).mean()
        delta = close.diff()
        gain = delta.clip(lower=0.0).fillna(0.0)
        loss = (-delta).clip(lower=0.0).fillna(0.0)
        avg_gain = gain.ewm(
            alpha=1.0 / rsi_n, adjust=False, min_periods=rsi_n
        ).mean()
        avg_loss = loss.ewm(
            alpha=1.0 / rsi_n, adjust=False, min_periods=rsi_n
        ).mean()
        rsi = 100.0 - 100.0 / (1.0 + avg_gain / avg_loss)
        rsi[avg_loss == 0.0] = 100.0
        pdf[f"ema_{ema_fast}"] = fast
        pdf[f"ema_{ema_slow}"] = slow
        pdf["macd"] = macd
        pdf["signal_line"] = signal
        pdf["macd_histogram"] = macd - signal
        pdf["rsi_wilder"] = rsi
        return pdf

    return df.groupBy(symbol_col).applyInPandas(compute, schema=schema)
