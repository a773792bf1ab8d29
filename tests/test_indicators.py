"""Golden-value + property tests for the indicator engine (SURVEY §5.2/§5.5).

Asserts the reference's exact quirk semantics
(reference spark-job/etl_job.py:271-356):
- EMA 12/26 are rolling means in reference mode (etl_job.py:294-295)
- RSI rs=100 when avg_loss == 0 → rsi = 100 - 100/101 (etl_job.py:312)
- pct-change 0-fill, not NULL (etl_job.py:324-333)
- OBV signed cumulative volume (etl_job.py:315-319)
and exact mode's true EMA against pandas ewm(adjust=False).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from finance_etl_system_spark.pipeline.indicators import technical_indicators


def _series_df(spark, closes, volumes=None):
    volumes = volumes or [100.0] * len(closes)
    base = dt.date(2024, 1, 1)
    rows = [
        ("AAA", base + dt.timedelta(days=i), float(c), float(v))
        for i, (c, v) in enumerate(zip(closes, volumes))
    ]
    return spark.createDataFrame(
        rows, "symbol STRING, trading_date DATE, close DOUBLE, volume DOUBLE"
    )


def _run(spark, closes, volumes=None, **kw):
    df = _series_df(spark, closes, volumes)
    out = technical_indicators(df, **kw)
    return (
        out.orderBy("trading_date")
        .toPandas()
        .set_index("trading_date", drop=False)
        .reset_index(drop=True)
    )


def test_sma_golden(spark):
    closes = [10, 20, 30, 40, 50, 60]
    pdf = _run(spark, closes)
    # sma_5 at row 4 = mean(10..50) = 30; at row 5 = mean(20..60) = 40
    assert pdf.loc[4, "sma_5"] == pytest.approx(30.0)
    assert pdf.loc[5, "sma_5"] == pytest.approx(40.0)
    # warm-up rows average over the partial frame, like the reference
    assert pdf.loc[0, "sma_5"] == pytest.approx(10.0)
    assert pdf.loc[1, "sma_5"] == pytest.approx(15.0)


def test_ema_is_rolling_mean_in_reference_mode(spark):
    closes = list(range(1, 31))
    pdf = _run(spark, closes, semantics="reference")
    expect = pd.Series(closes, dtype="float64").rolling(12, min_periods=1).mean()
    pd.testing.assert_series_equal(
        pdf["ema_12"], expect, check_names=False, atol=1e-9
    )


def test_exact_ema_matches_pandas_ewm(spark):
    closes = [10.0, 12.5, 11.0, 14.0, 13.0, 15.5, 16.0, 15.0, 17.5, 18.0]
    pdf = _run(spark, closes, semantics="exact")
    expect = pd.Series(closes).ewm(span=12, adjust=False).mean()
    pd.testing.assert_series_equal(
        pdf["ema_12"], expect, check_names=False, atol=1e-9
    )


def test_rsi_quirk_all_gains_is_rs_100(spark):
    closes = [10, 11, 12, 13, 14, 15]  # avg_loss == 0 from row 1 on
    pdf = _run(spark, closes)
    # reference quirk: rs = 100 → rsi = 100 - 100/101
    assert pdf.loc[5, "rsi"] == pytest.approx(100.0 - 100.0 / 101.0)
    # row 0 has no change at all: gain=loss=0 → also rs=100 per quirk
    assert pdf.loc[0, "rsi"] == pytest.approx(100.0 - 100.0 / 101.0)


def test_rsi_balanced_gains_losses(spark):
    closes = [10, 12, 10, 12, 10, 12, 10, 12, 10, 12, 10, 12, 10, 12, 10]
    pdf = _run(spark, closes)
    # within a 14-row frame gains and losses nearly balance; rsi ≈ 50
    assert 40 < pdf.loc[14, "rsi"] < 60


def test_obv_golden(spark):
    closes = [10, 12, 11, 11, 15]
    vols = [100, 200, 300, 400, 500]
    pdf = _run(spark, closes, vols)
    # obv: 0 (no prev), +200, -300, 0 (flat), +500 → cumulative
    assert list(pdf["obv"]) == [0.0, 200.0, -100.0, -100.0, 400.0]


def test_pct_change_zero_fill(spark):
    closes = [10, 11]
    pdf = _run(spark, closes)
    # row 0 has no lag → reference fills 0, not NULL
    assert pdf.loc[0, "day_change_pct"] == 0.0
    assert pdf.loc[0, "week_change_pct"] == 0.0
    assert pdf.loc[1, "day_change_pct"] == pytest.approx(10.0)


def test_bollinger_ordering_property(spark):
    closes = [10, 14, 9, 16, 12, 18, 11, 20, 13, 22, 15, 24, 14, 26, 16]
    pdf = _run(spark, closes)
    later = pdf.iloc[1:]  # row 0 has a single-row frame → stddev null
    assert (later["bb_upper"] >= later["bb_middle"]).all()
    assert (later["bb_middle"] >= later["bb_lower"]).all()


def test_constant_series_property(spark):
    closes = [42.0] * 25
    pdf = _run(spark, closes)
    assert (pdf["sma_5"] == 42.0).all()
    assert (pdf["sma_20"] == 42.0).all()
    assert (pdf["obv"] == 0.0).all()
    assert (pdf["day_change_pct"] == 0.0).all()
    # no gains, no losses → quirk rs=100 everywhere
    assert pdf["rsi"].map(lambda v: abs(v - (100 - 100 / 101)) < 1e-9).all()


def test_decimal_exact_matches_float_mode(spark):
    closes = [10.25, 11.5, 9.75, 12.0, 13.25, 12.5, 14.0, 13.75]
    a = _run(spark, closes, decimal_exact=True)
    b = _run(spark, closes, decimal_exact=False)
    for col in ("sma_5", "ema_12", "bb_middle", "rsi", "obv"):
        pd.testing.assert_series_equal(a[col], b[col], check_names=False, atol=1e-9)


def test_exact_suite_matches_loop_reference(spark):
    """Wilder RSI + true-EMA MACD vs explicit Python-loop recursions
    (independent of the engine's pandas calls)."""
    import math

    from finance_etl_system_spark.pipeline.indicators import (
        exact_indicator_suite,
    )

    closes = [
        100.0, 101.5, 99.8, 102.2, 103.0, 101.1, 104.5, 105.2, 103.9,
        106.0, 107.3, 106.1, 108.0, 109.5, 108.2, 110.0, 109.1, 111.4,
        112.0, 110.8, 113.5, 114.2, 112.9, 115.0, 116.3,
    ]
    df = _series_df(spark, closes)
    out = (
        exact_indicator_suite(df)
        .orderBy("trading_date")
        .toPandas()
        .reset_index(drop=True)
    )

    def ema_loop(xs, span):
        a = 2.0 / (span + 1.0)
        y = [xs[0]]
        for x in xs[1:]:
            y.append((1 - a) * y[-1] + a * x)
        return y

    fast = ema_loop(closes, 12)
    slow = ema_loop(closes, 26)
    macd = [f - s for f, s in zip(fast, slow)]
    signal = ema_loop(macd, 9)
    n = 14
    gains = [0.0] + [max(c2 - c1, 0.0) for c1, c2 in zip(closes, closes[1:])]
    losses = [0.0] + [max(c1 - c2, 0.0) for c1, c2 in zip(closes, closes[1:])]

    def wilder(xs):
        # ewm(alpha=1/n, adjust=False): recursive from the first value
        y = [xs[0]]
        for x in xs[1:]:
            y.append(y[-1] * (n - 1) / n + x / n)
        return y

    ag, al = wilder(gains), wilder(losses)
    for i in range(len(closes)):
        assert out.loc[i, "ema_12"] == pytest.approx(fast[i], abs=1e-9)
        assert out.loc[i, "macd"] == pytest.approx(macd[i], abs=1e-9)
        assert out.loc[i, "signal_line"] == pytest.approx(signal[i], abs=1e-9)
        assert out.loc[i, "macd_histogram"] == pytest.approx(
            macd[i] - signal[i], abs=1e-9
        )
        if i < n - 1:
            assert math.isnan(out.loc[i, "rsi_wilder"])  # min_periods warm-up
        else:
            want = (
                100.0
                if al[i] == 0
                else 100.0 - 100.0 / (1.0 + ag[i] / al[i])
            )
            assert out.loc[i, "rsi_wilder"] == pytest.approx(want, abs=1e-9)
    # RSI stays in (0, 100] and is 100 on a strictly rising tail
    rising = [100.0 + i for i in range(20)]
    out2 = (
        exact_indicator_suite(_series_df(spark, rising))
        .orderBy("trading_date")
        .toPandas()
    )
    tail = out2["rsi_wilder"].dropna()
    assert (tail == 100.0).all()
