"""Finance time-series queries (queries/finance.py): semantic
properties recomputed independently (pandas) on the smoke fixture."""

from __future__ import annotations

import pandas as pd

from finance_etl_system_spark.queries.finance import (
    q_max_drawdown,
    q_ohlc_resample,
    q_sessionize_events,
    q_symbol_correlation,
    q_vwap_daily,
)
from tests.conftest import SF_SMOKE


def _events_pdf() -> pd.DataFrame:
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf["ts"] = pdf["ts"].dt.floor("us")  # engines truncate ns -> us
    return pdf


def test_ohlc_bar_invariants(spark):
    rows = q_ohlc_resample(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.low <= min(r.open, r.close)
        assert r.high >= max(r.open, r.close)
        assert r.n_trades >= 1
    # bar count = distinct (symbol, week) present in raw data
    pdf = _events_pdf()
    weeks = pdf.assign(
        week=pdf["ts"].dt.to_period("W").dt.start_time
    ).groupby(["user_id", "week"]).size()
    assert len(rows) == len(weeks)


def test_ohlc_open_close_are_first_last(spark):
    rows = q_ohlc_resample(spark, SF_SMOKE).collect()
    pdf = _events_pdf().sort_values("ts")
    pdf["week"] = pdf["ts"].dt.to_period("W").dt.start_time
    g = pdf.groupby(["user_id", "week"])["value"]
    first = g.first()
    last = g.last()
    for r in rows:
        key = (r.symbol, pd.Timestamp(r.week))
        assert abs(r.open - round(first[key], 2)) < 1e-9
        assert abs(r.close - round(last[key], 2)) < 1e-9


def test_vwap_within_daily_range(spark):
    rows = q_vwap_daily(spark, SF_SMOKE).collect()
    pdf = _events_pdf()
    pdf["d"] = pdf["ts"].dt.date
    lo = pdf.groupby(["user_id", "d"])["value"].min()
    hi = pdf.groupby(["user_id", "d"])["value"].max()
    for r in rows:
        key = (r.symbol, r.d)
        assert lo[key] - 1e-6 <= r.vwap <= hi[key] + 1e-6


def test_max_drawdown_bounds_and_zero_peak_start(spark):
    rows = q_max_drawdown(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.max_drawdown < 1.0
        assert r.peak_price > 0


def test_sessionize_gap_property(spark):
    sessions = q_sessionize_events(spark, SF_SMOKE).collect()
    pdf = _events_pdf().sort_values(["user_id", "ts"])
    # recompute sessions in pandas with the same 30-min rule
    gaps = pdf.groupby("user_id")["ts"].diff() > pd.Timedelta(minutes=30)
    pdf["sid"] = gaps.groupby(pdf["user_id"]).cumsum()
    truth = pdf.groupby(["user_id", "sid"]).agg(
        n=("event_id", "size"), start=("ts", "min"), end=("ts", "max")
    )
    assert len(sessions) == len(truth)
    got_counts = sorted((s.user_id, s.n_events) for s in sessions)
    want_counts = sorted((uid, int(n)) for (uid, _), n in truth["n"].items())
    assert got_counts == want_counts


def test_symbol_correlation_is_valid_pearson(spark):
    rows = q_symbol_correlation(spark, SF_SMOKE).collect()
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr_r <= 1.0 + 1e-9
        assert r.sym_a < r.sym_b
        assert r.n_days >= 15


def test_twap_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd

    from finance_etl_system_spark.queries.finance import q_twap_daily

    got = {
        (r.symbol, str(r.d)): (r.twap, r.span_seconds, r.n_intervals)
        for r in q_twap_daily(spark, SF_SMOKE).collect()
    }
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["ticks"] = np.round(ev["value"] * 100).astype("int64")
    ev["k"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["d"] = ev["ts"].astype("datetime64[us]").dt.date
    want = {}
    for (sym, d), g in ev.groupby(["user_id", "d"]):
        g = g.sort_values("k")
        ks, ticks = g["k"].to_numpy(), g["ticks"].to_numpy()
        durs = (ks[1:] - ks[:-1]) // 1_000_000
        tot = int(durs.sum())
        if len(g) < 2 or tot <= 0:
            continue
        td = int((ticks[:-1] * durs).sum())
        twap = ((td * 20000 + tot) // (2 * tot)) / 1e6
        want[(sym, str(d))] = (twap, tot, len(g) - 1)
    assert got == want


def test_rolling_correlation_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from finance_etl_system_spark.queries.finance import (
        _ROLL_CORR_MIN,
        _ROLL_CORR_WIN,
        q_rolling_correlation,
    )

    got = {str(r.d): (r.n_days, r.roll_corr)
           for r in q_rolling_correlation(spark, SF_SMOKE).collect()}
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev[ev["user_id"].isin([1, 2])].copy()
    ev["ticks"] = np.round(ev["value"] * 100).astype("int64")
    ev["k"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["d"] = ev["ts"].astype("datetime64[us]").dt.date
    daily = (
        ev.sort_values("k").groupby(["user_id", "d"]).last()["ticks"].unstack(0)
    )
    j = daily.dropna().astype("int64")
    xs, ys = j[1].to_numpy(), j[2].to_numpy()
    days = [str(d) for d in j.index]
    want = {}
    for i in range(len(days)):
        lo = max(0, i - (_ROLL_CORR_WIN - 1))
        x, y = xs[lo:i + 1], ys[lo:i + 1]
        n = len(x)
        if n < _ROLL_CORR_MIN:
            continue
        vx = n * int((x * x).sum()) - int(x.sum()) ** 2
        vy = n * int((y * y).sum()) - int(y.sum()) ** 2
        cov = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        corr = round(cov / np.sqrt(float(vx) * float(vy)), 6) if vx > 0 and vy > 0 else None
        want[days[i]] = (n, corr)
    assert got == want
    assert any(c is not None for _, c in got.values())
