"""Drift-monitor accuracy: the grid-KS bracket must contain the true
exact two-sample KS statistic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_drift_ks_refined_brackets_exact_ks(spark):
    from finance_etl_system_spark.queries.drift import (
        _populations,
        q_drift_ks_refined,
    )

    row = q_drift_ks_refined(spark, SF_SMOKE).collect()[0]
    ref, cur = _populations(spark, SF_SMOKE)
    x = np.sort(np.array([r[0] for r in ref.select("o_totalprice").collect()]))
    y = np.sort(np.array([r[0] for r in cur.select("o_totalprice").collect()]))
    pts = np.concatenate([x, y])
    exact = float(
        np.abs(
            np.searchsorted(x, pts, side="right") / len(x)
            - np.searchsorted(y, pts, side="right") / len(y)
        ).max()
    )
    assert row.n_ref == len(x) and row.n_cur == len(y)
    assert row.ks_lower <= exact + 1e-6
    assert exact <= row.ks_upper + 1e-6
    # centile grid: bracket width ≤ 1/100 + max cur-bin mass
    assert row.ks_upper - row.ks_lower < 0.05


def test_drift_ks_histogram_brackets_exact_ks(spark):
    """The histogram-edge KS bracket must still contain the true
    exact two-sample KS (the bracket algebra holds for ANY grid;
    quantized edges only widen it by ≤ one bin's mass)."""
    from finance_etl_system_spark.queries.drift import (
        _populations,
        q_drift_ks_histogram,
    )

    row = q_drift_ks_histogram(spark, SF_SMOKE).collect()[0]
    ref, cur = _populations(spark, SF_SMOKE)
    x = np.sort(np.array([r[0] for r in ref.select("o_totalprice").collect()]))
    y = np.sort(np.array([r[0] for r in cur.select("o_totalprice").collect()]))
    pts = np.concatenate([x, y])
    exact = float(
        np.abs(
            np.searchsorted(x, pts, side="right") / len(x)
            - np.searchsorted(y, pts, side="right") / len(y)
        ).max()
    )
    assert row.n_ref == len(x) and row.n_cur == len(y)
    assert row.ks_lower <= exact + 1e-6
    assert exact <= row.ks_upper + 1e-6
    assert row.ks_upper - row.ks_lower < 0.08  # centile grid + bin slack


def test_drift_psi_histogram_edges_track_exact_deciles(spark):
    """The mergeable-histogram edge derivation must stand in for exact
    percentile: every bucket's reference mass stays near 1/10 (edges
    are at most one bin off the exact decile), and the total PSI
    agrees with the exact-edge formulation to the drift-decision
    tolerance."""
    from finance_etl_system_spark.queries.drift import (
        q_drift_psi,
        q_drift_psi_histogram,
    )

    hist_rows = q_drift_psi_histogram(spark, SF_SMOKE).collect()
    exact_rows = q_drift_psi(spark, SF_SMOKE).collect()
    assert sum(r.ref_n for r in hist_rows) == sum(r.ref_n for r in exact_rows)
    # quantized edges: each reference bucket holds ~10% ± one bin mass
    for r in hist_rows:
        assert abs(r.ref_frac - 0.1) < 0.03, r
    psi_h = sum(r.psi_contrib or 0.0 for r in hist_rows)
    psi_e = sum(r.psi_contrib or 0.0 for r in exact_rows)
    assert abs(psi_h - psi_e) < 0.02, (psi_h, psi_e)


def test_drift_cusum_matches_recursion_and_flags_shift(spark, monkeypatch):
    """The windowed closed form must equal the textbook CUSUM
    recursion S+_t = max(0, S+_{t-1} + (x_t - mu - k)) exactly, a
    level-shifted series alarms at the first accumulating index, and a
    stable series stays in control."""
    import finance_etl_system_spark.queries.drift as dq

    rows = []
    for i in range(40):  # u_shift: level jumps +$20 at monitored idx 5
        v = 100.0 if i < 24 else 120.0
        rows.append(("u_shift", i, v))
    for i in range(40):  # u_stable: constant level
        rows.append(("u_stable", i, 100.0))
    df = spark.createDataFrame(
        rows, "user_id string, event_id int, value double"
    ).withColumn(
        "ts",
        F.expr("timestampadd(SECOND, event_id, timestamp'2024-01-01')"),
    )
    monkeypatch.setattr(dq, "load_table", lambda s_, d_, n_: df)
    out = {r.user_id: r for r in dq.q_drift_cusum(spark, "x").collect()}

    # pure-Python recursion for u_shift (mu = first-half mean = 100)
    k, h, mu = dq._CUSUM_K / 100.0, dq._CUSUM_H / 100.0, 100.0
    vals = [100.0 if i < 24 else 120.0 for i in range(40)][20:]
    s = 0.0
    smax = 0.0
    first = None
    for j, x in enumerate(vals):
        s = max(0.0, s + (x - mu - k))
        smax = max(smax, s)
        if first is None and s > h:
            first = 21 + j  # global idx (1-based, monitored starts at 21)
    r = out["u_shift"]
    assert r.alarmed and r.first_alarm_idx == first
    assert abs(r.max_cusum - smax) < 1e-6
    r2 = out["u_stable"]
    assert not r2.alarmed and r2.first_alarm_idx is None
    assert r2.max_cusum == 0.0


def test_drift_psi_by_segment_one_sided_segment_yields_null(spark, tmp_path):
    """A segment present on only ONE side of the split must report
    NULL psi, not throw DIVIDE_BY_ZERO (ANSI mode, the Spark 4
    default this engine runs under). The TPC-H fixture has every
    priority on both sides, so this needs a synthetic table."""
    from finance_etl_system_spark.queries.drift import q_drift_psi_by_segment

    rows = []
    # segment "BOTH": 20 ref + 20 cur rows; "REFONLY": ref rows only
    for i in range(20):
        rows.append(("1996-06-01", "BOTH", 100.0 + i))
        rows.append(("1997-06-01", "BOTH", 120.0 + i))
        rows.append(("1996-06-01", "REFONLY", 50.0 + i))
    df = spark.createDataFrame(
        rows, "o_orderdate string, o_orderpriority string, o_totalprice double"
    ).select(
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
        "o_totalprice",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))

    got = {r.segment: r for r in q_drift_psi_by_segment(spark, str(tmp_path)).collect()}
    assert set(got) == {"BOTH", "REFONLY"}
    assert got["REFONLY"].cur_n == 0 and got["REFONLY"].psi is None
    assert got["BOTH"].psi is not None
