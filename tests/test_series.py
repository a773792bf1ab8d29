"""Seasonal decomposition (queries/series.py::q_seasonal_decompose):
a flat-trend series with an exact weekly pattern must recover the
zero-centered pattern as its per-phase seasonal indexes."""

from __future__ import annotations

import datetime as dt

from finance_etl_system_spark.queries.series import _SEASONAL_DECOMPOSE_SQL  # noqa: F401


def test_seasonal_decompose_recovers_known_pattern(spark, tmp_path):
    pattern = [3.0, -1.0, 0.5, 2.0, -2.5, -1.5, -0.5]  # sums to 0
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for uid in (1, 2):
        for i in range(35):  # 5 full weeks
            rows.append(
                (
                    uid * 1000 + i,
                    t0 + dt.timedelta(hours=i),
                    uid,
                    "purchase",
                    100.0 + pattern[i % 7],
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    from finance_etl_system_spark.queries.series import q_seasonal_decompose

    out = q_seasonal_decompose(spark, sf_dir).collect()
    got = {(r.user_id, r.phase): r.seasonal_idx for r in out}
    # with a flat trend and a zero-sum exact-period pattern, every
    # full-window detrended value equals the pattern at its phase
    for uid in (1, 2):
        for p in range(7):
            assert abs(got[(uid, p)] - pattern[p]) < 1e-6, (uid, p)
    # interior rows only: phases 0-2 lose the first week's short
    # windows, so counts differ but every phase is present
    assert {r.n_obs > 0 for r in out} == {True}


def test_anomaly_seasonal_flags_planted_spikes(spark, tmp_path):
    """A weekly-patterned series with two injected spikes: the
    deseasonalized detector must flag (roughly) just the spikes —
    the raw pattern alone must produce zero flags."""
    import datetime as dt

    pattern = [30.0, -10.0, 5.0, 20.0, -25.0, -15.0, -5.0]
    rows = []
    t0 = dt.datetime(2024, 3, 1)
    for i in range(70):  # 10 full weeks
        v = 500.0 + pattern[i % 7] + 0.01 * (i % 3)  # tiny jitter
        if i in (31, 52):
            v += 400.0  # spikes
        rows.append((i, t0 + dt.timedelta(hours=i), 1, "purchase", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")

    from finance_etl_system_spark.queries.series import q_anomaly_seasonal

    out = q_anomaly_seasonal(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # each spike contaminates its own 7-row MA neighborhood, so a few
    # neighbors may flag too — but the detector must fire, and not
    # on more than the two spike neighborhoods
    assert 2 <= r.n_outliers <= 8
    assert r.n_obs == 64  # 70 - 6 edge rows
