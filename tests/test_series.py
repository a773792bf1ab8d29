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
    # 20 weeks: the per-phase 3-sigma cut cannot fire below n=11
    # observations per phase (max sample |z| is (n-1)/sqrt(n)), so
    # give each phase ~19
    for i in range(140):
        v = 500.0 + pattern[i % 7] + 0.01 * (i % 3)  # tiny jitter
        if i in (31, 53):  # distinct phases (two spikes sharing a
            v += 400.0     # phase would mask each other's 3-sigma)
        rows.append((i, t0 + dt.timedelta(hours=i), 1, "purchase", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")

    from finance_etl_system_spark.queries.series import q_anomaly_seasonal

    out = q_anomaly_seasonal(spark, str(tmp_path)).collect()
    assert {r.user_id for r in out} == {1}
    # per-(user, phase) granularity: all 7 phases present, totals
    # cover the 134 full-window rows (140 - 6 edge rows)
    assert sorted(r.phase for r in out) == list(range(7))
    assert sum(r.n_obs for r in out) == 134
    # each spike contaminates its own 7-row MA neighborhood, so a few
    # neighbors may flag too — but the detector must fire, and not
    # on more than the two spike neighborhoods
    assert 2 <= sum(r.n_outliers for r in out) <= 8


def test_anomaly_seasonal_partitioning_invariant(spark):
    """The 3-sigma cut is exact bigint arithmetic ((n-1)*x*x > 9*ssx
    with sum(x) = 0 by construction), so the FULL output — flags
    included — must be byte-identical under any physical
    partitioning. Perturb the shuffle layout (1 vs 32 reduce
    partitions) and compare every row; the pre-fix pooled
    stddev_samp(double) formulation is exactly what this would catch
    flaking."""
    from finance_etl_system_spark.queries.series import q_anomaly_seasonal
    from tests.conftest import SF_SMOKE

    def run():
        return sorted(
            (
                r.user_id,
                r.phase,
                r.n_obs,
                r.resid_sd,
                r.n_outliers,
                r.outlier_frac,
            )
            for r in q_anomaly_seasonal(spark, SF_SMOKE).collect()
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = run()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one and one == many
