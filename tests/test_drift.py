"""Drift-monitor accuracy: the grid-KS bracket must contain the true
exact two-sample KS statistic."""

from __future__ import annotations

import numpy as np

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
