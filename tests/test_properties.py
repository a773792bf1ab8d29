"""Property-based checks (SURVEY §5 item 5) with hypothesis.

Each example spins Spark jobs, so examples are few but adversarial:
hypothesis shrinks failures to minimal series.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from finance_etl_system_spark.operators.joins import asof_join
from finance_etl_system_spark.pipeline.indicators import technical_indicators

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

prices = st.lists(
    st.floats(min_value=1.0, max_value=1000.0, allow_nan=False, width=32),
    min_size=2,
    max_size=40,
)


def test_banded_interval_join_matches_bruteforce(spark):
    """The banded formulation must equal the naive theta join
    (crossJoin + filter) — including interval-boundary rows — on the
    sf0.001 events table."""
    import pyspark.sql.functions as F

    from finance_etl_system_spark.catalog import load_table
    from finance_etl_system_spark.operators.joins import banded_interval_join

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("lid"), F.col("ts").alias("lts")
    )
    right = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("rid"), F.col("ts").alias("rts")
    )
    banded = banded_interval_join(left, right, "lts", "rts", after_seconds=600)
    naive = left.crossJoin(right).filter(
        (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 600 SECONDS"))
    )
    a = {(r["lid"], r["rid"]) for r in banded.select("lid", "rid").collect()}
    b = {(r["lid"], r["rid"]) for r in naive.select("lid", "rid").collect()}
    assert a == b and a


def test_approx_percentile_close_to_exact(spark):
    """Sketch accuracy: approx_percentile at accuracy=10000 must sit
    within 1% relative error of the exact interpolated percentile on
    the sf0.01 orders table."""
    from finance_etl_system_spark.queries.aggregates import (
        q_approx_percentiles,
        q_percentiles,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["o_orderpriority"]: r for r in q_percentiles(spark, sf).collect()}
    approx = {r["o_orderpriority"]: r for r in q_approx_percentiles(spark, sf).collect()}
    assert set(exact) == set(approx)
    for key, e in exact.items():
        a = approx[key]
        assert abs(a["approx_median_price"] - e["median_price"]) <= 0.01 * e["median_price"]
        assert abs(a["approx_p90_price"] - e["p90_price"]) <= 0.01 * e["p90_price"]
        assert a["n"] == e["n"]


@given(closes=prices)
@settings(**_SETTINGS)
def test_indicator_invariants(spark, closes):
    base = dt.date(2024, 1, 1)
    rows = [
        ("S", base + dt.timedelta(days=i), round(float(c), 2), 100.0)
        for i, c in enumerate(closes)
    ]
    df = spark.createDataFrame(
        rows, "symbol STRING, trading_date DATE, close DOUBLE, volume DOUBLE"
    )
    pdf = (
        technical_indicators(df)
        .orderBy("trading_date")
        .toPandas()
    )
    closes_r = [round(float(c), 2) for c in closes]
    for i, row in pdf.iterrows():
        # sma_5 within [min, max] of its window
        w = closes_r[max(0, i - 4) : i + 1]
        assert min(w) - 1e-9 <= row["sma_5"] <= max(w) + 1e-9
        # bollinger ordering wherever defined
        if row["bb_upper"] == row["bb_upper"]:  # not NaN
            assert row["bb_upper"] >= row["bb_middle"] - 1e-9
            assert row["bb_lower"] <= row["bb_middle"] + 1e-9
        # rsi bounded
        assert -1e-9 <= row["rsi"] <= 100 + 1e-9
    # obv steps by exactly ±volume or 0
    obv = list(pdf["obv"])
    for prev, cur in zip(obv, obv[1:]):
        assert abs(cur - prev) in (0.0, 100.0)


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
    right_ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=15),
)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, left_ts, right_ts):
    right_vals = {t: float(t * 7 % 101) for t in sorted(set(right_ts))}
    left = spark.createDataFrame(
        [("k", t, i) for i, t in enumerate(left_ts)], "k STRING, ts LONG, rid LONG"
    )
    right = spark.createDataFrame(
        [("k", t, v) for t, v in right_vals.items()] or [("zzz", 0, 0.0)],
        "k STRING, ts LONG, v DOUBLE",
    )
    got = {
        r["rid"]: r["v"]
        for r in asof_join(
            left, right, on="ts", by=["k"], right_values=["v"], suffix=""
        ).collect()
    }
    for i, t in enumerate(left_ts):
        eligible = [rt for rt in right_vals if rt <= t]
        expect = right_vals[max(eligible)] if eligible else None
        assert got.get(i) == expect, (t, sorted(right_vals), got.get(i), expect)


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-10_000, max_value=10_000),  # ticks
            st.integers(min_value=1, max_value=50),            # weight
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_weighted_median_kernel_properties(data):
    """The UDAF kernel must return an existing tick whose cumulative
    weight first reaches half the total, for ANY multiset."""
    import numpy as np
    import pandas as pd

    from finance_etl_system_spark.functions.udafs import weighted_median_ticks

    ticks = pd.Series([t for t, _ in data])
    w = pd.Series([wt for _, wt in data])
    got = weighted_median_ticks.func(ticks, w)

    assert got in set(ticks)
    total = int(w.sum())
    below = int(w[ticks < got].sum())
    upto = int(w[ticks <= got].sum())
    # lower weighted median: strictly-below mass < half, mass up to
    # (and including) the median reaches half
    assert 2 * below < total <= 2 * upto
    # expansion-invariance: equals the plain median of the expanded multiset
    expanded = np.repeat(ticks.to_numpy(), w.to_numpy())
    expanded.sort()
    k = int(np.searchsorted(np.cumsum(np.ones_like(expanded)) * 2, len(expanded), side="left"))
    assert got == expanded[k]


@given(
    left_ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=15),
    right_ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=0, max_size=15),
    tol=st.integers(min_value=0, max_value=500),
)
@settings(**_SETTINGS)
def test_asof_join_tolerance_matches_bruteforce(spark, left_ts, right_ts, tol):
    """With a numeric `on` column, tolerance nulls any match older
    than `tol` — brute-force per left row."""
    right_vals = {t: float(t * 7 % 101) for t in sorted(set(right_ts))}
    left = spark.createDataFrame(
        [("k", t, i) for i, t in enumerate(left_ts)], "k STRING, ts LONG, rid LONG"
    )
    right = spark.createDataFrame(
        [("k", t, v) for t, v in right_vals.items()] or [("zzz", 0, 0.0)],
        "k STRING, ts LONG, v DOUBLE",
    )
    got = {
        r["rid"]: r["v"]
        for r in asof_join(
            left, right, on="ts", by=["k"], right_values=["v"], suffix="",
            tolerance_seconds=tol,
        ).collect()
    }
    for i, t in enumerate(left_ts):
        eligible = [rt for rt in right_vals if rt <= t]
        expect = None
        if eligible and t - max(eligible) <= tol:
            expect = right_vals[max(eligible)]
        assert got.get(i) == expect, (t, tol, sorted(right_vals), got.get(i), expect)


def test_asof_tolerance_judges_age_of_carried_value(spark):
    """A newer NULL-valued right row must NOT refresh the staleness
    clock: the tolerance applies to the row that PROVIDED the carried
    value (LOCF skip-null semantics)."""
    left = spark.createDataFrame(
        [("k", 40, 0), ("k", 110, 1)], "k STRING, ts LONG, rid LONG"
    )
    right = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 100, None)], "k STRING, ts LONG, v DOUBLE"
    )
    got = {
        r["rid"]: r["v"]
        for r in asof_join(
            left, right, on="ts", by=["k"], right_values=["v"], suffix="",
            tolerance_seconds=50,
        ).collect()
    }
    assert got[0] == 1.0   # v observed at t=0, age 40 <= 50
    assert got[1] is None  # v still from t=0, age 110 > 50 (the newer
    #                        NULL row at t=100 must not mask staleness)


def test_asof_tolerance_rejects_string_on_column(spark):
    """A string `on` with tolerance_seconds must raise, not silently
    disable the staleness check (the cast-to-double would yield NULL
    and the stale predicate would never fire)."""
    import pytest as _pytest

    from finance_etl_system_spark.operators.joins import asof_join

    left = spark.createDataFrame([("a", "x")], "k string, t string")
    right = spark.createDataFrame([("a", "x", 1.0)], "k string, t string, v double")
    with _pytest.raises(TypeError, match="tolerance_seconds"):
        asof_join(left, right, "t", by=["k"], tolerance_seconds=5.0)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=10,
    ),
    phrase=st.tuples(
        st.sampled_from(["alpha", "beta", "gamma"]),
        st.sampled_from(["alpha", "beta", "gamma"]),
    ),
)
@settings(**_SETTINGS)
def test_positional_phrase_index_matches_python_count(
    spark, tmp_path_factory, docs, phrase
):
    """Indexed phrase occurrence counts must equal a brute-force
    python scan for ANY corpus/phrase — including repeated-term
    phrases ("alpha alpha") and empty documents."""
    from finance_etl_system_spark.operators.textindex import (
        build_text_index,
        phrase_search_index,
    )

    frame = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id LONG, text STRING",
    )
    path = str(tmp_path_factory.mktemp("posidx"))
    build_text_index(frame, path, positions=True)
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search_index(
            spark, path, list(phrase), k=100
        ).collect()
    }
    for i, words in enumerate(docs):
        want = sum(
            1
            for j in range(len(words) - 1)
            if (words[j], words[j + 1]) == phrase
        )
        assert got.get(i, 0) == want, (i, words, phrase, got)


def test_exact_moment_statistics_partitioning_invariant(spark):
    """group_agg_having and stats_corr derive avg/stddev/corr/covar
    from exact integer moments (round 7), so their FULL rounded
    output must be identical under any shuffle layout — the native
    float corr/stddev states this replaced merge in partition-
    dependent order and could flip a 6dp boundary."""
    from finance_etl_system_spark.queries.aggregates import (
        q_group_agg_having,
    )
    from finance_etl_system_spark.queries.series import q_stats_corr
    from tests.conftest import SF_SMOKE

    def run(fn):
        return sorted(map(tuple, fn(spark, SF_SMOKE).collect()))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for parts in ("1", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            outs.append((run(q_group_agg_having), run(q_stats_corr)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert outs[0] == outs[1]
    assert outs[0][0] and outs[0][1]


def test_tick_sum_helpers_match_exact_decimal(spark):
    """tick_sum/money_sum/tick_avg must equal exact Fraction
    arithmetic on adversarial 2dp values sitting at .005 rounding
    boundaries — and be invariant to partitioning by construction."""
    from fractions import Fraction

    from finance_etl_system_spark.functions.columns import (
        money_sum,
        tick_avg,
        tick_sum,
    )

    import pyspark.sql.functions as F

    vals = [0.005, 10.015, 99.995, 0.01, 123.45, 67.89, 0.005, 50.025]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = (
        df.repartition(7)
        .agg(
            tick_sum("v").alias("ticks"),
            money_sum("v").alias("msum"),
            tick_avg("v").alias("mavg"),
        )
        .collect()[0]
    )
    # ground truth in exact rationals over the CENT-ROUNDED values:
    # engines round HALF-AWAY (F.round/DuckDB ROUND) on the double
    # product v*100 — floor(x + 0.5) for positive x, NOT python's
    # half-even round()
    import math

    cents = [int(math.floor(v * 100 + 0.5)) for v in vals]
    total = sum(cents)
    assert got["ticks"] == total
    assert got["msum"] == round(float(Fraction(total, 100)), 2)
    assert got["mavg"] == round(float(Fraction(total, 100 * len(vals))), 6)


def test_tick_avg_ignores_nulls_like_avg(spark):
    """tick_avg on a nullable column must be AVG semantics — sum over
    non-null divided by COUNT(col), not COUNT(*) — and agree with the
    DuckDB oracle shape (COUNT(col) denominator) on the same rows."""
    from fractions import Fraction

    import duckdb

    from finance_etl_system_spark.functions.columns import tick_avg

    vals = [0.005, None, 10.015, 99.995, None, 123.45]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.repartition(3).agg(tick_avg("v").alias("mavg")).collect()[0]

    import math

    nonnull = [v for v in vals if v is not None]
    cents = sum(int(math.floor(v * 100 + 0.5)) for v in nonnull)
    want = round(float(Fraction(cents, 100 * len(nonnull))), 6)
    assert got["mavg"] == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    (oracle,) = con.execute(
        "SELECT ROUND(SUM(CAST(ROUND(v * 100, 0) AS BIGINT))"
        " / (100.0 * COUNT(v)), 6) FROM t"
    ).fetchone()
    assert got["mavg"] == oracle


# Certification tier (verdict r11 #4; markers registered in
# tests/conftest.py): this module is excluded from the fast tier
# `pytest -m "not certify"` and runs in the full per-round gate.
# Assignment is duration-measured (tools/tier_report.py), not guessed.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.certify
