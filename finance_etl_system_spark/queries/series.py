"""Time-series and statistical-aggregate operators.

The reference's analytics are per-symbol time series (SURVEY §2.5) but
it never densifies them — a missing trading day simply isn't a row.
A training-data pipeline needs the opposite guarantee: a continuous
spine with gaps made explicit (and optionally forward-filled), plus
distribution-shape aggregates. This module adds:

- gap-fill densification: date spine via sequence()/explode, left
  join, last-observation-carried-forward via last(ignorenulls) over an
  unbounded-preceding frame — all JVM-side, no UDF.
- statistical aggregates: corr / covar_samp / stddev_samp per group.
- ordered list aggregation (array_sort(collect_list)) — deterministic
  form of LISTAGG/string_agg.
- fixed-width histogram by pure integer arithmetic (identical floor
  expression on both engines — width_bucket exists in Spark but not
  DuckDB, so the shared-arithmetic form is the oracle-safe one).

Scale notes (100 TB posture):
- The spine is |event_types| x |days| rows — tiny relative to the
  fact table; it broadcasts onto the daily aggregate. The expensive
  side (the groupBy to daily grain) shuffles once on (type, day).
- The forward-fill window partitions by event_type and orders by day:
  partition count = distinct types; if one type dominates, the DAILY
  grain (not raw events) is what flows through the window, so state
  stays |days| rows per type.
- The histogram is a single scan + 20-key groupBy: map-side partial
  aggregation collapses everything before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.columns import money_sum, tick_avg


def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified daily high-value totals per event type: the spine
    makes missing (type, day) combinations explicit rows, the window
    forward-fills the last observed total, and is_gap marks fills."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 250)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        money_sum("value").alias("day_total")
    # grid-sized barrier (r13, guide §3.3): daily feeds the spine's
    # type list AND the fill join; with types also derived from it
    # (identical rows: a type is in daily iff it has a filtered
    # event), the before-plan's 3 events scans drop to 1 (bounds)
    ).localCheckpoint(eager=True)

    bounds = load_table(spark, sf_dir, "events").agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("day")
    )

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("day_total", ignorenulls=True).over(w).alias("filled_total"),
            F.col("day_total").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "day")
    )


_GAPFILL_DAILY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS day_total
  FROM events WHERE value > 250 GROUP BY 1, 2
),
bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
),
spine AS (
  SELECT t.event_type, CAST(gs.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM events WHERE value > 250) t
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
  ) gs
)
SELECT spine.event_type,
       strftime(spine.day, '%Y-%m-%d') AS day,
       LAST_VALUE(daily.day_total IGNORE NULLS) OVER (
         PARTITION BY spine.event_type ORDER BY spine.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_total,
       daily.day_total IS NULL AS is_gap
FROM spine
LEFT JOIN daily ON spine.event_type = daily.event_type AND spine.day = daily.day
ORDER BY spine.event_type, spine.day
"""


def q_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape aggregates per return flag: Pearson
    correlation and sample covariance of (quantity, price), plus the
    discount's sample stddev. One scan, one shuffle on a 3-value key;
    partial moments combine map-side.

    All three statistics are derived from EXACT integer moments
    (quantity is integral; price/discount go through integer cents)
    instead of native corr/covar/stddev: the engines' float moment
    states merge in partition-dependent order, so a rounded value can
    flip at a rounding boundary between runs/engines — the latent-
    flake class eliminated repo-wide in round 7 (see
    q_group_agg_having, q_anomaly_seasonal). Each output is a single
    deterministic float expression of engine-identical exact
    integers: corr = (n·Σxy − ΣxΣy)/(√Dx·√Dy) with D· computed in
    decimal/hugeint (Σc² overflows bigint; Dx·Dy would overflow even
    decimal38, so the two factors take their sqrts SEPARATELY —
    each a correctly-rounded conversion of an exact integer)."""
    l = load_table(spark, sf_dir, "lineitem")
    qy = F.round(F.col("l_quantity"), 0).cast("long")
    c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dd = F.round(F.col("l_discount") * 100, 0).cast("long")
    m = (
        l.select(
            "l_returnflag",
            qy.alias("_x"),
            c.alias("_y"),
            dd.alias("_d"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_x").alias("_sx"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
            F.sum("_y").alias("_sy"),
            F.sum((F.col("_y") * F.col("_y")).cast("decimal(28,0)")).alias(
                "_syy"
            ),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum("_d").alias("_sd"),
            F.sum(F.col("_d") * F.col("_d")).alias("_sdd"),
        )
    )
    n = F.col("n_lines")
    nd = n.cast("decimal(18,0)")
    num = nd * F.col("_sxy").cast("decimal(20,0)") - F.col("_sx").cast(
        "decimal(19,0)"
    ) * F.col("_sy").cast("decimal(19,0)")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")  # bigint-safe
    dy = nd * F.col("_syy") - F.col("_sy").cast("decimal(19,0)") * F.col(
        "_sy"
    ).cast("decimal(19,0)")
    ddisc = n * F.col("_sdd") - F.col("_sd") * F.col("_sd")
    return m.select(
        "l_returnflag",
        F.round(
            num.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
            6,
        ).alias("qty_price_corr"),
        F.round(
            num.cast("double") / (n * (n - 1)) / 100.0, 2
        ).alias("qty_price_covar"),
        F.round(
            F.sqrt(ddisc.cast("double") / (n * (n - 1))) / 100.0, 6
        ).alias("discount_stddev"),
        "n_lines",
    ).orderBy("l_returnflag")


_STATS_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sx,
         SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
             * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS sxx,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS syy,
         SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
             * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sxy,
         SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sd,
         SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)
             * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sdd
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                * SQRT(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))),
             6) AS qty_price_corr,
       ROUND(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             / (n * (n - 1)) / 100.0, 2) AS qty_price_covar,
       ROUND(SQRT(CAST(n * sdd - sd * sd AS DOUBLE) / (n * (n - 1)))
             / 100.0, 6) AS discount_stddev,
       n AS n_lines
FROM m
ORDER BY l_returnflag
"""


def q_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (LISTAGG/string_agg): nations per
    region as one sorted comma-joined string. Sorting inside the
    aggregate (array_sort before join) is what makes collect_list —
    otherwise order-nondeterministic across partitions — oracle-safe."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


_NATION_ROSTER_SQL = """
SELECT r_name,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price: 20 buckets of 5250,
    identical floor arithmetic on both engines. The groupBy key space
    is 20 values, so the shuffle moves only 20 partial rows per task
    regardless of input size."""
    l = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / 5250.0).cast("long"), F.lit(19).cast("long")
    )
    return (
        l.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum("l_extendedprice").alias("bucket_revenue"),
        )
        .orderBy("price_bucket")
    )


_PRICE_HISTOGRAM_SQL = """
SELECT LEAST(CAST(FLOOR(l_extendedprice / 5250.0) AS BIGINT), 19) AS price_bucket,
       COUNT(*) AS n_lines,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 2) AS bucket_revenue
FROM lineitem
GROUP BY price_bucket
ORDER BY price_bucket
"""


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed:
    each user's purchase events become validity intervals
    [valid_from, valid_to) with an is_current flag — the warehouse
    pattern for tracking attribute history without updates-in-place.

    One window family (lead over user_id ordered by event time) = one
    shuffle on user_id; no self-join. Ties on ts break on event_id so
    the intervals are deterministic.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            F.round("value", 2).alias("state_value"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


_SCD2_USER_STATE_SQL = """
SELECT user_id,
       event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
       ROUND(value, 2) AS state_value,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from, event_id
"""


def q_temporal_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-correct dimension lookup: every event joined to the
    SCD2 purchase-state version (q_scd2_user_state's intervals) valid
    AT ITS TIMESTAMP — the batch twin of
    streaming/enrich.py::temporal_enrich, and the semantics a
    current-version-only lookup (the reference's consumer upsert
    loop) gets wrong on replays. Events before a user's first version
    keep NULL state (left semantics, no guessed version).

    Plan: the dim is one window pass over the purchase slice
    (user-keyed, dim-sized), broadcast into a single fact-scan hash
    join on user_id with the interval conjuncts as post-filters —
    one shuffle total (the dim's)."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = purch.select(
        F.col("user_id").alias("d_user"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.round("value", 2).alias("state_value"),
    )
    cond = (
        (ev["user_id"] == dim["d_user"])
        & (ev["ts"] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (ev["ts"] < dim["valid_to"]))
    )
    return (
        ev.join(F.broadcast(dim), cond, "left")
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            "event_type",
            "state_value",
        )
        .orderBy("user_id", "event_id")
    )


_TEMPORAL_ENRICH_EVENTS_SQL = """
WITH dim AS (
  SELECT user_id AS d_user,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
         ROUND(value, 2) AS state_value
  FROM events WHERE event_type = 'purchase'
)
SELECT e.user_id,
       e.event_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       e.event_type,
       dim.state_value
FROM events e
LEFT JOIN dim
  ON e.user_id = dim.d_user
 AND e.ts >= dim.valid_from
 AND (dim.valid_to IS NULL OR e.ts < dim.valid_to)
ORDER BY e.user_id, e.event_id
"""


def q_tz_market_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware market-hours filter: UTC event times shifted to
    exchange-local (America/New_York), kept only within the 09:30-16:00
    trading session, summarized per local hour. Both engines resolve
    the IANA zone via tzdata, so offsets (incl. DST rules) agree;
    the fixture's January window sits entirely in EST."""
    ev = load_table(spark, sf_dir, "events")
    lt = F.from_utc_timestamp("ts", "America/New_York")
    minute_of_day = F.hour(lt) * 60 + F.minute(lt)
    return (
        ev.filter((minute_of_day >= 570) & (minute_of_day < 960))
        .groupBy(F.hour(lt).alias("ny_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            tick_avg("value").alias("avg_value"),
        )
        .orderBy("ny_hour")
    )


_TZ_MARKET_HOURS_SQL = """
WITH local AS (
  SELECT timezone('America/New_York', timezone('UTC', ts)) AS lt, value
  FROM events
)
SELECT CAST(hour(lt) AS INT) AS ny_hour,
       COUNT(*) AS n_events,
       ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / (100.0 * COUNT(value)), 6) AS avg_value
FROM local
WHERE hour(lt) * 60 + minute(lt) >= 570
  AND hour(lt) * 60 + minute(lt) < 960
GROUP BY ny_hour
ORDER BY ny_hour
"""



_SEASON_M = 7  # weekly seasonality on the per-user event series


def q_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation with MASE — the benchmark
    every forecasting tier must beat (Hyndman): per user, the
    m-step-back value predicts the current one, and the error is
    scaled by the 1-step naive\'s in-sample MAE:

        mase = mean|v_t − v_{t−m}| / mean|v_t − v_{t−1}|

    mase < 1 ⇔ the seasonal pattern carries real signal. Exact
    integer-tick absolute errors (|Δ| of longs), ONE window pass for
    both lags, one groupBy — fully oracle-checked, zero Python."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.round(F.col("value") * 100, 0).cast("long")
    base = (
        e.withColumn("_y", t)
        .withColumn("_l1", F.lag(t.alias("t"), 1).over(w))
        .withColumn("_lm", F.lag(t.alias("t"), _SEASON_M).over(w))
    )
    agg = base.groupBy("user_id").agg(
        F.sum(F.when(F.col("_lm").isNotNull(), 1).otherwise(0)).alias("n_eval"),
        F.sum(F.when(F.col("_lm").isNotNull(), F.abs(F.col("_y") - F.col("_lm")))).alias("sae_m"),
        F.sum(F.when(F.col("_l1").isNotNull(), 1).otherwise(0)).alias("n_naive"),
        F.sum(F.when(F.col("_l1").isNotNull(), F.abs(F.col("_y") - F.col("_l1")))).alias("sae_1"),
    )
    mae_m = F.col("sae_m").cast("double") / F.col("n_eval")
    mae_1 = F.col("sae_1").cast("double") / F.col("n_naive")
    return (
        agg.filter((F.col("n_eval") > 0) & (F.col("sae_1") > 0))
        .select(
            "user_id",
            "n_eval",
            F.round(mae_m / 100.0, 6).alias("mae_seasonal"),
            F.round(mae_1 / 100.0, 6).alias("mae_naive"),
            F.round(mae_m / mae_1, 6).alias("mase"),
        )
        .orderBy("user_id")
    )


_FORECAST_SEASONAL_NAIVE_SQL = f"""
WITH nn AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
lagged AS (
  SELECT user_id, y,
         LAG(y, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l1,
         LAG(y, {_SEASON_M}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lm
  FROM nn
),
agg AS (
  SELECT user_id,
    CAST(SUM(CASE WHEN lm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
    SUM(CASE WHEN lm IS NOT NULL THEN ABS(y - lm) END) AS sae_m,
    CAST(SUM(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_naive,
    SUM(CASE WHEN l1 IS NOT NULL THEN ABS(y - l1) END) AS sae_1
  FROM lagged GROUP BY user_id
)
SELECT user_id, n_eval,
  ROUND(CAST(sae_m AS DOUBLE) / n_eval / 100.0, 6) AS mae_seasonal,
  ROUND(CAST(sae_1 AS DOUBLE) / n_naive / 100.0, 6) AS mae_naive,
  ROUND((CAST(sae_m AS DOUBLE) / n_eval)
        / (CAST(sae_1 AS DOUBLE) / n_naive), 6) AS mase
FROM agg
WHERE n_eval > 0 AND sae_1 > 0
ORDER BY user_id
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition, the moving-average
    method (Hyndman & Athanasopoulos, FPP ch. 3): per user series,
    trend = centered 7-row moving average, detrended = y − trend,
    seasonal index = mean detrended per phase (position mod 7). The
    reference has nothing seasonal (its indicators are causal MAs,
    etl_job.py); this is the decomposition every monitoring stack
    runs before calling a drift alarm on a weekly-patterned metric.

    All arithmetic is exact integer ticks until the single final
    division: detrended is kept as d = 7·y − Σ₇y (ticks × 7, a
    long), so the per-phase aggregate Σd / (7·n·100) is one
    deterministic float op on both engines — no float-sum ordering
    anywhere (the forecast_seasonal_naive discipline).

    Scale: one hashpartitioning(user_id) window pass computes the
    centered MA and the phase; the per-phase aggregate is map-side
    combinable on (user_id, phase) — the same keys, so AQE coalesces
    without a second shuffle.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wma = w.rowsBetween(-3, 3)
    y = F.round(F.col("value") * 100, 0).cast("long")
    base = (
        e.withColumn("_y", y)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_s7", F.sum("_y").over(wma))
        .withColumn("_n7", F.count("_y").over(wma))
    )
    d = F.lit(7) * F.col("_y") - F.col("_s7")  # ticks × 7, exact
    full = F.col("_n7") == 7
    return (
        base.withColumn("_phase", ((F.col("_rn") - 1) % 7).cast("int"))
        .groupBy("user_id", "_phase")
        .agg(
            F.sum(full.cast("int")).cast("long").alias("n_obs"),
            F.sum(F.when(full, d)).alias("_sd"),
        )
        .filter(F.col("n_obs") > 0)
        .select(
            "user_id",
            F.col("_phase").alias("phase"),
            "n_obs",
            F.round(
                F.col("_sd").cast("double")
                / (F.lit(7.0) * F.col("n_obs") * 100.0),
                6,
            ).alias("seasonal_idx"),
        )
        .orderBy("user_id", "phase")
    )


_SEASONAL_DECOMPOSE_SQL = """
WITH nn AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
win AS (
  SELECT user_id, y,
         ROW_NUMBER() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         SUM(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
         COUNT(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
  FROM nn
)
SELECT user_id,
       CAST((rn - 1) % 7 AS INT) AS phase,
       CAST(SUM(CASE WHEN n7 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
       ROUND(CAST(SUM(CASE WHEN n7 = 7 THEN 7 * y - s7 END) AS DOUBLE)
             / (7.0 * SUM(CASE WHEN n7 = 7 THEN 1 ELSE 0 END) * 100.0),
             6) AS seasonal_idx
FROM win
GROUP BY user_id, phase
HAVING SUM(CASE WHEN n7 = 7 THEN 1 ELSE 0 END) > 0
ORDER BY user_id, phase
"""



def q_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-residual anomaly detection: deseasonalize each user
    series with the q_seasonal_decompose machinery (centered 7-row MA
    trend + detrended ticks d = 7y − Σ₇y), then flag observations
    beyond 3 sample standard deviations of their own (user, phase)
    residual distribution — the alarm a weekly-patterned metric needs
    so the pattern itself never pages anyone (the plain z-score twin
    would flag every weekend).

    The 3σ cut is EXACT INTEGER arithmetic end to end — no float ever
    crosses the comparison. Within a (user, phase) group of size n
    with detrended sum S = Σd, the scaled residual x = n·d − S is a
    bigint whose group sum is exactly 0, so the sample sd needs no
    mean subtraction: sd² = Σx²/(n−1), and |x| > 3·sd becomes

        (n − 1) · x² > 9 · Σx²          (all bigint)

    which is partition-order- and engine-independent by construction
    (the earlier per-user pooled formulation compared unrounded
    stddev_samp doubles, whose float-sum accumulation order could
    flip a boundary residual between Spark and DuckDB — the exact
    flake class the repo's integer-tick convention exists to avoid;
    pooling across phases with differing group sizes has no common
    integer denominator, so the cut is per phase, which is also the
    statistically honest grouping: each phase has its own level).
    Small-sample caveat (inherent to 3σ with the flagged point in its
    own sample sd): max attainable |z| is (n−1)/√n, so a phase needs
    n ≥ 11 observations (11+ weeks of data) before ANY point can
    flag — short series report n_outliers = 0, not false alarms.
    Overflow bound: |y| ≤ ~5.6e6 ticks ⇒ |d| < 7.9e7, |x| < 2n·max|d|
    and Σx² < 4n³·max|d|² — safe in bigint through n ≈ 2500 rows per
    (user, phase) at these tick scales; beyond that cast d to
    decimal(38,0) first.

    The two emitted floats (resid_sd, outlier_frac) are single
    deterministic expressions of exact integers: Σx² < 2⁵³ converts
    to double exactly, then one division, one correctly-rounded sqrt,
    one division, one round — identical in any engine.

    Scale: the one data-sized shuffle is hashpartitioning(user_id)
    for the ordered window; the (user_id, phase) windows and the
    final aggregate reuse that clustering (ClusteredDistribution by
    superset key) — no second data-sized shuffle.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wma = w.rowsBetween(-3, 3)
    y = F.round(F.col("value") * 100, 0).cast("long")
    base = (
        e.withColumn("_y", y)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_s7", F.sum("_y").over(wma))
        .withColumn("_n7", F.count("_y").over(wma))
        .filter(F.col("_n7") == 7)
        .select(
            "user_id",
            ((F.col("_rn") - 1) % 7).cast("int").alias("phase"),
            (F.lit(7) * F.col("_y") - F.col("_s7")).alias("d"),
        )
    )
    wp = Window.partitionBy("user_id", "phase")
    scored = base.select(
        "user_id",
        "phase",
        F.count(F.lit(1)).over(wp).alias("n"),
        (F.count(F.lit(1)).over(wp) * F.col("d") - F.sum("d").over(wp))
        .alias("x"),
    ).withColumn("ssx", F.sum(F.col("x") * F.col("x")).over(wp))
    flag = (
        (F.col("n") - F.lit(1)) * F.col("x") * F.col("x")
        > F.lit(9) * F.col("ssx")
    )
    return (
        scored.filter((F.col("n") >= 2) & (F.col("ssx") > 0))
        .groupBy("user_id", "phase", "n", "ssx")
        .agg(F.sum(flag.cast("int")).cast("long").alias("n_outliers"))
        .select(
            "user_id",
            "phase",
            F.col("n").alias("n_obs"),
            F.round(
                F.sqrt(
                    F.col("ssx").cast("double") / (F.col("n") - F.lit(1))
                )
                / (F.col("n") * F.lit(700.0)),
                6,
            ).alias("resid_sd"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias(
                "outlier_frac"
            ),
        )
        .orderBy("user_id", "phase")
    )


_ANOMALY_SEASONAL_SQL = """
WITH nn AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
win AS (
  SELECT user_id, y,
         ROW_NUMBER() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         SUM(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
         COUNT(y) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
  FROM nn
),
base AS (
  SELECT user_id,
         CAST((rn - 1) % 7 AS INT) AS phase,
         7 * y - s7 AS d
  FROM win WHERE n7 = 7
),
sc AS (
  SELECT user_id, phase,
         CAST(COUNT(*) OVER (PARTITION BY user_id, phase) AS BIGINT) AS n,
         CAST(COUNT(*) OVER (PARTITION BY user_id, phase) AS BIGINT) * d
           - SUM(d) OVER (PARTITION BY user_id, phase) AS x
  FROM base
),
xx AS (
  SELECT user_id, phase, n, x,
         SUM(x * x) OVER (PARTITION BY user_id, phase) AS ssx
  FROM sc
)
SELECT user_id, phase, n AS n_obs,
       ROUND(SQRT(CAST(ssx AS DOUBLE) / (n - 1)) / (n * 700.0), 6)
         AS resid_sd,
       CAST(SUM(CASE WHEN (n - 1) * x * x > 9 * ssx THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       ROUND(SUM(CASE WHEN (n - 1) * x * x > 9 * ssx THEN 1 ELSE 0 END)
             / CAST(n AS DOUBLE), 6) AS outlier_frac
FROM xx
WHERE n >= 2 AND ssx > 0
GROUP BY user_id, phase, n, ssx
ORDER BY user_id, phase
"""


QUERIES = {
    "gapfill_daily": q_gapfill_daily,
    "scd2_user_state": q_scd2_user_state,
    "temporal_enrich_events": q_temporal_enrich_events,
    "tz_market_hours": q_tz_market_hours,
    "stats_corr": q_stats_corr,
    "nation_roster": q_nation_roster,
    "price_histogram": q_price_histogram,
    "forecast_seasonal_naive": q_forecast_seasonal_naive,
    "seasonal_decompose": q_seasonal_decompose,
    "anomaly_seasonal": q_anomaly_seasonal,
}

ORACLE = {
    "gapfill_daily": _GAPFILL_DAILY_SQL,
    "scd2_user_state": _SCD2_USER_STATE_SQL,
    "temporal_enrich_events": _TEMPORAL_ENRICH_EVENTS_SQL,
    "tz_market_hours": _TZ_MARKET_HOURS_SQL,
    "stats_corr": _STATS_CORR_SQL,
    "nation_roster": _NATION_ROSTER_SQL,
    "price_histogram": _PRICE_HISTOGRAM_SQL,
    "forecast_seasonal_naive": _FORECAST_SEASONAL_NAIVE_SQL,
    "seasonal_decompose": _SEASONAL_DECOMPOSE_SQL,
    "anomaly_seasonal": _ANOMALY_SEASONAL_SQL,
}
