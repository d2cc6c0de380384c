"""Temporal queries: as-of join, proximity range join, window frames.

These cover the temporal-join family the reference lacks entirely
(SURVEY.md §2.6 — it delegates all joins to Postgres equi-joins) but
which an event-stream warehouse needs: "latest state as of each event",
"events near this incident", and sliding-frame aggregates.

Oracles use DuckDB's native ASOF JOIN / inequality joins / window
frames, so they are *independent implementations* of the same
semantics — a genuinely adversarial check on our banded/windowed
Spark formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dwh_spark.operators.temporal import asof_join, proximity_pairs
from dwh_spark.plans.registry import query
from dwh_spark.sources.catalog import load_table


@query(
    "events_asof_last_click",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS asof_ts, c.value AS asof_value,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the user's most
    recent click at-or-before it (union-then-window, one shuffle —
    never a nested-loop range join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(purchases, clicks, key="user_id", right_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "asof_ts",
        F.col("asof_value"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


@query(
    "events_error_purchase_proximity",
    oracle="""
    SELECT e.event_id, count(*) AS n_nearby,
           min(abs(epoch_us(e.ts) - epoch_us(p.ts))) AS closest_gap_us
    FROM events e
    JOIN events p
      ON p.event_type = 'purchase'
     AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 60000000
    WHERE e.event_type = 'error'
    GROUP BY 1
    """,
)
def events_error_purchase_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): purchases within ±60 s of each
    error, via the banded bucket join — DuckDB checks it with a real
    inequality (IEJoin) plan."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("ts")
    pairs = proximity_pairs(errors, purchases, window_us=60_000_000)
    return pairs.groupBy("event_id").agg(
        F.count("*").alias("n_nearby"), F.min("gap_us").alias("closest_gap_us")
    )


@query(
    "orders_daily_moving_stats",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total_dec,
             count(*) AS n_orders,
             epoch_us(o_orderdate) // 86400000000 AS d
      FROM orders GROUP BY 1, 4
    )
    SELECT o_orderdate,
           CAST(day_total_dec AS DOUBLE) AS day_total,
           n_orders,
           count(*) OVER w AS days_in_window,
           round(CAST(sum(day_total_dec) OVER w AS DOUBLE)
                 / count(*) OVER w, 6) AS moving_avg_7d,
           CAST(sum(day_total_dec) OVER
                (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cume_total
    FROM daily
    WINDOW w AS (ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def orders_daily_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame specs over daily order totals: a 7-day RANGE frame
    (calendar-aware — gaps in the date sequence shrink the window) and
    a running ROWS frame. Frames the reference can't express at all.

    Scale: the global orderBy window is a single-partition sort of the
    *daily* rollup (one row per date), not of the fact table — the
    heavy aggregation happens partition-parallel first.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_total_dec"),
        F.count("*").alias("n_orders"),
    ).withColumn("d", F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")))
    w7 = Window.orderBy("d").rangeBetween(-6, 0)
    cume = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "o_orderdate",
        F.col("day_total_dec").cast("double").alias("day_total"),
        "n_orders",
        F.count("*").over(w7).alias("days_in_window"),
        F.round(
            F.sum("day_total_dec").over(w7).cast("double") / F.count("*").over(w7), 6
        ).alias("moving_avg_7d"),
        F.sum("day_total_dec").over(cume).cast("double").alias("cume_total"),
    )


@query(
    "events_foreign_errors_in_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ), sessions AS (
      SELECT user_id, session_id,
             min(ts) AS session_start, max(ts) AS session_end
      FROM numbered GROUP BY 1, 2
    )
    SELECT s.user_id, count(*) AS n_foreign_errors
    FROM sessions s
    JOIN events e
      ON e.event_type = 'error'
     AND e.ts BETWEEN s.session_start AND s.session_end
     AND e.user_id != s.user_id
    GROUP BY 1
    """,
)
def events_foreign_errors_in_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (no equality key): other users' error
    events falling inside each user's sessions, via the banded
    point-in-interval join — DuckDB checks it with a native inequality
    (IEJoin) plan. The interval analog of the proximity range join."""
    from dwh_spark.operators.temporal import interval_point_join
    from dwh_spark.plans.events import events_sessionization

    sessions = events_sessionization(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    errors = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", "ts")
    )
    contained = interval_point_join(sessions, errors).filter(
        F.col("p_user_id") != F.col("user_id")
    )
    return contained.groupBy("user_id").agg(F.count("*").alias("n_foreign_errors"))


@query(
    "events_session_concurrency",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    ), sessions AS (
      SELECT user_id, session_id,
             min(ts) AS session_start, max(ts) AS session_end
      FROM numbered GROUP BY 1, 2
    ), deltas AS (
      SELECT session_start AS ts, 1 AS delta FROM sessions
      UNION ALL
      SELECT session_end AS ts, -1 AS delta FROM sessions
    ), run AS (
      SELECT ts, sum(delta) OVER (ORDER BY ts, delta DESC
                                  ROWS UNBOUNDED PRECEDING) AS cur
      FROM deltas
    )
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(max(cur) AS BIGINT) AS max_concurrent
    FROM run GROUP BY 1
    """,
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line max-concurrency: how many user sessions are open at
    once, daily — the interval-overlap counter every ops dashboard
    wants. The oracle's single global window IS the naive form; the
    Spark side runs the two-phase distributed prefix sum
    (operators/temporal.py:sweep_max_concurrency) whose only global
    sort is over the one-row-per-day rollup."""
    from dwh_spark.operators.temporal import sweep_max_concurrency
    from dwh_spark.plans.events import events_sessionization

    sessions = events_sessionization(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    return sweep_max_concurrency(sessions)


@query(
    "events_gap_fill_locf",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_val
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT s.user_id, CAST(g.day AS DATE) AS day
        FROM spans s,
             UNNEST(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS g(day)
    ),
    joined AS (
        SELECT g.user_id, g.day,
               d.day_val,
               CASE WHEN d.day_val IS NOT NULL THEN g.day END AS obs_day
        FROM grid g LEFT JOIN daily d USING (user_id, day)
    ),
    filled AS (
        SELECT user_id, day, day_val,
               last_value(day_val IGNORE NULLS) OVER past AS locf_val,
               last_value(obs_day IGNORE NULLS) OVER past AS prev_day,
               first_value(day_val IGNORE NULLS) OVER fut AS next_val,
               first_value(obs_day IGNORE NULLS) OVER fut AS next_day
        FROM joined
        WINDOW past AS (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fut AS (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    interp AS (
        SELECT user_id, day,
               day_val IS NOT NULL AS observed,
               COALESCE(locf_val, next_val) AS locf_out,
               CASE
                   WHEN day_val IS NOT NULL THEN day_val
                   WHEN locf_val IS NULL THEN next_val
                   WHEN next_val IS NULL THEN locf_val
                   ELSE locf_val + (next_val - locf_val)
                        * (day - prev_day) / (next_day - prev_day)
               END AS interp_out
        FROM filled
    )
    SELECT user_id,
           count(*) AS n_days,
           CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_observed,
           CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
               AS n_filled,
           CAST(round(sum(CAST(round(locf_out, 6) AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS locf_checksum,
           CAST(round(sum(CAST(round(interp_out, 6) AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS interp_checksum
    FROM interp GROUP BY user_id
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling — the hypertable `time_bucket_gapfill`
    /`locf`/`interpolate` surface: per user, the daily-total series is
    densified onto a complete day grid (sequence + explode, no join
    amplification beyond the grid), missing days are filled two ways —
    last-observation-carried-forward and linear interpolation between
    the bracketing observed days (leading gaps backfill, trailing gaps
    carry forward) — and per-user checksums pin every filled value.

    Determinism: daily totals are exact DECIMAL sums (no division);
    the interpolation runs in IEEE doubles from identical inputs on
    both engines, each filled value is rounded to DECIMAL(18,6) BEFORE
    the per-user sum (addition order can't drift), and the final
    2-dp round happens ON THE DECIMAL, not after a double cast —
    rounding a half-way decimal like x.715 as a double diverges
    between Spark (shortest-repr HALF_UP) and DuckDB (binary value).

    100 TB design: the grid explode is per-user-span (no cross join),
    both fills are two window passes over the same (user, day) sort,
    and the whole query is one shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("day_val")
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left").withColumn(
        "obs_day", F.when(F.col("day_val").isNotNull(), F.col("day"))
    )
    past = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fut = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = joined.select(
        "user_id",
        "day",
        "day_val",
        F.last("day_val", ignorenulls=True).over(past).alias("locf_val"),
        F.last("obs_day", ignorenulls=True).over(past).alias("prev_day"),
        F.first("day_val", ignorenulls=True).over(fut).alias("next_val"),
        F.first("obs_day", ignorenulls=True).over(fut).alias("next_day"),
    )
    interp = filled.select(
        "user_id",
        F.col("day_val").isNotNull().alias("observed"),
        F.coalesce("locf_val", "next_val").alias("locf_out"),
        F.when(F.col("day_val").isNotNull(), F.col("day_val"))
        .when(F.col("locf_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("locf_val"))
        .otherwise(
            F.col("locf_val")
            + (F.col("next_val") - F.col("locf_val"))
            * F.datediff("day", "prev_day")
            / F.datediff("next_day", "prev_day")
        )
        .alias("interp_out"),
    )
    return interp.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).alias("n_observed"),
        F.sum(F.when(F.col("observed"), 0).otherwise(1)).alias("n_filled"),
        F.round(F.sum(F.round("locf_out", 6).cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("locf_checksum"),
        F.round(F.sum(F.round("interp_out", 6).cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("interp_checksum"),
    )


@query(
    "events_retention_rates",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_trunc('week', e.ts) AS DATE) AS active_week
        FROM events e JOIN firsts f USING (user_id)
    ),
    cohort_sizes AS (
        SELECT cohort_week, count(*) AS cohort_size FROM firsts GROUP BY 1
    )
    SELECT a.cohort_week,
           (a.active_week - a.cohort_week) // 7 AS week_offset,
           count(DISTINCT a.user_id) AS n_retained,
           -- exact integer basis points: a rounded double ratio can
           -- land on a half-way point and round differently per engine
           count(DISTINCT a.user_id) * 10000 // min(c.cohort_size)
               AS retention_bp
    FROM activity a JOIN cohort_sizes c USING (cohort_week)
    GROUP BY 1, 2
    """,
)
def events_retention_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts — the product-analytics staple: users
    are assigned to the ISO week of their first event, each (cohort,
    week-offset) cell counts distinct users active that week, and the
    retention rate divides by the cohort size (one exact integer
    division per cell). Both engines truncate to Monday-start ISO
    weeks, so the cell boundaries agree exactly.

    100 TB design: two aggregations on user_id (first-touch + distinct
    activity) that share one shuffle key, a broadcast-sized cohort
    table, and a final small-cell rollup — no row explosion."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = (
        events.select(
            "user_id", F.to_date(F.date_trunc("week", "ts")).alias("active_week")
        )
        .distinct()
        .join(firsts, "user_id")
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        activity.groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_retained"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_retained",
            F.expr("CAST((n_retained * 10000) DIV cohort_size AS BIGINT)").alias(
                "retention_bp"
            ),
        )
    )
