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
