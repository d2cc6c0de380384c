"""Temporal join operators Spark lacks natively: as-of and proximity.

The reference has no temporal joins (SURVEY.md §2.6) — it gets point
lookups from Postgres. A warehouse over an event stream needs them
constantly ("state as of this event", "what happened near this
incident"), so we implement both as compositions of built-in DataFrame
ops — no Python UDFs, no cartesian products.

Scale notes:
- ``asof_join`` is the union-then-window formulation: ONE shuffle on
  the join key, then a per-key ordered scan with ``last(ignorenulls)``.
  No range-condition join (which Spark would execute as
  broadcast-nested-loop). State per key is O(1) during the scan, so a
  1000-executor cluster handles arbitrarily hot keys as long as a
  single key's rows fit one task's sort spill.
- ``proximity_pairs`` is a banded (bucketized) range join: each right
  row hashes to one time bucket, each left row probes its bucket ±1,
  then the exact predicate filters. Shuffle is on the bucket id — the
  quadratic blowup is bounded per-bucket, and skewed buckets split via
  AQE. This is the standard rewrite Spark's optimizer does NOT do for
  ``|a.ts - b.ts| <= w`` (it would pick BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: each left row picks up the latest right row
    with ``right.ts <= left.ts`` for the same key (inclusive, like
    DuckDB/pandas ``ASOF JOIN``). Left rows with no prior right row get
    nulls.

    Returns the left rows plus ``asof_ts`` and ``asof_<col>`` for each
    requested right column.

    Union-then-window: tag both sides, sort within key by
    (ts, side) — right rows sort before left rows at equal timestamps
    so same-instant matches are included — and carry the right payload
    forward with ``last(..., ignorenulls=True)``.
    """
    payload = [F.col(right_ts).alias("__asof_ts")] + [
        F.col(c).alias(f"__asof_{c}") for c in right_cols
    ]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        *[F.lit(None).cast(t.dataType).alias(t.name) for t in
          right.select(*payload).schema.fields],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("__row")).schema["__row"].dataType
        ).alias("__row"),
        *payload,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__row",
        *[
            F.last(f.name, ignorenulls=True).over(w).alias(f.name)
            for f in right.select(*payload).schema.fields
        ],
    )
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col("__asof_ts").alias("asof_ts")]
    out_cols += [F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_cols]
    return carried.filter(F.col("__side") == 1).select(*out_cols)


def proximity_pairs(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_us: int = 60_000_000,
) -> DataFrame:
    """All (left, right) pairs with ``|left.ts - right.ts| <= window_us``
    microseconds — a pure range join with NO equality key.

    Banded strategy: bucket width = the window, right rows land in one
    bucket, left rows probe bucket-1..bucket+1 (any qualifying pair is
    within one bucket width, so three probes cover it exactly once).
    Returns left.* plus ``gap_us`` and the right columns prefixed
    ``r_``.
    """
    bucket = lambda ts: (F.unix_micros(F.col(ts)) / F.lit(window_us)).cast("long")  # noqa: E731
    probe = left.withColumn(
        "__b", F.explode(F.array(bucket(left_ts) - 1, bucket(left_ts), bucket(left_ts) + 1))
    )
    build = right.select(
        F.col(right_ts).alias("__rts"),
        bucket(right_ts).alias("__b"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != right_ts],
    )
    gap = F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("__rts")))
    return (
        probe.join(build, "__b")
        .filter(gap <= window_us)
        .select(*left.columns, gap.alias("gap_us"), *[c for c in build.columns if c.startswith("r_")])
    )


def sweep_max_concurrency(
    intervals: DataFrame,
    start: str = "session_start",
    end: str = "session_end",
) -> DataFrame:
    """Max number of intervals simultaneously open, observed at interval
    boundaries, per calendar day of the boundary — the sweep-line
    counter (±1 deltas, running sum, max).

    Scale: a naive sweep is one global ``Window.orderBy`` — a
    single-task sort. This is the two-phase distributed prefix sum
    instead: (1) running sums partition-parallel WITHIN each day,
    (2) per-day delta totals (one row per day — thousands, not
    billions) get a cumulative offset via a window over days, and the
    offset is broadcast-joined back. Phase-2's global window sorts only
    the per-day rollup, so the fact-scale work stays partitioned.
    Boundary ties sort ``(ts, delta DESC)`` — a start and an end at the
    same instant count as overlapping — matching the oracle exactly.
    """
    deltas = intervals.select(
        F.col(start).alias("ts"), F.lit(1).alias("delta")
    ).unionByName(intervals.select(F.col(end).alias("ts"), F.lit(-1).alias("delta")))
    w_in = (
        Window.partitionBy("day")
        .orderBy(F.col("ts").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = deltas.withColumn("day", F.to_date("ts")).withColumn(
        "run_in", F.sum("delta").over(w_in)
    )
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        within.groupBy("day")
        .agg(F.sum("delta").alias("day_total"))
        .withColumn("offset", F.coalesce(F.sum("day_total").over(w_days), F.lit(0)))
    )
    return (
        within.join(F.broadcast(offsets.select("day", "offset")), "day")
        .groupBy("day")
        .agg(F.max(F.col("run_in") + F.col("offset")).alias("max_concurrent"))
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str = "session_start",
    end: str = "session_end",
    pt: str = "ts",
    bucket_us: int = 1_800_000_000,
) -> DataFrame:
    """Point-in-interval containment join with NO equality key: each
    point lands in one time bucket, each interval explodes over the
    buckets it covers (plus one on each side so boundary points are
    never missed), the exact predicate filters after the bucket
    equi-join. Returns intervals.* joined with the point columns
    prefixed ``p_``.

    Scale: shuffle is on the bucket id; fan-out per interval =
    ceil(duration / bucket) + 2, so pick the bucket near the typical
    interval length. Long outlier intervals fan out more — cap them
    upstream or split the join by duration class.
    """
    bucket = lambda c: (F.unix_micros(F.col(c)) / F.lit(bucket_us)).cast("long")  # noqa: E731
    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(bucket(start) - 1, bucket(end) + 1))
    )
    pts = points.select(
        bucket(pt).alias("__b"),
        *[F.col(c).alias(f"p_{c}") for c in points.columns],
    )
    return (
        iv.join(pts, "__b")
        .filter(
            (F.col(f"p_{pt}") >= F.col(start)) & (F.col(f"p_{pt}") <= F.col(end))
        )
        .drop("__b")
    )
