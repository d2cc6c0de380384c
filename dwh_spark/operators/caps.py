"""Executable hot-value cap calibration (VERDICT r13 What's-wrong #2 /
next #3) — turns the recorded manual rule ("read the cap off the stored
stats table's quantiles, between natural and degenerate df";
BASELINE.md round-13 cap-calibration note) into an operator, so a
deployment stops re-deriving the threshold by hand and a mis-set cap
stops silently costing recall.

Works over ANY of the stored stats artifacts the capped probes consume:
the H-K per-word table (``attach_subfp_df``'s (sub32, df) distinct
rows), the video block stats (``video_block_df``, (i, val, df)) and the
shared simhash block stats (``simhash_block_df``) — anything with a
``df`` column.

The rule, made exact: natural content is near-uniform over its value
space (df concentrated at small counts), degenerate values (silence
words, black-frame blocks, boilerplate shingles) sit orders of
magnitude above. ``calibrate_cap`` takes the q-th DISCRETE quantile of
the per-value df distribution — the smallest df v with
``#{values: df <= v} >= ceil(q * n_values)`` — and multiplies by a
safety ``margin``: the quantile pins the top of the NATURAL band, the
margin keeps merely-popular natural values (shared intros, common
shingles) under the cap, and anything above margin x quantile is the
degenerate band. The recorded examples calibrate themselves: a 2^32
word space at 500-5000 clips has quantile 1 -> cap 4-8; a 2^14 block
space at 60k frames has natural df 40-250 -> quantile ~250 x margin ~
the working cap 500-1000.

``cap_report`` is the silent-drop fix: one aggregate emitting exactly
what a chosen cap discards (values and postings), so a deployment SEES
the coverage cost instead of losing recall quietly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def df_quantile(stats: DataFrame, quantile: float, df_col: str = "df") -> int:
    """Exact discrete quantile of the df distribution — computed from
    the (df, count) HISTOGRAM, never a sort or window over the stats
    rows: the groupBy combines map-side and the histogram is bounded
    by the number of DISTINCT df counts (heavy-tailed: tens to a few
    thousand rows even for a billion-value table), so the driver-side
    cumulative walk is over a tiny frame. Not percentile_approx —
    the cap boundary must be exact and reproducible across engines
    (the DuckDB oracles re-derive the same ceil-rank rule)."""
    if not 0 < quantile <= 1:
        raise ValueError(f"quantile must be in (0, 1] (got {quantile})")
    hist = sorted(
        (r[0], r[1])
        for r in stats.groupBy(df_col).agg(F.count("*").alias("c")).collect()
    )
    if not hist:
        raise ValueError("empty stats table")
    n = sum(c for _, c in hist)
    k = math.ceil(quantile * n)
    cum = 0
    for v, c in hist:
        cum += c
        if cum >= k:
            return int(v)
    return int(hist[-1][0])


def calibrate_cap(
    stats: DataFrame,
    quantile: float = 0.99,
    margin: int = 4,
    df_col: str = "df",
) -> int:
    """The production cap recipe: ``margin x`` the q-th discrete
    quantile of per-value df. Returns a plain int (the cap is scalar
    config for the capped probes' ``max_word_freq``/``max_block_freq``
    — computing it costs one bounded aggregate at index build /
    compaction time, amortized over every probe)."""
    return df_quantile(stats, quantile, df_col) * int(margin)


def cap_report(stats: DataFrame, cap: int, df_col: str = "df") -> DataFrame:
    """What a cap discards, exactly — one aggregate over the stats
    table: (cap, n_values, n_values_dropped, n_postings,
    n_postings_dropped). Postings = sum(df) = index rows a probe could
    touch; dropped postings is the join work the cap saves AND the
    recall surface it forfeits (the stated trade, now measured per
    deployment instead of assumed)."""
    dropped = F.col(df_col) > cap
    return stats.agg(
        F.lit(int(cap)).cast("long").alias("cap"),
        F.count("*").alias("n_values"),
        F.sum(dropped.cast("long")).alias("n_values_dropped"),
        F.sum(F.col(df_col)).cast("long").alias("n_postings"),
        F.sum(F.when(dropped, F.col(df_col)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_postings_dropped"),
    )
