"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the ``dwh_spark`` package; this module only
re-exports its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dwh_spark.plans.all  # noqa: E402,F401  (populates the registry)
from dwh_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's README flagship (users with the token_ids they own,
    README.md:93-118) re-expressed over the star schema: every customer
    with the orders they own, nested-list shape via collect_list.
    """
    return QUERIES["flagship_owned_orders"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate samples the FIRST ~50 queries in dict
# order, so ordering is evidence policy (rotation, VERDICT r5 item 1):
# (1) never-checked queries lead, (2) queries whose code changed this
# round re-verify next, (3) the window backfills with the
# LONGEST-UNCHECKED greens. Round 6 added 1 query and touched 6, so
# ~43 of the ~50 slots go to backlog: all 17 r1-last-checked queries
# plus the oldest r2 block; the remaining r2 tail and the r3 block
# queue for round 7.
_CHECK_FIRST = [
    # -- new in round 6: no driver verdict yet
    "docs_heavy_hitters_mg",         # mergeable Misra-Gries top-k discovery
    # -- code touched in round 6: re-verify
    "imgs_jpeg_pixel_stats",         # progressive SOF2 fixtures + coding col
    "imgs_webp_pixel_stats",         # VP8L distance-map fix, VP8X scan
    "av_audio_flac_decode_stats",    # reserved-code/shift guards
    "pagination_page3",              # TakeOrderedAndProject pre-cut rewrite
    "events_mrl_quantile_audit",     # two-phase distributed exact ranks
    "events_stalest_topk",           # range-binned rank replaces 20%-of-table TopK
    # -- stale: last driver check was round 1 (all 17 cycle now)
    "events_kmv_distinct_users",
    "events_value_quantiles",
    "events_state_as_of",
    "events_hourly_daily_rollup",
    "imgs_format_bytes",
    "imgs_resize_fanout_stats",
    "imgs_decode_resize_bytes",
    "imgs_dedup_new",
    "imgs_keep_latest",
    "imgs_point_read_fallback",
    "metadata_validate",
    "metadata_scd1_merge",
    "metadata_refresh_schedule",
    "metadata_task_priority_order",
    "metadata_fetch_stage",
    "flagship_owned_orders",
    "q1_pricing_summary",
    # -- stale: last driver check was round 2 (oldest 28 cycle now;
    #    the remaining 19 r2 + 25 r3 queue for round 7)
    "docs_jaccard_hashed_shingles",
    "docs_pack_sequences",
    "docs_train_test_split",
    "docs_corpus_build",
    "docs_repetition_scores",
    "docs_pii_scrub_stats",
    "docs_top_terms",
    "docs_length_histogram",
    "docs_bigram_lm_scores",
    "docs_levenshtein_sample_pairs",
    "docs_weighted_sample_stats",
    "emb_ivf_probe_topk",
    "emb_ivf_inertia",
    "emb_dup_clusters",
    "emb_pq_adc_topk",
    "emb_int8_quantization",
    "events_salted_rollup",
    "events_zorder_keys",
    "events_scd2_intervals",
    "events_column_profile",
    "events_retention_cohorts",
    "events_salted_hot_join",
    "events_rolling_7d_actives",
    "events_partition_pruned_rollup",
    "events_compaction_roundtrip",
    "events_rank_battery",
    "events_cms_user_counts",
    "events_activity_bitmaps",
]


def _ordered(names: list[str]) -> list[str]:
    first = [n for n in _CHECK_FIRST if n in names]
    return first + [n for n in names if n not in set(first)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    return {n: ORACLES[n] for n in _ordered(list(ORACLES))}
