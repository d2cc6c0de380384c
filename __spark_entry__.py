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
# LONGEST-UNCHECKED greens, (4) queries touched this round but already
# verified LAST round trail as overflow — if the ~50-slot window cuts
# anything, it cuts re-verification of a recent-fresh verdict, never
# a stale one. Round 12's stale cohort is the ledger-exact 65 queries
# whose latest verdict is <= round 8 (newest committed artifact is
# r11, so r8 == newest-3; union of CORRECTNESS_r1..r11): the 16
# r7-verdict queries the r11 window cut (VERDICT r11 item 2 names
# them: q4_order_priority_exists … topk_orders_per_segment) go FIRST,
# then the 49 r8-verdict queries — the marketplace state family
# (batch + stream), the events sketch/session/funnel family, TPC-H
# q11/q12/q16/q21/q22, the docs BM25/winnowing/simhash trio, and the
# click-purchase streaming joins. New round-12 queries (never
# checked) lead, per priority (1). 65 stale + new > the ~50 budget:
# the r8 tail spills to round 13 by design (oldest-first ordering
# keeps the spill at the cohort's youngest end). Exact list matches
# tests/test_entry_contract.py's recomputation; regenerate with
# scripts/rotate_check_first.py.
_CHECK_FIRST = [
    # -- new in round 12: no driver verdict yet
    "av_audio_fp_offset_near_dups",     # H-K subfingerprint + relative-offset vote
    "av_video_phash_offset_near_dups",  # head-drop-tolerant per-frame offset vote
    "imgs_corpus_build",                # image corpus-build capstone rollup
    "av_audio_fp_offset_ingest",        # offset-tolerant probe vs stored lookup table
    "imgs_corpus_ingest_triage",        # image daily-delta triage vs stored indexes
    "av_video_phash_offset_ingest",     # head-drop-tolerant probe vs per-frame index
    "streaming_audio_offset_ingest",    # H-K lookup table as stream state
    "docs_containment_capped_ingest",   # stop-gram cap as a map-side index filter
    "streaming_video_offset_ingest",    # per-frame index + offset vote as stream state
    "av_audio_snippet_search",          # snippet-to-clip retrieval via the lookup table
    "av_video_snippet_search",          # frame-excerpt-to-video retrieval + offset
    # -- stale r7 verdicts (cut from the r11 window): lead the round
    "q4_order_priority_exists",
    "q5_region_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation",
    "reconcile_daily_counts",
    "rollup_region_nation",
    "scalar_function_battery",
    "setops_customer_segments",
    "sql_big_spenders",
    "sql_correlated_outliers",
    "streaming_daily_rollup_incremental",
    "streaming_session_windows",
    "streaming_user_accumulator",
    "topk_orders_per_segment",
    # -- stale: latest driver verdict is round 8 (all 49 cycle now)
    "av_audio_chunk_energy",
    "av_audio_chunking",
    "customer_forget_cascade",
    "docs_bm25_topk",
    "docs_corpus_build",
    "docs_fingerprint_winnowing",
    "docs_simhash_rotation_near_dups",
    "docs_token_stats",
    "emb_ivf_recall_audit",
    "events_asof_last_click",
    "events_daily_type_pivot",
    "events_error_purchase_proximity",
    "events_foreign_errors_in_sessions",
    "events_funnel_signup_purchase",
    "events_hll_distinct_users",
    "events_hll_union_merge",
    "events_interval_frame_sums",
    "events_json_extract",
    "events_kmv_set_algebra",
    "events_range_hypertable_rollup",
    "events_session_funnel_windows",
    "events_sessionization",
    "filters_combinators",
    "imgs_real_pixel_stats",
    "marketplace_audit_counts",
    "marketplace_bids_surviving",
    "marketplace_ft_state",
    "marketplace_listed_value",
    "marketplace_nfts_state",
    "marketplace_offers_surviving",
    "marketplace_stream_bids_surviving",
    "marketplace_stream_nfts_state",
    "marketplace_stream_offers_surviving",
    "marketplace_stream_users_state",
    "marketplace_users_state",
    "nation_trade_triangles",
    "orders_incremental_cdc_merge",
    "point_lookup_composite",
    "q11_important_stock",
    "q12_shipmode_priority_counts",
    "q16_supplier_part_counts",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "semi_anti_customers",
    "streaming_click_purchase_join",
    "streaming_click_purchase_left_join",
    "streaming_daily_rollup",
    "streaming_dedup_exactly_once",
    "streaming_dim_enrichment",
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
