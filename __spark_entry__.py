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
# a stale one. Round 11's stale cohort is the ledger-exact 51 queries
# whose latest verdict is <= round 7 (newest committed artifact is
# r10, so r7 == newest-3; union of CORRECTNESS_r1..r10): the 5 r6
# leftovers the r10 window cut (VERDICT r10 item 2) go FIRST, then the
# 46 r7-verdict queries — TPC-H q1-q20, the SQL/scalar/datetime
# batteries, rollup/cube/setops/unpivot, the salted/sketch events
# queries, pagerank, 3 incremental-streaming queries, wav roundtrip,
# and the nested flagship. Round 11 also shipped NEW queries (never
# checked — they lead, per priority (1)): with ~10 new + 51 stale
# against the driver's ~50 budget, the r7 tail spills to round 12 by
# design (oldest-first ordering keeps the spill at the cohort's
# youngest end). Exact list matches tests/test_entry_contract.py's
# recomputation; regenerate with scripts/rotate_check_first.py.
_CHECK_FIRST = [
    # -- new in round 11: no driver verdict yet
    "docs_corpus_ingest_contained",     # triage + incremental Broder containment arm
    "imgs_phash_near_dups",             # perceptual dHash near-dup, pigeonhole-blocked
    "imgs_phash_incremental_ingest",    # dHash ingest probe vs stored fingerprint index
    "docs_hybrid_rrf_retrieval",        # BM25 + cosine reciprocal-rank fusion
    "emb_semantic_decontaminate",       # eval-set broadcast screen of the train corpus
    "docs_quality_weighted_sample",     # per-doc Bernoulli keep at p=quality
    "docs_corpus_snapshot_diff",        # added/removed/changed audit between versions
    "docs_cross_source_dup_matrix",     # which sources duplicate each other
    "streaming_phash_ingest",           # dHash fingerprint index as stream state
    "av_audio_fp_near_dups",            # energy-difference audio fingerprint dedup
    "av_video_phash_near_dups",         # per-frame dHash voting over real AVI decode
    "av_audio_fp_incremental_ingest",   # audio fingerprint probe vs stored index
    "av_video_phash_incremental_ingest", # per-frame video probe vs stored index
    "streaming_audio_fp_ingest",        # audio fingerprint index as stream state
    "streaming_video_phash_ingest",     # per-frame video index as stream state
    # -- stale r6 verdicts (cut from the r10 window): lead the round
    "metadata_scd1_merge",
    "metadata_task_priority_order",
    "metadata_validate",
    "pagination_page3",
    "q1_pricing_summary",
    # -- stale: latest driver verdict is round 7 (all 46 cycle now)
    "agg_all_orders",
    "av_wav_roundtrip_stats",
    "bucketed_cust_order_rollup",
    "cube_orders_status_priority",
    "datetime_function_battery",
    "docs_collection_fn_battery",
    "docs_semantic_dedup",
    "events_activity_bitmaps",
    "events_cms_user_counts",
    "events_mg_salted_hot_join",
    "events_session_concurrency",
    "events_snapshot_diff",
    "events_stalest_topk",
    "events_value_robust_stats",
    "flagship_nft_offers_nested",
    "marketplace_multicoin_totals",
    "marketplace_stream_ft_state",
    "nation_trade_pagerank",
    "orders_daily_moving_stats",
    "orders_unpivot_measures",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_parts_suppliers_semi",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
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
