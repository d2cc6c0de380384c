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
# LONGEST-UNCHECKED greens. Round 7 adds 2 queries and touches 2
# non-stale code paths, so the remaining ~46 slots take the ENTIRE
# stale backlog — the ledger-exact 21 r2-last-checked + 25 r3-last-
# checked queries (union of CORRECTNESS_r1..r6 latest rounds). After
# this window lands green, no query's driver verdict predates r4 and
# the rotation has fully cycled once.
_CHECK_FIRST = [
    # -- new in round 7: no driver verdict yet
    "docs_semantic_dedup",           # SemDeDup-shape IVF-cell cosine prune
    "events_mg_salted_hot_join",     # MG-discovered keys drive targeted salting
    # -- code touched in round 7: re-verify
    "events_stalest_topk",           # adaptive-nbins + NaN-bin rank rewrite
    "marketplace_stream_nfts_state", # parallel store commits in the fold (also r2-stale)
    # -- stale: last driver check was round 2 (all 21 cycle now)
    "bucketed_cust_order_rollup",
    "datetime_function_battery",
    "events_activity_bitmaps",
    "events_cms_user_counts",
    "events_session_concurrency",
    "events_snapshot_diff",
    "events_value_robust_stats",
    "flagship_nft_offers_nested",
    "marketplace_multicoin_totals",
    "marketplace_stream_bids_surviving",
    "marketplace_stream_ft_state",
    "marketplace_stream_offers_surviving",
    "marketplace_stream_users_state",
    "nation_trade_pagerank",
    "orders_unpivot_measures",
    "q13_customer_distribution",
    "reconcile_daily_counts",
    "sql_correlated_outliers",
    "streaming_daily_rollup_incremental",
    "streaming_session_windows",
    # -- stale: last driver check was round 3 (all 25 cycle now)
    "agg_all_orders",
    "cube_orders_status_priority",
    "docs_collection_fn_battery",
    "orders_daily_moving_stats",
    "q10_returned_items",
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
    "rollup_region_nation",
    "scalar_function_battery",
    "setops_customer_segments",
    "sql_big_spenders",
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
