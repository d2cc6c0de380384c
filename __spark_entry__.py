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
# a stale one. Round 15's stale cohort is the ledger-exact 94 queries
# whose latest verdict is <= round 11 (newest committed artifact is
# r14, so r11 == newest-3; union of CORRECTNESS_r1..r14): the 44
# r10-verdict queries (two rounds past the window, VERDICT r14 item 1
# names them) go FIRST, then the 50 r11-verdict queries oldest-first
# (alphabetical within the uniform-age cohort). New round-15 queries
# (never checked) lead, per priority (1) — seven of them this round,
# so 7 + 94 stale > the ~50 budget: the whole r11 cohort and the
# youngest one or two r10 entries spill to round 16 by design
# (ordering keeps every spill at the stale set's youngest end). Exact list matches
# tests/test_entry_contract.py's recomputation; regenerate with
# scripts/rotate_check_first.py.
_CHECK_FIRST = [
    # -- new round-15 queries: no driver verdict yet
    "pipeline_unified_erasure_ledger",  # unified erasure capstone: one GDPR manifest, every index family
    "streaming_minhash_forget_ingest",  # mid-stream forget, docs binding (two-store rewrite)
    "streaming_phash_forget_ingest",    # mid-stream forget, image binding
    "streaming_video_offset_forget_ingest",  # mid-stream forget, video binding
    "streaming_minhash_ttl_ingest",     # retention/TTL horizon on a live fold
    "imgs_phash_forget_probe",          # image binding of the batch forget family
    "streaming_minhash_ttl_compact_ingest",  # the compact+expire straddle over-approximation
    "emb_semantic_retrain_compaction",  # executable centroid retrain at the compaction seam
    "pipeline_mixed_ingest_ledger",     # cross-modality capstone: mixed delta, one routed ledger
    "streaming_semantic_retrain_ingest",  # mid-stream forget + centroid retrain in a live fold
    "emb_retrain_drift_trigger",        # WHEN to retrain: inertia-based decision arithmetic
    "docs_token_budget_waterfill",      # mixture planning: exact weighted water-filling
    "docs_mixture_realized",            # the plan executed: rates -> per-doc md5 draws
    "emb_pq_forget_recode",             # PQ forget-compliance: codebook rebuild + store re-encode
    # -- stale: latest driver verdict is round 10 (all 44 lead; two
    # -- rounds past the window)
    "docs_jaccard_hashed_shingles",
    "docs_leakage_safe_split",
    "docs_length_histogram",
    "docs_levenshtein_sample_pairs",
    "docs_pack_sequences",
    "docs_pii_scrub_stats",
    "docs_repetition_scores",
    "docs_source_quota_cap",
    "docs_top_terms",
    "docs_train_test_split",
    "docs_weighted_sample_stats",
    "emb_dup_clusters",
    "emb_int8_quantization",
    "emb_ivf_inertia",
    "emb_ivf_probe_topk",
    "emb_pq_adc_topk",
    "emb_semantic_incremental_ingest",
    "events_column_profile",
    "events_compaction_roundtrip",
    "events_hourly_daily_rollup",
    "events_kmv_distinct_users",
    "events_mrl_quantile_audit",
    "events_partition_pruned_rollup",
    "events_rank_battery",
    "events_retention_cohorts",
    "events_rolling_7d_actives",
    "events_salted_hot_join",
    "events_salted_rollup",
    "events_scd2_intervals",
    "events_state_as_of",
    "events_value_quantiles",
    "events_zorder_keys",
    "flagship_owned_orders",
    "imgs_decode_resize_bytes",
    "imgs_dedup_new",
    "imgs_format_bytes",
    "imgs_jpeg_pixel_stats",
    "imgs_keep_latest",
    "imgs_point_read_fallback",
    "imgs_resize_fanout_stats",
    "imgs_webp_pixel_stats",
    "metadata_fetch_stage",
    "metadata_refresh_schedule",
    "streaming_semantic_ingest",
    # -- stale: latest driver verdict is round 11 (50; the tail past
    # -- the ~50-slot window spills to round 16 by design)
    "agg_all_orders",
    "av_audio_fp_incremental_ingest",
    "av_audio_fp_near_dups",
    "av_video_phash_incremental_ingest",
    "av_video_phash_near_dups",
    "av_wav_roundtrip_stats",
    "bucketed_cust_order_rollup",
    "cube_orders_status_priority",
    "datetime_function_battery",
    "docs_collection_fn_battery",
    "docs_corpus_ingest_contained",
    "docs_corpus_snapshot_diff",
    "docs_cross_source_dup_matrix",
    "docs_hybrid_rrf_retrieval",
    "docs_quality_weighted_sample",
    "docs_semantic_dedup",
    "emb_semantic_decontaminate",
    "events_activity_bitmaps",
    "events_cms_user_counts",
    "events_mg_salted_hot_join",
    "events_session_concurrency",
    "events_snapshot_diff",
    "events_stalest_topk",
    "events_value_robust_stats",
    "flagship_nft_offers_nested",
    "imgs_phash_incremental_ingest",
    "imgs_phash_near_dups",
    "marketplace_multicoin_totals",
    "marketplace_stream_ft_state",
    "metadata_scd1_merge",
    "metadata_task_priority_order",
    "metadata_validate",
    "nation_trade_pagerank",
    "orders_daily_moving_stats",
    "orders_unpivot_measures",
    "pagination_page3",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q20_parts_suppliers_semi",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "streaming_audio_fp_ingest",
    "streaming_phash_ingest",
    "streaming_video_phash_ingest",
    # -- code-touched this round but verified r14 (trailing overflow,
    # -- policy priority 4): forget_with_df gained the df>0 filter,
    # -- calibrate_cap gained the band guard, and the video cap fold
    # -- reads current_cap(). (emb_pq_adc_topk and
    # -- docs_corpus_ingest_delta were also code-touched but are
    # -- already in the stale r10 cohort above.)
    "av_audio_offset_forget_probe",
    "docs_posting_forget_reprobe",
    "av_audio_fp_cap_calibration",
    "streaming_video_offset_cap_compaction",
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
