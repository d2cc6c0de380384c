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
# a stale one. Round 13's stale cohort is the ledger-exact 76 queries
# whose latest verdict is <= round 9 (newest committed artifact is
# r12, so r9 == newest-3; union of CORRECTNESS_r1..r12): the 26
# r8-verdict queries the r12 window cut (VERDICT r12 item 2 names
# them: the marketplace batch/stream state family, TPC-H
# q11/q12/q16/q21/q22, imgs_real_pixel_stats, nation_trade_triangles,
# the CDC merge, point_lookup_composite, semi_anti_customers, and the
# five r8 streaming queries) go FIRST, then the 50 r9-verdict queries
# oldest-first (alphabetical within the uniform-age cohort). New
# round-13 queries (never checked) lead, per priority (1). 76 stale +
# new > the ~50 budget: the r9 tail spills to round 14 by design
# (ordering keeps the spill at the cohort's youngest end). Exact list
# matches tests/test_entry_contract.py's recomputation; regenerate
# with scripts/rotate_check_first.py.
_CHECK_FIRST = [
    # -- new round-13 queries: no driver verdict yet
    "av_audio_fp_offset_capped_ingest",   # hot-word cap: silence-padded corpus
    "av_video_phash_offset_capped_ingest",  # hot-block cap: black-frame corpus
    "av_audio_corpus_build",            # audio corpus capstone w/ offset screen
    "av_video_corpus_build",            # video corpus capstone w/ offset screen
    "av_audio_corpus_ingest_triage",    # audio daily-delta triage vs stored indexes
    "av_video_corpus_ingest_triage",    # video daily-delta triage vs stored indexes
    "av_video_phash_offset_banded_near_dups",  # time-banded offset contract
    "av_audio_fp_offset_entropy_ingest",  # stateless low-entropy guard (stream form)
    "imgs_phash_capped_ingest",           # hot-block cap on the shared simhash probe
    "streaming_audio_offset_entropy_ingest",  # stream fold + stateless guard e2e
    # -- stale: latest driver verdict is round 8 (all 26 lead)
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
    # -- stale: latest driver verdict is round 9 (50; the tail
    # -- past the ~50-slot window spills to round 14 by design)
    "av_audio_adpcm_decode_stats",
    "av_audio_g711_decode_stats",
    "av_video_frame_digests",
    "av_video_mjpeg_frame_stats",
    "av_video_real_frame_stats",
    "docs_chunk_windows",
    "docs_decontaminate",
    "docs_dup_clusters",
    "docs_dup_clusters_distributed",
    "docs_duplicated_ngram_spans",
    "docs_exact_dedup",
    "docs_fingerprint_clusters",
    "docs_jaccard_pairs",
    "docs_lang_temperature_mixture",
    "docs_langid_confusion",
    "docs_minhash_incremental_ingest",
    "docs_minhash_lsh_audit",
    "docs_minhash_near_dups",
    "docs_pack_training_order",
    "docs_quality_composite_filter",
    "docs_quality_scores",
    "docs_semantic_dedup_skew_split",
    "docs_simhash_near_dups",
    "docs_tfidf_knn_communities",
    "emb_cosine_near_dups",
    "emb_cosine_topk",
    "emb_ivf_cells",
    "emb_label_stats",
    "emb_lsh_topk",
    "emb_semantic_trained_prune",
    "emb_trained_recall_audit",
    "events_daily_rollup",
    "events_gap_fill_locf",
    "events_latest_state",
    "events_retention_rates",
    "events_value_histogram_quantiles",
    "imgs_gif_pixel_stats",
    "imgs_jpeg_reencode_stats",
    "imgs_tiff_pixel_stats",
    "orders_bloom_prejoin_prune",
    "orders_constraint_checks",
    "orders_incremental_join_view",
    "orders_jdbc_roundtrip",
    "orders_multiformat_roundtrip",
    "orders_pivot_unpivot_roundtrip",
    "orders_schema_evolution_read",
    "orders_set_ops_battery",
    "orders_window_function_battery",
    "streaming_latest_state",
    "streaming_minhash_ingest",
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
