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
# a stale one. Round 14's stale cohort is the ledger-exact 86 queries
# whose latest verdict is <= round 10 (newest committed artifact is
# r13, so r10 == newest-3; union of CORRECTNESS_r1..r13): the 36
# r9-verdict queries (two rounds past the window, VERDICT r13 item 1
# names them) go FIRST, then the 50 r10-verdict queries oldest-first
# (alphabetical within the uniform-age cohort). New round-14 queries
# (never checked) lead, per priority (1). 86 stale + new > the ~50
# budget: the r10 tail spills to round 15 by design (ordering keeps
# the spill at the cohort's youngest end). Exact list matches
# tests/test_entry_contract.py's recomputation; regenerate with
# scripts/rotate_check_first.py.
_CHECK_FIRST = [
    # -- new round-14 queries: no driver verdict yet
    "av_audio_offset_forget_probe",     # H-K table forget + df decrement + ghost probe
    "av_video_offset_forget_probe",     # frame-index forget + stats shrink + capped probe
    "docs_posting_forget_reprobe",      # posting-index forget, df load-bearing under cap
    "av_audio_fp_cap_calibration",      # executable cap calibration + coverage report
    "streaming_audio_offset_cap_compaction",  # df-cap composed with the fold via compaction
    "emb_semantic_forget_reprobe",      # IVF-cell forget, centroid semantics stated
    "streaming_audio_offset_forget_ingest",  # mid-stream forget via compact(transform)
    "streaming_video_offset_cap_compaction",  # video df-cap composed with the fold
    # -- stale: latest driver verdict is round 9 (all 36 lead)
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
    # -- stale: latest driver verdict is round 10 (50; the tail
    # -- past the ~50-slot window spills to round 15 by design)
    "av_audio_flac_decode_stats",
    "docs_bigram_lm_scores",
    "docs_containment_near_dups",
    "docs_corpus_ingest_delta",
    "docs_dedup_detector_agreement",
    "docs_heavy_hitters_mg",
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
