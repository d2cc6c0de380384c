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
# order, so ordering is evidence policy (r5 rotation, per VERDICT r4
# item 5): (1) queries with no driver verdict yet lead, (2) queries
# whose code changed this round re-verify next, (3) the ~50-query
# window backfills with the LONGEST-UNCHECKED greens — every r1-last-
# checked query cycles through this round, r2/r3 stale next rounds —
# so every registry query gets a fresh driver verdict within ~3 rounds.
_CHECK_FIRST = [
    # -- new in round 5: no driver verdict yet
    "imgs_webp_pixel_stats",
    "av_audio_g711_decode_stats",
    "av_audio_adpcm_decode_stats",
    "docs_duplicated_ngram_spans",
    "orders_bloom_prejoin_prune",
    "orders_window_function_battery",
    "events_gap_fill_locf",
    "events_retention_rates",
    "docs_minhash_lsh_audit",
    "docs_lang_temperature_mixture",
    "orders_multiformat_roundtrip",
    "orders_constraint_checks",
    "orders_set_ops_battery",
    "streaming_click_purchase_left_join",
    "docs_tfidf_knn_communities",
    "av_audio_flac_decode_stats",
    "orders_schema_evolution_read",
    "orders_incremental_join_view",
    "orders_pivot_unpivot_roundtrip",
    "imgs_jpeg_pixel_stats",
    "imgs_gif_pixel_stats",
    "events_mrl_quantile_audit",
    "av_video_mjpeg_frame_stats",
    "imgs_tiff_pixel_stats",
    # -- code touched in round 5 (advisor fixes): re-verify
    "docs_quality_composite_filter",
    "events_value_histogram_quantiles",
    "orders_jdbc_roundtrip",
    "docs_dup_clusters_distributed",
    "docs_dup_clusters",
    "av_video_real_frame_stats",
    "streaming_latest_state",
    # -- stale: last driver check was round 1 (all 37 cycle now)
    "av_wav_roundtrip_stats",
    "av_video_frame_digests",
    "docs_exact_dedup",
    "docs_quality_scores",
    "docs_langid_confusion",
    "docs_fingerprint_clusters",
    "docs_jaccard_pairs",
    "docs_minhash_near_dups",
    "docs_simhash_near_dups",
    "docs_chunk_windows",
    "docs_decontaminate",
    "emb_cosine_topk",
    "emb_lsh_topk",
    "emb_ivf_cells",
    "emb_label_stats",
    "emb_cosine_near_dups",
    "events_latest_state",
    "events_stalest_topk",
    "events_daily_rollup",
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
    # -- stale: last checked round 2 (head of next rotation; the rest
    #    of r2/r3 cycle in rounds 6-7)
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
