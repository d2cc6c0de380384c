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
# a stale one. Round 10's stale cohort is the ledger-exact 48 queries
# whose latest verdict is round 6 (newest committed artifact is r9, so
# r6 == newest-3; union of CORRECTNESS_r1..r9): flac audio, 11 docs_*
# text-analysis/pack/sample queries, 5 emb_* quantization/IVF queries,
# 15 events_* profile/sketch/salt/rollup queries, the flagship, 8
# imgs_* queries, 5 metadata_* queries, pagination, and TPC-H q1 —
# exact list below (matches tests/test_entry_contract.py's
# recomputation; regenerate with scripts/rotate_check_first.py).
_CHECK_FIRST = [
    # -- new in round 10: no driver verdict yet
    "emb_semantic_incremental_ingest",  # batch-vs-corpus IVF cell probe, no re-assign
    "streaming_semantic_ingest",        # cell index as accumulating stream state
    "docs_source_quota_cap",            # per-domain quota cap, md5-deterministic
    "docs_containment_near_dups",       # Broder asymmetric containment dedup
    "docs_leakage_safe_split",          # cluster-rep split, no straddling dups
    "docs_dedup_detector_agreement",    # minhash/simhash/containment pair-set audit
    "docs_corpus_ingest_delta",         # daily-delta triage vs stored corpus indexes
    # -- stale: latest driver verdict is round 6 (all 48 cycle now)
    "av_audio_flac_decode_stats",
    "docs_bigram_lm_scores",
    "docs_heavy_hitters_mg",
    "docs_jaccard_hashed_shingles",
    "docs_length_histogram",
    "docs_levenshtein_sample_pairs",
    "docs_pack_sequences",
    "docs_pii_scrub_stats",
    "docs_repetition_scores",
    "docs_top_terms",
    "docs_train_test_split",
    "docs_weighted_sample_stats",
    "emb_dup_clusters",
    "emb_int8_quantization",
    "emb_ivf_inertia",
    "emb_ivf_probe_topk",
    "emb_pq_adc_topk",
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
    "metadata_scd1_merge",
    "metadata_task_priority_order",
    "metadata_validate",
    "pagination_page3",
    "q1_pricing_summary",
    # -- touched in round 10 (candidate-id pushdown in the ingest
    #    verify stages), verified green r9: overflow tail
    "docs_minhash_incremental_ingest",
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
