"""Regenerate PLANS.md: executed physical plans for headline queries.

The claims the repo makes about scale (filters reach scans, dimensions
broadcast, top-k compiles to TakeOrderedAndProject, expressions stay in
whole-stage codegen) are plan properties — this captures them as
reviewable evidence. Run after plan-affecting changes:

    python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dwh_spark.plans.all  # noqa: F401,E402
from dwh_spark.plans.registry import QUERIES  # noqa: E402
from dwh_spark.session import get_spark  # noqa: E402

# query -> the plan property the excerpt demonstrates
HEADLINERS = {
    "q1_pricing_summary": "partial (map-side) HashAggregate before the exchange; "
    "scan reads only the 7 referenced lineitem columns",
    "q3_shipping_priority": "dimension side broadcast; date filters pushed to "
    "the parquet scan (PushedFilters)",
    "flagship_owned_orders": "single shuffle for join+group (same key); "
    "no fact-side broadcast",
    "events_stalest_topk": "equi-depth-binned distributed rank "
    "(operators/ranks.py): per-bin windows, no global sort, no "
    "k-proportional driver merge",
    "pagination_page3": "TakeOrderedAndProject(limit=offset+limit) pre-cut; "
    "the row_number window ranks only the 60 survivors",
    "docs_heavy_hitters_mg": "Misra-Gries summaries: one hash repartition + "
    "MapInPandas; counter union is a tiny groupBy; exact counts exist only "
    "as the audit arm",
    "events_sessionization": "one shuffle on user_id serves both the lag window "
    "and the session rollup",
    "events_state_as_of": "time-travel predicate pushed into the scan",
    "docs_jaccard_hashed_shingles": "self-join keyed on xxhash64 longs; "
    "ReuseExchange computes the inverted index once",
    "docs_minhash_near_dups": "banded LSH equi-join — candidate pairs only, "
    "never all-pairs",
    "emb_cosine_topk": "query side broadcast; per-partition partial top-k "
    "before the final window",
    "events_session_concurrency": "two-phase prefix sum: fact-scale window is "
    "partitioned by day; only the per-day rollup sees a global order",
    "marketplace_nfts_state": "fixture LocalTableScan + set-oriented "
    "last-writer-wins replay, no iterative driver loop",
    "docs_pack_sequences": "per-language window (sharded prefix sum), "
    "no global sort",
    "docs_corpus_build": "quality filter precedes every exchange; dedup "
    "semi-join + semantic-cell prune (clamped centroid broadcast, "
    "within-cell equi-join, anti-join on pruned ids) + shard window + "
    "rollup move only surviving rows",
    "emb_ivf_probe_topk": "probe list broadcast; corpus scanned once for "
    "cell assignment, equi-joined on cell — no all-pairs stage",
    "events_salted_rollup": "two-phase salted aggregate: hot key spread "
    "over 16 partials, then a tiny combine",
    "bucketed_cust_order_rollup": "bucketed(16) both sides — SortMergeJoin "
    "with NO exchange on either input; only the rollup shuffles",
    "q21_waiting_suppliers": "one orderkey shuffle reused by both the EXISTS "
    "semi and the NOT-EXISTS anti arm; supplier names broadcast",
    "q11_important_stock": "scalar global total as a 1-row broadcast; "
    "exact-decimal threshold compare, no second fact scan",
    "events_range_hypertable_rollup": "14-day range predicate pushed to the "
    "scan; daily layer aggregates hourly partials only",
    "docs_fingerprint_winnowing": "explicit 32-way spread of the single-split "
    "fixture; one window sort serves the per-window argmin",
    "docs_bm25_topk": "corpus stats as 1-row broadcast; term-filtered explode "
    "never shuffles the full token stream",
    "nation_trade_triangles": "canonical a<b edge list persisted once; "
    "two-hop join probes the closing edge (compact-forward shape)",
    "docs_simhash_rotation_near_dups": "per-block candidate tables equi-join "
    "on (block, value) — pigeonhole recall with no all-pairs stage",
    "docs_duplicated_ngram_spans": "inverted index: ONE hash shuffle for the "
    "gram aggregate; the dup-hash set broadcasts back so the gram stream "
    "never shuffles for the probe join",
    "orders_bloom_prejoin_prune": "16-row bit_or sketch broadcast; probe side "
    "checks membership map-side with zero shuffles before the audit rollup",
    "events_gap_fill_locf": "per-user-span grid explode (no cross join); one "
    "user_id shuffle serves both fill windows",
    "orders_window_function_battery": "six analytic functions in one Window "
    "operator over a single (priority, price, key) sort",
    "docs_semantic_dedup": "SemDeDup cells: centroid broadcast cross-score "
    "for assignment, then a within-cell EQUI-join for pairs — the pair stage "
    "is hash-partitioned on cell, never all-pairs",
    "events_mg_salted_hot_join": "MG-discovered hot keys as a literal IN "
    "list: only hot fact rows fan out, dimension explode is per-key "
    "conditional — cold keys join once",
    "emb_semantic_trained_prune": "trained index: n_cells clamped to "
    "<=65536 so the centroid broadcast is bounded (~16 MB); seeds + Lloyd "
    "means + assignment all oracle-re-derivable; prune is a within-cell "
    "equi-join, never all-pairs",
    "docs_semantic_dedup_skew_split": "MG-discovered hot cells join on "
    "(cell, block_a, block_b) — a mega-cell's pairs spread over "
    "n_blocks^2 even buckets; cold cells keep the plain cell equi-join",
    "docs_minhash_incremental_ingest": "asymmetric band probe: the new "
    "batch's bands equi-join the corpus band index — no corpus "
    "self-join; batch side broadcast into the Jaccard verification",
    "emb_trained_recall_audit": "trained centroid frame broadcast to "
    "both the assignment and the probe ranking; corpus scanned once "
    "per ranking, no all-pairs stage",
    "docs_pack_training_order": "seeded global shuffle without a global "
    "sort: md5 keys ranked by equi-depth bins + per-bin windows "
    "(operators/ranks.py) over the pack table",
    "streaming_minhash_ingest": "drained read-back of the versioned "
    "batch=* result dirs (the per-batch fold itself runs inside "
    "foreachBatch: O(batch) band-index appends, broadcast candidate "
    "probe, candidate-only shingle verify — see streaming/docs_ingest.py)",
    "emb_semantic_incremental_ingest": "ingest-time semantic screen: the "
    "batch assigns itself against the broadcast centroids and is broadcast "
    "into the within-cell index probe — the corpus is scanned once, never "
    "re-assigned, never shuffled",
    "docs_source_quota_cap": "per-domain cap: one hash shuffle on source "
    "feeds the md5-order window; kept set joined back for the audit rollup",
    "docs_containment_near_dups": "asymmetric containment pairs: inverted "
    "index keyed on xxhash64 longs; at this SF AQE broadcasts one index copy "
    "(BroadcastHashJoin BuildRight below — the two FileScan+Generate "
    "subtrees are the same subplan computed twice, cheap at this size); "
    "at scale the same plan becomes an SMJ whose identical sides reuse "
    "one exchange",
    "docs_corpus_ingest_delta": "delta triage: codegen quality gate, hash-"
    "index equi-join, incremental band probe with candidate-only shingle "
    "verify — the corpus side contributes only its stored indexes",
    "docs_dedup_detector_agreement": "three bucket-bounded detectors "
    "(MinHash bands, SimHash blocks, containment posting join) feed ONE "
    "pair-keyed agreement aggregate; no all-pairs stage anywhere — the "
    "cost IS the detectors, the overlap matrix is a single extra groupBy",
    "streaming_semantic_ingest": "drained read-back of the versioned "
    "batch=* result dirs (per-batch fold inside foreachBatch: assign vs "
    "broadcast centroids, batch BROADCAST into the within-cell probe, "
    "probed-cell IN-list pushed into the stored-index scan — see "
    "streaming/emb_ingest.py)",
    "docs_leakage_safe_split": "split membership hashes the dup-CLUSTER "
    "representative (connected components over band pairs), so dup "
    "families never straddle train/eval; the cluster map is a broadcast "
    "join back onto the corpus",
    "docs_corpus_ingest_contained": "triage + incremental Broder screen: "
    "the batch's postings BROADCAST into the stored shingle posting "
    "index (O(batch × collisions)); the containment decision composes "
    "with the exact/near/quality arms without re-scanning the corpus",
    "imgs_phash_near_dups": "perceptual 56-bit dHash over REAL decoded "
    "pixels, hamming-bucketed via 14-bit pigeonhole blocks — candidate "
    "pairs come from per-block equi-joins, never an all-pairs image "
    "compare",
    "imgs_phash_incremental_ingest": "perceptual ingest probe: only the "
    "batch is decoded; its blocks BROADCAST into the stored fingerprint "
    "index (BroadcastHashJoin, index = stream side, never shuffled)",
    "docs_hybrid_rrf_retrieval": "rank-only fusion of two "
    "TakeOrderedAndProject top-k arms — the full-outer fusion join sees "
    "<= 40 rows at any corpus size",
    "emb_semantic_decontaminate": "eval set broadcast, train corpus "
    "scanned ONCE with map-side cosine — zero exchanges anywhere in the "
    "plan",
    "docs_quality_weighted_sample": "per-row Bernoulli keep at p=quality: "
    "md5-uniform draw vs quality score, all inside whole-stage codegen — "
    "the only exchange is the audit rollup",
    "docs_corpus_snapshot_diff": "md5 digests projected BEFORE the "
    "full-outer join, so only (id, source, 32-byte digest) crosses the "
    "shuffle — never the document bodies",
    "docs_cross_source_dup_matrix": "the near-dup pair frame (tiny vs "
    "corpus) broadcast into two corpus scans for source attribution — "
    "documents never shuffled",
    "av_audio_fp_near_dups": "56-bit energy-difference audio fingerprint "
    "(exact int64, gain-invariant) paired by the pigeonhole blocked "
    "equi-join — never all-pairs",
    "av_video_phash_near_dups": "per-frame dHash voting: blocked join "
    "keyed per (frame_ix, block) so candidates are temporally aligned "
    "inside the join; blobs cross to Python once",
    "av_audio_fp_incremental_ingest": "audio ingest probe: batch-only "
    "decode, its fingerprint blocks BROADCAST into the stored index "
    "(BroadcastHashJoin, index = stream side, never shuffled) — the "
    "asymmetric-probe shape shared by every perceptual ingest",
    "av_video_phash_incremental_ingest": "video ingest probe: batch-only "
    "decode, per-frame blocks BROADCAST into the stored fingerprint "
    "index (BroadcastHashJoin, index = stream side)",
    "docs_containment_capped_ingest": "stop-gram cap as a map-side "
    "filter on the stored df column — no corpus-side aggregate in the "
    "probe; batch postings BROADCAST into the capped index",
    "imgs_corpus_ingest_triage": "image daily-delta triage: decode/"
    "contrast gates per-row, batch hash set and fingerprint blocks "
    "BROADCAST into the streamed stored indexes, probes gated "
    "cheapest-first over shrinking inputs",
    "av_audio_fp_offset_ingest": "offset-tolerant audio ingest: batch "
    "subfingerprints BROADCAST into the stored H-K lookup table, "
    "relative-offset vote over matches only",
    "av_video_phash_offset_ingest": "head-drop-tolerant video ingest: "
    "frame_ix dropped from the join key, batch frames BROADCAST, "
    "pairs vote on the relative frame offset",
    "streaming_audio_offset_ingest": "drained read-back (the H-K "
    "subfingerprint lookup table as stream state — pairs-form "
    "within-batch vote, stored table probed broadcast-side, O(batch "
    "positions) appends; all bindings share _run_indexed_ingest)",
    "streaming_video_offset_ingest": "drained read-back (per-frame "
    "index as stream state with the RELATIVE-OFFSET vote probe — "
    "head-dropped copies keep their votes across batches)",
    "imgs_corpus_build": "image corpus-build capstone: one Arrow "
    "feature pass (blobs cross once), md5 groupBy exact arm, blocked "
    "perceptual arm over survivors only, codegen hash split — the "
    "rollup pins stage membership via id sums",
    "av_audio_snippet_search": "snippet-to-clip retrieval (song-ID "
    "shape): tiny snippet word set BROADCAST into the stored lookup "
    "table, offset vote returns WHERE in the clip the snippet sits",
    "av_video_snippet_search": "frame-excerpt retrieval (scene-ID "
    "shape): excerpt frames BROADCAST into the stored per-frame "
    "index, relative-offset vote returns (video, frame offset)",
    "av_audio_fp_offset_near_dups": "Haitsma-Kalker block matching: "
    "exact-equality equi-join on 32-bit subfingerprints (the lookup "
    "table as a join; fan-out = positions/2^32) + a relative-offset "
    "vote — trimmed copies match at offset = windows trimmed",
    "av_video_phash_offset_near_dups": "relative-offset frame voting: "
    "the blocked join drops the frame_ix key so head-dropped copies "
    "keep their votes; pairs vote on (frame_ix_a - frame_ix_b)",
    "streaming_phash_ingest": "drained read-back of the versioned "
    "batch=* result dirs (per-batch fold inside foreachBatch: one decode "
    "pass, blocked within-batch pairs, broadcast index probe, O(batch) "
    "fingerprint appends — see streaming/phash_ingest.py)",
    "streaming_audio_fp_ingest": "drained read-back (the GENERIC "
    "fingerprint fold of streaming/phash_ingest.py bound to the audio "
    "energy hash — same replay guard and index discipline as the image "
    "binding)",
    "streaming_video_phash_ingest": "drained read-back (per-frame "
    "fingerprint index as stream state; pairs-form aligned within-batch "
    "vote, stored index probed via the shared video_frame_vote_probe — "
    "batch decoded once per fold)",
    "av_audio_fp_offset_capped_ingest": "hot-word cap as a MAP-SIDE "
    "filter on the lookup table's stored df column: silence's sub32=0 "
    "bucket never materializes, zero per-batch aggregates (the df "
    "aggregate ran at index build time)",
    "av_video_phash_offset_capped_ingest": "hot-block cap as a "
    "broadcast LEFT-ANTI of the tiny over-cap (block, value) set off "
    "the streamed index side: black frames' dhash=0 buckets never "
    "materialize, zero added shuffles",
    "av_audio_corpus_build": "audio corpus capstone: one Arrow "
    "feature pass, md5 groupBy exact arm, blocked whole-clip arm over "
    "exact survivors, posexploded offset vote over the remainder only, "
    "codegen hash split — rollup pins stage membership via id sums",
    "av_audio_corpus_ingest_triage": "audio delta triage: stored "
    "hash/fingerprint/lookup-table indexes streamed, batch broadcast, "
    "probes gated cheapest-first over shrinking survivors",
    "av_video_corpus_build": "video corpus capstone: per-frame dHash "
    "list from one Arrow pass, aligned frame-vote arm then offset arm "
    "over shrinking survivors, codegen hash split",
    "av_video_corpus_ingest_triage": "video delta triage: aligned "
    "probe then offset probe against the stored per-frame index, "
    "batch frames broadcast, corpus never re-decoded",
    "av_video_phash_offset_banded_near_dups": "time-banded offset "
    "vote: the band joins as an EQUI key beside (block, value) — "
    "buckets shrink to ~3 bands; out-of-band drift excluded",
    "av_audio_fp_offset_entropy_ingest": "stateless low-entropy "
    "guard: <4-transition words dropped map-side on both join sides, "
    "no df column, no aggregate — the streaming-capable form",
    "imgs_phash_capped_ingest": "hot-block cap on the shared simhash "
    "probe: stored (i, val, df) stats anti-joined broadcast off the "
    "streamed index; flat batch images match nothing",
    "streaming_audio_offset_entropy_ingest": "drained read-back (the "
    "offset fold with the in-fold low-entropy skip: degenerate words "
    "never enter the stored lookup-table state)",
    "docs_minhash_delta_snapshot": "incremental snapshot read: the "
    "(0,2] delta and the checkpoint-era index are SEGMENT SELECTIONS "
    "off the manifest (plain parquet scans, no filter column); the "
    "stored bands probe as an equi-join with the candidate pairs "
    "broadcast back — no delta re-banding stage anywhere in the plan",
    "streaming_rollup_version_gc": "snapshot-store retention: "
    "expire_versions is O(dropped dirs) filesystem work with NO "
    "Spark job; the surviving as-of read resolves the version "
    "pointer and scans ONE retained snapshot (no log replay, no "
    "filter column in the plan)",
    "streaming_rollup_version_delta": "version-to-version CDC: two "
    "snapshot scans + one row-level exceptAll — neither era is "
    "re-aggregated from events; delta cost scales with state size, "
    "not folded history",
    "docs_minhash_two_store_window_ledger": "two-store window: "
    "forget is a broadcast anti-join per store in the leak-safe "
    "order (bands before texts); the cross-store referential audit "
    "is two key anti-joins, never a cartesian",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — executed physical plans of headline queries",
        "",
        f"Generated by `scripts/dump_plans.py` at `{sf_dir}`. Each excerpt",
        "is the Catalyst/AQE *executed* plan; the one-line note states the",
        "scale property the plan demonstrates.",
        "",
    ]
    for name, why in HEADLINERS.items():
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # resolve AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip volatile ids/paths that would churn the diff
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = re.sub(r"\[plan_id=\d+\]", "", plan)
        plan = re.sub(r"file:[^\s,\]]+", "file:...", plan)
        lines = plan.splitlines()
        if len(lines) > 40:
            lines = lines[:40] + [f"... ({len(plan.splitlines()) - 40} more lines)"]
        out += [f"## {name}", "", f"*{why}*", "", "```", *lines, "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("PLANS.md written,", len(HEADLINERS), "plans")
    spark.stop()


if __name__ == "__main__":
    main()
