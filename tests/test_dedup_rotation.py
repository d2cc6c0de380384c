"""Permute-and-reblock SimHash: pigeonhole recall guarantee.

The single-permutation blocker (high-16-bit cut) misses pairs whose
differing bits straddle the block boundary; the rotated scheme must
find every pair at hamming <= n_blocks-1 regardless of where the
differing bits fall.
"""

from pyspark.sql import functions as F

from dwh_spark.operators.dedup import (
    simhash60,
    simhash_blocked_pairs,
    simhash_near_duplicates_rotated,
)

import pytest


def _pairs(spark, fingerprints, **kw):
    sh = spark.createDataFrame(fingerprints, "doc_id long, simhash long")
    return {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_blocked_pairs(sh, **kw).collect()
    }


def test_boundary_straddling_pair_found(spark):
    # diffs at the top bit of blocks 0, 1 and 2 — every one-cut
    # blocking that keys on any of those blocks misses this pair;
    # block 3 is clean, so the rotated join finds it.
    b = (1 << 14) | (1 << 29) | (1 << 44)
    got = _pairs(spark, [(1, 0), (2, b)])
    assert got == {(1, 2): 3}


def test_hamming_above_block_count_excluded(spark):
    # four differing bits across four blocks: no clean block, and the
    # distance exceeds max_hamming anyway — must not appear.
    b = (1 << 3) | (1 << 17) | (1 << 32) | (1 << 47)
    assert _pairs(spark, [(1, 0), (2, b)]) == {}


def test_pigeonhole_guarantee_needs_enough_blocks(spark):
    sh = spark.createDataFrame([(1, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError):
        simhash_blocked_pairs(sh, max_hamming=4, n_blocks=4)


def test_rotated_matches_brute_force(spark):
    """End-to-end on texts: the blocked join finds EXACTLY the pairs a
    quadratic all-pairs scan finds at hamming <= 3."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, "completely unrelated text about spark shuffles"),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash60(docs).collect()}
    want = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for a in fp
        for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_duplicates_rotated(docs).collect()
    }
    assert got == want and (1, 5) in got  # the exact-dup pair at hd 0


def test_minhash_incremental_matches_cross_split_pairs(spark):
    """The asymmetric batch-vs-corpus probe must find EXACTLY the full
    near-dup pairs that cross the split — in both id directions (the
    full pipeline orders pairs id_a<id_b; the incremental probe must
    not silently assume batch ids are larger)."""
    from pyspark.sql import functions as F

    from dwh_spark.operators.dedup import (
        minhash_incremental_near_dups,
        minhash_near_duplicates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    new_docs = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)

    inc = {
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in minhash_incremental_near_dups(corpus, new_docs, threshold=0.7).collect()
    }
    full = minhash_near_duplicates(docs, threshold=0.7).collect()
    want = set()
    for r in full:
        a, b, j = r["id_a"], r["id_b"], r["jaccard"]
        if a % 10 == 7 and b % 10 != 7:
            want.add((a, b, j))
        elif b % 10 == 7 and a % 10 != 7:
            want.add((b, a, j))
    assert inc == want
    assert inc  # the fixture split actually crosses some dup families


def test_candidate_pushdown_shingles_above_join(spark):
    """Candidate-id pushdown (VERDICT r9 #2): the corpus-side shingle
    projection must sit ABOVE the broadcast candidate join, so only
    candidate rows are shingled — a full-corpus `shingles(text)`
    projection per ingest batch is O(corpus) CPU at 100 TB. With a
    literal candidate frame, `regexp_extract_all` (the shingle
    expression) may appear only above the Join node in the optimized
    plan."""
    from dwh_spark.operators.dedup import candidate_corpus_shingles

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = spark.sql(
        "SELECT * FROM VALUES (101, 3), (102, 5), (103, 5) AS t(new_id, corpus_id)"
    )
    out = candidate_corpus_shingles(pairs, corpus)

    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    join_ix = next(i for i, l in enumerate(lines) if "Join" in l)
    assert any("regexp_extract_all" in l for l in lines[:join_ix]), plan
    assert all("regexp_extract_all" not in l for l in lines[join_ix:]), plan
    # broadcast hint survives: the corpus is never shuffled
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()

    # row-count probe: shingles attach to exactly the candidate pairs
    rows = out.collect()
    assert sorted((r["new_id"], r["corpus_id"]) for r in rows) == [
        (101, 3),
        (102, 5),
        (103, 5),
    ]
    want = {
        r["doc_id"]: r["sh"]
        for r in corpus.filter(F.col("doc_id").isin(3, 5))
        .select("doc_id", F.expr(
            r"array_distinct(regexp_extract_all(text, '(?<=^| )(?=((?:\\S+ ){2}\\S+))', 1))"
        ).alias("sh"))
        .collect()
    }
    for r in rows:
        assert r["sh_c"] == want[r["corpus_id"]]


def test_containment_catches_jaccard_miss(spark):
    """Broder containment vs Jaccard: a 10-shingle doc fully embedded
    in a 100-shingle doc has containment 1.0 but Jaccard ~0.1 — the
    minhash/jaccard detectors (threshold 0.7) must miss it, the
    containment detector must flag it with the right direction."""
    from dwh_spark.operators.dedup import containment_pairs, jaccard_pairs

    short = " ".join(f"w{i}" for i in range(12))          # 10 shingles
    long = " ".join(f"w{i}" for i in range(102))          # 100 shingles
    other = " ".join(f"x{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], "doc_id long, text string"
    )
    jac = jaccard_pairs(docs, threshold=0.7).collect()
    assert jac == []
    got = {
        (r["id_a"], r["id_b"]): (r["cont_a_in_b"], r["cont_b_in_a"])
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert set(got) == {(1, 2)}
    ca, cb = got[(1, 2)]
    assert ca == 1.0 and cb == 0.1


def test_corpus_ingest_triage_all_decisions(spark):
    """Planted delta hits every triage arm, in priority order: a
    low-quality doc that is ALSO an exact dup routes 'low_quality';
    a byte-identical copy of a corpus doc routes 'exact_dup'; a
    one-word edit routes 'near_dup'; fresh text routes 'kept'."""
    from pyspark.sql import functions as F

    from dwh_spark.operators.dedup import corpus_ingest_triage

    base = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1, base), (2, " ".join(f"x{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    edited = " ".join((f"w{i}" if i != 29 else "EDIT") for i in range(30))
    new_docs = spark.createDataFrame(
        [
            (10, base),                                     # exact dup of 1
            (11, edited),                                   # near dup of 1
            (12, " ".join(f"y{i}" for i in range(30))),     # fresh
            (13, "tiny"),                                   # low quality
        ],
        "doc_id long, text string",
    )
    # quality: length-based stub — 'tiny' fails, everything else passes
    quality = lambda c: F.when(F.length(c) > 20, F.lit(1.0)).otherwise(F.lit(0.0))
    got = {
        r["doc_id"]: r["decision"]
        for r in corpus_ingest_triage(corpus, new_docs, quality).collect()
    }
    assert got == {10: "exact_dup", 11: "near_dup", 12: "kept", 13: "low_quality"}

    # priority: an exact dup that is also low quality -> low_quality
    corpus2 = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    new2 = spark.createDataFrame([(20, "tiny")], "doc_id long, text string")
    got2 = {
        r["doc_id"]: r["decision"]
        for r in corpus_ingest_triage(corpus2, new2, quality).collect()
    }
    assert got2 == {20: "low_quality"}


def test_containment_stop_gram_cap(spark):
    """max_doc_freq drops boilerplate shingles from the join: with a
    generous cap the pair set is unchanged; with a cap that excludes
    a shared boilerplate prefix, the boilerplate-only pair's
    containment falls below threshold (the documented under-estimate)
    while a genuine short-in-long pair survives."""
    from dwh_spark.operators.dedup import containment_pairs

    boiler = " ".join(f"b{i}" for i in range(12))  # shared by 4 docs
    docs = spark.createDataFrame(
        [
            (1, boiler),                                             # boilerplate only
            (2, boiler + " " + " ".join(f"p{i}" for i in range(40))),
            (3, boiler + " " + " ".join(f"q{i}" for i in range(40))),
            (4, boiler + " " + " ".join(f"r{i}" for i in range(40))),
            (5, " ".join(f"s{i}" for i in range(12))),               # short
            (6, " ".join(f"s{i}" for i in range(12))
                + " " + " ".join(f"t{i}" for i in range(60))),       # contains 5
        ],
        "doc_id long, text string",
    )
    plain = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    # doc1 ⊆ docs 2/3/4 via boilerplate; doc5 ⊆ doc6 genuinely
    assert {(1, 2), (1, 3), (1, 4), (5, 6)} <= plain
    wide = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(docs, threshold=0.9, max_doc_freq=10).collect()
    }
    assert wide == plain
    capped = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(docs, threshold=0.9, max_doc_freq=3).collect()
    }
    # boilerplate shingles (doc-freq 4) dropped: doc1's pairs vanish,
    # the genuine containment (unique shingles, doc-freq 2) survives
    assert (5, 6) in capped
    assert not any(p[0] == 1 for p in capped)


def _subtree(lines: list[str], ix: int) -> list[str]:
    """Lines of the plan subtree rooted at lines[ix] (indent-based)."""
    def depth(l: str) -> int:
        for i, ch in enumerate(l):
            if ch not in " :+-":
                return i
        return len(l)
    d = depth(lines[ix])
    out = [lines[ix]]
    for l in lines[ix + 1:]:
        if depth(l) <= d:
            break
        out.append(l)
    return out


def test_triage_exact_probe_never_builds_on_corpus(spark):
    """VERDICT r10 #1: the exact-dup arm must probe the stored corpus
    hash index with the BROADCAST batch-hash set (inner join, build =
    batch) and broadcast the <= batch-sized `found` set back — never
    put the corpus index on the build side of an outer join, never
    shuffle it. Pinned on the executed plan: (a) the md5 LeftOuter
    broadcast join's build subtree is the `__exact` found-projection,
    not a raw corpus aggregate; (b) the inner __h probe builds right
    on the batch side (batch filter marker in the build subtree, no
    corpus marker); (c) the corpus-index streamed side reaches its
    FileScan with no Exchange in between; (d) no SortMergeJoin on
    __h anywhere (the 100 TB fallback shape the old LEFT join forced)."""
    from dwh_spark.operators.dedup import corpus_ingest_triage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    new_docs = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    quality = lambda c: F.when(F.length(c) > 20, F.lit(1.0)).otherwise(F.lit(0.0))
    out = corpus_ingest_triage(corpus, new_docs, quality)

    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()

    # (d) the scale-killer fallback must not appear for the hash probe
    assert not any("SortMergeJoin [__h" in l for l in lines), plan
    assert not any("SortMergeJoin [md5" in l for l in lines), plan

    # (a) the outer md5 probe joins against the broadcast found set
    outer_ix = next(
        i for i, l in enumerate(lines)
        if "BroadcastHashJoin [md5" in l and "LeftOuter" in l
    )
    outer_sub = _subtree(lines, outer_ix)
    bx_ix = next(i for i, l in enumerate(outer_sub) if "BroadcastExchange" in l)
    found_sub = _subtree(outer_sub, bx_ix)
    assert any("__exact" in l for l in found_sub), plan

    # (b) inside found: the inner probe builds on the BATCH hash set
    inner_rel = next(
        i for i, l in enumerate(found_sub)
        if "BroadcastHashJoin [__h" in l and "Inner, BuildRight" in l
    )
    inner_sub = _subtree(found_sub, inner_rel)
    build_ix = next(
        i for i, l in enumerate(inner_sub) if "BroadcastExchange" in l
    )
    build_sub = _subtree(inner_sub, build_ix)
    assert any("% 10) = 7" in l and "NOT" not in l for l in build_sub), plan
    assert not any("NOT ((doc_id" in l for l in build_sub), plan

    # (c) the corpus-index streamed side: scan -> project, no Exchange
    streamed = inner_sub[1:build_ix]
    assert any("NOT ((doc_id" in l for l in streamed), plan
    assert not any("Exchange" in l for l in streamed), plan


def test_containment_bucket_composition(spark):
    """VERDICT r10 #4: the bucketed candidate-universe form. Output
    must equal the uncapped pair set filtered to same-bucket pairs,
    and the bucket key must sit INSIDE the self-join condition (plan
    pin: the join keys include `bk`) so cross-bucket fan-out is pruned
    in the join, not after it."""
    from dwh_spark.operators.dedup import containment_pairs

    short = " ".join(f"w{i}" for i in range(12))
    long = " ".join(f"w{i}" for i in range(102))
    docs = spark.createDataFrame(
        [(1, short, "s1"), (2, long, "s1"), (3, short, "s2"), (4, long, "s3")],
        "doc_id long, text string, source string",
    )
    full = {
        (r["id_a"], r["id_b"]) for r in containment_pairs(docs).collect()
    }
    assert full == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    bucketed = containment_pairs(docs, bucket="source")
    got = {(r["id_a"], r["id_b"]) for r in bucketed.collect()}
    assert got == {p for p in full if src[p[0]] == src[p[1]]} == {(1, 2)}
    plan = bucketed._jdf.queryExecution().optimizedPlan().toString()
    join_line = next(l for l in plan.splitlines() if "Join Inner" in l)
    assert "bk" in join_line, plan


def test_containment_incremental_matches_pairwise(spark):
    """The ingest-time containment probe must agree with the batch
    containment_pairs restricted to new-vs-corpus pairs, and its plan
    must broadcast the BATCH postings (corpus index streamed)."""
    from dwh_spark.operators.dedup import containment_incremental, containment_pairs

    corpus_rows = [
        (1, " ".join(f"w{i}" for i in range(102))),
        (2, " ".join(f"x{i}" for i in range(40))),
    ]
    new_rows = [
        (10, " ".join(f"w{i}" for i in range(12))),   # contained in 1
        (11, " ".join(f"y{i}" for i in range(12))),   # fresh
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {
        (r["new_id"], r["corpus_id"]): (r["cont_new_in_corpus"], r["cont_corpus_in_new"])
        for r in containment_incremental(corpus, new).collect()
    }
    assert set(got) == {(10, 1)}
    assert got[(10, 1)] == (1.0, 0.1)
    # cross-check vs the batch operator over the union
    both = corpus.unionByName(new)
    want = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(both).collect()
        if r["id_b"] >= 10 and r["id_a"] < 10
    }
    assert want == {(1, 10)}
    plan = containment_incremental(corpus, new)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [h" in plan.replace("#", " #").replace("[h #", "[h#") or "BroadcastHashJoin" in plan, plan


def test_containment_capped_probe_is_map_side(spark):
    """VERDICT r11 #3: the stop-gram cap must be a map-side filter on
    the posting index's STORED df column — never a per-batch aggregate
    over the corpus postings. Pins (a) result parity: the capped probe
    over a prebuilt with_df index equals the inline max_doc_freq path
    (boilerplate pairs vanish, the genuine short-in-long survives);
    (b) the plan: the capped probe over the prebuilt index has exactly
    the same HashAggregate count as the UNCAPPED probe (the only
    aggregate left is the downstream collision groupBy) and no Window
    node; (c) a df-less index with a cap is a loud ValueError, not a
    silent uncapped probe."""
    import pytest

    from dwh_spark.operators.dedup import (
        containment_incremental,
        containment_posting_index,
    )

    boiler = " ".join(f"b{i}" for i in range(12))
    corpus = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"p{i}" for i in range(40))),
            (2, boiler + " " + " ".join(f"q{i}" for i in range(40))),
            (3, boiler + " " + " ".join(f"r{i}" for i in range(40))),
            (4, " ".join(f"s{i}" for i in range(12))
                + " " + " ".join(f"t{i}" for i in range(60))),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, boiler), (11, " ".join(f"s{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    # the stored artifact: built ONCE (with df), reused across batches
    index = containment_posting_index(corpus, with_df=True).localCheckpoint()

    uncapped = {
        (r["new_id"], r["corpus_id"])
        for r in containment_incremental(corpus, new).collect()
    }
    assert uncapped == {(10, 1), (10, 2), (10, 3), (11, 4)}
    inline = {
        (r["new_id"], r["corpus_id"])
        for r in containment_incremental(corpus, new, max_doc_freq=2).collect()
    }
    stored = {
        (r["new_id"], r["corpus_id"])
        for r in containment_incremental(
            corpus, new, max_doc_freq=2, posting_index=index
        ).collect()
    }
    # boilerplate shingles (df=3) dropped by the cap: doc10's pairs
    # vanish, the genuine containment (df=1 shingles) survives
    assert stored == inline == {(11, 4)}

    def agg_count(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("HashAggregate"), plan

    n_capped, plan_capped = agg_count(
        containment_incremental(corpus, new, max_doc_freq=2, posting_index=index)
    )
    n_plain, _ = agg_count(
        containment_incremental(corpus, new, posting_index=index.drop("df"))
    )
    assert n_capped == n_plain, plan_capped
    assert "Window" not in plan_capped, plan_capped

    with pytest.raises(ValueError, match="with_df"):
        containment_incremental(
            corpus, new, max_doc_freq=2, posting_index=index.drop("df")
        )


def test_triage_contained_arm(spark):
    """detect_contained routes a short fragment of a stored doc to
    'contained' (band probe misses it: Jaccard ~0.28), keeps decision
    priority (a near-dup that is also contained routes 'near_dup'),
    and default triage leaves the fragment 'kept'."""
    from dwh_spark.operators.dedup import corpus_ingest_triage

    long = " ".join(f"w{i}" for i in range(102))
    corpus = spark.createDataFrame(
        [(1, long), (2, " ".join(f"x{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    frag = " ".join(f"w{i}" for i in range(30))
    edited = " ".join((f"w{i}" if i != 100 else "EDIT") for i in range(102))
    new_docs = spark.createDataFrame(
        [(10, frag), (11, edited), (12, " ".join(f"z{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    quality = lambda c: F.when(F.length(c) > 20, F.lit(1.0)).otherwise(F.lit(0.0))
    got = {
        r["doc_id"]: r["decision"]
        for r in corpus_ingest_triage(
            corpus, new_docs, quality, detect_contained=True
        ).collect()
    }
    assert got == {10: "contained", 11: "near_dup", 12: "kept"}
    plain = {
        r["doc_id"]: r["decision"]
        for r in corpus_ingest_triage(corpus, new_docs, quality).collect()
    }
    assert plain == {10: "kept", 11: "near_dup", 12: "kept"}
