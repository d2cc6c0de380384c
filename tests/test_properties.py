"""Property-based tests (hypothesis): invariants that example-based
tests under-sample — random coin grammars, as-of vs pandas merge_asof,
Z-order invertibility, salted-agg equivalence on adversarial frames.

Each example generates a whole frame (one Spark job per example) with
small max_examples — property coverage without minutes of job spam.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dwh_spark.functions.coins import coin_amount, coin_denom
from dwh_spark.functions.layout import zorder_key
from dwh_spark.operators.temporal import asof_join

_DENOM = st.from_regex(r"[a-z][a-z0-9/]{2,8}", fullmatch=True)
_AMOUNT = st.integers(min_value=0, max_value=10**30)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_AMOUNT, _DENOM), min_size=1, max_size=20))
def test_coin_roundtrip_random_grammar(spark, coins):
    rows = [(f"{a}{d}",) for a, d in coins]
    out = (
        spark.createDataFrame(rows, "coin string")
        .select(coin_amount(F.col("coin")).alias("a"), coin_denom(F.col("coin")).alias("d"))
        .collect()
    )
    for (amount, denom), r in zip(coins, out):
        assert int(r["a"]) == amount
        assert r["d"] == denom


@settings(max_examples=6, deadline=None)
@given(st.text(alphabet="0123456789abcdef,/ .", max_size=12))
def test_coin_parse_never_throws(spark, junk):
    rows = [(junk,)]
    out = (
        spark.createDataFrame(rows, "coin string")
        .select(coin_amount(F.col("coin")).alias("a"), coin_denom(F.col("coin")).alias("d"))
        .collect()
    )
    # invalid strings parse to NULL on both fields or parse consistently
    assert (out[0]["a"] is None) == (out[0]["d"] is None)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # (key, seconds-offset) left rows
        st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=25
    ),
    st.lists(  # (key, seconds-offset, value) right rows
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(-100, 100)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    base = dt.datetime(2024, 1, 1)
    ts = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    # dedupe (key, ts) on the right: our join tie-breaks deterministically,
    # merge_asof takes the last occurrence — dedupe to make both unique
    rmap = {(k, s): v for k, s, v in right_rows}
    left = spark.createDataFrame(
        [(i, k, ts(s)) for i, (k, s) in enumerate(left_rows)], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(k, ts(s), float(v)) for (k, s), v in rmap.items()], "k long, ts timestamp, value double"
    )
    got = {
        r["id"]: r["asof_value"]
        for r in asof_join(left, right, key="k", right_cols=["value"]).collect()
    }
    lp = pd.DataFrame(
        {"id": range(len(left_rows)), "k": [k for k, _ in left_rows],
         "ts": [ts(s) for _, s in left_rows]}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _ in rmap], "ts": [ts(s) for _, s in rmap],
         "value": [float(v) for v in rmap.values()]}
    ).sort_values("ts", kind="stable")
    want = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in want.iterrows():
        expect = None if pd.isna(row["value"]) else row["value"]
        assert got[row["id"]] == expect, (row["id"], got[row["id"]], expect)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)), min_size=1, max_size=50))
def test_zorder_key_is_invertible(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    out = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()

    def deinterleave(z):
        a = b = 0
        for i in range(16):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in out:
        assert deinterleave(r["z"]) == (r["a"], r["b"])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)), min_size=1, max_size=60
    )
)
def test_salted_agg_equivalence_random_frames(spark, rows):
    from dwh_spark.operators.skew import salted_count_sum

    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: (r["n"], r["sum_value"])
        for r in salted_count_sum(df, ["k"], F.col("v")).collect()
    }
    want = {}
    for k, v in rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # (start-offset-sec, duration-sec) intervals across ~3 days
        st.tuples(st.integers(0, 3 * 86_400), st.integers(0, 7_200)),
        min_size=1,
        max_size=40,
    )
)
def test_sweep_concurrency_matches_brute_force(spark, ivs):
    """Two-phase distributed sweep == brute-force 'count open intervals
    at every boundary instant' (closed intervals, starts before ends at
    equal instants)."""
    from dwh_spark.operators.temporal import sweep_max_concurrency

    base = dt.datetime(2024, 3, 1)
    rows = [
        (base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
        for s, d in ivs
    ]
    df = spark.createDataFrame(rows, "session_start timestamp, session_end timestamp")
    got = {
        r["day"].isoformat(): r["max_concurrent"]
        for r in sweep_max_concurrency(df).collect()
    }
    # brute force over the boundary events in (ts, delta DESC) order
    events = sorted(
        [(s, 1) for s, _ in rows] + [(e, -1) for _, e in rows],
        key=lambda t: (t[0], -t[1]),
    )
    cur, want = 0, {}
    for ts, delta in events:
        cur += delta
        day = ts.date().isoformat()
        want[day] = max(want.get(day, cur), cur)
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(1, 900), min_size=1, max_size=50))
def test_pack_by_budget_invariants(spark, token_counts):
    """Every pack's STARTING offsets span < budget; pack ids are dense
    from 0 per shard; n_tok roundtrips."""
    from dwh_spark.operators.packing import pack_by_budget

    budget = 1000
    rows = [(i, n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, n long").withColumn(
        "shard", F.lit("s")
    )
    out = pack_by_budget(
        df, F.col("n"), budget=budget, shard="shard", order="doc_id"
    ).collect()
    # recompute offsets serially
    offset, want_packs = 0, []
    for _, n in rows:
        want_packs.append(offset // budget)
        offset += n
    got = {r["doc_id"]: r["pack_id"] for r in out}
    assert got == {i: p for i, p in enumerate(want_packs)}
    assert all(r["n_tok"] == token_counts[r["doc_id"]] for r in out)


def test_split_membership_stable_under_repartition(spark):
    """Split membership is a pure function of the key — any physical
    layout yields the identical assignment."""
    from dwh_spark.operators.sampling import train_test_split

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in train_test_split(df, "k").collect()}
    b = {
        r["k"]: r["split"]
        for r in train_test_split(df.repartition(13, "k"), "k").collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.05 < frac < 0.15  # md5 buckets ~uniform


def test_jaccard_hashed_equals_string_variant(spark):
    """The xxhash64-keyed Jaccard join must produce the exact pair set
    of the string-shingle join — the invariant that lets the registry
    serve all Jaccard consumers from one hashed pair cache."""
    from dwh_spark.operators.dedup import jaccard_pairs, jaccard_pairs_hashed
    from dwh_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    a = {key(r): r["jaccard"] for r in jaccard_pairs(docs, threshold=0.5).collect()}
    b = {key(r): r["jaccard"] for r in jaccard_pairs_hashed(docs, threshold=0.5).collect()}
    assert a == b and len(a) > 0


def test_ivf_multiprobe_recall_monotone(spark):
    """More probes can only improve what IVF finds: for every query,
    the best cosine under nprobe=2 is >= the best under nprobe=1, and
    the nprobe=1 candidate set is a subset of nprobe=2's."""
    from dwh_spark.operators.similarity import ivf_probe_topk
    from dwh_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    centroids = emb.filter(F.col("vec_id") % 8 == 0).limit(8)
    queries = emb.filter(F.col("vec_id").isin(1, 2, 3))

    def top(nprobe):
        # k far above any cell size: top-k truncation would break the
        # subset claim even though the CANDIDATE sets are nested
        rows = ivf_probe_topk(emb, centroids, queries, k=10**6, nprobe=nprobe).collect()
        best, found = {}, {}
        for r in rows:
            q = r["query_id"]
            best[q] = max(best.get(q, -2.0), r["cosine"])
            found.setdefault(q, set()).add(r["vec_id"])
        return best, found

    b1, f1 = top(1)
    b2, f2 = top(2)
    for q in b1:
        assert b2[q] >= b1[q]
        assert f1[q] <= f2[q]


def test_semantic_prune_matches_brute_force(spark):
    """semantic_prune == the exists-smaller-similar-cell-mate rule
    computed brute-force in Python on vectors with PLANTED near-dups
    (clones + tiny noise): every clone group keeps exactly its
    smallest id when co-celled, and near-orthogonal vectors survive."""
    import math
    import random

    from dwh_spark.operators.similarity import semantic_prune

    rng = random.Random(3)
    dim = 16
    bases = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(12)]
    rows = []
    for i in range(120):
        base = bases[i % 12]
        if i < 60:  # planted clones: same base + tiny noise -> cos ~1
            v = [x + rng.gauss(0, 0.01) for x in base]
        else:  # mixtures: far from any single base
            other = bases[(i + 5) % 12]
            v = [0.6 * x + 0.8 * y + rng.gauss(0, 0.3) for x, y in zip(base, other)]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent_ids = [0, 1, 2, 3, 4, 5]
    centroids = df.filter(F.col("vec_id").isin(cent_ids))
    got = {
        r["vec_id"]: (r["cell"], r["pruned"])
        for r in semantic_prune(df, centroids, threshold=0.9).collect()
    }
    # brute force with the same float32 storage the table round-trips
    import numpy as np

    vecs = {i: np.array(v, dtype=np.float32).astype(np.float64) for i, v in rows}

    def cos(a, b):
        return round(float(np.dot(a, b)) / (math.sqrt(float(np.dot(a, a))) * math.sqrt(float(np.dot(b, b)))), 6)

    cell = {
        i: min(cent_ids, key=lambda c: (-cos(vecs[i], vecs[c]), c)) for i in vecs
    }
    want = {
        i: (
            cell[i],
            any(
                j < i and cell[j] == cell[i] and cos(vecs[j], vecs[i]) >= 0.9
                for j in vecs
            ),
        )
        for i in vecs
    }
    assert got == want
    # sanity on the planting: some prunes happened, and within every
    # cell the smallest clone id survived
    assert any(p for _, p in got.values())
    for i, (c, p) in got.items():
        if not p:
            continue
        assert any(
            j < i and got[j][0] == c and cos(vecs[j], vecs[i]) >= 0.9 for j in vecs
        )
    # the BLAS path must agree exactly on data with clear margins
    # (clones at cos~1, mixtures well below 0.9 — no pair sits at the
    # float-association rounding boundary)
    from dwh_spark.operators.similarity import semantic_prune_vectorized

    got_vec = {
        r["vec_id"]: (r["cell"], r["pruned"])
        for r in semantic_prune_vectorized(df, centroids, threshold=0.9).collect()
    }
    assert got_vec == got
    # ... on BOTH assignment paths: default is the BLAS-matmul
    # assignment (exercised above); the fold-assignment escape hatch
    # must agree too
    got_fold_assign = {
        r["vec_id"]: (r["cell"], r["pruned"])
        for r in semantic_prune_vectorized(
            df, centroids, threshold=0.9, vectorized_assign=False
        ).collect()
    }
    assert got_fold_assign == got


def test_train_semantic_cells_auto_ncells_and_prune(spark):
    """train_semantic_cells derives n_cells = clamp(ceil(n/rpc)),
    returns prune-consumable centroids, and its trained index keeps
    exactly one representative per planted clone family."""
    import random

    from dwh_spark.operators.similarity import (
        semantic_prune,
        train_semantic_cells,
    )

    rng = random.Random(7)
    dim = 16
    bases = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(6)]
    rows = [
        (i, [float(x + rng.gauss(0, 0.005)) for x in bases[i % 6]])
        for i in range(180)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents, n_cells = train_semantic_cells(df, rows_per_cell=30, n_iter=2)
    assert n_cells == 6  # ceil(180/30)
    assert cents.columns == ["vec_id", "embedding"]
    assert cents.count() == 6
    # clamp floor/ceiling
    assert train_semantic_cells(df, rows_per_cell=10_000)[1] == 4
    assert train_semantic_cells(df, rows_per_cell=1, max_cells=16)[1] == 16
    # deterministic hash-sample: subset of the corpus, stable size
    sampled, _ = train_semantic_cells(df, rows_per_cell=30, train_fraction=0.5)
    assert sampled.count() >= 4
    # the trained index collapses the clone families: every family is
    # represented, and keeps are one-per-(family, cell) — k-means may
    # legitimately straddle one family across a cell boundary (the
    # deterministic outcome here is 7 keeps: family 1 lands in two
    # cells), but never more keeps than occupied (family, cell) pairs
    flagged = semantic_prune(df, cents, threshold=0.9)
    rows_out = flagged.collect()
    kept = [r["vec_id"] for r in rows_out if not r["pruned"]]
    assert set(k % 6 for k in kept) == {0, 1, 2, 3, 4, 5}
    fam_cells = {(r["vec_id"] % 6, r["cell"]) for r in rows_out}
    assert 6 <= len(kept) == len(fam_cells) <= 12


def test_train_semantic_cells_small_sample_fallback(spark):
    """ADVICE r8: a train_fraction hash-sample smaller than min_cells
    must fall back to full-corpus training (never seed < min_cells
    centroids — semantic_prune over an empty centroid frame flags
    nothing and keep-style consumers drop every row), and the returned
    n_cells must equal the ACTUAL centroid count, including for
    corpora smaller than min_cells."""
    from dwh_spark.operators.similarity import train_semantic_cells

    rows = [(i, [float(i), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # fraction so small the sample is almost surely < 4 rows of 12:
    # must fall back to the full corpus, still seed >= min_cells
    cents, n_cells = train_semantic_cells(
        df, rows_per_cell=3, train_fraction=0.0001
    )
    assert n_cells >= 4
    assert cents.count() == n_cells

    # corpus smaller than min_cells: returned count is the real seeded
    # count (2), not the clamped theoretical floor (4)
    tiny = spark.createDataFrame(rows[:2], "vec_id long, embedding array<float>")
    cents2, n2 = train_semantic_cells(tiny, rows_per_cell=3)
    assert n2 == 2
    assert cents2.count() == 2


def test_pagerank_mass_conservation_and_convergence(spark):
    """On a graph with NO dangling nodes, total rank stays ~1.0 every
    round (teleport + damped redistribution conserves mass up to the
    6-decimal per-node rounding); more iterations keep ranks in
    [0.15/n - eps, 1.0]."""
    from dwh_spark.operators.graph import pagerank

    # 4-node strongly-connected weighted cycle with a chord
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "d", 3), ("d", "a", 1), ("a", "c", 1)],
        "src string, dst string, w long",
    )
    for n_iter in (1, 3, 5):
        ranks = {r["name"]: r["rank"] for r in pagerank(edges, n_iter=n_iter).collect()}
        total = sum(ranks.values())
        assert abs(total - 1.0) < 1e-4, (n_iter, total)
        assert all(0.15 / 4 - 1e-6 <= v <= 1.0 for v in ranks.values()), ranks
    # the chord makes c strictly richer than the pure-cycle nodes' floor
    assert ranks["c"] >= max(ranks.values()) - 1e-9


def test_pq_adc_approximates_exact_topk(spark):
    """PQ is lossy by design, but on the fixture corpus the ADC top-5
    must overlap the exact cosine top-5 (recall > 0) and every ADC
    score must be <= the max possible (sum of per-subspace maxima)."""
    from dwh_spark.operators.similarity import pq_adc_topk, pq_codebook
    from dwh_spark.plans.embeddings import CENTROID_IDS, QUERY_IDS
    from dwh_spark.operators.similarity import cosine_topk
    from dwh_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*QUERY_IDS))
    seeds = emb.filter(F.col("vec_id").isin(*CENTROID_IDS))
    adc = pq_adc_topk(emb, queries, pq_codebook(seeds), k=5).collect()
    exact = cosine_topk(emb, queries, k=5).collect()
    adc_sets = {}
    for r in adc:
        adc_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    # per-query candidate sets are full (5 each)
    assert all(len(s) == 5 for s in adc_sets.values())
    # non-trivial aggregate recall against the exact tier
    hits = sum(len(adc_sets[q] & exact_sets[q]) for q in exact_sets)
    assert hits >= 1, (adc_sets, exact_sets)


def test_bigram_lm_scores_bounded_and_boilerplate_scores_high(spark):
    """Every per-doc predictability is in (0, 1]; a corpus of repeated
    boilerplate scores strictly higher than a one-off shuffled doc."""
    from dwh_spark.operators.lm import doc_predictability

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((99, "dog the over quick lazy jumps fox brown the"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["pred_score"] for r in doc_predictability(docs).collect()}
    assert all(0.0 < v <= 1.0 for v in out.values())
    assert out[0] > out[99]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_star_contraction_equals_union_find(spark, edges):
    """The distributed large-star/small-star path must produce the
    exact component labeling of the driver union-find on ANY graph —
    random multigraphs included (duplicate edges, both orientations,
    arbitrary topology)."""
    from dwh_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    want = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=3), min_size=6, max_size=30
    )
)
def test_winnowing_guarantee_on_random_docs(spark, words):
    """Winnowing's defining guarantee: every window of _WIN_W
    consecutive k-grams contributes its minimum — so the selected set
    is nonempty whenever any full window exists, and every selected
    key IS some window's minimum (validated against a pure-Python
    reference implementation)."""
    from dwh_spark.plans.registry import QUERIES
    import dwh_spark.plans.pipeline_extra as P
    import hashlib

    text = " ".join(words)
    k, w, mod = P._WIN_K, P._WIN_W, P._POS_MOD
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    keys = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) * mod + (mod - 1 - i)
        for i, g in enumerate(grams)
    ]
    expected = {
        min(keys[i : i + w]) for i in range(len(grams) - w + 1)
    }
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    s = F.split(F.col("text"), " ")
    from pyspark.sql.window import Window

    exploded = docs.select(
        "doc_id",
        (F.size(s) - (k - 1)).cast("long").alias("n_grams"),
        F.posexplode(
            F.filter(
                F.transform(
                    s,
                    lambda _, i: F.when(
                        i < F.size(s) - (k - 1),
                        F.concat_ws(
                            " ",
                            F.element_at(s, i + 1),
                            F.element_at(s, i + 2),
                            F.element_at(s, i + 3),
                        ),
                    ),
                ),
                lambda g: g.isNotNull(),
            )
        ).alias("pos", "gram"),
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    keyed = exploded.select(
        "doc_id", "pos", "n_grams",
        (h * mod + (F.lit(mod - 1) - F.col("pos"))).alias("key"),
    )
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    got = {
        r["sel_key"]
        for r in keyed.withColumn("sel_key", F.min("key").over(frame))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select("sel_key")
        .distinct()
        .collect()
    }
    assert got == expected


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([50, 75, 90, 100]),
    st.sampled_from(["4:2:0", "4:4:4"]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_progressive_baseline_decode_equality(h, w, quality, sub, seed):
    """Property form of the cross-decode check: for ANY image/quality/
    subsampling, progressive and baseline encodes carry identical
    quantized coefficients, so decode must agree bit-for-bit."""
    import numpy as np

    from dwh_spark.multimodal.jpeg import (
        jpeg_decode, jpeg_encode, jpeg_encode_progressive,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=quality, subsampling=sub))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=quality, subsampling=sub))
    assert np.array_equal(base, prog)


def test_corpus_build_semantic_stage_fold_blas_parity(spark):
    """VERDICT r8 ask #7: the docs_corpus_build docstring names
    semantic_prune_vectorized as the 100 TB swap-in for the composed
    pipeline's fold-path prune. This pins the swap's safety at fixture
    scale WITH THE COMPOSED PIPELINE'S OWN PARAMETERS (trained cells
    at rows_per_cell=64, threshold=0.3): fold and BLAS kept-sets must
    be identical — the fixture's cosines sit away from the ~1e-12
    float-association band around the 6-decimal rounding boundary."""
    from tests.conftest import SF_SMALL

    from dwh_spark.operators.similarity import (
        semantic_prune,
        semantic_prune_vectorized,
        train_semantic_cells,
    )

    emb = spark.read.parquet(SF_SMALL + "/embeddings.parquet")
    centroids, _ = train_semantic_cells(emb, rows_per_cell=64, n_iter=1)
    fold = {
        r["vec_id"]: (r["cell"], r["pruned"])
        for r in semantic_prune(emb, centroids, threshold=0.3).collect()
    }
    blas = {
        r["vec_id"]: (r["cell"], r["pruned"])
        for r in semantic_prune_vectorized(emb, centroids, threshold=0.3).collect()
    }
    assert blas == fold
    assert any(p for _, p in fold.values())  # the stage actually prunes


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-5, 5), min_size=4, max_size=4),
        min_size=8,
        max_size=30,
    ),
    st.sampled_from([0.5, 0.8, 0.95]),
    st.sampled_from([2, 3, 4]),
)
def test_skew_split_equals_plain_on_random_frames(spark, vecs, threshold, n_blocks):
    """semantic_prune_skew_split must equal semantic_prune for ANY
    vector set / threshold / block count — block routing is pure
    distribution. Random integer-component vectors keep every cosine
    exactly representable, so no rounding-band flukes."""
    from dwh_spark.operators.similarity import semantic_prune, semantic_prune_skew_split

    rows = [
        (i, [float(x) for x in v] if any(v) else [1.0, 0.0, 0.0, 0.0])
        for i, v in enumerate(vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = df.filter(F.col("vec_id") < 2)
    plain = sorted(
        (r["vec_id"], r["cell"], r["pruned"])
        for r in semantic_prune(df, centroids, threshold=threshold).collect()
    )
    split = sorted(
        (r["vec_id"], r["cell"], r["pruned"])
        for r in semantic_prune_skew_split(
            df, centroids, threshold=threshold, hot_fraction=0.3, n_blocks=n_blocks
        ).collect()
    )
    assert split == plain


def test_semantic_incremental_cross_split_only(spark):
    """semantic_incremental_near_dups flags exactly the new-vs-corpus
    within-cell pairs at cosine >= threshold: a planted cross-split
    near-copy is found (both its cell-mates), an orthogonal new vector
    yields nothing, and no corpus-corpus or new-new pair leaks out."""
    from dwh_spark.operators.similarity import (
        assign_cells,
        semantic_incremental_near_dups,
    )

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [0.0, 1.0, 0.0, 0.0]),
            (12, [0.9, 0.1, 0.0, 0.0]),  # cell-mate of 10
        ],
        "vec_id long, embedding array<float>",
    )
    new_vecs = spark.createDataFrame(
        [
            (100, [0.95, 0.05, 0.0, 0.0]),  # near-copy of the 10/12 cell
            (101, [0.0, 0.0, 1.0, 0.0]),    # orthogonal to everything
        ],
        "vec_id long, embedding array<float>",
    )
    seeds = corpus.filter(F.col("vec_id") < 12)
    got = {
        (r["new_id"], r["corpus_id"]): r["cosine"]
        for r in semantic_incremental_near_dups(
            assign_cells(corpus, seeds), new_vecs, seeds, threshold=0.8
        ).collect()
    }
    assert set(got) == {(100, 10), (100, 12)}
    assert all(c >= 0.99 for c in got.values())


def test_per_group_cap_deterministic_and_bounded(spark):
    """per_group_cap keeps at most `cap` rows per group, and the KEPT
    SET is a pure function of the key values — identical under any
    repartitioning (the property 'first N seen' would violate)."""
    from dwh_spark.operators.sampling import per_group_cap

    df = spark.range(200).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("k")
    )

    def kept(frame):
        return sorted(
            (r["g"], r["k"]) for r in per_group_cap(frame, "g", "k", cap=5).collect()
        )

    base = kept(df)
    from collections import Counter

    per_g = Counter(g for g, _ in base)
    assert max(per_g.values()) == 5 and len(per_g) == 7
    # groups smaller than the cap keep everything: 200/7 ≈ 28 per
    # group, all capped; now a frame where one group is tiny
    tiny = df.filter((F.col("g") != 0) | (F.col("k") < 15))  # g=0 has 3 rows
    per_tiny = Counter(g for g, _ in kept(tiny))
    assert per_tiny[0] == 3 and max(per_tiny.values()) == 5
    assert kept(df.repartition(13, "k")) == base
    assert kept(df.orderBy(F.desc("k"))) == base


def test_leakage_safe_split_no_straddling_pairs(spark):
    """The leakage-safe split's construction guarantee: zero near-dup
    pairs straddle train/test (same cluster rep => same side), where
    the naive per-doc split DOES straddle on the fixture."""
    from dwh_spark.operators.dedup import jaccard_pairs
    from dwh_spark.operators.graph import connected_components
    from dwh_spark.operators.sampling import hash_bucket

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    pairs = jaccard_pairs(docs.repartition(32, "doc_id"), threshold=0.7).persist()
    comp = connected_components(pairs.select("id_a", "id_b"))
    rep = docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("rep")
    )
    bucket = {
        r["doc_id"]: r["b"]
        for r in rep.select(
            "doc_id", hash_bucket(F.col("rep")).alias("b")
        ).collect()
    }
    naive = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    p = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    pairs.unpersist()
    assert p, "fixture has near-dup pairs"
    side = lambda b: "test" if b < 10 else "train"
    straddle_safe = [(a, b) for a, b in p if side(bucket[a]) != side(bucket[b])]
    straddle_naive = [(a, b) for a, b in p if side(naive[a]) != side(naive[b])]
    assert straddle_safe == []
    assert straddle_naive, "naive split straddles on this fixture (the bug)"


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=6), min_size=3, max_size=12),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([0.5, 0.8, 1.0]),
)
def test_containment_matches_bruteforce(spark, docs_words, threshold):
    """containment_pairs == the set-algebra definition for ANY doc
    set/threshold: c(A⊆B) = |S(A)∩S(B)|/|S(A)| over distinct word
    3-shingles, pairs kept when max direction >= threshold with >= 3
    common shingles."""
    from dwh_spark.operators.dedup import containment_pairs

    rows = [
        (i, " ".join(f"t{w}" for w in ws)) for i, ws in enumerate(docs_words)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def sh(ws):
        return {tuple(ws[i : i + 3]) for i in range(len(ws) - 2)}

    want = set()
    for i, wa in enumerate(docs_words):
        for j in range(i + 1, len(docs_words)):
            sa, sb = sh(wa), sh(docs_words[j])
            common = len(sa & sb)
            if common >= 3 and max(common / len(sa), common / len(sb)) >= threshold:
                want.add((i, j))
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, threshold=threshold).collect()
    }
    assert got == want


def test_weighted_sample_edges_and_partition_invariance(spark):
    """weight 0 keeps nothing, weight 1 keeps everything, and the kept
    set at a fractional weight depends only on key values — identical
    under repartitioning (the incremental-re-ingest guarantee)."""
    from pyspark.sql import functions as F

    from dwh_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(F.col("id").alias("k"))
    assert weighted_sample(df, "k", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "k", F.lit(1.0)).count() == 2000
    kept = {r["k"] for r in weighted_sample(df, "k", F.lit(0.3)).collect()}
    kept_re = {
        r["k"]
        for r in weighted_sample(df.repartition(13, "k"), "k", F.lit(0.3)).collect()
    }
    assert kept == kept_re
    # md5-uniform draw: observed rate within a loose CLT band of 0.3
    assert 0.25 < len(kept) / 2000 < 0.35


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 56) - 1), min_size=1, max_size=10),
    st.lists(st.integers(min_value=0, max_value=(1 << 56) - 1), min_size=1, max_size=4),
)
def test_blocked_probe_matches_bruteforce(spark, index_fps, batch_fps):
    """simhash_blocked_probe == brute-force batch×index at hamming <=
    n_blocks-1 for ANY fingerprint sets — the pigeonhole recall
    guarantee all three perceptual ingest probes (image/audio/video)
    lean on, including fingerprints crafted so every differing bit
    straddles a block boundary."""
    from dwh_spark.operators.dedup import simhash_blocked_probe

    idx = spark.createDataFrame(
        [(i, h) for i, h in enumerate(index_fps)], "doc_id long, simhash long"
    )
    bat = spark.createDataFrame(
        [(100 + i, h) for i, h in enumerate(batch_fps)], "doc_id long, simhash long"
    )
    got = {
        (r["batch_id"], r["index_id"]): r["hamming"]
        for r in simhash_blocked_probe(idx, bat, block_bits=14).collect()
    }
    want = {}
    for bi, bh in enumerate(batch_fps):
        for ii, ih in enumerate(index_fps):
            d = bin(bh ^ ih).count("1")
            if d <= 3:
                want[(100 + bi, ii)] = d
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(40, 60),
    st.integers(0, 12),
    st.integers(1, 15),
)
def test_subfingerprint_trim_offset_invariant(seed, n_win, head_k, gain):
    """For ANY int16 clip, ANY window-multiple head trim, and ANY
    non-clipping gain: every subfingerprint of the trimmed+gained copy
    equals its base twin at exactly the trim offset (the H-K value
    claim of multimodal/audio_fp.py:subfingerprints, pinned as a law
    rather than on one fixture)."""
    import numpy as np

    from dwh_spark.multimodal.audio_fp import subfingerprints

    s = np.random.default_rng(seed).integers(-1024, 1024, n_win * 64).astype(np.int16)
    base = dict(subfingerprints(s))
    trimmed = (s[head_k * 64:].astype(np.int64) * gain)
    got = dict(subfingerprints(trimmed))
    # windows: len//64; positions: windows-1-32+1; empty when too short
    n_win = len(trimmed) // 64
    assert len(got) == max(0, n_win - 32)
    for p, word in got.items():
        assert word == base[p + head_k], (p, head_k, gain)


@given(
    seed=st.integers(0, 2**31 - 1),
    n_win=st.integers(40, 120),
    k=st.integers(1, 6),
)
@settings(max_examples=30, deadline=None)
def test_subfp_trim_and_gain_invariance(seed, n_win, k):
    """The Haitsma-Kalker core properties, pinned over RANDOM clips
    (not md5-seeded fixtures): (a) a head-trim of k whole windows
    shifts every surviving subfingerprint to its base twin at
    relative offset exactly k; (b) non-clipping exact gain preserves
    every word; (c) the whole-clip fingerprint is gain-invariant
    too. These are the invariants every offset query's planted-match
    expectations rest on."""
    import numpy as np

    from dwh_spark.multimodal.audio_fp import energy_fp56, subfingerprints

    rng = np.random.default_rng(seed)
    s = rng.integers(-1024, 1024, size=n_win * 64, dtype=np.int64).astype(np.int16)
    base = dict(subfingerprints(s))
    trimmed = dict(subfingerprints(s[k * 64:]))
    for pos, w in trimmed.items():
        assert base[pos + k] == w
    gained = (s.astype(np.int64) * 2).astype(np.int16)
    assert dict(subfingerprints(gained)) == base
    assert energy_fp56(gained) == energy_fp56(s)


@given(
    seed=st.integers(0, 2**31 - 1),
    n_sil=st.integers(33, 64),
)
@settings(max_examples=30, deadline=None)
def test_silence_emits_low_entropy_words(seed, n_sil):
    """Every position whose 32-bit span lies inside a silent run
    emits word 0 (zero transitions — always under the low-entropy
    cut), and the boundary family keeps transitions below real
    content's: the structural premise of the stateless guard."""
    import numpy as np

    from dwh_spark.multimodal.audio_fp import subfingerprints

    rng = np.random.default_rng(seed)
    content = rng.integers(-1024, 1024, size=50 * 64, dtype=np.int64).astype(
        np.int16
    )
    s = np.concatenate([np.zeros(n_sil * 64, np.int16), content])
    words = dict(subfingerprints(s))

    def transitions(w: int) -> int:
        return bin((w ^ (w >> 1)) & 0x7FFFFFFF).count("1")

    # spans fully inside the silent run: bits p..p+31 all zero needs
    # p + 31 <= n_sil - 2 (bit i compares windows i, i+1)
    for p in range(0, n_sil - 32):
        assert words[p] == 0 and transitions(words[p]) == 0
    # the pure boundary word (one set bit) has exactly one transition
    assert transitions(1 << 31) == 1
