"""Edge semantics of asof_join / proximity_pairs / kmv_distinct that
the fixture-driven oracle parity test can't isolate."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from dwh_spark.operators.sketch import kmv_distinct
from dwh_spark.operators.temporal import asof_join, proximity_pairs


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_asof_inclusive_equal_ts_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", _ts(5)), (3, "other", _ts(10))],
        "id long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts(10), 100.0), ("k", _ts(7), 70.0)],
        "key string, ts timestamp, value double",
    )
    out = {
        r["id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, key="key", right_cols=["value"]).collect()
    }
    assert out[1] == (_ts(10), 100.0)  # equal ts matches (inclusive)
    assert out[2] is not None and out[2] == (None, None)  # right rows all later
    assert out[3] == (None, None)  # no right rows for this key


def test_asof_picks_latest_not_first(spark):
    left = spark.createDataFrame([(1, "k", _ts(30))], "id long, key string, ts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(1), 1.0), ("k", _ts(20), 20.0), ("k", _ts(29), 29.0)],
        "key string, ts timestamp, value double",
    )
    (row,) = asof_join(left, right, key="key", right_cols=["value"]).collect()
    assert row["asof_value"] == 29.0


def test_proximity_exact_boundary_and_no_dupes(spark):
    left = spark.createDataFrame([(1, _ts(30))], "id long, ts timestamp")
    right = spark.createDataFrame(
        # exactly at the window edge (in, once), 31s away (out)
        [(_ts(0),), (_ts(61),)],
        "ts timestamp",
    )
    pairs = proximity_pairs(left, right, window_us=30_000_000).collect()
    # right row at _ts(0) is exactly 30s away -> included once, not per probe bucket
    gaps = sorted(r["gap_us"] for r in pairs)
    assert gaps == [30_000_000]


def test_kmv_exact_below_k_and_close_above(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 20).alias("g"), F.col("id").alias("v")
    )
    # 20 groups x 50 distinct values, k=64 > 50 -> exact
    exact = {r["g"]: r["n_kmv"] for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert all(v == 50 for v in exact.values())
    # single group, 1000 distinct, k=64 -> estimate within 25%
    (est,) = kmv_distinct(df.withColumn("g", F.lit(0)), ["g"], "v", k=64).collect()
    assert 750 <= est["n_kmv"] <= 1250


def test_vectorized_cosine_topk_matches_fold(spark):
    from dwh_spark.operators.similarity import cosine_topk, cosine_topk_vectorized
    from dwh_spark.sources.catalog import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = vecs.filter(F.col("vec_id") < 3)
    slow = {(r["query_id"], r["rnk"]): (r["vec_id"], r["cosine"])
            for r in cosine_topk(vecs, queries, k=5).collect()}
    fast = {(r["query_id"], r["rnk"]): (r["vec_id"], r["cosine"])
            for r in cosine_topk_vectorized(vecs, queries, k=5).collect()}
    assert set(slow) == set(fast)
    for kk in slow:
        assert slow[kk][0] == fast[kk][0]
        assert abs(slow[kk][1] - fast[kk][1]) < 1e-9


def test_kmeans_recovers_planted_clusters(spark):
    import random

    from dwh_spark.operators.similarity import assign_cells, kmeans_iterate

    rng = random.Random(7)
    centers = [[5.0] * 4, [-5.0] * 4, [5.0, -5.0, 5.0, -5.0]]
    rows = []
    for i in range(300):
        c = centers[i % 3]
        rows.append((i, [v + rng.uniform(-0.5, 0.5) for v in c]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # noisy seeds, one per basin (k-means cannot merge two seeds that
    # start in the same angular basin — standard k-means limitation)
    seeds = spark.createDataFrame(
        [(0, [4.0, 4.0, 4.0, 6.5]), (1, [-4.0, -6.5, -4.0, -4.0]), (2, [6.0, -4.0, 4.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    refined = kmeans_iterate(vecs, seeds, n_iter=3)
    assigned = assign_cells(vecs, refined.withColumnRenamed("centroid_id", "vec_id"))
    # every planted cluster maps to exactly one cell, purely
    groups = {
        r["g"]: r["cells"]
        for r in assigned.groupBy((F.col("vec_id") % 3).alias("g"))
        .agg(F.collect_set("cell").alias("cells"))
        .collect()
    }
    purity = all(len(cells) == 1 for cells in groups.values())
    distinct = len({cells[0] for cells in groups.values()})
    # seeds all near center 0: k-means must still separate at least the
    # two far clusters; full recovery expected with these margins
    assert purity and distinct == 3


# ------------------------------------------------- MRL quantile sketch


def _mrl_build_split(values, k, n_parts, rng):
    """Build via random partition split + random-order merges, the way
    per-partition sketches combine in the operator."""
    from dwh_spark.operators.quantile_sketch import MRLSketch

    parts = np.array_split(values, n_parts)
    sketches = []
    for p in parts:
        s = MRLSketch(k)
        # insert in arrow-batch-sized chunks
        for i in range(0, len(p), 1000):
            s.insert_batch(p[i : i + 1000])
        sketches.append(s)
    rng.shuffle(sketches)
    out = sketches[0]
    for s in sketches[1:]:
        out = out.merge(s)
    return out


def test_mrl_rank_error_within_tracked_bound():
    """The sketch's own certified bound must hold: for every queried
    quantile, |true_rank(estimate) - target_rank| <= audit_bound(),
    across distributions, sizes, split counts and merge orders."""
    rng = np.random.default_rng(1234)
    distributions = {
        "uniform": lambda n: rng.uniform(0, 1e6, n),
        "zipfish": lambda n: 1.0 / rng.uniform(1e-6, 1.0, n),
        "constant": lambda n: np.full(n, 42.5),
        "sorted": lambda n: np.arange(n, dtype=float),
        "fewdistinct": lambda n: rng.integers(0, 10, n).astype(float),
    }
    for name, gen in distributions.items():
        for n in (999, 20_000, 120_000):
            values = gen(n)
            sk = _mrl_build_split(values, k=256, n_parts=7, rng=rng)
            assert sk.n == n
            sorted_vals = np.sort(values)
            for q in (0.01, 0.25, 0.5, 0.9, 0.99):
                est = sk.quantile(q)
                target = max(1, int(np.ceil(q * n)))
                # ties: the estimate value occupies a rank INTERVAL
                # [lo, hi]; the guarantee is that the interval comes
                # within audit_bound of the target rank
                lo = int(np.searchsorted(sorted_vals, est, side="left")) + 1
                hi = int(np.searchsorted(sorted_vals, est, side="right"))
                err = max(lo - target, target - hi, 0)
                assert err <= sk.audit_bound(), (
                    name, n, q, err, sk.audit_bound()
                )


def test_mrl_bound_is_nontrivial():
    """The guarantee has teeth: at n=120k, k=256 the certified bound
    stays under 5% of n (vs the histogram's data-dependent error)."""
    rng = np.random.default_rng(7)
    sk = _mrl_build_split(rng.uniform(0, 1, 120_000), k=256, n_parts=7, rng=rng)
    assert sk.audit_bound() <= 0.05 * sk.n


def test_mrl_fixed_merge_order_is_bit_reproducible():
    """The operator's contract: merging per-partition sketches in a
    PINNED order (sorted pid) twice gives identical estimates."""
    rng = np.random.default_rng(99)
    values = rng.uniform(0, 1e3, 50_000)
    a = _mrl_build_split(values, k=128, n_parts=5, rng=np.random.default_rng(1))
    b = _mrl_build_split(values, k=128, n_parts=5, rng=np.random.default_rng(1))
    for q in (0.1, 0.5, 0.99):
        assert a.quantile(q) == b.quantile(q)


def test_mrl_any_merge_order_stays_within_bound():
    """Eager compaction makes estimates merge-order-SENSITIVE (within
    the bound); the certified rank guarantee must hold for EVERY
    order. This is the honest invariant — equality across arbitrary
    orders does not hold and must not be claimed."""
    rng = np.random.default_rng(99)
    values = rng.uniform(0, 1e3, 50_000)
    sorted_vals = np.sort(values)
    n = len(values)
    for seed in (1, 2, 3, 4):
        sk = _mrl_build_split(
            values, k=128, n_parts=5, rng=np.random.default_rng(seed)
        )
        bound = sk.audit_bound()
        for q in (0.1, 0.5, 0.99):
            est = sk.quantile(q)
            target = max(1, int(np.ceil(q * n)))
            lo = int(np.searchsorted(sorted_vals, est, side="left"))
            hi = int(np.searchsorted(sorted_vals, est, side="right"))
            assert lo - bound <= target <= hi + bound


def test_mrl_rank_zero_below_minimum():
    from dwh_spark.operators.quantile_sketch import MRLSketch

    s = MRLSketch(64)
    s.insert_batch(np.array([10.0, 20.0, 30.0]))
    assert s.rank(5.0) == 0.0
    assert s.rank(25.0) == 2.0
    assert s.rank(99.0) == 3.0


def test_mrl_exact_below_k():
    """Fewer than k values: the sketch has seen everything; quantiles
    are exact and err_bound is 0."""
    from dwh_spark.operators.quantile_sketch import MRLSketch

    s = MRLSketch(64)
    s.insert_batch(np.array([5.0, 1.0, 9.0, 3.0]))
    assert s.err_bound == 0
    assert s.quantile(0.5) == 3.0
    assert s.quantile(1.0) == 9.0


def test_mrl_serialization_roundtrip():
    from dwh_spark.operators.quantile_sketch import MRLSketch

    rng = np.random.default_rng(3)
    s = MRLSketch(64)
    s.insert_batch(rng.uniform(0, 1, 5000))
    s2 = MRLSketch.from_rows(s.to_rows(), s.k, s.n, s.err_bound)
    for q in (0.2, 0.5, 0.8):
        assert s.quantile(q) == s2.quantile(q)


# ------------------------------------------------- distributed ranks


def test_global_rank_matches_single_window(spark):
    """Two-phase equi-depth-binned rank == unpartitioned row_number for
    random data with heavy ties, negatives, NULLs (Spark ASC = nulls
    first), and a tie-break column. meta_out n must equal the row
    count."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dwh_spark.operators.ranks import with_global_rank

    rng = random.Random(7)
    rows = [
        (i, rng.choice([None, -5.0, -1.5, 0.0, 2.25, 7.5, 9.0, rng.uniform(-10, 10)]))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    meta: dict = {}
    got = {
        (r["id"]): r["rn"]
        for r in with_global_rank(
            df, "v", [F.asc("v"), F.asc("id")], nbins=16, meta_out=meta
        ).collect()
    }
    assert meta["n"] == 2000
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_skewed_distribution(spark):
    """99% of values in a narrow band + outliers stretching the range:
    equi-depth edges must keep per-bin loads near n/nbins (equal-width
    slicing would put ~everything in one bin), and ranks stay exact."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dwh_spark.operators.ranks import with_global_rank

    df = spark.range(5000).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, F.col("id") * 1e6)
        .otherwise(100.0 + F.pmod(F.xxhash64("id"), F.lit(1000)) / 1e6)
        .alias("v"),
    )
    got = {
        r["id"]: r["rn"]
        for r in with_global_rank(df, "v", [F.asc("v"), F.asc("id")], nbins=16).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_degenerate_and_timestamp(spark):
    from pyspark.sql import functions as F

    from dwh_spark.operators.ranks import with_global_rank

    # all-equal primary: pure tie-break ordering still exact
    df = spark.createDataFrame([(i, 42.0) for i in range(50)], "id long, v double")
    out = with_global_rank(df, "v", [F.asc("v"), F.desc("id")]).collect()
    assert {r["id"]: r["rn"] for r in out} == {i: 50 - i for i in range(50)}
    # all-NULL primary: ranks 1..n by tie-break, not null ranks
    dfn = spark.createDataFrame(
        [(i, None) for i in range(20)], "id long, v double"
    )
    outn = with_global_rank(dfn, "v", [F.asc("v"), F.asc("id")]).collect()
    assert {r["id"]: r["rn"] for r in outn} == {i: i + 1 for i in range(20)}
    # timestamp primary (the stalest-selection shape)
    ts = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "id long, off int"
    ).select("id", F.timestamp_seconds(1_700_000_000 + F.col("off") * 3600).alias("t"))
    out2 = with_global_rank(ts, "t", [F.asc("t"), F.asc("id")], nbins=4).collect()
    ranks = sorted((r["t"], r["id"], r["rn"]) for r in out2)
    assert [x[2] for x in ranks] == list(range(1, 101))
    # empty input keeps the schema
    empty = with_global_rank(df.filter("id < 0"), "v")
    assert empty.count() == 0 and "rn" in empty.columns


def test_global_rank_adaptive_nbins_and_nan(spark):
    """nbins=None auto-scales: with rows_per_bin forced tiny the edge
    pass must upgrade past the 128-bin floor, and the upgraded ranks
    must equal the single-window form exactly — including NULL (sorts
    first) and NaN (sorts greatest) primaries, which get dedicated
    bins and never reach the percentile sketch."""
    import math
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dwh_spark.operators.ranks import with_global_rank

    rng = random.Random(11)
    rows = [
        (
            i,
            rng.choice(
                [None, float("nan"), -3.0, 0.0, 5.5, rng.uniform(-100, 100)]
            ),
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    meta: dict = {}
    got = {
        r["id"]: r["rn"]
        for r in with_global_rank(
            df, "v", [F.asc("v"), F.asc("id")], rows_per_bin=4, meta_out=meta
        ).collect()
    }
    assert meta["n"] == 2000
    assert meta["nbins"] == math.ceil(2000 / 4)  # upgraded past the 128 floor
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
    # small input under the default target: floor stays at 128
    meta2: dict = {}
    with_global_rank(df, "v", [F.asc("v"), F.asc("id")], meta_out=meta2).collect()
    assert meta2["nbins"] == 128


# -------------------------------------------- Misra-Gries heavy hitters


def test_mg_bound_holds_on_adversarial_data(spark):
    """est <= true <= est + err_bound for EVERY key, and
    err_bound*(k+1) <= n — on a skewed corpus with enough distinct
    keys to force evictions in every partition."""
    from pyspark.sql import functions as F

    from dwh_spark.operators.sketch import mg_merge, mg_partition_summaries

    # zipf-ish: key j appears ~N/(j+1) times; 200 distinct >> k=8
    rows = []
    rid = 0
    for j in range(200):
        for _ in range(max(1, 2000 // (j + 1))):
            rows.append((rid, f"k{j:03d}"))
            rid += 1
    df = spark.createDataFrame(rows, "row_id long, key string")
    partials = mg_partition_summaries(df, "key", "row_id", k=8, n_parts=4)
    counters, err, n = mg_merge(partials)
    assert n == len(rows)
    assert err * (8 + 1) <= n
    exact = {r["key"]: r["cnt"] for r in
             df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    ests = {r["key"]: r["est"] for r in counters.collect()}
    assert len(ests) <= 4 * 8 + 4  # union of per-partition summaries
    for key, est in ests.items():
        assert est <= exact[key] <= est + err, key
    # the heaviest key must survive (true count >> any partition's
    # decrement budget)
    assert "k000" in ests


def test_mg_threshold_selection_is_superset(spark):
    """The discovery→salting contract (events_mg_salted_hot_join):
    for any threshold T ABOVE the err bound, selecting tracked keys
    with est + err_bound >= T must be a SUPERSET of every key with
    TRUE count >= T — under heavy skew, near-uniform keys, and k small
    enough to force evictions. (true >= T > err forces the key to be
    tracked with est >= true - err, hence est + err >= T.) Below err
    no sketch can promise discovery; the complement guarantee is that
    every UNTRACKED key has true <= err."""
    import random

    from pyspark.sql import functions as F

    from dwh_spark.operators.sketch import mg_merge, mg_partition_summaries

    rng = random.Random(19)
    rows = []
    rid = 0
    # two celebrity keys + zipf body + uniform tail
    for j, reps in [("hotA", 4000), ("hotB", 2500)]:
        for _ in range(reps):
            rows.append((rid, j)); rid += 1
    for j in range(300):
        for _ in range(max(1, 800 // (j + 1))):
            rows.append((rid, f"z{j:03d}")); rid += 1
    for _ in range(3000):
        rows.append((rid, f"u{rng.randrange(1500):04d}")); rid += 1
    df = spark.createDataFrame(rows, "row_id long, key string")
    exact = {r["key"]: r["cnt"] for r in
             df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    counters, err, n = mg_merge(
        mg_partition_summaries(df, "key", "row_id", k=16, n_parts=8)
    )
    ests = {r["key"]: r["est"] for r in counters.collect()}
    assert n == len(rows)
    for T in (err + 1, max(err + 1, n // 20), max(err + 1, n // 10), n // 4):
        selected = {k for k, est in ests.items() if est + err >= T}
        truly_hot = {k for k, c in exact.items() if c >= T}
        assert truly_hot <= selected, (T, truly_hot - selected)
    # the discovery floor: every key MG dropped is provably below err
    for key, c in exact.items():
        if key not in ests:
            assert c <= err, (key, c, err)
    # and the celebrities are always discovered
    assert {"hotA", "hotB"} <= set(ests)


def test_mg_deterministic_across_input_order(spark):
    """Same data in shuffled input order => bit-identical summaries
    (content is hash-partitioned; processing order is sorted-key)."""
    from dwh_spark.operators.sketch import mg_merge, mg_partition_summaries

    rows = [(i, f"t{(i * 7919) % 60:02d}") for i in range(5000)]
    a = spark.createDataFrame(rows, "row_id long, key string")
    b = spark.createDataFrame(list(reversed(rows)), "row_id long, key string")
    ca, ea, na = mg_merge(mg_partition_summaries(a, "key", "row_id", k=8, n_parts=4))
    cb, eb, nb = mg_merge(mg_partition_summaries(b, "key", "row_id", k=8, n_parts=4))
    assert (ea, na) == (eb, nb)
    assert sorted(map(tuple, ca.collect())) == sorted(map(tuple, cb.collect()))
