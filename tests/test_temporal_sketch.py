"""Edge semantics of asof_join / proximity_pairs / kmv_distinct that
the fixture-driven oracle parity test can't isolate."""

import datetime as dt

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
