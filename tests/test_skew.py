"""Salted aggregation/join equivalence with the unsalted forms."""

from pyspark.sql import functions as F

from dwh_spark.operators.skew import salted_count_sum, salted_join
from dwh_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain(spark):
    events = load_table(spark, SF, "events")
    got = {
        r["user_id"]: (r["n"], round(r["sum_value"], 4))
        for r in salted_count_sum(events, ["user_id"], F.col("value")).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), customer, on=["c_custkey"]
    ).count()
    assert salted == plain


def test_targeted_salted_join_equals_plain(spark):
    """Hot-key-only salting is row-set-invariant for ANY hot list:
    empty, a real hot subset, and keys absent from the data all
    produce exactly the plain join (per-row multiset equality, not
    just counts). Dimension amplification must stay |dim| +
    (n_salts-1)*|hot|, not n_salts*|dim|."""
    from collections import Counter

    from dwh_spark.operators.skew import targeted_salted_join

    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_name")
    plain = Counter(
        (r["c_custkey"], r["o_orderkey"], r["c_name"])
        for r in orders.join(customer, "c_custkey").collect()
    )
    hot_real = [
        r["c_custkey"]
        for r in orders.groupBy("c_custkey").count().orderBy(F.desc("count")).limit(5).collect()
    ]
    for hot in ([], hot_real, [-1, -2], hot_real + [999_999_999]):
        got = Counter(
            (r["c_custkey"], r["o_orderkey"], r["c_name"])
            for r in targeted_salted_join(
                orders, customer, on=["c_custkey"], hot_keys=hot, n_salts=4
            ).collect()
        )
        assert got == plain, f"hot={hot}"


def test_semantic_prune_skew_split_planted_mega_cell(spark):
    """VERDICT r7 ask #6: one 10x-skewed cell must (a) be DISCOVERED
    by the MG sketch over cell ids, (b) have its within-cell self-join
    block-decomposed — the pair join keys on (cell, __ba, __bb), so
    the mega-cell's pairs spread over n_blocks^2 buckets instead of
    one task — while (c) the flagged output stays multiset-equal to
    the plain semantic_prune."""
    import random

    from dwh_spark.operators.similarity import (
        assign_cells,
        discover_hot_cells,
        semantic_prune,
        semantic_prune_skew_split,
    )

    rng = random.Random(11)
    dim = 8
    base_hot = [1.0] + [0.0] * (dim - 1)
    base_cold = [0.0] * (dim - 1) + [1.0]
    rows = [
        (i, [float(x + rng.gauss(0, 0.01)) for x in base_hot]) for i in range(110)
    ] + [
        (200 + i, [float(x + rng.gauss(0, 0.01)) for x in base_cold])
        for i in range(11)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # centroids: one per family (ids 0 and 200 are members of each)
    centroids = df.filter(F.col("vec_id").isin(0, 200))

    cells = assign_cells(df, centroids)
    hot = discover_hot_cells(cells, hot_fraction=0.5)
    assert hot == [0], f"planted mega-cell not discovered: {hot}"

    plain = sorted(
        (r["vec_id"], r["cell"], r["pruned"])
        for r in semantic_prune(df, centroids, threshold=0.9).collect()
    )
    split_df = semantic_prune_skew_split(
        df, centroids, threshold=0.9, hot_fraction=0.5, n_blocks=4
    )
    got = sorted((r["vec_id"], r["cell"], r["pruned"]) for r in split_df.collect())
    assert got == plain
    # the hot cell is actually pruned down (the families are tight)
    assert sum(1 for _, c, p in got if c == 0 and p) >= 100
    # the executed plan joins hot pairs on the block columns
    plan = split_df._jdf.queryExecution().executedPlan().toString()
    assert "__ba" in plan and "__bb" in plan


def test_semantic_prune_vectorized_skew_split_matches_fold(spark):
    """The BLAS+block-split composition must agree with the plain fold
    prune on planted data with clear cosine margins (same cells, same
    exists-rule; per-bucket cross-grams only change WHERE a pair is
    scored) — and with the plain vectorized prune."""
    import random

    from dwh_spark.operators.similarity import (
        semantic_prune,
        semantic_prune_vectorized,
        semantic_prune_vectorized_skew_split,
    )

    rng = random.Random(23)
    dim = 8
    base_hot = [1.0] + [0.0] * (dim - 1)
    base_cold = [0.0] * (dim - 1) + [1.0]
    rows = [
        (i, [float(x + rng.gauss(0, 0.01)) for x in base_hot]) for i in range(110)
    ] + [
        (200 + i, [float(x + rng.gauss(0, 0.01)) for x in base_cold])
        for i in range(11)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = df.filter(F.col("vec_id").isin(0, 200))

    fold = sorted(
        (r["vec_id"], r["cell"], r["pruned"])
        for r in semantic_prune(df, centroids, threshold=0.9).collect()
    )
    blas = sorted(
        (r["vec_id"], r["cell"], r["pruned"])
        for r in semantic_prune_vectorized(df, centroids, threshold=0.9).collect()
    )
    split = sorted(
        (r["vec_id"], r["cell"], r["pruned"])
        for r in semantic_prune_vectorized_skew_split(
            df, centroids, threshold=0.9, hot_fraction=0.5, n_blocks=4
        ).collect()
    )
    assert split == blas == fold


def test_discover_hot_cells_certified_superset(spark):
    """MG discovery contract: EVERY cell holding >= hot_fraction of
    rows must be returned (est + err >= frac*n selects a guaranteed
    superset), across skew shapes — one mega-cell, two hot cells, and
    near-uniform. False positives are allowed; misses are not."""
    from dwh_spark.operators.similarity import discover_hot_cells

    shapes = [
        {0: 500, 1: 30, 2: 30, 3: 40},          # one mega-cell
        {0: 200, 1: 200, 2: 50, 3: 50, 4: 20},  # two hot cells
        {i: 40 for i in range(10)},             # near-uniform
    ]
    for counts in shapes:
        rows, vid = [], 0
        for cell, n in counts.items():
            for _ in range(n):
                rows.append((vid, cell))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, cell long")
        n_total = sum(counts.values())
        for frac in (0.1, 0.25):
            hot = set(discover_hot_cells(df, hot_fraction=frac))
            must = {c for c, n in counts.items() if n >= frac * n_total}
            assert must <= hot, (counts, frac, must, hot)
