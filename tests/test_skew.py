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
