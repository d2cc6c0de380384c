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
