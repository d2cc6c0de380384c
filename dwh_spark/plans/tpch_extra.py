"""Extended TPC-H-shape relational battery (round 3).

The reference's query surface is Hasura→PostgreSQL relational reads
(`README.md:89-152`): projections, predicate combinators, FK joins,
aggregates, pagination. Rounds 1-2 covered those shapes (Q1-Q8 in
SURVEY.md §2.3) plus TPC-H q1/q3/q5/q13; this module widens the battery
with the remaining TPC-H shapes expressible on the driver's simplified
star schema: EXISTS/semi joins, scalar subqueries, correlated
aggregates, disjunctive pushdown predicates, conditional-ratio
aggregates, min-equality joins, and anti joins.

Adaptations forced by the fixture schema (no partsupp, no
commit/receipt dates, no phone/comment columns) are noted per query.

Determinism: registry.py rules — DECIMAL(18,2) before aggregation,
exact-decimal comparisons for threshold/min-equality/top-k selection
(double rounding must never decide membership), DOUBLE only in final
output columns.

Scale notes (100 TB):
- all dimension sides (part, supplier, nation, region, customer where
  filtered) are explicit ``F.broadcast``; the lineitem side never
  shuffles on a dim key.
- semi/anti joins use ``leftsemi``/``leftanti`` so Spark plans
  broadcast-hash-semi rather than materializing a distinct+inner.
- scalar subqueries (global avg / max) are 1-row broadcast cross
  joins, not ``collect()``.
- OR-of-ANDs predicates (q19) stay as one scan filter → parquet
  row-group pruning on (brand, size) min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dwh_spark.plans.registry import query
from dwh_spark.sources.catalog import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _volume() -> F.Column:
    """l_extendedprice * (1 - l_discount) as exact decimal."""
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


_VOL_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# ---------------------------------------------------------------------------
# TPC-H q2 shape: min-equality join ("cheapest EUROPE supplier per part").
# partsupp is absent → supplier cost is proxied by the minimum extended
# price any EUROPE supplier shipped that part for. Exercises: groupBy-min
# + equality join-back, multi-dim broadcast chain, region filter.
# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu AS (
      SELECT l_partkey, l_suppkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
    ),
    mins AS (SELECT l_partkey, min(price) AS minp FROM eu GROUP BY 1)
    SELECT DISTINCT p.p_partkey AS partkey, p.p_name AS part_name,
           s.s_name AS supp_name, n.n_name AS supp_nation,
           CAST(m.minp AS DOUBLE) AS min_price
    FROM eu e
    JOIN mins m    ON e.l_partkey = m.l_partkey AND e.price = m.minp
    JOIN part p    ON p.p_partkey = e.l_partkey
                   AND p.p_size = 15 AND p.p_type = 'STANDARD'
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    eu_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    eu = li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", "l_suppkey", "s_name", "n_name",
        _dec("l_extendedprice").alias("price"),
    )
    mins = eu.groupBy("l_partkey").agg(F.min("price").alias("minp"))
    return (
        eu.join(mins.withColumnRenamed("l_partkey", "m_partkey"),
                (F.col("l_partkey") == F.col("m_partkey")) & (F.col("price") == F.col("minp")))
        .join(
            F.broadcast(part.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("supp_nation"),
            F.col("minp").cast("double").alias("min_price"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# TPC-H q4 shape: EXISTS (semi join) with a correlated inequality.
# commit/receipt dates are absent → "late" is a lineitem shipped >60 days
# after the order date. Exercises: leftsemi with compound condition.
# ---------------------------------------------------------------------------
@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return (
        o.join(li, late, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H q6: the canonical pushdown query — range + equality predicates
# straight to the parquet scan, single global aggregate.
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q7 shape: bidirectional nation-pair trade volume per ship year.
# Exercises: two roles of the same dimension (nation as supplier-side and
# customer-side), symmetric OR pair predicate, year extraction.
# ---------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year, {_VOL_SQL} AS volume
          FROM lineitem
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01') x
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H q8 shape: market share — conditional-ratio aggregate over a
# multi-dim join (nation's share of AMERICA-region ECONOMY-part revenue
# per order year). NULL-sum numerator coalesced identically both sides.
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(coalesce(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE), 0.0)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT year(o_orderdate) AS o_year, {_VOL_SQL} AS volume, n1.n_name AS nation
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          JOIN region   ON r_regionkey = n2.n_regionkey AND r_name = 'AMERICA'
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey) x
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier")

    amer_cust = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "nation")
    vol = _volume()
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(amer_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("nation") == "NATION_3", vol)).cast("double"),
                    F.lit(0.0),
                )
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q9 shape: profit by supplier nation × order year for one part
# family. ps_supplycost is absent → profit is discounted revenue.
# ---------------------------------------------------------------------------
@query(
    "q9_profit_by_nation",
    oracle=f"""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year, {_VOL_SQL} AS amount
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%red%'
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON n_nationkey = s_nationkey) x
    GROUP BY 1, 2
    """,
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%")).select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_volume()).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H q10: top-20 customers by returned-item revenue in a quarter.
# Top-k selection ordered by the EXACT decimal revenue (double rounding
# must not decide membership), custkey tie-break for determinism.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey AS custkey, c_name AS name,
           CAST(sum({_VOL_SQL}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal, n_name AS nation
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY 1, 2, c_acctbal, 5
    ORDER BY sum({_VOL_SQL}) DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_volume()).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("custkey"))
        .limit(20)
        .select(
            "custkey", "name",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "nation",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q14: promo revenue share — conditional ratio over one month.
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(100.0 * coalesce(CAST(sum(CASE WHEN p_type = 'PROMO' THEN volume END) AS DOUBLE), 0.0)
                 / CAST(sum(volume) AS DOUBLE), 6) AS promo_share
    FROM (SELECT p_type, {_VOL_SQL} AS volume
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-09-01'
            AND l_shipdate <  TIMESTAMP '1997-10-01') x
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    vol = _volume()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              li.l_partkey == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.coalesce(
                    F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double"),
                    F.lit(0.0),
                )
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q15: top supplier(s) by quarterly revenue — scalar-subquery max
# as a 1-row broadcast cross join, equality on the exact decimal.
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, sum({_VOL_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey AS suppkey, s.s_name AS name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_volume()).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("max_rev"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q17 shape: correlated aggregate — lines whose quantity is below
# 20% of their part's average. The avg comparison is done in exact
# integer/decimal form (5·qty·cnt < sum_qty ⟺ qty < 0.2·avg) so a
# float-rounded average can never flip a boundary row between engines.
# ---------------------------------------------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
    JOIN (SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                 count(*) AS cnt
          FROM lineitem GROUP BY 1) a ON a.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * a.cnt < a.sum_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q18: large orders (HAVING over a grouped sum used as an IN/semi
# filter). Threshold 250 ≈ p99 of per-order quantity in the fixtures.
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name AS name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_orderdate AS orderdate, CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1
                           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
    GROUP BY 1, 2, 3, 4, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("big_qty"))
        .filter(F.col("big_qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("big_orderkey"), "leftsemi")
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(li.select("l_orderkey", "l_quantity"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice"),
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"))
        .withColumn("totalprice", F.col("o_totalprice").cast("double"))
        .select("name", "custkey", "orderkey", "orderdate", "totalprice", "sum_qty")
    )


# ---------------------------------------------------------------------------
# TPC-H q19: disjunctive pushdown — three OR'd (brand, size, quantity)
# bands as ONE scan filter; shipinstruct/shipmode absent.
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({_VOL_SQL}) AS DOUBLE) AS revenue, count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                     li.l_partkey == F.col("p_partkey"))
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(band).agg(
        F.sum(_volume()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# TPC-H q20 shape: nested semi join — suppliers who shipped >500 units of
# '%blue%' parts in 1997. partsupp/availqty absent → shipped quantity.
# ---------------------------------------------------------------------------
@query(
    "q20_parts_suppliers_semi",
    oracle="""
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%blue%'
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 500)
    """,
)
def q20_parts_suppliers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part.filter(F.col("p_name").like("%blue%")).select("p_partkey")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("ship_qty"))
        .filter(F.col("ship_qty") > 500)
    )
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "leftsemi")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
    )


# ---------------------------------------------------------------------------
# TPC-H q22 shape: anti join + global scalar threshold. Every fixture
# customer has orders, so "idle" = no order since 2001-01-01; the
# above-average balance test uses the exact bal·n > sum form so a
# float-rounded average can never flip a boundary customer.
# ---------------------------------------------------------------------------
@query(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (SELECT c_custkey, c_nationkey,
                        CAST(c_acctbal AS DECIMAL(18,2)) AS bal
                 FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE)),
         stats AS (SELECT sum(bal) AS s, count(*) AS n FROM pos)
    SELECT n.n_name AS nation, count(*) AS numcust,
           CAST(sum(c.bal) AS DOUBLE) AS totacctbal
    FROM pos c
    CROSS JOIN stats st
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.bal * st.n > st.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    pos = customer.filter(F.col("c_acctbal") > 0).select(
        "c_custkey", "c_nationkey", _dec("c_acctbal").alias("bal")
    )
    stats = pos.agg(F.sum("bal").alias("s"), F.count("*").alias("n"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        pos.crossJoin(F.broadcast(stats))
        .filter(F.col("bal") * F.col("n") > F.col("s"))
        .join(recent, pos.c_custkey == recent.o_custkey, "leftanti")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q12 shape: conditional priority counts by ship mode. The fixture
# has no l_shipmode/l_commitdate/l_receiptdate, so (documented proxies)
# l_returnflag stands in as the mode-like grouping column and "late"
# means shipped >90 days after the order date. Exercises: fact-fact
# equi join + CASE-conditional integer sums — q12's defining shape.
# ---------------------------------------------------------------------------
@query(
    "q12_shipmode_priority_counts",
    oracle="""
    SELECT l_returnflag AS ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
      AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q12_shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q21 shape: the double-correlated EXISTS / NOT-EXISTS anti-join —
# suppliers whose late lineitem is the ONLY late one on a multi-supplier
# finished order. Proxies as in q12: late = shipped >90 days after order
# date; the original's single-nation filter is dropped (100 fixture
# suppliers over 25 nations would leave ~4) — the join shape, not the
# selectivity, is the point. Scale: the fact-fact join shuffles on
# l_orderkey once and both EXISTS arms reuse that key; supplier names
# resolve via broadcast.
# ---------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH fj AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                WHERE o_orderstatus = 'F'),
    late AS (SELECT l_orderkey, l_suppkey FROM fj
             WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY),
    all_f AS (SELECT DISTINCT l_orderkey, l_suppkey FROM fj),
    late_d AS (SELECT DISTINCT l_orderkey, l_suppkey FROM late)
    SELECT s_name AS name, count(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM all_f l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late_d l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1 ORDER BY numwait DESC, name LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    fj = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = fj.filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select("l_orderkey", "l_suppkey")
    all_f = fj.select("l_orderkey", "l_suppkey").distinct()
    late_d = late.distinct()
    l2 = all_f.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late_d.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waiting = (
        late.join(
            l2,
            (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3),
            "leftanti",
        )
    )
    return (
        waiting.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            waiting.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H q11 shape: grouped value vs a scalar fraction of the global
# total. partsupp is absent → "stock value" of a part is proxied by the
# value ASIA-region suppliers shipped of it (extendedprice × quantity).
# The threshold uses the exact-decimal form v·1000 > total so a
# float-rounded fraction can never flip a boundary part (q22 pattern).
# ---------------------------------------------------------------------------
@query(
    "q11_important_stock",
    oracle="""
    WITH stock AS (
      SELECT l_partkey,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      JOIN region   ON r_regionkey = n_regionkey AND r_name = 'ASIA'),
    tot AS (SELECT sum(val) AS t FROM stock)
    SELECT l_partkey AS partkey, CAST(sum(val) AS DOUBLE) AS stock_value
    FROM stock CROSS JOIN tot
    GROUP BY l_partkey, t
    HAVING sum(val) * 1000 > t
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    stock = li.join(
        F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey")
    ).select(
        "l_partkey",
        (_dec("l_extendedprice") * _dec("l_quantity")).alias("val"),
    )
    tot = stock.agg(F.sum("val").alias("t"))
    return (
        stock.groupBy("l_partkey")
        .agg(F.sum("val").alias("v"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("v") * 1000 > F.col("t"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v").cast("double").alias("stock_value"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H q16 shape: distinct-supplier counts per part attribute triple
# with a NOT-IN supplier exclusion. The complaint regex is proxied by
# negative account balance (no comment column in the fixture supplier).
# Exercises: anti join on a broadcast exclusion list + count(DISTINCT)
# over a three-column group.
# ---------------------------------------------------------------------------
@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand AS brand, p_type AS type, p_size AS size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    complained = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(complained), li.l_suppkey == F.col("s_suppkey"), "leftanti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
