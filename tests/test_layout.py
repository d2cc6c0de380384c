"""Z-order key: correct interleave, and the locality property that
motivates it — range-partitioning on the Morton key bounds BOTH
dimensions' per-partition spread, where a linear key bounds one."""

from pyspark.sql import functions as F

from dwh_spark.functions.layout import zorder_key
from dwh_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_zorder_bit_interleave_exact(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    (row,) = df.select(zorder_key(F.col("a"), F.col("b"), bits=4).alias("z")).collect()
    # a bits at even positions: 0,1,0,1 -> 0b01000100; b at odd: 0,1,1,0 -> 0b00101000
    assert row["z"] == 0b01000100 | 0b00101000


def _avg_spread(df, part_key, col):
    parts = (
        df.repartitionByRange(8, part_key)
        .select(F.spark_partition_id().alias("p"), F.col(col))
        .groupBy("p")
        .agg((F.max(col) - F.min(col)).alias("spread"))
    )
    rows = parts.collect()
    return sum(r["spread"] for r in rows) / len(rows)


def test_zorder_bounds_both_dimensions(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("day")
    )
    z = zorder_key(F.col("user_id"), F.col("day"), bits=8)
    # linear layout on user_id: every partition spans ~the whole month
    linear_day_spread = _avg_spread(ev, F.col("user_id"), "day")
    zorder_day_spread = _avg_spread(ev, z, "day")
    assert zorder_day_spread < linear_day_spread * 0.8
    # and user_id locality is retained (not perfect, but bounded)
    full_user_spread = _avg_spread(ev, F.col("day"), "user_id")
    zorder_user_spread = _avg_spread(ev, z, "user_id")
    assert zorder_user_spread < full_user_spread
