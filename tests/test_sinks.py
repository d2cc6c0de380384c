"""Sink layout semantics: partition pruning and bucketed shuffle-free joins."""

import os

from pyspark.sql import functions as F

from dwh_spark.sources.catalog import load_table
from dwh_spark.sources.sinks import read_partitioned, write_bucketed, write_partitioned

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    events = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    write_partitioned(events, path, partition_by=["day"], sort_by=["user_id"])

    # layout: one dir per day
    days = [d for d in os.listdir(path) if d.startswith("day=")]
    assert len(days) > 1

    back = read_partitioned(spark, path)
    one_day = sorted(d[len("day="):] for d in days)[0]
    q = back.filter(F.col("day") == one_day)
    # partition pruning: only the matching directory is scanned
    plan = q.queryExecution().explainString("formatted") if hasattr(q, "queryExecution") else \
        q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert q.count() == events.filter(F.to_date("ts") == one_day).count()
    assert "PartitionFilters: [isnotnull(day" in plan

    # round-trip integrity
    assert back.count() == events.count()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    events = load_table(spark, SF, "events")
    write_bucketed(
        events, "ev_bucketed", bucket_by=["user_id"], n_buckets=4, sort_by=["user_id"],
        path=str(tmp_path / "ev_bucketed"),
    )
    t = spark.table("ev_bucketed")
    agg = t.groupBy("user_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    # the groupBy on the bucket key needs NO exchange
    assert "Exchange" not in plan
    assert agg.count() == events.select("user_id").distinct().count()
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")


def test_compact_small_files(spark, tmp_path):
    from dwh_spark.sources.sinks import compact_small_files

    events = load_table(spark, SF, "events")
    small = str(tmp_path / "small")
    events.repartition(64).write.parquet(small)  # 64 tiny files
    compacted = str(tmp_path / "compacted")
    n = compact_small_files(spark, small, compacted, target_file_bytes=10**9)
    assert n == 1
    import glob as g
    assert len(g.glob(f"{compacted}/*.parquet")) == 1
    # content preserved exactly
    before = events.groupBy("event_type").count().collect()
    after = spark.read.parquet(compacted).groupBy("event_type").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
