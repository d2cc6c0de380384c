"""applyInPandasWithState: state survives across micro-batches and the
final per-user totals equal the batch aggregate."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dwh_spark.sources.catalog import load_table
from dwh_spark.streaming.ingest import stage_stream_input, stream_events
from dwh_spark.streaming.stateful import running_user_state

SF = "/root/testdata/sf0.001"


def test_running_state_matches_batch_aggregate(spark, tmp_path):
    events = load_table(spark, SF, "events")
    input_dir = stage_stream_input(spark, events, str(tmp_path / "input"), n_files=3)

    out = running_user_state(stream_events(spark, input_dir, events.schema))
    q = (
        out.writeStream.format("memory")
        .queryName("user_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per user per batch it appeared in; the
    # LAST emission per user carries the accumulated totals
    emitted = spark.table("user_state")
    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_cents"])
        for r in final.collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert got == want
    # state genuinely crossed batches: some user appeared in >1 batch
    multi = emitted.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0


def test_all_late_batch_preserves_last_type(spark, tmp_path):
    """A micro-batch whose rows are all event-time-late (batch max ts <=
    state last_ts) must re-emit the persisted last_type, not NULL — the
    regression the STATE_SCHEMA last_type field exists to prevent."""
    events = load_table(spark, SF, "events").filter(F.col("user_id") == 1)
    newest = events.orderBy(F.desc("ts")).limit(1)
    older = events.join(newest.select("event_id"), "event_id", "left_anti")
    assert older.count() > 0
    input_dir = str(tmp_path / "input")
    # file source processes files in modification-time order: the newest
    # event lands in batch 0, every batch-1 row is event-time-late
    newest.coalesce(1).write.mode("append").parquet(input_dir)
    import time

    time.sleep(1.1)  # distinct mtimes so batch order is deterministic
    older.coalesce(1).write.mode("append").parquet(input_dir)

    out = running_user_state(
        stream_events(spark, input_dir, events.schema, max_files_per_trigger=1)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("late_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("late_state").orderBy("n_events").collect()
    assert len(rows) >= 2
    want_type = newest.collect()[0]["event_type"]
    # every emission, including the all-late one, carries the true last_type
    assert all(r["last_type"] == want_type for r in rows)
