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


def test_event_time_ttl_evicts_idle_keys(spark, tmp_path):
    """State TTL: a user active only in batch 0 whose last event falls
    more than TTL behind the advancing watermark is EVICTED — the final
    row arrives flagged, the state store shrinks. The active user's
    state survives."""
    import datetime as dt
    import os
    import shutil
    import time as _t

    from dwh_spark.streaming.stateful import running_user_state_with_ttl

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch0 = [(1, t0, 1, "click", 1.0), (2, t0, 2, "click", 1.0)]
    # 40 days later: only user 2 is still active; watermark (max ts -
    # 1 day) moves ~39 days past user 1's last event > 30-day TTL
    batch1 = [(3, t0 + dt.timedelta(days=40), 2, "view", 2.0)]
    input_dir = str(tmp_path / "input")
    os.makedirs(input_dir)
    for i, rows in enumerate([batch0, batch1]):
        tmp = str(tmp_path / f"t{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(input_dir, f"b{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    _t.sleep(0.1)

    stream = stream_events(spark, input_dir, schema, max_files_per_trigger=1)
    out = running_user_state_with_ttl(
        stream.withWatermark("ts", "1 day"), ttl_ms=30 * 86400 * 1000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("ttl_state").collect()
    evicted = [r for r in rows if r["evicted"] == "ttl"]
    assert [r["user_id"] for r in evicted] == [1]
    # the evicted row carries user 1's final accumulated state
    assert evicted[0]["n_events"] == 1 and evicted[0]["sum_cents"] == 100
    # user 2 was never evicted and accumulated across both batches
    live = [r for r in rows if r["user_id"] == 2 and r["evicted"] is None]
    assert max(r["n_events"] for r in live) == 2
