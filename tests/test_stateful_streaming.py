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
