"""Stream-stream interval join: the Structured Streaming twin of the
``events_interval_join`` catalog family.

Contracts pinned:

1. **Batch/stream equivalence** — the same time-bounded inner join
   (clicks within 10 minutes after an error, per user) produces the
   identical pair set whether both sides are batch DataFrames or two
   watermarked streams self-joined in append mode.
2. **Bounded join state** — the watermark + time-range join condition
   lets Spark expire buffered rows: an error arriving in a later
   trigger (after a checkpointed restart) with event time older than
   the persisted watermark finds no partner and is dropped from the
   join state rather than buffered forever. Without the range bound
   the state of a 100 TB/day stream grows without limit — the same
   reason the batch twin refuses the unbounded theta-join shape.

Reference analogue: Debezium leaves cross-event correlation to Kafka
Streams / Flink consumers; the engine owns it here, over the same
envelope feed it publishes.
"""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
import pyspark.sql.types as T

EVENT_ST = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _rows_a():
    d = lambda h, m: datetime(2026, 2, 1, h, m)  # noqa: E731
    return [
        (1, d(10, 0), 1, "error"),
        (2, d(10, 4), 1, "click"),  # joins err 1 (+4m)
        (3, d(10, 9), 1, "click"),  # joins err 1 (+9m)
        (4, d(10, 12), 1, "click"),  # outside 10m -> no pair
        (5, d(10, 0), 2, "error"),
        (6, d(10, 30), 2, "click"),  # outside -> no pair
        # the engine takes the MIN of the two sides' watermarks, so
        # BOTH sides need a 12:00 row to advance the global watermark
        # to 11:30 (neither joins anything: u3 has no errors yet, u4
        # no clicks)
        (7, d(12, 0), 3, "click"),
        (11, d(12, 0), 4, "error"),
    ]


def _rows_b():
    d = lambda h, m: datetime(2026, 2, 1, h, m)  # noqa: E731
    return [
        # LATE error: event time 10:02 but the checkpointed watermark
        # is ~12:00 - 30min = 11:30; its click partners' state was
        # already evicted -> must produce NO pair
        (8, d(10, 2), 1, "error"),
        # fresh pair entirely above the watermark
        (9, d(12, 10), 3, "error"),
        (10, d(12, 15), 3, "click"),
    ]


def _pairs_batch(spark, rows):
    df = spark.createDataFrame(rows, EVENT_ST)
    err = df.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("err_ts"),
    )
    clk = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("clk_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("clk_ts"),
    )
    j = err.join(
        clk,
        F.expr(
            "u = cu AND clk_ts >= err_ts "
            "AND clk_ts < err_ts + interval 10 minutes"
        ),
    )
    return {(r["err_id"], r["clk_id"]) for r in j.collect()}


def _joined_stream(spark, src_dir):
    raw = (
        spark.readStream.schema(EVENT_ST).parquet(src_dir)
    )
    err = (
        raw.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("u"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "30 minutes")
    )
    clk = (
        raw.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("clk_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "30 minutes")
    )
    return err.join(
        clk,
        F.expr(
            "u = cu AND clk_ts >= err_ts "
            "AND clk_ts < err_ts + interval 10 minutes"
        ),
    )


def _run_available(stream_df, checkpoint):
    out: set = set()

    def sink(df, _eid):
        for r in df.collect():
            out.add((r["err_id"], r["clk_id"]))

    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    return out


def test_stream_join_equals_batch_and_state_is_bounded(spark, tmp_root):
    src = f"{tmp_root}/feed"
    ckpt = f"{tmp_root}/ckpt"
    os.makedirs(src, exist_ok=True)

    spark.createDataFrame(_rows_a(), EVENT_ST).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = _run_available(_joined_stream(spark, src), ckpt)
    want = _pairs_batch(spark, _rows_a())
    assert got == want == {(1, 2), (1, 3)}

    # restart from checkpoint with one late error + one fresh pair
    spark.createDataFrame(_rows_b(), EVENT_ST).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = _run_available(_joined_stream(spark, src), ckpt)
    # the fresh pair appears; the late error's would-be pairs do NOT —
    # its partners were expired from the join state by the watermark
    assert got2 == {(9, 10)}
