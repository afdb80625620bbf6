"""Structured Streaming window aggregation: the streaming twin of the
``events_tumbling_window`` catalog query.

Two contracts pinned here:

1. **Batch/stream equivalence** — the same ``F.window`` aggregation
   over the same rows produces identical results whether it runs as a
   batch groupBy or through ``readStream`` (complete mode). This is
   the property that lets the catalog verify the streaming operator
   with a DuckDB oracle on the batch twin.
2. **Watermark late-row eviction** — with ``withWatermark``, a row
   arriving (in a later trigger, after a checkpointed restart) with an
   event time older than the persisted watermark is DROPPED from the
   aggregation; fresh rows still aggregate. This is the bounded-state
   guarantee that makes the operator viable on an unbounded 100 TB/day
   stream — without it, window state grows forever.

Reference analogue: Debezium's event-time windows live downstream in
Kafka Streams; here the engine itself owns them
(``pipeline/txmetadata`` orders by source time the same way).
"""

from __future__ import annotations

import os
import time
from datetime import datetime

import pyspark.sql.functions as F
import pyspark.sql.types as T

EVENT_ST = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows_a():
    d = lambda h, m: datetime(2026, 1, 15, h, m)  # noqa: E731
    return [
        (1, d(10, 5), 1, "click", 1.5),
        (2, d(10, 40), 2, "click", 2.0),
        (3, d(11, 10), 1, "buy", 10.0),
        (4, d(12, 59), 3, "click", 0.5),
    ]


def _rows_b():
    d = lambda h, m: datetime(2026, 1, 15, h, m)  # noqa: E731
    return [
        # LATE: event time 10:07, but the checkpointed watermark is
        # 12:59 - 30min = 12:29 → must be dropped
        (5, d(10, 7), 9, "click", 100.0),
        # fresh row: new 13:00 window
        (6, d(13, 30), 2, "buy", 4.0),
    ]


def _windowed(df):
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def _run_available(stream_df, checkpoint):
    """Run one availableNow trigger through foreachBatch (the only
    sink shape that supports checkpoint recovery) and return the
    emitted update rows as {(window_start, event_type): (n, cents)}."""
    out: dict = {}

    def sink(df, _eid):
        for r in df.collect():
            out[(r["window_start"], r["event_type"])] = (
                r["n_events"],
                r["value_cents"],
            )

    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    return out


def test_stream_equals_batch_and_watermark_drops_late(spark, tmp_root):
    src = os.path.join(tmp_root, "stream_src")
    ckpt = os.path.join(tmp_root, "ckpt")
    os.makedirs(src)
    spark.createDataFrame(_rows_a(), EVENT_ST).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(EVENT_ST).parquet(src)
    agg = _windowed(stream.withWatermark("ts", "30 minutes"))

    got1 = _run_available(agg, ckpt)
    batch1 = {
        (r["window_start"], r["event_type"]): (
            r["n_events"],
            r["value_cents"],
        )
        for r in _windowed(
            spark.createDataFrame(_rows_a(), EVENT_ST)
        ).collect()
    }
    assert got1 == batch1  # batch/stream equivalence on trigger 1

    # second trigger after restart from the same checkpoint: the
    # persisted watermark (12:29) must drop the 10:07 straggler but
    # aggregate the fresh 13:30 row
    spark.createDataFrame(_rows_b(), EVENT_ST).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(EVENT_ST).parquet(src)
    agg2 = _windowed(stream2.withWatermark("ts", "30 minutes"))
    got2 = _run_available(agg2, ckpt)

    late_key = (datetime(2026, 1, 15, 10, 0), "click")
    fresh_key = (datetime(2026, 1, 15, 13, 0), "buy")
    # the late row's window is NOT re-emitted (row filtered below the
    # watermark before aggregation — bounded state at scale)
    assert late_key not in got2
    # the fresh row aggregated normally
    assert got2[fresh_key] == (1, 400)
