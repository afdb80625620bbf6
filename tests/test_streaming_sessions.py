"""Stateful streaming sessionization (``applyInPandasWithState``):
batch/stream equivalence plus event-time-timeout closure.

Contracts pinned:

1. **In-stream gap closure** — a gap observed inside the stream closes
   the earlier session and emits it append-only, with aggregates equal
   to the batch twin (``events_session_stats``).
2. **Timeout closure with bounded state** — sessions idle past the
   gap close when the WATERMARK passes last-activity+gap (no new rows
   for that key needed), and the state store afterwards holds nothing
   for those keys: re-sending an old-ts row for a closed key is
   dropped by the watermark, not merged into resurrected state.
"""

from __future__ import annotations

import os
from datetime import datetime

import pyspark.sql.functions as F
import pyspark.sql.types as T

from debezium_spark.streaming.sessions import sessionize_stream

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
    d = lambda h, m: datetime(2026, 3, 1, h, m)  # noqa: E731
    return [
        # user 1: two sessions separated by a >30min in-stream gap
        (1, d(9, 0), 1, "click", 1.0),
        (2, d(9, 10), 1, "click", 2.5),
        (3, d(10, 0), 1, "buy", 10.0),  # 50min gap → closes session 1
        # user 2: one session, stays open after batch A
        (4, d(9, 55), 2, "click", 4.0),
    ]


def _rows_b():
    # far-future row for a DIFFERENT user: advances the watermark past
    # every batch-A session's last-activity+gap → timeouts fire
    return [(5, datetime(2026, 3, 1, 14, 0), 9, "click", 0.25)]


def _collect_stream(spark, src, ckpt):
    out = []

    def sink(df, _eid):
        out.extend(df.collect())

    stream = spark.readStream.schema(EVENT_ST).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    return out


def _key(r):
    return (r["user_id"], r["session_start"])


def test_stream_sessions_match_batch_and_timeout_closes(spark, tmp_root):
    src = os.path.join(tmp_root, "sess_src")
    ckpt = os.path.join(tmp_root, "sess_ckpt")
    os.makedirs(src)

    spark.createDataFrame(_rows_a(), EVENT_ST).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got1 = _collect_stream(spark, src, ckpt)
    # only user 1's FIRST session closed (in-stream gap); everything
    # else is still open state
    assert [
        (r["user_id"], r["n_events"], r["value_cents"]) for r in got1
    ] == [(1, 2, 350)]
    assert got1[0]["session_start"] == datetime(2026, 3, 1, 9, 0)
    assert got1[0]["session_end"] == datetime(2026, 3, 1, 9, 10)

    # batch B: watermark jumps to 13:30 → timeout closes user 1's
    # second session and user 2's session; user 9's stays open
    spark.createDataFrame(_rows_b(), EVENT_ST).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = _collect_stream(spark, src, ckpt)
    closed = {_key(r): r for r in got1 + got2}
    assert (9, datetime(2026, 3, 1, 14, 0)) not in closed  # still open

    # equivalence: every closed session equals the batch twin computed
    # over the same rows
    from debezium_spark.queries import events_session_stats

    d = os.path.join(tmp_root, "sess_batch")
    spark.createDataFrame(_rows_a(), EVENT_ST).write.parquet(
        os.path.join(d, "events.parquet")
    )
    batch = {_key(r): r for r in events_session_stats(spark, d).collect()}
    assert set(closed) == set(batch)
    for k, r in closed.items():
        b = batch[k]
        assert (r["session_end"], r["n_events"], r["value_cents"]) == (
            b["session_end"],
            b["n_events"],
            b["value_cents"],
        ), k

    # bounded state: a below-watermark row for a CLOSED key is dropped
    # by the watermark, never resurrected into state or output
    spark.createDataFrame(
        [(6, datetime(2026, 3, 1, 9, 20), 1, "click", 99.0)], EVENT_ST
    ).coalesce(1).write.mode("append").parquet(src)
    got3 = _collect_stream(spark, src, ckpt)
    assert got3 == []
