"""Stateful streaming sessionization — gap-based session windows as a
custom ``applyInPandasWithState`` operator.

The batch twin is the ``events_session_stats`` catalog query (lag +
running-sum gap split, then a per-session groupBy); this module is the
same semantics expressed as an UNBOUNDED-stream operator: per-user
state holds only the one OPEN session (4 scalars), closed sessions are
emitted append-only, and the event-time timeout (watermark ≥ last
activity + gap) closes idle sessions so state never grows with stream
length — the bounded-state property that makes the operator viable on
a 100 TB/day event stream.

Reference analogue: Debezium leaves session semantics to downstream
Kafka Streams session windows; here the engine owns them, the same
ownership shift as ``events_tumbling_window``.

Scale shape: one hash exchange on ``user_id`` (the stateful groupBy),
Arrow-batched pandas fold per key group — no per-row Python round
trips, no global sort. A hot user serializes its own key group only
(same bound as any keyed session-window implementation).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

GAP_MS_DEFAULT = 30 * 60 * 1000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

# open-session state: 4 scalars per user, independent of stream length
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)


def _fold_sessions(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
    gap_ms: int,
) -> Iterator[pd.DataFrame]:
    """Fold a key group's micro-batch rows into the open session,
    emitting every session that CLOSES (a gap observed in-batch, or
    the event-time timeout firing with no new rows)."""
    closed: list[tuple[int, int, int, int, int]] = []
    uid = key[0]

    if state.hasTimedOut:
        # watermark passed last activity + gap with no new rows: the
        # open session is complete by definition of the gap window
        if state.exists:
            s0, s1, n, cents = state.get
            closed.append((uid, s0, s1, n, cents))
        state.remove()
    else:
        open_sess = list(state.get) if state.exists else None
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            ms = (
                pdf["ts"].astype("datetime64[ms]").astype("int64")
            )
            cents = pdf["value_cents"]
            rows.extend(zip(ms.tolist(), cents.tolist()))
        rows.sort()
        for ms, cents in rows:
            if open_sess is None:
                open_sess = [ms, ms, 1, cents]
            elif ms - open_sess[1] > gap_ms:
                closed.append((uid, *open_sess))
                open_sess = [ms, ms, 1, cents]
            else:
                open_sess[1] = max(open_sess[1], ms)
                open_sess[2] += 1
                open_sess[3] += cents
        if open_sess is not None:
            state.update(tuple(open_sess))
            # close when the watermark passes last activity + gap;
            # Spark requires the timeout to sit above the current
            # watermark, so clamp (a clamped timeout just fires on the
            # next watermark advance — same closure, one batch later)
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(open_sess[1] + gap_ms, wm + 1))

    if closed:
        out = pd.DataFrame(
            closed,
            columns=[
                "user_id",
                "session_start",
                "session_end",
                "n_events",
                "value_cents",
            ],
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="ms")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="ms")
        yield out


def sessionize_stream(
    events,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
):
    """Gap-based session windows over a STREAMING events DataFrame
    (``ts``, ``user_id``, ``value`` columns required).

    Returns an append-only stream of CLOSED sessions
    (:data:`SESSION_SCHEMA`); the per-user open session lives in the
    state store and is closed either by an in-stream gap or by the
    event-time timeout once the watermark passes ``last activity +
    gap``. Rows older than the watermark are dropped before the
    stateful operator (bounded state on unbounded input).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    prepped = (
        events.withWatermark("ts", watermark)
        .select(
            "ts",
            F.col("user_id").cast("long").alias("user_id"),
            F.floor(F.col("value") * 100)
            .cast("long")
            .alias("value_cents"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _fold_sessions(key, pdfs, state, gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
