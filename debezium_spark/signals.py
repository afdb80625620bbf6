"""Ad-hoc signal channel — pause / resume / stop / execute-snapshot.

Reference: ``pipeline/signal/SignalRecord.java:26-31`` (rows of
``(id, type, data-json)``), ``SignalProcessor.java:1-220`` polls a
signal table/topic/file and dispatches to actions in
``pipeline/signal/actions/snapshotting/`` (ExecuteSnapshot,
StopSnapshot, PauseIncrementalSnapshot/Resume, plus Log).

Spark re-expression: a JSON-lines control file polled between
micro-batches (the engine is driver-paced, so "between batches" is the
natural signal boundary — same granularity as the reference's poll
loop). Processed signal ids are tracked in a sidecar file so replay
after restart does not re-fire actions (the reference gets this from
offsets in the signal topic).

Delivery is at-least-once: :meth:`SignalChannel.poll` returns pending
signals WITHOUT marking them; the engine calls :meth:`SignalChannel.ack`
only after the signal's action completed, so a crash mid-action re-fires
the signal on restart (the reference commits signal offsets after
processing; actions are idempotent — the incremental-snapshot chunks an
execute-snapshot re-fire produces are LWW-deduped by the watermark).
"""

from __future__ import annotations

import json
import os

KNOWN_TYPES = (
    "pause",
    "resume",
    "stop",
    "execute-snapshot",
    "blocking-snapshot",
    # in-flight snapshot control, polled between chunks
    # (actions/snapshotting/StopSnapshot.java:31,
    # PauseIncrementalSnapshot.java, ResumeIncrementalSnapshot.java)
    "stop-snapshot",
    "pause-snapshot",
    "resume-snapshot",
    "log",
    # per-chunk incremental-snapshot watermark rows the ENGINE itself
    # writes into the signal collection (OpenIncrementalSnapshotWindow /
    # CloseIncrementalSnapshotWindow names; written by
    # InsertWindowCloser.java:33-43 / DeleteWindowCloser.java:36-55).
    # Bookkeeping, not commands: the LSN watermark is the actual fence.
    "snapshot-window-open",
    "snapshot-window-close",
)


class SignalChannel:
    def __init__(self, path: str, processed_path: str | None = None):
        # ``processed_path``: consumer-scoped ack ledger. The signal
        # file is a shared channel (any writer appends); WHICH signals
        # a consumer has handled is that consumer's own state — with
        # several engines tailing one channel (multi-table capture),
        # each keeps its ledger under its own lake root so one
        # engine's ack never hides a signal from another (the
        # consumer-group-offsets shape).
        self.path = path
        self._done_path = processed_path or (path + ".processed")

    def _processed(self) -> set[str]:
        if not os.path.exists(self._done_path):
            return set()
        with open(self._done_path) as f:
            return {line.strip() for line in f if line.strip()}

    def _mark(self, ids: list[str]) -> None:
        with open(self._done_path, "a") as f:
            for i in ids:
                f.write(i + "\n")

    def send(self, sid: str, stype: str, data: dict | None = None) -> None:
        """Append a signal (test/ops helper — any writer can append).
        Mutators take an exclusive flock on the file so a concurrent
        :meth:`delete` rewrite can't lose an in-flight append."""
        import fcntl

        with open(self.path, "a") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            f.write(
                json.dumps({"id": sid, "type": stype, "data": data or {}})
                + "\n"
            )

    def poll(self) -> list[dict]:
        """Unprocessed signals in file order. Does NOT mark them —
        call :meth:`ack` once each signal's action has completed."""
        import fcntl

        if not os.path.exists(self.path):
            return []
        done = self._processed()
        out = []
        with open(self.path) as f:
            # shared lock: mutators (send/delete) hold LOCK_EX, so a
            # reader can never observe a half-rewritten file
            fcntl.flock(f, fcntl.LOCK_SH)
            for line in f:
                line = line.strip()
                if not line:
                    continue
                sig = json.loads(line)
                if sig["id"] in done:
                    continue
                out.append(sig)
        return out

    def ack(self, sid: str) -> None:
        """Mark one signal processed (call after its action commits)."""
        self._mark([sid])

    def delete(self, sid: str) -> None:
        """Remove a signal row from the collection — the reference's
        ``DELETE FROM <signal> WHERE id = ?`` used by the INSERT_DELETE
        watermarking strategy to close a chunk window by deleting its
        ``-open`` row (DeleteWindowCloser.java:26-55).

        The read→rewrite happens under the same exclusive flock
        :meth:`send` takes, so a concurrent ops append can't be lost to
        the rewrite window; kept lines are re-terminated so a trailing
        partial line from an external writer can't concatenate with the
        next append."""
        import fcntl

        if not os.path.exists(self.path):
            return
        with open(self.path, "r+") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            lines = [ln.strip() for ln in f if ln.strip()]
            kept = [ln for ln in lines if json.loads(ln)["id"] != sid]
            f.seek(0)
            f.truncate()
            for ln in kept:
                f.write(ln + "\n")

class TopicSignalChannel(SignalChannel):
    """Broker-topic signal channel — the ``KafkaSignalChannel``
    analogue (``pipeline/signal/channels/KafkaSignalChannel.java``:
    one single-partition topic of (id, type, data) records, consumers
    tail it with their own committed offsets). The sandbox has no
    broker, but the transport semantics are fully expressible over an
    append-only SEGMENTED directory — the same file-topic shape
    :mod:`debezium_spark.publisher` uses for the outbound leg:

    - the topic is a directory of ``segment-NNNNNNNN.jsonl`` files,
      append-only within a segment, ordered by (segment, line) —
      a partition's offset order;
    - producers ``send`` to the tail segment (flock-exclusive) and may
      ``roll()`` a new segment (broker segment rotation);
    - each consumer keeps its OWN processed ledger (consumer-group
      offsets), so with several engines tailing one topic a signal
      fires once per consumer — identical ack semantics to the file
      channel, same at-least-once contract;
    - ``delete`` is NOT supported: a log is append-only, exactly as
      Kafka cannot delete a record — engines using the
      ``insert_delete`` watermarking strategy must keep the file or
      source channel (the reference's window-close-by-DELETE also
      requires the signal *table*, not the topic).
    """

    SEG_PREFIX = "segment-"

    def __init__(self, path: str, processed_path: str | None = None):
        os.makedirs(path, exist_ok=True)
        super().__init__(
            path,
            processed_path
            or os.path.join(path, "_consumer.default.processed"),
        )

    # -- segment layout -------------------------------------------------
    def _segments(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.path)
            if n.startswith(self.SEG_PREFIX) and n.endswith(".jsonl")
        )

    def _tail_segment(self) -> str:
        segs = self._segments()
        if segs:
            return os.path.join(self.path, segs[-1])
        return os.path.join(self.path, f"{self.SEG_PREFIX}00000001.jsonl")

    def roll(self) -> str:
        """Start a new tail segment (broker segment rotation); older
        segments stay readable until retention removes them."""
        segs = self._segments()
        n = 1 + (
            int(segs[-1][len(self.SEG_PREFIX) :].split(".")[0])
            if segs
            else 0
        )
        p = os.path.join(self.path, f"{self.SEG_PREFIX}{n:08d}.jsonl")
        open(p, "a").close()
        return p

    # -- producer / consumer -------------------------------------------
    def send(self, sid: str, stype: str, data: dict | None = None) -> None:
        import fcntl

        with open(self._tail_segment(), "a") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            f.write(
                json.dumps({"id": sid, "type": stype, "data": data or {}})
                + "\n"
            )

    def poll(self) -> list[dict]:
        import fcntl

        done = self._processed()
        out = []
        for seg in self._segments():
            # shared lock against a concurrent send()'s LOCK_EX append,
            # so we never observe a torn mid-append line (the base
            # channel's poll takes the same flock)
            with open(os.path.join(self.path, seg)) as f:
                fcntl.flock(f, fcntl.LOCK_SH)
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    sig = json.loads(line)
                    if sig["id"] in done:
                        continue
                    out.append(sig)
        return out

    def delete(self, sid: str) -> None:
        raise NotImplementedError(
            "a topic channel is append-only (Kafka cannot delete a "
            "record); use the file or source channel for the "
            "insert_delete watermarking strategy"
        )

    def expire_segments(self, keep_last: int = 2) -> dict:
        """Broker retention: drop the oldest segments, keeping the
        newest ``keep_last`` (the tail segment always survives).
        Exactly like Kafka's time/size retention this is CONSUMER-
        BLIND — a consumer that lags past retention silently loses the
        expired records (its ledger keeps any acks; unacked expired
        records simply stop appearing in :meth:`poll`). Returns
        removal counts for ops visibility."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        segs = self._segments()
        drop = segs[:-keep_last]
        removed_records = 0
        for n in drop:
            p = os.path.join(self.path, n)
            with open(p) as f:
                removed_records += sum(1 for ln in f if ln.strip())
            os.unlink(p)
        return {
            "removed_segments": len(drop),
            "removed_records": removed_records,
            "retained_segments": len(segs) - len(drop),
        }


def open_signal_channel(
    path: str, kind: str = "file", processed_path: str | None = None
) -> SignalChannel:
    """Channel factory: ``file`` (JSON-lines control file) or
    ``topic`` (segmented append-only directory, KafkaSignalChannel
    analogue). The engine picks via ``EngineConfig.
    signal_channel_kind``."""
    if kind == "file":
        return SignalChannel(path, processed_path=processed_path)
    if kind == "topic":
        return TopicSignalChannel(path, processed_path=processed_path)
    raise ValueError(f"signal_channel_kind must be file|topic, got {kind!r}")


# ---------------------------------------------------------------------------
# Source channel — signals riding the change stream itself
# (pipeline/signal/channels/SourceSignalChannel.java: a dedicated
# signaling table of (id, type, data) captured by CDC; its change
# events surface as stream records and are dispatched at their log
# position). Our log multiplexes control payloads through op='m'
# rows' `message` column, so a source-channel signal is a message
# payload of shape {"signal": {"id": ..., "type": ..., "data": {...}}}
# — distinguished from schema-change payloads by the "signal" key the
# way the reference distinguishes by table name.
# ---------------------------------------------------------------------------


def is_source_signal_payload(message: str) -> bool:
    """True iff the op='m' message payload is a source-channel signal
    row (well-formed or not) rather than a schema-change event."""
    try:
        obj = json.loads(message)
    except Exception:
        return False
    return isinstance(obj, dict) and "signal" in obj


def parse_source_signal(message: str) -> dict | None:
    """Parse a source-channel signal payload.

    Returns the inner ``{"id", "type", "data"}`` dict, or None when the
    payload is not a signal row at all (schema-change payloads fall
    through to the schema path). A payload that IS a signal row but
    misses the required id/type fields raises ValueError — callers
    warn-and-skip, the reference's behavior for malformed signal-table
    rows (``SourceSignalChannel.java:62-80`` logs and drops records
    whose required fields are missing).
    """
    try:
        obj = json.loads(message)
    except Exception:
        return None
    if not isinstance(obj, dict) or "signal" not in obj:
        return None
    sig = obj["signal"]
    if (
        not isinstance(sig, dict)
        or not isinstance(sig.get("id"), str)
        or not isinstance(sig.get("type"), str)
    ):
        raise ValueError(f"malformed source-channel signal: {message!r}")
    data = sig.get("data") or {}
    if not isinstance(data, dict):
        raise ValueError(f"malformed source-channel signal data: {message!r}")
    return {"id": sig["id"], "type": sig["type"], "data": data}


class SourceSignalLedger:
    """Processed-id ledger for the source channel, persisted under the
    lake root so a cold restart (which replays the whole log, signal
    rows included) never re-fires an already-completed action — the
    analogue of the reference resuming the signal table's capture from
    committed offsets. Ids are marked only AFTER the action completes
    (at-least-once, matching the file channel's ack discipline)."""

    def __init__(self, lake_root: str):
        d = os.path.join(lake_root, "_signals")
        os.makedirs(d, exist_ok=True)
        self.path = os.path.join(d, "source.processed")

    def seen(self, sid: str) -> bool:
        if not os.path.exists(self.path):
            return False
        with open(self.path) as f:
            return sid in {line.strip() for line in f if line.strip()}

    def mark(self, sid: str) -> None:
        with open(self.path, "a") as f:
            f.write(sid + "\n")
