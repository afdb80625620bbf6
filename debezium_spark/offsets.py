"""External offset store + commit policy — the Kafka Connect offset
backing store as the engine sees it.

Reference: ``debezium-api .../engine/spi/OffsetCommitPolicy.java:25-53``
(ALWAYS — commit after every batch — vs PERIODIC, default 60 s
``offset.flush.interval.ms``) and the embedded engine's flush loop
``embedded/EmbeddedEngine.java:815-836,877-905`` (offsets are flushed
to the backing store on the policy's cadence and on graceful shutdown;
a crash between flushes rewinds to the last flushed position, so
delivery from the store's point of view is at-least-once).

Spark re-expression: the lake's fenced merge commits already carry the
exact per-batch offsets (exactly-once EFFECT regardless of this store —
SURVEY §2.5). The external store models the reference's contract on
top: it is the AUTHORITATIVE resume position when configured, flushed
per policy, written atomically (tmp + rename, the
FileOffsetBackingStore shape). Rewinding to a stale flush only enlarges
the re-read window — re-delivered batch ids hit the lake's commit fence
and skip, so the final state stays exact while the store behaves
byte-for-byte like the reference's.
"""

from __future__ import annotations

import json
import os
import time

POLICY_ALWAYS = "always"
POLICY_PERIODIC = "periodic"


class FileOffsetStore:
    """Atomic single-file offset backing store
    (``FileOffsetBackingStore`` analogue; wired for the embedded engine
    in ``embedded/KafkaConnectUtil.java``)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict | None:
        """Last flushed record, or None for a cold store."""
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)

    def last_batch_id(self) -> int:
        rec = self.load()
        return int(rec["last_batch_id"]) if rec else 0

    def flush(self, last_batch_id: int, offsets: dict) -> None:
        """Write-and-rename — a crash mid-flush leaves the previous
        record intact (the reference's working-file swap)."""
        rec = {
            "last_batch_id": int(last_batch_id),
            "offsets": {str(k): int(v) for k, v in offsets.items()},
            "ts_ms": int(time.time() * 1000),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self.path)
