"""Engine lifecycle notifications — snapshot / incremental-snapshot
progress records.

Reference: ``pipeline/notification/Notification.java:1-150`` +
``pipeline/notification/IncrementalSnapshotNotificationService.java``:
Debezium emits ``{id, aggregate_type, type, additional_data,
timestamp}`` records on a notification channel (topic/log/JMX) —
aggregate types "Initial Snapshot" / "Incremental Snapshot", types
STARTED / IN_PROGRESS / TABLE_SCAN_COMPLETED / COMPLETED / ABORTED.

Spark re-expression: an append-only JSON-lines file under the lake
root (``_notifications``) — driver-side control-plane writes, one line
per lifecycle event, monotonically sequenced. Consumers tail it the
way the reference's sink channel is consumed.
"""

from __future__ import annotations

import json
import os
import time

INITIAL_SNAPSHOT = "Initial Snapshot"
INCREMENTAL_SNAPSHOT = "Incremental Snapshot"
BLOCKING_SNAPSHOT = "Blocking Snapshot"

STARTED = "STARTED"
IN_PROGRESS = "IN_PROGRESS"
TABLE_SCAN_COMPLETED = "TABLE_SCAN_COMPLETED"
COMPLETED = "COMPLETED"
ABORTED = "ABORTED"


class NotificationLog:
    """File-sink notification channel plus a fan-out SPI.

    The reference routes notifications through pluggable channels
    (``pipeline/notification/channels/NotificationChannel.java`` —
    SinkNotificationChannel, LogNotificationChannel, jmx). The JSON-
    lines file is our sink channel; ``channels`` registers additional
    consumers, each called with the finished record dict AFTER the
    file append (so a consumer crash never loses the durable copy).
    Consumer exceptions propagate — like the reference, a broken
    channel is a deployment error, not something to swallow."""

    def __init__(self, root: str, channels: tuple = ()):
        self.path = os.path.join(root, "_notifications", "log.jsonl")
        self.channels = tuple(channels)
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def _next_id(self) -> int:
        # derived from the file at write time, never cached: two engine
        # instances sharing one lake root (e.g. restart tests) must
        # still produce monotone ids. The log is a small control-plane
        # file; a line count per emit is cheap.
        return len(self.read())

    def emit(
        self,
        aggregate_type: str,
        notification_type: str,
        data: dict | None = None,
    ) -> dict:
        rec = {
            "id": self._next_id(),
            "aggregate_type": aggregate_type,
            "type": notification_type,
            "additional_data": data or {},
            "ts_ms": int(time.time() * 1000),
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        for ch in self.channels:
            ch(rec)
        return rec

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def topic_notification_channel(topic_dir: str):
    """Broker-topic notification channel — the
    ``SinkNotificationChannel`` analogue (``pipeline/notification/
    channels/SinkNotificationChannel.java`` routes notification
    records to a configured Kafka topic). Returns a channel callable
    for ``NotificationLog(channels=(...,))`` that appends each record
    to a segmented file-topic (the same append-only transport as
    :class:`debezium_spark.signals.TopicSignalChannel`); any number of
    consumers tail it with independent ledgers."""
    from debezium_spark.signals import TopicSignalChannel

    topic = TopicSignalChannel(topic_dir)

    def channel(rec: dict) -> None:
        topic.send(f"notif-{rec['id']}", "notification", rec)

    return channel
