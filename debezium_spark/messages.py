"""Logical decoding messages — the consumer-visible op='m' event.

Reference: Postgres ``pg_logical_emit_message`` surfaces through
Debezium as a MESSAGE change event delivered to a dedicated
``<server>.message`` topic
(``connector/postgresql/LogicalDecodingMessageMonitor.java``: value =
{op:'m', ts_ms, source, message:{prefix, content}}, key = {prefix},
content converted per ``binary.handling.mode``), filtered by prefix
include/exclude regexes
(``connector/postgresql/LogicalDecodingMessageFilter.java``).

This engine's log multiplexes control payloads through op='m' rows'
``message`` column; a LOGICAL message is a payload of shape
``{"message": {"prefix": ..., "content": ...}}`` — distinguished from
schema changes (TableChanges dicts / ddl) and source-channel signals
(``{"signal": ...}``) the way the reference distinguishes by event
class. The engine's control-row pass routes them — prefix-filtered —
to ``<lake>/_messages/log.jsonl``, the dedicated-topic analogue,
dedup-fenced by LSN so batch re-delivery under the at-least-once
replay never duplicates a message.
"""

from __future__ import annotations

import base64
import json
import os


def is_logical_message_payload(message: str) -> bool:
    """True iff the op='m' payload is a logical decoding message
    (well-formed or not) rather than a schema change or signal."""
    try:
        obj = json.loads(message)
    except Exception:
        return False
    return isinstance(obj, dict) and "message" in obj


def parse_logical_message(message: str) -> dict | None:
    """Parse a logical-message payload to ``{"prefix", "content"}``.

    Returns None when the payload is not a logical message at all;
    raises ValueError when it is one but malformed (missing prefix /
    non-string content) — callers warn-and-skip, mirroring the
    reference's handling of undecodable message events."""
    try:
        obj = json.loads(message)
    except Exception:
        return None
    if not isinstance(obj, dict) or "message" not in obj:
        return None
    msg = obj["message"]
    if not isinstance(msg, dict) or not isinstance(msg.get("prefix"), str):
        raise ValueError(f"malformed logical message: {message!r}")
    content = msg.get("content")
    if content is not None and not isinstance(content, str):
        raise ValueError(f"malformed logical message content: {message!r}")
    return {"prefix": msg["prefix"], "content": content}


class LogicalMessageLog:
    """The dedicated message-topic analogue: an append-only JSON-lines
    log under the lake root, one record per delivered logical message
    — ``{lsn, prefix, content_base64, content_hex, ts_ms}`` (both
    binary.handling.mode text conversions carried, like the catalog's
    type-handling entry). LSN-keyed dedup makes delivery idempotent
    under batch re-replay (messages are control-plane-rare; the seen
    set is a small file read per control pass)."""

    def __init__(self, root: str):
        self.path = os.path.join(root, "_messages", "log.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def seen_lsns(self) -> set[int]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return {
                int(json.loads(line)["lsn"]) for line in f if line.strip()
            }

    def deliver(
        self, lsn: int, prefix: str, content: str | None, ts_ms: int | None
    ) -> bool:
        """Append one message record unless its LSN was already
        delivered. Returns True when written."""
        if lsn in self.seen_lsns():
            return False
        raw = (content or "").encode("utf-8")
        rec = {
            "lsn": int(lsn),
            "prefix": prefix,
            "content_base64": base64.b64encode(raw).decode("ascii"),
            "content_hex": raw.hex(),
            "ts_ms": ts_ms,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return True

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
