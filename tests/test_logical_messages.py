"""Logical decoding messages surfacing as consumer-visible MESSAGE
events (LogicalDecodingMessageMonitor.java delivery +
LogicalDecodingMessageFilter.java prefix filtering), multiplexed over
the same op='m' transport as schema changes and source signals."""

from __future__ import annotations

import json
import os

import pytest

from debezium_spark.generator import (
    _control_envelope,
    gen_change_log,
    gen_source_table,
    schema_change_envelopes,
)
from debezium_spark.messages import (
    LogicalMessageLog,
    is_logical_message_payload,
    parse_logical_message,
)
from debezium_spark.streaming.engine import Engine, EngineConfig

BASE = 100


def _msg_payload(prefix, content):
    return json.dumps({"message": {"prefix": prefix, "content": content}})


def test_payload_detection_and_parse():
    assert is_logical_message_payload(_msg_payload("app.1", "x"))
    assert not is_logical_message_payload('{"signal": {"id": "s"}}')
    assert not is_logical_message_payload('{"change_type": "X"}')
    assert not is_logical_message_payload("not json")
    assert parse_logical_message(_msg_payload("app.1", "x")) == {
        "prefix": "app.1",
        "content": "x",
    }
    assert parse_logical_message('{"change_type": "X"}') is None
    with pytest.raises(ValueError, match="malformed"):
        parse_logical_message('{"message": {"content": "no prefix"}}')
    with pytest.raises(ValueError, match="content"):
        parse_logical_message('{"message": {"prefix": "p", "content": 5}}')


def _world(spark, tmp_root):
    src = os.path.join(tmp_root, "src")
    log = os.path.join(tmp_root, "log")
    gen_source_table(spark, 4, 20).write.parquet(src)
    data = gen_change_log(
        spark, 4, 20, n_events=300, snapshot_lsn_base=BASE
    )
    change = {
        "lsn": BASE + 150,
        "schema_version": 1,
        "change_type": "ALTER_ADD_COLUMN",
        "column_name": "size_bytes",
        "new_type": "bigint",
    }
    msgs = _control_envelope(
        spark,
        [
            (BASE + 50, "m", 0, _msg_payload("app.orders", "hello")),
            (BASE + 260, "m", 0, _msg_payload("internal.audit", "nope")),
            (BASE + 400, "m", 0, _msg_payload("app.billing", "world")),
            # malformed: IS a logical message but missing prefix —
            # warn-and-skip, never a schema-history error
            (BASE + 410, "m", 0, '{"message": {"content": "broken"}}'),
        ],
    )
    data.unionByName(schema_change_envelopes(spark, [change])).unionByName(
        msgs
    ).write.parquet(log)
    return src, log, change


def test_messages_routed_filtered_and_deduped_across_restart(
    spark, tmp_root
):
    src, log, change = _world(spark, tmp_root)
    cfg = EngineConfig(
        changelog_path=log,
        lake_root=os.path.join(tmp_root, "lake"),
        source_table_path=src,
        batch_lsn_span=300,
        n_buckets=4,
        logical_message_prefix_include=r"^app\.",
    )
    eng = Engine(spark, cfg)
    # logical-message rows must not poison the schema-history scan
    assert eng.tracker.latest_version == 1
    eng.run(max_batches=1)  # partial, then crash

    eng2 = Engine(spark, cfg)  # restart re-delivers the first window
    eng2.run()
    recs = eng2.messages.read()
    assert [(r["lsn"], r["prefix"]) for r in recs] == [
        (BASE + 50, "app.orders"),
        (BASE + 400, "app.billing"),
    ]  # internal.* filtered, malformed skipped, NO duplicates
    import base64

    assert recs[0]["content_base64"] == base64.b64encode(b"hello").decode()
    assert recs[0]["content_hex"] == b"hello".hex()
    # MESSAGE events carry the source timestamp
    # (LogicalDecodingMessageMonitor includes ts_ms), not null
    from debezium_spark.generator import BASE_TS_MS

    assert [r["ts_ms"] for r in recs] == [
        BASE_TS_MS + BASE + 50,
        BASE_TS_MS + BASE + 400,
    ]
    # the schema change riding the same transport still applied
    assert eng2.lake.table_schema().version == 1
    assert "size_bytes" in [
        c["name"] for c in eng2.lake.table_schema().columns
    ]


def test_exclude_filter_and_unfiltered_default(spark, tmp_root):
    src, log, _ = _world(spark, tmp_root)
    eng = Engine(
        spark,
        EngineConfig(
            changelog_path=log,
            lake_root=os.path.join(tmp_root, "lake_ex"),
            source_table_path=src,
            batch_lsn_span=1000,
            n_buckets=4,
            logical_message_prefix_exclude=r"^internal\.",
        ),
    )
    eng.run()
    assert [r["prefix"] for r in eng.messages.read()] == [
        "app.orders",
        "app.billing",
    ]
    # no filters: everything well-formed delivers
    eng2 = Engine(
        spark,
        EngineConfig(
            changelog_path=log,
            lake_root=os.path.join(tmp_root, "lake_all"),
            source_table_path=src,
            batch_lsn_span=1000,
            n_buckets=4,
        ),
    )
    eng2.run()
    assert [r["prefix"] for r in eng2.messages.read()] == [
        "app.orders",
        "internal.audit",
        "app.billing",
    ]


def test_message_log_lsn_dedup(tmp_root):
    log = LogicalMessageLog(tmp_root)
    assert log.deliver(5, "app.x", "a", None) is True
    assert log.deliver(5, "app.x", "a", None) is False  # redelivery
    assert len(log.read()) == 1
