"""Topic-backed signal channel (KafkaSignalChannel analogue,
pipeline/signal/channels/KafkaSignalChannel.java): a segmented
append-only directory as the single-partition signal topic, consumers
with independent ledgers (consumer-group offsets), no record deletion.
"""

from __future__ import annotations

import os

import pytest

from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.signals import TopicSignalChannel, open_signal_channel
from debezium_spark.streaming.engine import Engine, EngineConfig


def test_topic_channel_send_poll_ack_across_segments(tmp_root):
    ch = TopicSignalChannel(f"{tmp_root}/topic")
    ch.send("s1", "log", {"message": "a"})
    ch.roll()  # broker segment rotation
    ch.send("s2", "pause")
    ch.send("s3", "resume")
    assert [s["id"] for s in ch.poll()] == ["s1", "s2", "s3"]  # offset order
    ch.ack("s1")
    ch.ack("s2")
    assert [s["id"] for s in ch.poll()] == ["s3"]
    # segments on disk: rotation really happened
    segs = [n for n in os.listdir(f"{tmp_root}/topic") if n.startswith("segment-")]
    assert len(segs) == 2


def test_topic_channel_consumer_group_ledgers(tmp_root):
    """Two consumers tail ONE topic with their own ledgers: each sees
    the signal exactly once; one consumer's ack hides nothing from the
    other."""
    topic = f"{tmp_root}/topic"
    a = TopicSignalChannel(topic, processed_path=f"{tmp_root}/a.processed")
    b = TopicSignalChannel(topic, processed_path=f"{tmp_root}/b.processed")
    a.send("s1", "execute-snapshot", {"data-collections": ["t1"]})
    assert [s["id"] for s in a.poll()] == ["s1"]
    a.ack("s1")
    assert a.poll() == []
    assert [s["id"] for s in b.poll()] == ["s1"]  # still pending for b
    b.ack("s1")
    assert b.poll() == []


def test_topic_channel_is_append_only(tmp_root):
    ch = TopicSignalChannel(f"{tmp_root}/topic")
    ch.send("s1", "log")
    with pytest.raises(NotImplementedError, match="append-only"):
        ch.delete("s1")


def test_topic_retention_is_consumer_blind(tmp_root):
    """Broker-style retention drops the oldest segments regardless of
    consumer progress; a lagging consumer loses the expired records
    silently (Kafka semantics), the tail segment always survives."""
    ch = TopicSignalChannel(f"{tmp_root}/topic")
    ch.send("s1", "log")
    ch.roll()
    ch.send("s2", "log")
    ch.roll()
    ch.send("s3", "log")
    lagger = TopicSignalChannel(
        f"{tmp_root}/topic", processed_path=f"{tmp_root}/lag.processed"
    )
    assert len(lagger.poll()) == 3
    r = ch.expire_segments(keep_last=1)
    assert r == {
        "removed_segments": 2,
        "removed_records": 2,
        "retained_segments": 1,
    }
    assert [s["id"] for s in lagger.poll()] == ["s3"]  # s1/s2 gone
    with pytest.raises(ValueError):
        ch.expire_segments(keep_last=0)


def test_factory_and_config_validation(spark, tmp_root):
    assert isinstance(
        open_signal_channel(f"{tmp_root}/t", kind="topic"),
        TopicSignalChannel,
    )
    with pytest.raises(ValueError, match="file|topic"):
        open_signal_channel(f"{tmp_root}/x", kind="redis")
    # insert_delete needs a deletable collection — refuse at engine init
    with pytest.raises(ValueError, match="append-only"):
        Engine(
            spark,
            EngineConfig(
                changelog_path=f"{tmp_root}/nolog",
                lake_root=f"{tmp_root}/lake_bad",
                signal_path=f"{tmp_root}/t",
                signal_channel_kind="topic",
                watermarking_strategy="insert_delete",
            ),
        )


def test_engine_processes_signals_from_topic_channel(spark, tmp_root):
    """End to end: an execute-snapshot record on the signal TOPIC fires
    the engine's incremental snapshot; the ack ledger survives a
    restart so a second poll re-fires nothing."""
    src, log = f"{tmp_root}/src", f"{tmp_root}/log"
    gen_source_table(spark, 4, 20).write.parquet(src)
    gen_change_log(
        spark, 4, 20, n_events=400, snapshot_lsn_base=80
    ).write.parquet(log)
    topic = f"{tmp_root}/sigtopic"
    TopicSignalChannel(topic).send(
        "sig-t1", "execute-snapshot", {"chunk_size": 40}
    )
    cfg = EngineConfig(
        changelog_path=log,
        lake_root=f"{tmp_root}/lake",
        source_table_path=src,
        batch_lsn_span=1000,
        n_buckets=4,
        signal_path=topic,
        signal_channel_kind="topic",
        signal_ack_path=f"{tmp_root}/lake/_signals.processed",
    )
    eng = Engine(spark, cfg)
    eng.run()  # the engine loop polls the topic between batches
    assert eng.lake.last_batch_id("incremental") >= 0  # snapshot ran
    assert eng.process_signals() == []  # already handled in-run
    # window bookkeeping rows landed on the topic (insert_insert) and
    # were self-acked; the topic stays append-only throughout
    pending = {s["type"] for s in TopicSignalChannel(topic).poll()}
    assert "execute-snapshot" in pending  # default-ledger consumer view

    eng2 = Engine(spark, cfg)  # restart: ledger under the lake root
    assert eng2.process_signals() == []


def test_topic_notification_channel_fans_out(spark, tmp_root):
    """SinkNotificationChannel analogue: lifecycle notifications route
    to a topic; independent consumers each tail the full record set."""
    from debezium_spark.notifications import (
        NotificationLog,
        topic_notification_channel,
    )

    topic = f"{tmp_root}/notif_topic"
    log = NotificationLog(
        f"{tmp_root}/lakeroot",
        channels=(topic_notification_channel(topic),),
    )
    log.emit("Initial Snapshot", "STARTED")
    log.emit("Initial Snapshot", "COMPLETED", {"rows": 5})

    a = TopicSignalChannel(topic, processed_path=f"{tmp_root}/na.processed")
    b = TopicSignalChannel(topic, processed_path=f"{tmp_root}/nb.processed")
    got_a = a.poll()
    assert [s["data"]["type"] for s in got_a] == ["STARTED", "COMPLETED"]
    assert got_a[1]["data"]["additional_data"] == {"rows": 5}
    for s in got_a:
        a.ack(s["id"])
    assert a.poll() == []
    assert len(b.poll()) == 2  # b's ledger untouched by a's acks
    # the durable file copy is written BEFORE the channel fan-out
    assert [r["type"] for r in log.read()] == ["STARTED", "COMPLETED"]
