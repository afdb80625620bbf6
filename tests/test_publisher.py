"""Outbound change-topic publisher: per-commit wire records with
atomic per-version directories, delete+tombstone pairs, idempotent
re-publish, and crash-safe temp cleanup."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from debezium_spark.lake import LakeTable
from debezium_spark.publisher import publish_changes, read_published

SCHEMA_DDL = (
    "repo: string, path: string, commit: string, lang: string, "
    "content: string, op: string, lsn: long"
)


def _ch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_DDL)


def _row(k, op, lsn, tag):
    return (f"r{k % 4}", f"p{k:03d}", f"c-{tag}", "py", f"{tag}", op, lsn)


def _seed(spark, root):
    lt = LakeTable(spark, root, n_buckets=4)
    lt.create()
    lt.merge(
        _ch(spark, [_row(k, "c", 100 + k, f"base-{k}") for k in range(8)]), 1
    )
    lt.merge(_ch(spark, [_row(2, "u", 500, "upd")]), 2)
    lt.merge(_ch(spark, [_row(3, "d", 600, "del")]), 3)
    return lt


def test_publish_per_commit_wire_records(spark, tmp_root):
    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic"
    res = publish_changes(lt, out)
    assert res["published"] == [1, 2, 3]
    assert sorted(os.listdir(out)) == ["v00000001", "v00000002", "v00000003"]
    rec = read_published(spark, out)
    by_v = {
        v: [r for r in rec.collect() if r["version"] == v]
        for v in (1, 2, 3)
    }
    assert len(by_v[1]) == 8  # 8 inserts
    assert len(by_v[2]) == 1  # 1 update
    assert len(by_v[3]) == 2  # delete + tombstone companion
    u = by_v[2][0]
    v = json.loads(u["value_json"])
    assert v["op"] == "u" and v["after"]["content"] == "upd"
    assert v["before"]["content"] == "base-2" and v["lsn"] == 500
    assert json.loads(u["key_json"]) == {"repo": "r2", "path": "p002"}
    d = sorted(by_v[3], key=lambda r: r["offset"])
    dv = json.loads(d[0]["value_json"])
    assert dv["op"] == "d" and dv["before"]["content"] == "base-3"
    assert "after" not in dv  # null fields omitted, Connect-style
    assert d[1]["is_tombstone"] and d[1]["value_json"] is None
    assert d[1]["offset"] == d[0]["offset"] + 1
    # partition = lake bucket of the key (per-key ordering domain)
    assert d[0]["partition"] == d[1]["partition"]


def test_idempotent_and_incremental(spark, tmp_root):
    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic"
    publish_changes(lt, out)
    assert publish_changes(lt, out)["published"] == []
    lt.merge(_ch(spark, [_row(5, "u", 900, "late")]), 4)
    assert publish_changes(lt, out)["published"] == [4]
    assert read_published(spark, out).filter("version = 4").count() == 1


def test_crash_leftover_temp_is_rewritten(spark, tmp_root):
    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic"
    # simulate a crash: stale temp dir for v1 with garbage inside
    os.makedirs(out + "/.tmp-v00000001")
    with open(out + "/.tmp-v00000001/part-junk.json", "w") as f:
        f.write("{broken")
    res = publish_changes(lt, out)
    assert res["published"] == [1, 2, 3]
    assert not any(n.startswith(".tmp") for n in os.listdir(out))
    assert read_published(spark, out).filter("version = 1").count() == 8


def test_tombstones_off_and_schema_only_commits(spark, tmp_root):
    lt = _seed(spark, tmp_root + "/lake")
    lt.apply_schema_change(
        {
            "change_type": "ALTER_ADD_COLUMN",
            "column_name": "stars",
            "new_type": "bigint",
            "schema_version": 1,
            "lsn": 700,
        }
    )
    out = tmp_root + "/topic"
    publish_changes(lt, out, tombstones_on_delete=False)
    rec = read_published(spark, out)
    assert rec.filter("is_tombstone").count() == 0
    assert rec.filter("version = 3").count() == 1  # delete only
    # schema-only commit publishes an empty version dir (consumers see
    # contiguous versions, no false gap)
    assert os.path.isdir(out + "/v00000004")
    assert rec.filter("version = 4").count() == 0


def test_expired_unpublished_commit_raises(spark, tmp_root):
    lt = _seed(spark, tmp_root + "/lake")
    lt.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="expired before publish"):
        publish_changes(lt, tmp_root + "/topic")


def test_feed_replay_from_topic_rebuilds_state(spark, tmp_root):
    # consumer-side proof: folding the published topic (LWW by offset,
    # tombstones/deletes removing keys) reproduces the lake state
    lt = _seed(spark, tmp_root + "/lake")
    lt.merge(_ch(spark, [_row(3, "c", 800, "revived")]), 4)
    out = tmp_root + "/topic"
    publish_changes(lt, out)
    rec = read_published(spark, out).filter(~F.col("is_tombstone"))
    parsed = rec.select(
        F.get_json_object("key_json", "$.repo").alias("repo"),
        F.get_json_object("key_json", "$.path").alias("path"),
        F.get_json_object("value_json", "$.op").alias("op"),
        F.get_json_object("value_json", "$.after.content").alias("content"),
        F.col("offset"),
    )
    w = F.max_by(F.struct("op", "content"), F.col("offset")).alias("w")
    final = (
        parsed.groupBy("repo", "path")
        .agg(w)
        .filter(F.col("w.op") != "d")
        .select("repo", "path", "w.content")
    )
    got = {
        (r["repo"], r["path"]): r["content"] for r in final.collect()
    }
    want = {
        (r["repo"], r["path"]): r["content"]
        for r in lt.read_state().collect()
    }
    assert got == want


def test_engine_publishes_topic_during_run(spark, tmp_root):
    # full loop: changelog -> engine -> lake commits -> outbound topic;
    # a mid-run kill leaves a backlog the restart drains (publish is
    # version-fenced), and folding the topic reproduces final_state
    from debezium_spark.generator import gen_change_log, gen_source_table
    from debezium_spark.streaming.engine import Engine, EngineConfig

    src, log, out = tmp_root + "/src", tmp_root + "/log", tmp_root + "/topic"
    gen_source_table(spark, 4, 20).write.parquet(src)
    gen_change_log(
        spark, 4, 20, n_events=1200, snapshot_lsn_base=100
    ).write.parquet(log)
    cfg = dict(
        changelog_path=log,
        lake_root=tmp_root + "/lake",
        source_table_path=src,
        batch_lsn_span=600,
        n_buckets=4,
        publish_topic_dir=out,
    )
    e1 = Engine(spark, EngineConfig(**cfg))
    e1.run(max_batches=1)
    n_after_kill = len(
        [n for n in os.listdir(out) if n.startswith("v")]
    )
    assert n_after_kill >= 1
    e2 = Engine(spark, EngineConfig(**cfg))
    e2.run()
    versions = sorted(
        int(n[1:]) for n in os.listdir(out) if n.startswith("v")
    )
    assert versions == list(range(1, e2.lake.current_version() + 1))
    rec = read_published(spark, out).filter(~F.col("is_tombstone"))
    parsed = rec.select(
        F.get_json_object("key_json", "$.repo").alias("repo"),
        F.get_json_object("key_json", "$.path").alias("path"),
        F.get_json_object("value_json", "$.op").alias("op"),
        F.get_json_object("value_json", "$.after.content").alias("content"),
        F.col("version"),
        F.col("offset"),
    )
    w = F.max_by(
        F.struct("op", "content"), F.struct("version", "offset")
    ).alias("w")
    final = (
        parsed.groupBy("repo", "path")
        .agg(w)
        .filter(F.col("w.op") != "d")
        .select("repo", "path", "w.content")
    )
    got = {(r["repo"], r["path"]): r["content"] for r in final.collect()}
    want = {
        (r["repo"], r["path"]): r["content"]
        for r in e2.final_state().collect()
    }
    assert got == want


def test_stream_published_tails_topic(spark, tmp_root):
    # Structured Streaming consumer: availableNow pass over the topic,
    # then a SECOND pass from the same checkpoint picks up ONLY the
    # versions published in between (consumer-offset resume semantics)
    from debezium_spark.publisher import stream_published

    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic"
    publish_changes(lt, out)
    sink, ckpt = tmp_root + "/sink", tmp_root + "/ckpt"

    def _drain():
        q = (
            stream_published(spark, out)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _drain()
    first = spark.read.parquet(sink).count()
    assert first == 8 + 1 + 2  # creates + update + delete&tombstone
    lt.merge(_ch(spark, [_row(6, "u", 900, "tail")]), 4)
    publish_changes(lt, out)
    _drain()
    rows = spark.read.parquet(sink)
    assert rows.count() == first + 1
    assert rows.filter("version = 4").count() == 1


def test_compact_published_topic(spark, tmp_root):
    from debezium_spark.publisher import compact_published

    lt = _seed(spark, tmp_root + "/lake")  # v1..v3 incl delete of p003
    lt.merge(_ch(spark, [_row(6, "u", 900, "tail")]), 4)
    out = tmp_root + "/topic"
    publish_changes(lt, out)
    res = compact_published(spark, out, through_version=3)
    # v1..v3 replaced by one snapshot; v4 untouched
    names = sorted(os.listdir(out))
    assert names == ["compacted-00000003", "v00000004"]
    assert res["compacted_through"] == 3
    # snapshot = latest record per key through v3; deleted key GONE
    rec = read_published(spark, out)
    snap = rec.filter("version <= 3")
    assert snap.filter("is_tombstone").count() == 0
    keys = {
        r["key_json"] for r in snap.select("key_json").collect()
    }
    assert '{"repo":"r3","path":"p003"}' not in keys
    assert len(keys) == 7  # 8 creates - 1 deleted
    # stored versions survive the path change (update of p002 was v2)
    upd = [
        r
        for r in snap.collect()
        if json.loads(r["key_json"])["path"] == "p002"
    ]
    assert upd[0]["version"] == 2
    # tail still reads, and a new consumer's fold == lake state
    parsed = rec.filter(~F.col("is_tombstone")).select(
        F.get_json_object("key_json", "$.repo").alias("repo"),
        F.get_json_object("key_json", "$.path").alias("path"),
        F.get_json_object("value_json", "$.op").alias("op"),
        F.get_json_object("value_json", "$.after.content").alias("content"),
        "version",
        "offset",
    )
    w = F.max_by(
        F.struct("op", "content"), F.struct("version", "offset")
    ).alias("w")
    final = (
        parsed.groupBy("repo", "path")
        .agg(w)
        .filter(F.col("w.op") != "d")
        .select("repo", "path", "w.content")
    )
    got = {(r["repo"], r["path"]): r["content"] for r in final.collect()}
    want = {
        (r["repo"], r["path"]): r["content"]
        for r in lt.read_state().collect()
    }
    assert got == want
    # publish after compaction does NOT re-publish folded versions
    lt.merge(_ch(spark, [_row(7, "u", 950, "post")]), 5)
    assert publish_changes(lt, out)["published"] == [5]


def test_compact_keep_tombstones_and_recompact(spark, tmp_root):
    from debezium_spark.publisher import compact_published

    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic"
    publish_changes(lt, out)
    compact_published(spark, out, through_version=3, keep_tombstones=True)
    rec = read_published(spark, out)
    # delete.retention window: the tombstone marker survives compaction
    tombs = rec.filter("is_tombstone").collect()
    assert len(tombs) == 1
    assert json.loads(tombs[0]["key_json"])["path"] == "p003"
    # later commits + RE-compaction supersede the old snapshot
    lt.merge(_ch(spark, [_row(3, "c", 990, "revive")]), 4)
    publish_changes(lt, out)
    compact_published(spark, out, through_version=4)
    names = sorted(os.listdir(out))
    assert names == ["compacted-00000004"]
    rec2 = read_published(spark, out)
    assert rec2.filter("is_tombstone").count() == 0
    revived = [
        r
        for r in rec2.collect()
        if json.loads(r["key_json"])["path"] == "p003"
    ]
    assert len(revived) == 1 and revived[0]["version"] == 4


def test_parquet_wire_format_round_trip(spark, tmp_root):
    # columnar topic: same records, same folds, 100TB-friendly bytes
    from debezium_spark.publisher import compact_published

    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic_pq"
    res = publish_changes(lt, out, file_format="parquet")
    assert res["published"] == [1, 2, 3]
    with open(out + "/_format") as f:
        assert f.read() == "parquet"
    # format is sticky: switching raises, omitting adopts
    with pytest.raises(ValueError, match="cannot switch"):
        publish_changes(lt, out, file_format="json")
    lt.merge(_ch(spark, [_row(5, "u", 900, "tail")]), 4)
    assert publish_changes(lt, out)["published"] == [4]
    rec = read_published(spark, out)
    assert rec.count() == 8 + 1 + 2 + 1
    d = rec.filter("is_tombstone").collect()
    assert len(d) == 1 and d[0]["version"] == 3
    # compaction preserves the container
    compact_published(spark, out, through_version=3)
    rec2 = read_published(spark, out)
    assert rec2.filter("version <= 3").count() == 7
    assert rec2.filter("version = 4").count() == 1
    import glob as _g

    assert _g.glob(out + "/compacted-00000003/*.parquet")


def test_streaming_tail_reads_parquet_topic(spark, tmp_root):
    from debezium_spark.publisher import stream_published

    lt = _seed(spark, tmp_root + "/lake")
    out = tmp_root + "/topic_pq2"
    publish_changes(lt, out, file_format="parquet")
    q = (
        stream_published(spark, out)
        .writeStream.format("parquet")
        .option("path", tmp_root + "/sink")
        .option("checkpointLocation", tmp_root + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(tmp_root + "/sink").count() == 11
