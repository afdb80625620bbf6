"""Envelope shape + generator determinism — VerifyRecord-style checks
(reference: debezium-core/src/test/java/io/debezium/data/VerifyRecord.java:129-227)."""

from __future__ import annotations

from debezium_spark import envelope as env
from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.sources.snapshot import snapshot_envelopes


def test_source_table_shape(spark):
    src = gen_source_table(spark, n_repos=4, paths_per_repo=10)
    rows = src.collect()
    assert len(rows) == 40
    assert src.columns == ["repo", "path", "commit", "lang", "content"]
    # PK uniqueness
    assert len({(r["repo"], r["path"]) for r in rows}) == 40
    for r in rows:
        assert len(r["commit"]) == 40
        assert r["path"].endswith(r["lang"])
        assert len(r["content"]) >= 50


def test_generator_deterministic(spark):
    a = gen_change_log(spark, 4, 10, n_events=200, seed=7).collect()
    b = gen_change_log(spark, 4, 10, n_events=200, seed=7).collect()
    assert sorted(a, key=lambda r: r["lsn"]) == sorted(b, key=lambda r: r["lsn"])
    c = gen_change_log(spark, 4, 10, n_events=200, seed=8).collect()
    assert sorted(a, key=lambda r: r["lsn"]) != sorted(c, key=lambda r: r["lsn"])


def test_envelope_validity(spark):
    log = gen_change_log(spark, 4, 10, n_events=500, seed=42)
    rows = [r.asDict(recursive=True) for r in log.collect()]
    lsns = [r["lsn"] for r in rows]
    assert len(lsns) == len(set(lsns)), "LSNs must be globally unique"
    n_ops = {"c": 0, "u": 0, "d": 0, "t": 0}
    n_tomb = 0
    for r in rows:
        if r["is_tombstone"]:
            n_tomb += 1
            assert env.is_valid_tombstone(r)
            continue
        n_ops[r["op"]] += 1
        if r["op"] == "c":
            assert env.is_valid_insert(r)
        elif r["op"] == "u":
            assert env.is_valid_update(r)
            assert r["before"] is not None
        elif r["op"] == "d":
            assert env.is_valid_delete(r)
    # distribution sanity (60/25/14 ± slack)
    assert n_ops["u"] > n_ops["c"] > n_ops["d"] > 0
    assert n_tomb == n_ops["d"], "every delete has exactly one tombstone"


def test_snapshot_envelopes(spark):
    src = gen_source_table(spark, 3, 7)
    snap = snapshot_envelopes(src, partitions=4)
    rows = [r.asDict(recursive=True) for r in snap.collect()]
    assert len(rows) == 21
    markers = [r["source"]["snapshot"] for r in rows]
    assert markers.count("first") == 1
    assert markers.count("last") == 1
    assert markers.count("true") == 19
    for r in rows:
        assert env.is_valid_read(r)
        assert r["lsn"] == 0
        assert 0 <= r["partition_id"] < 4
