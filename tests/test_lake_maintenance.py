"""Lake maintenance: time-travel reads (VERSION AS OF) and
Iceberg-style snapshot expiry.

Contracts pinned:

1. **Time travel** — a version-pinned read reproduces the table
   exactly as of that commit, even after later merges rewrote some of
   its buckets (untouched buckets resolve through older data dirs).
2. **Expiry keeps every retained read alive** — after
   ``expire_snapshots(keep_last=2)``, the current AND the previous
   version still read byte-identically; the expired version raises
   ``FileNotFoundError``; data dirs referenced by NO retained manifest
   are gone from disk (bounded storage), dirs shared with retained
   manifests survive.
3. **Engine semantics unaffected** — batch-id fencing and resume work
   across an expiry (the newest manifest is never expired).
"""

from __future__ import annotations

import os

from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.streaming.engine import Engine, EngineConfig


def _rows(df):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["content"])
        for r in df.collect()
    )


def _mk_engine(spark, tmp_root, **kw):
    cfg = EngineConfig(
        changelog_path=f"{tmp_root}/log",
        lake_root=f"{tmp_root}/lake",
        source_table_path=f"{tmp_root}/src",
        batch_lsn_span=800,
        n_buckets=8,
        **kw,
    )
    return Engine(spark, cfg)


def test_time_travel_and_expiry(spark, tmp_root):
    gen_source_table(spark, 4, 20).write.parquet(f"{tmp_root}/src")
    gen_change_log(
        spark, 4, 20, n_events=2400, snapshot_lsn_base=80
    ).write.parquet(f"{tmp_root}/log")

    eng = _mk_engine(spark, tmp_root)
    eng.run(max_batches=1)  # snapshot + first stream batch
    v_early = eng.lake.current_version()
    early = _rows(eng.final_state())

    eng.run()  # the rest of the log → more commits rewrite buckets
    v_final = eng.lake.current_version()
    assert v_final > v_early
    final = _rows(eng.final_state())
    assert final != early  # later batches actually changed state

    # 1. time travel reproduces the historical state exactly
    assert _rows(eng.state_as_of(v_early)) == early
    assert _rows(eng.state_as_of(v_final)) == final

    # 2. expiry: keep the last 2 commits
    res = eng.lake.expire_snapshots(keep_last=2)
    assert res["retained"] == [v_final - 1, v_final]
    assert res["removed_data_dirs"] > 0

    # retained reads are intact
    assert _rows(eng.final_state()) == final
    assert _rows(eng.state_as_of(v_final - 1))  # readable, no missing files

    # the expired version is gone — loudly, not wrong-answer
    try:
        eng.state_as_of(v_early).collect()
        raise AssertionError("expired version still readable")
    except FileNotFoundError:
        pass

    # every data dir a retained manifest references still exists;
    # nothing else does
    lake = eng.lake
    referenced = {
        e["path"]
        for v in res["retained"]
        for e in lake.manifest(v)["files"].values()
    }
    on_disk = set()
    data_root = f"{tmp_root}/lake/data"
    for vdir in os.listdir(data_root):
        for bdir in os.listdir(os.path.join(data_root, vdir)):
            if bdir.startswith("bucket="):
                on_disk.add(f"data/{vdir}/{bdir}")
    assert referenced <= on_disk
    assert on_disk == referenced

    # 3. engine fencing/resume still works across the expiry: a fresh
    # engine on the same lake resumes cleanly and re-delivery is fenced
    eng2 = _mk_engine(spark, tmp_root)
    assert eng2.run() == []  # log fully consumed → no new batches
    assert _rows(eng2.final_state()) == final


def test_expire_noop_when_few_versions(spark, tmp_root):
    gen_source_table(spark, 2, 5).write.parquet(f"{tmp_root}/src")
    gen_change_log(
        spark, 2, 5, n_events=50, snapshot_lsn_base=10
    ).write.parquet(f"{tmp_root}/log")
    eng = _mk_engine(spark, tmp_root)
    eng.run(max_batches=1)
    before = _rows(eng.final_state())
    res = eng.lake.expire_snapshots(keep_last=10)
    assert res["removed_manifests"] == 0
    assert _rows(eng.final_state()) == before


def test_timestamp_as_of(spark, tmp_root):
    import time as _t

    from debezium_spark.lake import LakeTable

    lt = LakeTable(spark, tmp_root + "/ts_lake", n_buckets=2)
    lt.create()
    ddl = (
        "repo: string, path: string, commit: string, lang: string, "
        "content: string, op: string, lsn: long"
    )
    lt.merge(
        spark.createDataFrame(
            [("r0", "p0", "c1", "py", "one", "c", 100)], ddl
        ),
        1,
    )
    between = _t.time()
    _t.sleep(0.05)
    lt.merge(
        spark.createDataFrame(
            [("r0", "p0", "c2", "py", "two", "u", 200)], ddl
        ),
        2,
    )
    v = lt.version_as_of(between)
    assert v == 1
    rows = lt.read_state(version=v).collect()
    assert rows[0]["content"] == "one"
    assert lt.version_as_of(_t.time()) == lt.current_version()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lt.version_as_of(between - 10_000)
    # engine surface: exactly one selector
    from debezium_spark.streaming.engine import Engine, EngineConfig

    eng = Engine.__new__(Engine)
    eng.lake = lt
    assert (
        Engine.state_as_of(eng, ts=between).collect()[0]["content"] == "one"
    )
    with _pytest.raises(ValueError):
        Engine.state_as_of(eng)
    with _pytest.raises(ValueError):
        Engine.state_as_of(eng, version=1, ts=between)


def test_concurrent_commit_is_exclusive_not_lost(spark, tmp_root):
    """Optimistic concurrency: a second writer racing to the same
    manifest version must FAIL (CommitFailedException analogue), never
    silently overwrite the committed merge."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from debezium_spark.lake import ConcurrentCommitError, LakeTable

    lt = LakeTable(spark, tmp_root + "/cc_lake", n_buckets=2)
    lt.create()
    ddl = (
        "repo: string, path: string, commit: string, lang: string, "
        "content: string, op: string, lsn: long"
    )
    lt.merge(
        spark.createDataFrame([("r0", "p0", "c", "py", "x", "c", 100)], ddl),
        1,
    )
    # another writer wins the race to version 2 between this writer's
    # head read and its manifest publish
    winner = dict(lt.manifest(), version=2, metrics={"winner": True})
    with open(lt._manifest_path(2), "w") as f:
        _json.dump(winner, f)
    loser = dict(lt.manifest(1), version=2, metrics={"loser": True})
    with _pytest.raises(ConcurrentCommitError, match="another writer"):
        lt._write_manifest(loser)
    # the winner's manifest is intact and no temp junk remains
    with open(lt._manifest_path(2)) as f:
        assert _json.load(f)["metrics"] == {"winner": True}
    assert not [
        n for n in _os.listdir(lt._commits_dir) if n.startswith(".tmp")
    ]
    # the loser recovers by re-reading the head and retrying: its merge
    # now targets version 3 and commits cleanly
    res = lt.merge(
        spark.createDataFrame(
            [("r0", "p0", "c", "py", "y", "u", 200)], ddl
        ),
        2,
    )
    assert res["version"] == 3
