"""Bucket-spec persistence + partition-spec evolution (``rebucket``).

The manifest records ``n_buckets``; any open adopts the manifest's
spec, so a client constructed with a stale width cannot misroute keys
(missing-bucket reads would otherwise turn updates into duplicate
inserts). ``rebucket`` rewrites the table under a new width in one
fenced commit — the Iceberg spec-evolution analogue a 100 TB table
needs as it grows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.lake import LakeTable

SCHEMA_DDL = (
    "repo: string, path: string, commit: string, lang: string, "
    "content: string, op: string, lsn: long"
)


def _ch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_DDL)


def _row(k, op, lsn, tag):
    return (f"r{k % 4}", f"p{k:03d}", f"c-{tag}", "py", f"{tag}", op, lsn)


def _state(lt):
    return sorted(
        (r["repo"], r["path"], r["content"], r["_lsn"])
        for r in lt.read_state(logical=False, with_sys=True)
        .select("repo", "path", "content", "_lsn")
        .collect()
    )


def test_stale_constructor_width_adopts_manifest_spec(spark, tmp_root):
    lt = LakeTable(spark, tmp_root + "/l", n_buckets=4)
    lt.create()
    lt.merge(
        _ch(spark, [_row(k, "c", 100 + k, f"base-{k}") for k in range(20)]), 1
    )
    want = _state(lt)
    # reopen with a WRONG constructor width — first manifest read must
    # adopt the persisted spec, and a merge must route correctly
    lt2 = LakeTable(spark, tmp_root + "/l", n_buckets=32)
    assert _state(lt2) == want
    assert lt2.n_buckets == 4
    lt2.merge(_ch(spark, [_row(3, "u", 900, "upd")]), 2)
    lt2.merge(_ch(spark, [_row(3, "d", 950, "del")]), 3)
    live = {
        (r["repo"], r["path"])
        for r in lt2.read_state(logical=False).collect()
    }
    assert ("r3", "p003") not in live and len(live) == 19


def test_rebucket_preserves_state_and_routes_new_merges(spark, tmp_root):
    lt = LakeTable(spark, tmp_root + "/l", n_buckets=2)
    lt.create()
    lt.merge(
        _ch(spark, [_row(k, "c", 100 + k, f"base-{k}") for k in range(30)]), 1
    )
    before = _state(lt)
    res = lt.rebucket(8)
    assert res["n_buckets"] == 8 and lt.n_buckets == 8
    assert _state(lt) == before
    man = lt.manifest()
    assert man["n_buckets"] == 8
    assert all(int(b) < 8 for b in man["files"])
    assert len(man["files"]) > 2  # really respread
    # a sparse merge under the new spec touches few buckets
    v = man["version"]
    lt.merge(_ch(spark, [_row(5, "u", 900, "after-rebucket")]), 2)
    m2 = lt.manifest()
    touched = {b for b in m2["files"] if man["files"].get(b) != m2["files"][b]}
    assert len(touched) == 1
    got = {
        r["path"]: r["content"]
        for r in lt.read_state(logical=False).collect()
    }
    assert got["p005"] == "after-rebucket"
    # no-op + validation
    assert lt.rebucket(8)["version"] == m2["version"]
    with pytest.raises(ValueError):
        lt.rebucket(0)
    # a reader that still holds the old width adopts the new spec too
    lt3 = LakeTable(spark, tmp_root + "/l", n_buckets=2)
    assert _state(lt3) == _state(lt) and lt3.n_buckets == 8


def test_rebucket_keeps_retained_tombstones(spark, tmp_root):
    lt = LakeTable(spark, tmp_root + "/l", n_buckets=2, retain_tombstones=True)
    lt.create()
    lt.merge(
        _ch(spark, [_row(k, "c", 100 + k, f"base-{k}") for k in range(8)]), 1
    )
    lt.merge(_ch(spark, [_row(1, "d", 500, "del")]), 2)
    lt.rebucket(8)
    tomb = (
        lt.read_state(logical=False, with_sys=True)
        .filter("_deleted")
        .collect()
    )
    assert [(r["repo"], r["path"]) for r in tomb] == [("r1", "p001")]
    # the tombstone still guards its key after the respread
    lt.merge(_ch(spark, [_row(1, "u", 300, "late")]), 3)
    live = {
        (r["repo"], r["path"])
        for r in lt.read_state(logical=False).collect()
    }
    assert ("r1", "p001") not in live


def test_table_changes_across_rebucket_boundary(spark, tmp_root):
    lt = LakeTable(spark, tmp_root + "/l", n_buckets=2)
    lt.create()
    lt.merge(
        _ch(spark, [_row(k, "c", 100 + k, f"base-{k}") for k in range(12)]), 1
    )
    v1 = lt.manifest()["version"]
    lt.rebucket(8)
    lt.merge(_ch(spark, [_row(2, "u", 900, "upd")]), 2)
    feed = {
        (r["repo"], r["path"]): r
        for r in lt.table_changes(v1).collect()
    }
    # the respread rewrote every bucket, but the _lsn guard keeps the
    # feed to REAL changes only
    assert set(feed) == {("r2", "p002")}
    assert feed[("r2", "p002")]["op"] == "u"


def test_engine_resume_with_stale_width_converges(spark, tmp_root):
    import hashlib

    from debezium_spark.generator import gen_change_log, gen_source_table
    from debezium_spark.oracle import fold_final_state
    from debezium_spark.streaming.engine import Engine, EngineConfig

    src, log = tmp_root + "/src", tmp_root + "/log"
    gen_source_table(spark, 4, 20).write.parquet(src)
    gen_change_log(
        spark, 4, 20, n_events=1500, snapshot_lsn_base=100
    ).write.parquet(log)
    cfg = dict(
        changelog_path=log,
        lake_root=tmp_root + "/lake",
        source_table_path=src,
        batch_lsn_span=800,
    )
    Engine(spark, EngineConfig(**cfg, n_buckets=8)).run(max_batches=2)
    # resume with a DIFFERENT configured width: manifest spec wins
    e2 = Engine(spark, EngineConfig(**cfg, n_buckets=32))
    e2.run()
    assert e2.lake.n_buckets == 8
    src_pdf = spark.read.parquet(src).toPandas()
    log_pdf = spark.read.parquet(log).toPandas()
    for c in ("source", "transaction"):
        if c in log_pdf.columns:
            log_pdf[c] = log_pdf[c].map(
                lambda r: r.asDict() if hasattr(r, "asDict") else r
            )
    want = fold_final_state(src_pdf, log_pdf)
    got = {
        (r["repo"], r["path"]): r for r in e2.final_state().collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        assert (
            hashlib.sha256((got[k]["content"] or "").encode()).hexdigest()
            == hashlib.sha256((w["content"] or "").encode()).hexdigest()
        ), k
