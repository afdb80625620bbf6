"""Snapshot modes `when_needed` / `schema_only` + pinned stream origin.

Reference: ``MySqlConnectorConfig.java:139`` (WHEN_NEEDED — snapshot
when the server no longer holds the recorded resume position, i.e. the
binlog was purged) and ``:151`` (SCHEMA_ONLY — capture structure, never
historical rows; stream from the current position).

The enabling invariant pinned here first: the stream's deterministic
batch windows are anchored to an origin recorded in the lake on first
contact, so purging the log's head (WAL retention — an operational
certainty at the 10^10-event scale) never shifts batch arithmetic;
fully-purged windows replay as clean zero-row batches."""

from __future__ import annotations

import os

import pytest

from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.oracle import fold_final_state
from debezium_spark.streaming.engine import Engine, EngineConfig

N_REPOS, PPR, N_EVENTS = 5, 20, 250
BASE = N_REPOS * PPR  # 100
SPAN = 200


def _cfg(log, lake, src, **kw):
    kw.setdefault("batch_lsn_span", SPAN)
    return EngineConfig(
        changelog_path=log,
        lake_root=lake,
        source_table_path=src,
        n_buckets=8,
        **kw,
    )


def _world(spark, root):
    src = os.path.join(root, "src")
    log = os.path.join(root, "log")
    gen_source_table(spark, N_REPOS, PPR).write.parquet(src)
    gen_change_log(
        spark, N_REPOS, PPR, n_events=N_EVENTS, snapshot_lsn_base=BASE
    ).write.parquet(log)
    return src, log


def _pdf(spark, path):
    pdf = spark.read.parquet(path).toPandas()
    for c in ("before", "after", "source"):
        if c in pdf.columns:
            pdf[c] = pdf[c].map(
                lambda v: v.asDict() if hasattr(v, "asDict") else v
            )
    return pdf


def test_unknown_snapshot_mode_rejected(spark, tmp_root):
    src, log = _world(spark, tmp_root)
    with pytest.raises(ValueError, match="unknown snapshot_mode"):
        Engine(
            spark,
            _cfg(log, os.path.join(tmp_root, "lake"), src, snapshot_mode="bogus"),
        )


def test_pinned_origin_survives_head_purge(spark, tmp_root):
    """Purge the log's head BELOW the applied frontier: resume must
    replay the remaining windows at their original positions and land
    on the exact full-log final state. Without the pinned origin the
    windows would shift by the purge amount and skip real events."""
    src, log = _world(spark, tmp_root)
    lake = os.path.join(tmp_root, "lake")
    e1 = Engine(spark, _cfg(log, lake, src))
    e1.run(max_batches=2)  # windows [100,300) and [300,500) applied
    assert e1._load_stream_origin() == BASE

    log2 = os.path.join(tmp_root, "log2")
    full = spark.read.parquet(log)
    full.filter("lsn >= 250").write.parquet(log2)  # head purged, all applied

    e2 = Engine(spark, _cfg(log2, lake, src))
    assert not e2._purged_resume_gap()  # purge stayed below the frontier
    e2.run()
    oracle = fold_final_state(_pdf(spark, src), _pdf(spark, log))
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in e2.final_state().collect()
    }
    assert got == {k: v["content"] for k, v in oracle.items()}


def test_when_needed_first_run_takes_initial_snapshot(spark, tmp_root):
    src, log = _world(spark, tmp_root)
    lake = os.path.join(tmp_root, "lake")
    eng = Engine(spark, _cfg(log, lake, src, snapshot_mode="when_needed"))
    res = eng.run()
    assert res and res[0].get("batch_id") == 0  # initial snapshot ran
    oracle = fold_final_state(_pdf(spark, src), _pdf(spark, log))
    assert eng.final_state().count() == len(oracle)


def test_when_needed_heals_purged_unapplied_window(spark, tmp_root):
    """Purge PAST the applied frontier (events lost before being read),
    with the source table advanced to upstream truth at the purge cut.
    when_needed detects the gap, re-snapshots incrementally from the
    raw source, and the LWW merge restores exactness for every key the
    source still holds; keys DELETED inside the purged window are the
    documented DBLog caveat (stale until touched again) and are
    asserted explicitly."""
    src, log = _world(spark, tmp_root)
    lake = os.path.join(tmp_root, "lake")
    e1 = Engine(spark, _cfg(log, lake, src))
    e1.run(max_batches=2)  # applied through lsn < 500

    cut = 560
    src_pdf, log_pdf = _pdf(spark, src), _pdf(spark, log)
    truth_at_cut = fold_final_state(
        src_pdf, log_pdf[log_pdf["lsn"] < cut]
    )
    state_before = fold_final_state(src_pdf, log_pdf[log_pdf["lsn"] < 500])
    # upstream truth at the cut, as the new source table
    src2 = os.path.join(tmp_root, "src2")
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame(list(truth_at_cut.values()))[
            ["repo", "path", "commit", "lang", "content"]
        ]
    ).write.parquet(src2)
    log2 = os.path.join(tmp_root, "log2")
    spark.read.parquet(log).filter(f"lsn >= {cut}").write.parquet(log2)

    e2 = Engine(
        spark, _cfg(log2, lake, src2, snapshot_mode="when_needed")
    )
    assert e2._purged_resume_gap()
    res = e2.run()
    heal = [r for r in res if r.get("mode") == "when_needed"]
    assert heal and heal[0]["healed_chunks"] > 0

    exp_full = fold_final_state(src_pdf, log_pdf)
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in e2.final_state().collect()
    }
    # every key upstream still holds is exact
    for k, v in exp_full.items():
        assert got[k] == v["content"], k
    # the only surplus keys are ones deleted inside the purged window
    # and never touched again — carrying their pre-purge state value
    tail_keys = {
        (r["key"]["repo"], r["key"]["path"])
        for r in log_pdf[log_pdf["lsn"] >= cut].to_dict("records")
        if r["op"] in ("c", "u", "d")
    }
    predicted_stale = (
        set(state_before) - set(truth_at_cut)
    ) - tail_keys
    assert set(got) - set(exp_full) == predicted_stale
    for k in predicted_stale:
        assert got[k] == state_before[k]["content"]

    # gap closed: a third when_needed engine does not re-heal
    e3 = Engine(
        spark, _cfg(log2, lake, src2, snapshot_mode="when_needed")
    )
    assert not e3._purged_resume_gap()
    assert e3.snapshot() is None


def test_schema_only_streams_from_current_position(spark, tmp_root):
    """schema_only captures no historical rows: a full static log
    yields an empty table, but schema history IS recovered from the
    log's op='m' rows; events appended after first contact apply."""
    import json

    from tests.test_schema_evolution import _changes, _world_with_messages

    src, log = _world_with_messages(
        spark, tmp_root, [json.dumps(_changes()[0])]
    )
    lake = os.path.join(tmp_root, "lake")
    eng = Engine(spark, _cfg(log, lake, src, snapshot_mode="schema_only"))
    assert eng.tracker.latest_version == 1  # history recovered
    eng.run()
    assert eng.final_state().count() == 0  # no historical rows captured
    origin = eng._load_stream_origin()
    hi = spark.read.parquet(log).agg({"lsn": "max"}).collect()[0][0]
    assert origin == hi + 1

    # new arrivals land above the origin and DO apply
    new_events = gen_change_log(
        spark, N_REPOS, PPR, n_events=60, snapshot_lsn_base=origin
    )
    new_events.write.mode("append").parquet(log)
    e2 = Engine(spark, _cfg(log, lake, src, snapshot_mode="schema_only"))
    e2.run()
    # fold only the new tail (origin onward), starting from empty
    tail_pdf = _pdf(spark, log)
    tail_pdf = tail_pdf[tail_pdf["lsn"] >= origin]
    oracle = fold_final_state(None, tail_pdf)
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in e2.final_state().collect()
    }
    assert got == {k: v["content"] for k, v in oracle.items()}
    # evolved column from the historical 'm' row reached the lake schema
    assert "size_bytes" in e2.final_state().columns


def test_always_mode_resnapshots_on_restart(spark, tmp_root):
    """AlwaysSnapshotter semantics (PostgresConnectorConfig.java:200):
    a restarted `always` engine re-executes the snapshot on a fresh
    fenced batch id instead of skipping; LWW keeps streamed values
    (newer LSNs) and re-asserts source values for untouched keys, so
    the final state stays oracle-exact."""
    src, log = _world(spark, tmp_root)
    lake = os.path.join(tmp_root, "lake")
    e1 = Engine(spark, _cfg(log, lake, src, snapshot_mode="always"))
    e1.run()
    assert e1.lake.last_batch_id("snapshot") == 0

    e2 = Engine(spark, _cfg(log, lake, src, snapshot_mode="always"))
    res = e2.run()
    snap = [r for r in res if r.get("phase") is None and "batch_id" in r]
    # the re-run snapshot applied (not {'skipped': True})
    assert e2.lake.last_batch_id("snapshot") == 1
    assert not any(r.get("skipped") for r in res)
    oracle = fold_final_state(_pdf(spark, src), _pdf(spark, log))
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in e2.final_state().collect()
    }
    assert got == {k: v["content"] for k, v in oracle.items()}
