"""Source signal channel — signals riding the change stream itself.

Reference: ``pipeline/signal/channels/SourceSignalChannel.java`` — a
signaling table of (id, type, data) captured by CDC whose change events
surface in the stream and dispatch at their log position. Our transport
is an op='m' row whose ``message`` payload is
``{"signal": {"id", "type", "data"}}`` (schema changes and signals share
the op='m' lane the way the reference multiplexes by table name).

Pinned here: (1) LSN-positioned dispatch — a stop signal halts AFTER the
batch containing it, earlier batches applied, later ones not; (2) the
processed-id ledger — a cold restart replays the whole log but never
re-fires a completed action; (3) deferred execute-snapshot firing after
the containing batch's merge commit, with crash recovery re-firing it
(:meth:`_recover_source_signals`); (4) malformed signal rows are
warn-and-skipped while schema changes sharing the batch still apply."""

from __future__ import annotations

import json
import os

import pytest

from debezium_spark.signals import (
    SourceSignalLedger,
    is_source_signal_payload,
    parse_source_signal,
)
from debezium_spark.streaming.engine import Engine, EngineConfig

from tests.test_schema_evolution import (
    BASE,
    N_EVENTS,
    _changes,
    _world_with_messages,
)


def _sig(sid, stype, data=None):
    return json.dumps({"signal": {"id": sid, "type": stype, "data": data or {}}})


def _cfg(log, lake, src, **kw):
    kw.setdefault("batch_lsn_span", 977)
    return EngineConfig(
        changelog_path=log,
        lake_root=lake,
        source_table_path=src,
        n_buckets=8,
        **kw,
    )


def test_parse_source_signal_shapes():
    assert parse_source_signal('{"change_type": "ALTER_ADD_COLUMN"}') is None
    assert parse_source_signal("not json") is None
    got = parse_source_signal(_sig("s1", "log", {"message": "hi"}))
    assert got == {"id": "s1", "type": "log", "data": {"message": "hi"}}
    for bad in (
        '{"signal": {"type": "log"}}',  # no id
        '{"signal": {"id": "x"}}',  # no type
        '{"signal": "not a dict"}',
        '{"signal": {"id": "x", "type": "log", "data": [1]}}',
    ):
        with pytest.raises(ValueError, match="malformed source-channel"):
            parse_source_signal(bad)
        assert is_source_signal_payload(bad)


def test_custom_action_fires_once_across_cold_restart(spark, tmp_root):
    """A custom-SPI signal in the stream fires at its batch, is marked
    in the ledger, and a cold restart (full-log replay incl. the signal
    row) does not re-fire it."""
    calls = []
    sig_lsn = BASE + 100
    src, log = _world_with_messages(
        spark, tmp_root, [_sig("c1", "mark", {"tag": "t"})], lsns=[sig_lsn]
    )
    lake = os.path.join(tmp_root, "lake")
    actions = {"mark": lambda eng, sig: calls.append(sig["id"])}
    e1 = Engine(
        spark, _cfg(log, lake, src, custom_signal_actions=actions)
    )
    e1.run()
    assert calls == ["c1"]
    assert SourceSignalLedger(lake).seen("c1")
    # cold restart: same lake, fresh engine, full replay re-reads the row
    e2 = Engine(
        spark, _cfg(log, lake, src, custom_signal_actions=actions)
    )
    e2.run()
    assert calls == ["c1"]  # not re-fired


def test_stop_signal_halts_after_containing_batch(spark, tmp_root):
    """The stop takes effect at the next batch boundary: batches up to
    and including the signal's are applied, the rest are not — then a
    fresh engine resumes from exactly that position."""
    span = 200  # data lsns run BASE..BASE+2*N_EVENTS → 3 windows
    sig_lsn = BASE + span + 50  # inside batch k=1, data follows after
    src, log = _world_with_messages(
        spark, tmp_root, [_sig("st1", "stop")], lsns=[sig_lsn]
    )
    lake = os.path.join(tmp_root, "lake")
    e1 = Engine(spark, _cfg(log, lake, src, batch_lsn_span=span))
    res = e1.run()
    stream_batches = [
        r["batch_id"] for r in res if "batch_id" in r and r["batch_id"] > 0
    ]
    assert stream_batches == [1, 2]  # halted after the signal's window
    assert e1._stopped
    # later events really were left unapplied: committed frontier stops
    # at the signal batch's window
    assert max(e1.lake.committed_offsets().values()) < BASE + 2 * span
    # resume: the signal is in the ledger, so the fresh engine does not
    # re-stop; it replays the remaining windows to completion
    e2 = Engine(spark, _cfg(log, lake, src, batch_lsn_span=span))
    res2 = e2.run()
    assert [r["batch_id"] for r in res2][0] == 3
    assert not e2._stopped
    # full final state after resume matches the pure fold
    from debezium_spark.oracle import fold_final_state

    src_pdf = spark.read.parquet(src).toPandas()
    log_pdf = spark.read.parquet(log).toPandas()
    for c in ("before", "after", "source"):
        log_pdf[c] = log_pdf[c].map(
            lambda v: v.asDict() if hasattr(v, "asDict") else v
        )
    oracle = fold_final_state(src_pdf, log_pdf)
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in e2.final_state().collect()
    }
    assert got == {k: v["content"] for k, v in oracle.items()}


def test_execute_snapshot_signal_from_stream(spark, tmp_root):
    """An execute-snapshot signal row triggers an incremental snapshot
    after its batch commits; the snapshot notification trail appears
    and the final state stays oracle-exact (chunks are LWW-fenced)."""
    from debezium_spark.oracle import fold_final_state

    sig_lsn = BASE + 200
    src, log = _world_with_messages(
        spark,
        tmp_root,
        [_sig("es1", "execute-snapshot", {"chunk_size": 40})],
        lsns=[sig_lsn],
    )
    lake = os.path.join(tmp_root, "lake")
    eng = Engine(spark, _cfg(log, lake, src))
    eng.run()
    kinds = [
        (n["aggregate_type"], n["type"]) for n in eng.notifications.read()
    ]
    assert ("Incremental Snapshot", "STARTED") in kinds or any(
        "INCREMENTAL" in a.upper() for a, _ in kinds
    )
    assert SourceSignalLedger(lake).seen("es1")

    src_pdf = spark.read.parquet(src).toPandas()
    log_pdf = spark.read.parquet(log).toPandas()
    for c in ("before", "after", "source"):
        log_pdf[c] = log_pdf[c].map(
            lambda v: v.asDict() if hasattr(v, "asDict") else v
        )
    oracle = fold_final_state(src_pdf, log_pdf)
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in eng.final_state().collect()
    }
    exp = {k: v["content"] for k, v in oracle.items()}
    assert got == exp


def test_crash_between_merge_and_snapshot_recovers(spark, tmp_root):
    """Crash window: the signal's batch merge committed, the deferred
    execute-snapshot did not complete. On restart the recovery scan
    finds the delivered-but-unmarked id below the committed frontier
    and re-fires it exactly once."""
    sig_lsn = BASE + 100
    src, log = _world_with_messages(
        spark,
        tmp_root,
        [_sig("es2", "execute-snapshot", {"chunk_size": 50})],
        lsns=[sig_lsn],
    )
    lake = os.path.join(tmp_root, "lake")
    e1 = Engine(spark, _cfg(log, lake, src))

    def boom(*a, **kw):
        raise RuntimeError("injected crash: merge committed, snapshot not")

    e1.incremental_snapshot = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        e1.run()
    assert not SourceSignalLedger(lake).seen("es2")

    snaps = []
    e2 = Engine(spark, _cfg(log, lake, src))
    orig = e2.incremental_snapshot
    e2.incremental_snapshot = lambda *a, **kw: snaps.append(1) or orig(*a, **kw)
    e2.run()
    assert snaps == [1]  # recovery fired it exactly once
    assert SourceSignalLedger(lake).seen("es2")
    # a third engine does not fire it again
    e3 = Engine(spark, _cfg(log, lake, src))
    e3.incremental_snapshot = boom
    e3.run()  # no raise: never called


def test_malformed_signal_skipped_schema_changes_still_apply(spark, tmp_root):
    """Signal rows missing required fields are warn-and-skipped (the
    reference channel logs and drops them) WITHOUT tripping the
    schema-history unparseable gate; a schema change in the same log
    still applies."""
    ch = _changes()[0]  # ALTER_ADD_COLUMN size_bytes at ~30%
    msgs = [
        json.dumps({"signal": {"type": "log"}}),  # malformed: no id
        json.dumps(ch),
        _sig("ok1", "log", {"message": "note"}),
    ]
    lsns = [BASE + 5, ch["lsn"], BASE + 2 * N_EVENTS - 5]
    src, log = _world_with_messages(spark, tmp_root, msgs, lsns=lsns)
    lake = os.path.join(tmp_root, "lake")
    eng = Engine(spark, _cfg(log, lake, src))  # no unparseable raise
    assert eng.tracker.latest_version == 1  # signal rows not schema events
    eng.run()
    assert "size_bytes" in eng.final_state().columns
    led = SourceSignalLedger(lake)
    assert led.seen("ok1")


def test_flag_signal_survives_crash_before_merge(spark, tmp_root):
    """At-least-once for flag signals: a crash AFTER the control pass
    applied the flag but BEFORE the batch's merge commit must not lose
    the signal — it is ledger-marked only post-commit, so the replayed
    batch re-delivers it."""
    span = 200
    src, log = _world_with_messages(
        spark, tmp_root, [_sig("st2", "stop")], lsns=[BASE + span + 50]
    )
    lake = os.path.join(tmp_root, "lake")
    e1 = Engine(spark, _cfg(log, lake, src, batch_lsn_span=span))
    orig_merge = e1.lake.merge

    def crashing_merge(changes, batch_id, **kw):
        if batch_id == 2:  # the signal's batch
            raise RuntimeError("injected: flag applied, merge not")
        return orig_merge(changes, batch_id, **kw)

    e1.lake.merge = crashing_merge
    with pytest.raises(RuntimeError, match="injected"):
        e1.run()
    assert e1._stopped  # flag had been applied in-memory
    assert not SourceSignalLedger(lake).seen("st2")  # but never marked

    # restart: the batch replays, the signal re-fires, stop is honored
    e2 = Engine(spark, _cfg(log, lake, src, batch_lsn_span=span))
    e2.run()
    assert e2._stopped
    assert SourceSignalLedger(lake).seen("st2")
    # a third engine resumes past the consumed signal and completes
    e3 = Engine(spark, _cfg(log, lake, src, batch_lsn_span=span))
    e3.run()
    assert not e3._stopped
