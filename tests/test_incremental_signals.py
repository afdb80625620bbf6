"""Incremental snapshot (DBLog watermark dedup), signals, and
error-handling modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.signals import SignalChannel
from debezium_spark.streaming.engine import Engine, EngineConfig


def _cfg(tmp_root, **kw):
    base = dict(
        changelog_path=f"{tmp_root}/log",
        lake_root=f"{tmp_root}/lake",
        source_table_path=f"{tmp_root}/src",
        batch_lsn_span=2000,
        n_buckets=8,
    )
    base.update(kw)
    return EngineConfig(**base)


@pytest.fixture()
def small_world(spark, tmp_root):
    gen_source_table(spark, 4, 20).write.parquet(f"{tmp_root}/src")
    gen_change_log(spark, 4, 20, n_events=1000, snapshot_lsn_base=80).write.parquet(
        f"{tmp_root}/log"
    )
    return tmp_root


def test_incremental_snapshot_backfills_and_loses_window_races(spark, small_world):
    """DBLog semantics (AbstractIncrementalSnapshotChangeEventSource
    .java:197-206): the chunked re-read targets the LIVE database — rows
    already advanced by streamed events re-read at their current value;
    rows never captured are back-filled; and events streamed AFTER the
    chunk's low watermark beat the chunk row (window dedup). Modeled by
    streaming half the log, snapshotting from the then-live source
    state, then streaming the rest — the final state must equal a pure
    full-stream replay plus the back-filled untouched keys."""
    eng = Engine(spark, _cfg(small_world, snapshot_mode="never"))
    eng.stream(max_batches=2)  # half the log

    # live DB at the watermark = applied state + never-touched source rows
    cols = ["repo", "path", "commit", "lang", "content"]
    state = eng.final_state().select(*cols)
    src = spark.read.parquet(f"{small_world}/src").select(*cols)
    touched = (
        spark.read.parquet(f"{small_world}/log")
        .select(
            F.col("key.repo").alias("repo"), F.col("key.path").alias("path")
        )
        .distinct()
    )
    live = state.unionByName(src.join(touched, ["repo", "path"], "left_anti"))

    results = eng.incremental_snapshot(source=live, chunk_size=16)
    assert len(results) >= 5
    assert all(not r.get("skipped") for r in results)

    eng.stream()  # the rest of the log: lsn > watermark must win

    after = {
        (r["repo"], r["path"]): r["commit"] for r in eng.final_state().collect()
    }

    # oracle: pure full-stream replay on a fresh lake
    ref = Engine(
        spark,
        _cfg(small_world, snapshot_mode="never", lake_root=f"{small_world}/lake_ref"),
    )
    ref.stream()
    ref_state = {
        (r["repo"], r["path"]): r["commit"] for r in ref.final_state().collect()
    }
    for k, commit in ref_state.items():
        assert after[k] == commit, f"chunk row beat a streamed event for {k}"

    # back-filled untouched keys carry their source-table values
    src_rows = {(r["repo"], r["path"]): r["commit"] for r in src.collect()}
    touched_keys = {(r["repo"], r["path"]) for r in touched.collect()}
    for k, commit in src_rows.items():
        if k not in touched_keys:
            assert after[k] == commit, f"untouched key {k} not back-filled"


def test_incremental_snapshot_resumes_with_per_phase_fence(spark, small_world):
    eng = Engine(spark, _cfg(small_world, snapshot_mode="never"))
    eng.stream(max_batches=1)
    r1 = eng.incremental_snapshot(chunk_size=30, max_chunks=1)
    # a fresh engine: stream batches continue from the stream fence even
    # though incremental batches committed in between
    eng2 = Engine(spark, _cfg(small_world, snapshot_mode="never"))
    r2 = eng2.stream()
    assert all(not r.get("skipped") for r in r2)
    r3 = eng2.incremental_snapshot(chunk_size=30)
    assert r1[0]["batch_id"] == 0  # incremental fence starts at 0
    assert r3[0]["batch_id"] == 1  # and continues across engine restarts


def test_signal_pause_stop_and_execute_snapshot(spark, small_world):
    sig_path = f"{small_world}/signals.jsonl"
    ch = SignalChannel(sig_path)
    ch.send("s1", "pause")
    eng = Engine(
        spark, _cfg(small_world, signal_path=sig_path, snapshot_mode="never")
    )
    assert eng.stream() == []  # paused before the first batch
    ch.send("s2", "resume")
    out = eng.stream()
    assert out and all(not r.get("skipped") for r in out)

    # stop halts mid-run on a fresh lake
    import shutil

    shutil.rmtree(f"{small_world}/lake")
    ch2 = SignalChannel(f"{small_world}/sig2.jsonl")
    ch2.send("x1", "stop")
    eng2 = Engine(
        spark,
        _cfg(
            small_world,
            signal_path=f"{small_world}/sig2.jsonl",
            snapshot_mode="never",
        ),
    )
    assert eng2.stream() == []

    # execute-snapshot triggers an incremental snapshot between batches
    ch2.send("x2", "execute-snapshot", {"chunk_size": 40})
    eng3 = Engine(
        spark,
        _cfg(
            small_world,
            signal_path=f"{small_world}/sig2.jsonl",
            snapshot_mode="never",
        ),
    )
    eng3.stream()
    phases = {r["phase"] for r in eng3.lake.lineage()}
    assert "incremental" in phases and "stream" in phases


def test_signals_ack_after_processing(tmp_path):
    """poll() must NOT consume signals — a crash between poll and action
    re-delivers on restart; only ack() marks them done (the reference
    commits signal offsets after processing)."""
    ch = SignalChannel(str(tmp_path / "sig.jsonl"))
    ch.send("a", "log")
    ch.send("b", "log")
    first = ch.poll()
    assert [s["id"] for s in first] == ["a", "b"]
    # crash before ack: a re-poll (restart) sees the same signals
    again = ch.poll()
    assert [s["id"] for s in again] == ["a", "b"]
    ch.ack("a")
    assert [s["id"] for s in ch.poll()] == ["b"]
    ch.ack("b")
    assert ch.poll() == []


def test_execute_snapshot_defaults_to_live_source(spark, small_world):
    """The execute-snapshot signal must re-read the LIVE state, not the
    stale initial-snapshot parquet: keys already advanced by streamed
    events keep their streamed values after the signal-triggered
    snapshot (the old default re-read the static source and reverted
    them to initial contents)."""
    sig_path = f"{small_world}/sig_live.jsonl"
    eng = Engine(
        spark,
        _cfg(
            small_world,
            signal_path=sig_path,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_live",
        ),
    )
    eng.stream()  # whole log applied; offsets at the frontier
    before = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.final_state().collect()
    }
    SignalChannel(sig_path).send("es", "execute-snapshot", {"chunk_size": 40})
    eng.process_signals()
    after = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.final_state().collect()
    }
    # streamed values survive; untouched source keys are back-filled
    for k, commit in before.items():
        assert after[k] == commit, f"signal snapshot reverted {k}"
    assert set(before) <= set(after)


def test_chunk_pagination_has_no_per_chunk_sort(spark, small_world):
    """Chunk reads are pruned range scans — the per-chunk global
    sort+limit (TakeOrderedAndProject over the remaining table) is the
    O(n²/chunk) shape the pagination must avoid."""
    from debezium_spark.sources.incremental import (
        plan_chunk_bounds,
        read_chunk_range,
    )

    src = spark.read.parquet(f"{small_world}/src")
    bounds = plan_chunk_bounds(src, 16)
    assert len(bounds) >= 4
    lo = None
    for hi in bounds[:3]:
        chunk = read_chunk_range(src, lo, hi)
        plan = chunk._sc._jvm.PythonSQLUtils.explainString(
            chunk._jdf.queryExecution(), "formatted"
        )
        assert "TakeOrderedAndProject" not in plan
        assert "Sort" not in plan
        assert "PushedFilters" in plan
        lo = hi
    # the ranges tile the key space: union of chunks == source
    total = sum(
        read_chunk_range(src, None if i == 0 else bounds[i - 1], b).count()
        for i, b in enumerate(bounds)
    )
    assert total == src.count()


def test_error_mode_fail_aborts_before_commit(spark, tmp_root, small_world):
    bad = gen_change_log(spark, 4, 20, n_events=100, snapshot_lsn_base=80)
    # corrupt: an update with a null after image
    bad = bad.withColumn(
        "after",
        F.when(F.col("lsn") % 7 == 0, F.lit(None).cast(bad.schema["after"].dataType)).otherwise(
            F.col("after")
        ),
    )
    bad.write.mode("overwrite").parquet(f"{small_world}/badlog")
    eng = Engine(
        spark,
        _cfg(
            small_world,
            changelog_path=f"{small_world}/badlog",
            lake_root=f"{small_world}/lake_fail",
            snapshot_mode="never",
            error_mode="fail",
        ),
    )
    with pytest.raises(Exception, match="invalid envelope"):
        eng.stream()
    # nothing was committed for the failed batch
    assert eng.lake.last_batch_id("stream") == -1

    # skip mode applies the valid remainder
    eng2 = Engine(
        spark,
        _cfg(
            small_world,
            changelog_path=f"{small_world}/badlog",
            lake_root=f"{small_world}/lake_skip",
            snapshot_mode="never",
            error_mode="skip",
        ),
    )
    out = eng2.stream()
    assert out and all(not r.get("skipped") for r in out)
    assert eng2.final_state().count() > 0


def test_error_mode_dlq_routes_and_commits(spark, small_world):
    """``errors.tolerance=all`` + dead-letter routing
    (DeadLetterQueueReporter): invalid envelopes land in
    <lake_root>/_dlq with __connect.errors.* context headers, the main
    path commits the valid remainder (identical to skip mode), and a
    re-delivered batch leaves the DLQ unchanged (idempotent
    overwrite)."""
    from debezium_spark.operators.transforms import event_invalid

    bad = gen_change_log(spark, 4, 20, n_events=100, snapshot_lsn_base=80)
    bad = bad.withColumn(
        "after",
        F.when(
            F.col("lsn") % 7 == 0,
            F.lit(None).cast(bad.schema["after"].dataType),
        ).otherwise(F.col("after")),
    )
    bad.write.mode("overwrite").parquet(f"{small_world}/badlog_dlq")
    n_invalid = bad.filter(event_invalid(bad)).count()
    assert n_invalid > 0

    eng = Engine(
        spark,
        _cfg(
            small_world,
            changelog_path=f"{small_world}/badlog_dlq",
            lake_root=f"{small_world}/lake_dlq",
            snapshot_mode="never",
            error_mode="dlq",
        ),
    )
    out = eng.stream()
    assert out and all(not r.get("skipped") for r in out)

    dlq = eng.dead_letters()
    rows = dlq.collect()
    assert len(rows) == n_invalid
    for r in rows:
        h = r["headers"]
        assert h["__connect.errors.stage"] == "VALUE_CONVERTER"
        assert (
            h["__connect.errors.exception.message"]
            == "c/r/u event without after image"
        )
        assert h["__connect.errors.offset"] == str(r["lsn"])
        assert int(r["lsn"]) % 7 == 0
        # the DLQ keeps the raw record for repair-and-replay
        assert r["after"] is None and r["op"] in ("c", "u", "r")

    # main path == skip mode final state
    eng_skip = Engine(
        spark,
        _cfg(
            small_world,
            changelog_path=f"{small_world}/badlog_dlq",
            lake_root=f"{small_world}/lake_dlq_skip",
            snapshot_mode="never",
            error_mode="skip",
        ),
    )
    eng_skip.stream()
    a = {tuple(r) for r in eng.final_state().collect()}
    b = {tuple(r) for r in eng_skip.final_state().collect()}
    assert a == b

    # re-delivery: fresh engine over the same lake skips the committed
    # batch and the DLQ stays exactly as written
    eng2 = Engine(
        spark,
        _cfg(
            small_world,
            changelog_path=f"{small_world}/badlog_dlq",
            lake_root=f"{small_world}/lake_dlq",
            snapshot_mode="never",
            error_mode="dlq",
        ),
    )
    out2 = eng2.stream()
    # either the offset fast-path yields no windows at all, or every
    # re-delivered window is fenced off as skipped — both are no-ops
    assert all(r.get("skipped") for r in out2)
    assert eng2.dead_letters().count() == n_invalid


def test_dead_letters_empty_lake(spark, tmp_root, small_world):
    """dead_letters() on a lake that never routed anything is an empty
    DataFrame with the headers column, not an error."""
    eng = Engine(
        spark,
        _cfg(
            small_world,
            lake_root=f"{small_world}/lake_nodlq",
            snapshot_mode="never",
            error_mode="dlq",
        ),
    )
    df = eng.dead_letters()
    assert "headers" in df.columns
    assert df.count() == 0


def test_blocking_snapshot_phase(spark, small_world):
    """Dedicated blocking-snapshot phase: pause -> snapshot -> resume
    (ChangeEventSourceCoordinator.java:198-227); streaming continues
    afterwards and the final state stays oracle-consistent."""
    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_blocking",
            batch_lsn_span=800,  # several batches so streaming remains
        ),
    )
    eng.stream(max_batches=1)
    res = eng.blocking_snapshot(chunk_size=40)
    assert res and all(not r.get("skipped") for r in res)
    assert not eng._paused  # resumed
    out = eng.stream()  # remaining log still applies
    assert out and all(not r.get("skipped") for r in out)
    phases = {r["phase"] for r in eng.lake.lineage()}
    assert "incremental" in phases and "stream" in phases


def test_stop_snapshot_signal_halts_in_flight_snapshot(spark, small_world):
    """stop-snapshot (pipeline/signal/actions/snapshotting/StopSnapshot
    .java:31) cancels an in-flight incremental snapshot at chunk
    granularity: the loop halts after the current chunk with per-chunk
    fences intact, emits ABORTED, and a later execute-snapshot
    completes the work idempotently (already-applied chunks are LWW
    no-ops)."""
    import threading

    sig_path = f"{small_world}/sig_stop.jsonl"
    ch = SignalChannel(sig_path)
    eng = Engine(
        spark,
        _cfg(
            small_world,
            signal_path=sig_path,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_stopsnap",
        ),
    )
    eng.stream()

    # fire stop-snapshot as soon as the first chunk committed
    def stop_after_first_chunk():
        import time

        while not any(
            n["type"] == "IN_PROGRESS" for n in eng.notifications.read()
        ):
            time.sleep(0.01)
        ch.send("st", "stop-snapshot")

    t = threading.Thread(target=stop_after_first_chunk, daemon=True)
    t.start()
    results = eng.incremental_snapshot(chunk_size=12)
    t.join()
    notes = eng.notifications.read()
    aborted = [
        n for n in notes
        if n["aggregate_type"] == "Incremental Snapshot"
        and n["type"] == "ABORTED"
    ]
    assert aborted, "stop-snapshot did not abort the snapshot"
    assert aborted[-1]["additional_data"]["chunks_done"] < aborted[-1][
        "additional_data"
    ]["of"]
    assert len(results) >= 1  # at least the first chunk committed

    # a later execute-snapshot completes the remainder; final state =
    # full replay + back-filled untouched keys (idempotent resume)
    results2 = eng.incremental_snapshot(chunk_size=12)
    assert all(not r.get("skipped") for r in results2)
    src = spark.read.parquet(f"{small_world}/src")
    assert eng.final_state().count() >= src.count() * 0.5
    # incremental fences stayed monotone across the abort: every
    # (batch, partition) committed exactly once, batch ids in order
    pairs = [
        (r["batch_id"], r["partition_id"])
        for r in eng.lake.lineage()
        if r["phase"] == "incremental"
    ]
    assert len(pairs) == len(set(pairs))
    ids = [b for b, _ in pairs]
    assert ids == sorted(ids)


def test_pause_resume_snapshot_round_trip(spark, small_world):
    """pause-snapshot stalls the chunk loop between chunks until a
    resume-snapshot arrives (PauseIncrementalSnapshot.java /
    ResumeIncrementalSnapshot.java); the snapshot then completes in
    full."""
    import threading
    import time

    sig_path = f"{small_world}/sig_pause.jsonl"
    ch = SignalChannel(sig_path)
    # pre-written: the snapshot's own between-chunk poll must see it
    # before the first chunk (no engine-loop poll consumes it first)
    ch.send("p", "pause-snapshot")
    eng = Engine(
        spark,
        _cfg(
            small_world,
            signal_path=sig_path,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_pausesnap",
        ),
    )
    delay = 0.6
    t = threading.Thread(
        target=lambda: (time.sleep(delay), ch.send("r", "resume-snapshot")),
        daemon=True,
    )
    t0 = time.time()
    t.start()
    results = eng.incremental_snapshot(chunk_size=40)
    t.join()
    assert time.time() - t0 >= delay  # the pause actually stalled
    assert results and all(not r.get("skipped") for r in results)
    assert not eng._snapshot_paused
    notes = eng.notifications.read()
    assert any(
        n["aggregate_type"] == "Incremental Snapshot"
        and n["type"] == "COMPLETED"
        for n in notes
    )


def test_execute_snapshot_data_collections_and_additional_conditions(
    spark, small_world
):
    """ExecuteSnapshot payload semantics (ExecuteSnapshot.java +
    AdditionalCondition.java): data-collections scopes the signal to
    named tables (others are acked no-ops); additional-conditions
    carries a per-table predicate so only the filtered slice is
    re-snapshotted — untouched keys are unaffected."""
    # a sparser world than small_world: many keys stay untouched, so the
    # filtered back-fill has something to add
    gen_source_table(spark, 6, 30).write.parquet(f"{small_world}/src_cond")
    gen_change_log(
        spark, 6, 30, n_events=150, snapshot_lsn_base=180
    ).write.parquet(f"{small_world}/log_cond")
    sig_path = f"{small_world}/sig_cond.jsonl"
    ch = SignalChannel(sig_path)
    eng = Engine(
        spark,
        _cfg(
            small_world,
            changelog_path=f"{small_world}/log_cond",
            source_table_path=f"{small_world}/src_cond",
            signal_path=sig_path,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_cond",
        ),
    )
    eng.stream()
    before = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.final_state().collect()
    }

    # a signal for another table must not trigger anything
    ch.send("c0", "execute-snapshot", {"data-collections": ["other_table"]})
    eng.process_signals()
    assert not any(
        r["phase"] == "incremental" for r in eng.lake.lineage()
    )
    assert ch.poll() == []  # acked as a no-op

    # filtered re-snapshot: only the lang='py' slice is read back
    ch.send(
        "c1",
        "execute-snapshot",
        {
            "data-collections": ["repo_files"],
            "additional-conditions": [
                {"data-collection": "repo_files", "filter": "lang = 'py'"}
            ],
            "chunk_size": 40,
        },
    )
    eng.process_signals()
    after = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.final_state().collect()
    }
    # streamed values survive (watermark dedup)
    for k, commit in before.items():
        assert after[k] == commit, f"filtered snapshot reverted {k}"
    # newly back-filled keys are exactly the untouched py-slice keys
    new_keys = set(after) - set(before)
    src_lang = {
        (r["repo"], r["path"]): r["lang"]
        for r in spark.read.parquet(f"{small_world}/src_cond").collect()
    }
    assert new_keys, "filtered back-fill added nothing"
    assert all(src_lang[k] == "py" for k in new_keys)


def test_additional_condition_predicate_reaches_the_chunk_scan(
    spark, small_world
):
    """The additional-condition predicate must be visible as a pushed
    filter on the chunk's pruned scan — at 100 TB the re-snapshot reads
    only matching row groups, not the whole table."""
    from pyspark.sql import functions as SF

    from debezium_spark.sources.incremental import (
        plan_chunk_bounds,
        read_chunk_range,
    )

    src = spark.read.parquet(f"{small_world}/src").filter(
        SF.expr("lang = 'py'")
    )
    bounds = plan_chunk_bounds(src, 16)
    chunk = read_chunk_range(src, None, bounds[0])
    plan = chunk._sc._jvm.PythonSQLUtils.explainString(
        chunk._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    assert "EqualTo(lang,py)" in plan


def test_incremental_snapshot_is_read_only_on_the_log(spark, small_world):
    """Read-only incremental-snapshot semantics
    (MySqlReadOnlyIncrementalSnapshotChangeEventSource analogue): the
    engine's committed-offset watermark never writes control rows to
    the change log — the log's file set is byte-identical across the
    snapshot."""
    import os

    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_ro",
        ),
    )
    eng.stream(max_batches=2)
    log_dir = f"{small_world}/log"

    def fingerprint():
        out = {}
        for n in sorted(os.listdir(log_dir)):
            p = os.path.join(log_dir, n)
            st = os.stat(p)
            out[n] = (st.st_size, st.st_mtime_ns)
        return out

    before = fingerprint()
    eng.incremental_snapshot(chunk_size=40)
    assert fingerprint() == before


def test_empty_changelog_is_clean_noop(spark, tmp_root):
    """A WAL tail that starts before the first log segment lands (or a
    log with zero events) must be a clean no-op, not an int(None)
    crash (lsn_bounds on an empty/missing log)."""
    from debezium_spark.envelope import EVENT_SCHEMA
    from debezium_spark.generator import gen_source_table

    gen_source_table(spark, 2, 10).write.parquet(f"{tmp_root}/src")

    # missing log directory
    eng = Engine(
        spark,
        _cfg(
            tmp_root,
            changelog_path=f"{tmp_root}/no_such_log",
            lake_root=f"{tmp_root}/lake_nolog",
        ),
    )
    res = eng.run()
    assert len(res) == 1 and not res[0].get("skipped")  # snapshot only
    assert eng.final_state().count() == 20

    # present-but-empty log (zero events)
    spark.createDataFrame([], EVENT_SCHEMA).write.parquet(
        f"{tmp_root}/empty_log"
    )
    eng2 = Engine(
        spark,
        _cfg(
            tmp_root,
            changelog_path=f"{tmp_root}/empty_log",
            lake_root=f"{tmp_root}/lake_emptylog",
        ),
    )
    res2 = eng2.run()
    assert len(res2) == 1
    assert eng2.final_state().count() == 20


def test_misconfigured_changelog_raises_not_noop(spark, tmp_root):
    """Only a truly absent/empty log is a clean no-op. A changelog_path
    pointing at the WRONG parquet table (no lsn column) must raise —
    swallowing it would silently replay nothing and report a converged
    state (silent data loss)."""
    from pyspark.errors import AnalysisException

    from debezium_spark.generator import gen_source_table
    from debezium_spark.sources.changelog import lsn_bounds

    gen_source_table(spark, 2, 5).write.parquet(f"{tmp_root}/src")
    with pytest.raises(AnalysisException):
        lsn_bounds(spark, f"{tmp_root}/src")  # exists, but not a log
    eng = Engine(
        spark,
        _cfg(
            tmp_root,
            changelog_path=f"{tmp_root}/src",  # mistyped: the source dir
            lake_root=f"{tmp_root}/lake_misconf",
            snapshot_mode="never",
        ),
    )
    with pytest.raises(AnalysisException):
        eng.stream()


def test_snapshot_select_statement_override(spark, tmp_root):
    """snapshot.select.statement.overrides analogue
    (RelationalDatabaseConnectorConfig.java:346): a per-table predicate
    + projection restricts what the initial snapshot captures;
    FIRST/LAST markers are computed over the overridden result set."""
    from debezium_spark.generator import gen_source_table
    from debezium_spark.sources.snapshot import snapshot_envelopes

    gen_source_table(spark, 3, 12).write.parquet(f"{tmp_root}/src")
    eng = Engine(
        spark,
        _cfg(
            tmp_root,
            changelog_path=f"{tmp_root}/no_log",
            lake_root=f"{tmp_root}/lake_override",
            snapshot_overrides={
                "repo_files": {
                    "filter": "lang = 'py'",
                    "columns": ["repo", "path", "commit", "lang"],
                }
            },
        ),
    )
    eng.run()
    rows = eng.final_state().collect()
    src = spark.read.parquet(f"{tmp_root}/src")
    n_py = src.filter(F.col("lang") == "py").count()
    assert 0 < len(rows) == n_py
    assert all(r["lang"] == "py" for r in rows)
    # projected-away column was never captured
    assert all(r["content"] is None for r in rows)
    assert all(r["commit"] is not None for r in rows)

    # FIRST/LAST markers sit on the min/max key of the FILTERED set
    filtered = src.filter(F.col("lang") == "py")
    env = snapshot_envelopes(filtered).select(
        "key", F.col("source.snapshot").alias("marker")
    )
    marks = {r["marker"] for r in env.collect()}
    assert marks == {"first", "true", "last"}
    ordered = sorted(
        (r["key"]["repo"], r["key"]["path"], r["marker"])
        for r in env.collect()
    )
    assert ordered[0][2] == "first" and ordered[-1][2] == "last"


def test_extract_schema_to_new_record(spark):
    from debezium_spark.operators.transforms import (
        extract_schema_to_new_record,
    )
    from debezium_spark.schema_evolution import TableSchema

    df = spark.createDataFrame([(1,)], "lsn: long")
    out = extract_schema_to_new_record(df, TableSchema().columns).collect()[0]
    assert out["__schema"].startswith("1:repo:string,2:path:string")


def test_notifications_channel(spark, small_world):
    """Notification records (pipeline/notification/Notification.java:
    1-150): snapshot and incremental-snapshot lifecycle events appear
    in order on the notification log."""
    eng = Engine(
        spark,
        _cfg(small_world, lake_root=f"{small_world}/lake_notif"),
    )
    eng.run(max_batches=1)
    eng.incremental_snapshot(chunk_size=40, max_chunks=2)
    kinds = [
        (n["aggregate_type"], n["type"]) for n in eng.notifications.read()
    ]
    assert kinds[0] == ("Initial Snapshot", "STARTED")
    assert ("Initial Snapshot", "COMPLETED") in kinds
    inc = [k for k in kinds if k[0] == "Incremental Snapshot"]
    assert inc[0][1] == "STARTED"
    assert inc[-1][1] == "COMPLETED"
    assert ("Incremental Snapshot", "IN_PROGRESS") in inc
    ids = [n["id"] for n in eng.notifications.read()]
    assert ids == list(range(len(ids)))  # monotone sequence


def test_live_source_covers_pk_change_targets(spark, tmp_path):
    """A PK-change update moves a row onto a key that appears only in
    the event's after image. live_source must count that key as touched
    — otherwise the stale source row is unioned next to the streamed
    one and an execute-snapshot can revert the move."""
    from debezium_spark.envelope import EVENT_SCHEMA
    from debezium_spark.generator import gen_source_table

    src_p = str(tmp_path / "src")
    log_p = str(tmp_path / "log")
    gen_source_table(spark, 2, 10).write.parquet(src_p)
    rows = spark.read.parquet(src_p).orderBy("repo", "path").limit(2).collect()
    k1, k2 = rows[0], rows[1]

    def img(row, content):
        return {
            "repo": row["repo"], "path": row["path"], "commit": "c" * 40,
            "lang": row["lang"], "content": content, "size_bytes": None,
        }

    ev = {
        "partition_id": 0, "lsn": 100, "op": "u",
        "key": {"repo": k1["repo"], "path": k1["path"]},
        "before": img(k1, k1["content"]),
        "after": img(k2, "moved-content"),  # PK-change onto k2
        "source": {"ts_ms": 1, "snapshot": "false", "txId": 1, "table": "repo_files"},
        "ts_ms": 1, "schema_version": 0, "is_tombstone": False, "message": None,
    }
    spark.createDataFrame([ev], EVENT_SCHEMA).write.parquet(log_p)

    eng = Engine(
        spark,
        EngineConfig(
            changelog_path=log_p, lake_root=str(tmp_path / "lake"),
            source_table_path=src_p, batch_lsn_span=200, n_buckets=4,
        ),
    )
    eng.run()
    lv = eng.live_source()
    dup = (
        lv.groupBy("repo", "path").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0  # k2 must not appear twice (streamed + stale source)
    eng.incremental_snapshot(chunk_size=8)
    final = {
        (r["repo"], r["path"]): r["content"]
        for r in eng.final_state().collect()
    }
    assert (k1["repo"], k1["path"]) not in final  # moved away
    assert final[(k2["repo"], k2["path"])] == "moved-content"  # not reverted


# -- incremental.snapshot.watermarking.strategy ---------------------------
# (CommonConnectorConfig.java:787-795; InsertWindowCloser.java:33-43,
#  DeleteWindowCloser.java:36-55)


def _window_rows(path):
    import json, os

    if not os.path.exists(path):
        return []
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    return [r for r in rows if r["type"].startswith("snapshot-window-")]


def test_watermarking_insert_insert_writes_open_and_close(spark, small_world):
    sig = f"{small_world}/sig_ii.jsonl"
    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_ii",
            signal_path=sig,
        ),
    )
    eng.stream(max_batches=2)
    results = eng.incremental_snapshot(chunk_size=40)
    marks = _window_rows(sig)
    opens = [m for m in marks if m["type"] == "snapshot-window-open"]
    closes = [m for m in marks if m["type"] == "snapshot-window-close"]
    assert len(opens) == len(results)
    assert len(closes) == len(results)
    # open precedes its close in file order, ids pair up (chunk-id-open /
    # chunk-id-close as the reference writes them)
    assert {o["id"][: -len("-open")] for o in opens} == {
        c["id"][: -len("-close")] for c in closes
    }
    # bookkeeping rows are self-acked: a later poll must not redeliver
    from debezium_spark.signals import SignalChannel

    assert all(
        not s["type"].startswith("snapshot-window-")
        for s in SignalChannel(sig).poll()
    )


def test_watermarking_insert_delete_deletes_open_rows(spark, small_world):
    sig = f"{small_world}/sig_id.jsonl"
    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_id",
            signal_path=sig,
            watermarking_strategy="insert_delete",
        ),
    )
    eng.stream(max_batches=2)
    results = eng.incremental_snapshot(chunk_size=40)
    assert len(results) >= 2
    # every -open row deleted by its close; no -close rows ever written
    assert _window_rows(sig) == []
    # state identical to the insert_insert run shape: untouched keys
    # back-filled, streamed keys kept (fence is the LSN watermark, not
    # the bookkeeping rows)
    assert eng.final_state().count() > 0


def test_watermarking_read_only_writes_nothing(spark, small_world):
    import os

    sig = f"{small_world}/sig_ro.jsonl"
    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_wro",
            signal_path=sig,
            watermarking_strategy="read_only",
        ),
    )
    eng.stream(max_batches=2)
    eng.incremental_snapshot(chunk_size=40)
    assert not os.path.exists(sig)


def test_watermarking_strategy_rejected_if_unknown(spark, small_world):
    with pytest.raises(ValueError, match="watermarking_strategy"):
        Engine(
            spark,
            _cfg(
                small_world,
                lake_root=f"{small_world}/lake_bad",
                watermarking_strategy="upsert_upsert",
            ),
        )


# -- custom SignalAction SPI (SignalProcessor.java:52,130-133) -------------


def test_custom_signal_action_dispatch_and_ack(spark, small_world):
    sig = f"{small_world}/sig_custom.jsonl"
    calls = []
    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_csa",
            signal_path=sig,
            custom_signal_actions={
                "compact-now": lambda engine, s: calls.append(
                    (s["id"], s.get("data", {}).get("level"))
                )
            },
        ),
    )
    ch = SignalChannel(sig)
    ch.send("c1", "compact-now", {"level": 2})
    ch.send("u1", "unknown-type")  # recorded, no effect, still acked
    eng.stream(max_batches=1)
    assert calls == [("c1", 2)]
    # acked: a second poll cycle must not re-fire
    eng.stream(max_batches=1)
    assert calls == [("c1", 2)]


def test_custom_signal_action_failure_refires(spark, small_world):
    sig = f"{small_world}/sig_custfail.jsonl"
    state = {"fail": True, "n": 0}

    def flaky(engine, s):
        state["n"] += 1
        if state["fail"]:
            raise RuntimeError("transient")

    eng = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_csaf",
            signal_path=sig,
            custom_signal_actions={"flaky-action": flaky},
        ),
    )
    SignalChannel(sig).send("f1", "flaky-action")
    with pytest.raises(RuntimeError, match="transient"):
        eng.stream(max_batches=1)
    # un-acked: the next poll re-fires it (at-least-once), then acks
    state["fail"] = False
    eng.stream(max_batches=1)
    assert state["n"] == 2
    eng.stream(max_batches=1)
    assert state["n"] == 2


def test_surrogate_key_chunking(spark, small_world):
    """execute-snapshot ``surrogate-key`` (ExecuteSnapshot.java:62,
    137-139): chunk pagination runs over a single named column instead
    of the composite PK. The key-space partition changes; chunk
    contents, watermark stamping, and the LWW merge do not — so the
    final state must be identical to PK-chunked pagination, including
    with a NON-UNIQUE surrogate column (equal values stay whole in one
    range chunk: no lost, no duplicated rows)."""
    from debezium_spark.sources.incremental import (
        plan_chunk_bounds,
        read_chunk_range,
    )

    src = spark.read.parquet(f"{small_world}/src")

    # coverage invariant, directly on the chunk planner: the union of
    # (lo, hi] range chunks over the HEAVILY non-unique `lang` column
    # (a handful of distinct values, so several range partitions share
    # a max and some chunks are empty) is exactly the source — every
    # row once
    bounds = plan_chunk_bounds(src, 16, ("lang",))
    assert len(bounds) >= 2
    seen = 0
    lo = None
    for hi in bounds:
        seen += read_chunk_range(src, lo, hi, ("lang",)).count()
        lo = hi
    assert seen == src.count()

    # engine path via the signal payload, on a half-streamed world
    sig_path = f"{small_world}/sig_sk.jsonl"
    ch = SignalChannel(sig_path)
    eng = Engine(
        spark,
        _cfg(small_world, snapshot_mode="never", signal_path=sig_path),
    )
    eng.stream(max_batches=2)
    before = {
        (r["repo"], r["path"]): r["commit"]
        for r in eng.final_state().collect()
    }
    ch.send(
        "sk1",
        "execute-snapshot",
        {"surrogate-key": "lang", "chunk_size": 16},
    )
    eng.process_signals()
    after = eng.final_state()
    # streamed values survive the surrogate-chunked back-fill
    got = {
        (r["repo"], r["path"]): r["commit"] for r in after.collect()
    }
    for k, commit in before.items():
        assert got[k] == commit, f"surrogate chunk reverted {k}"
    # one row per key
    assert after.count() == after.select("repo", "path").distinct().count()

    # the real invariant: only the key-space partition changed — a
    # PK-chunked snapshot of the same half-streamed world lands on the
    # IDENTICAL final state (deleted keys absent from both, untouched
    # keys back-filled in both)
    ref = Engine(
        spark,
        _cfg(
            small_world,
            snapshot_mode="never",
            lake_root=f"{small_world}/lake_sk_ref",
        ),
    )
    ref.stream(max_batches=2)
    ref.incremental_snapshot(chunk_size=16)
    ref_got = {
        (r["repo"], r["path"]): r["commit"]
        for r in ref.final_state().collect()
    }
    assert got == ref_got

    # unknown surrogate column is rejected at signal time, like the
    # reference's validation — not silently PK-fallback
    with pytest.raises(ValueError, match="surrogate key"):
        eng.incremental_snapshot(surrogate_key="no_such_col")

    # ... but a SIGNAL carrying the bad column is warn-and-skipped
    # (acked as a no-op), never a poison pill that aborts the engine
    before_lineage = len(eng.lake.lineage())
    ch.send("sk-bad", "execute-snapshot", {"surrogate-key": "no_such_col"})
    with pytest.warns(UserWarning, match="invalid payload"):
        eng.process_signals()
    assert ch.poll() == []  # acked
    assert len(eng.lake.lineage()) == before_lineage  # nothing ran


def test_surrogate_key_null_values_not_lost(spark, small_world):
    """A NULLABLE surrogate column must lose no rows: NULLs sort first
    and belong to the first chunk (NULL comparisons would otherwise
    exclude them from every range). Also covers the all-null sentinel
    bound."""
    from debezium_spark.sources.incremental import (
        plan_chunk_bounds,
        read_chunk_range,
    )

    src = spark.read.parquet(f"{small_world}/src")
    # null out lang for ~a third of rows
    nsrc = src.withColumn(
        "lang",
        F.when(F.pmod(F.xxhash64("path"), F.lit(3)) != 0, F.col("lang")),
    )
    assert nsrc.filter(F.col("lang").isNull()).count() > 0
    bounds = plan_chunk_bounds(nsrc, 16, ("lang",))
    seen = 0
    lo = None
    for hi in bounds:
        seen += read_chunk_range(nsrc, lo, hi, ("lang",)).count()
        lo = hi
    assert seen == nsrc.count()

    # all-null column: single sentinel chunk covers everything
    allnull = src.withColumn("lang", F.lit(None).cast("string"))
    b2 = plan_chunk_bounds(allnull, 16, ("lang",))
    assert b2 == [None]
    assert read_chunk_range(allnull, None, None, ("lang",)).count() == src.count()
