"""MaterializedAggView: retract-fold view maintenance over the lake's
change feed — view == recompute after every refresh, exactly-once
fencing, delete retraction, and O(groups) state."""

from __future__ import annotations

import os

import pytest

from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.streaming.aggview import MaterializedAggView
from debezium_spark.streaming.engine import Engine, EngineConfig


def _rows(df):
    return sorted(
        ((r["g"], r["live_rows"], r["agg_bytes"]) for r in df.collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
    )


@pytest.fixture()
def lake_world(spark, tmp_root):
    src, log = f"{tmp_root}/src", f"{tmp_root}/log"
    gen_source_table(spark, 4, 15).write.parquet(src)
    gen_change_log(
        spark, 4, 15, n_events=1200, snapshot_lsn_base=100
    ).write.parquet(log)
    cfg = EngineConfig(
        changelog_path=log,
        lake_root=f"{tmp_root}/lake",
        source_table_path=src,
        batch_lsn_span=600,
        n_buckets=4,
    )
    return cfg


def test_view_equals_recompute_after_full_replay(spark, tmp_root, lake_world):
    eng = Engine(spark, lake_world)
    eng.run()
    view = MaterializedAggView(spark, eng.lake, f"{tmp_root}/view")
    r = view.refresh()
    assert r["skipped"] is False and r["from_version"] == 0
    assert _rows(view.state()) == _rows(view.recompute())


def test_incremental_refresh_across_engine_batches(
    spark, tmp_root, lake_world
):
    eng = Engine(spark, lake_world)
    eng.run(max_batches=2)
    view = MaterializedAggView(spark, eng.lake, f"{tmp_root}/view")
    view.refresh()
    assert _rows(view.state()) == _rows(view.recompute())
    v_mid = view.applied_version()

    # more commits arrive; the next refresh folds ONLY the new feed
    eng2 = Engine(spark, lake_world)
    eng2.run()
    r = view.refresh()
    assert r["from_version"] == v_mid
    assert view.applied_version() == eng2.lake.current_version()
    assert _rows(view.state()) == _rows(view.recompute())


def test_refresh_is_idempotent_and_fenced(spark, tmp_root, lake_world):
    eng = Engine(spark, lake_world)
    eng.run()
    view = MaterializedAggView(spark, eng.lake, f"{tmp_root}/view")
    view.refresh()
    before = _rows(view.state())
    assert view.refresh()["skipped"] is True  # already current
    assert _rows(view.state()) == before


def test_crashed_refresh_attempt_is_recovered(spark, tmp_root, lake_world):
    """Crash between state write and pointer commit: the pointer still
    holds the previous consistent (version, state) pair — the commit
    is ONE atomic os.replace — so the next refresh re-folds the same
    NET feed, overwriting the crashed attempt's partial state dir."""
    eng = Engine(spark, lake_world)
    eng.run(max_batches=2)
    view = MaterializedAggView(spark, eng.lake, f"{tmp_root}/view")
    view.refresh()

    eng2 = Engine(spark, lake_world)
    eng2.run()
    cur = eng2.lake.current_version()
    # the crashed attempt's half-written output for the target version
    garbage = os.path.join(f"{tmp_root}/view", f"state_v{cur}")
    os.makedirs(garbage, exist_ok=True)
    with open(os.path.join(garbage, "part-corrupt.parquet"), "w") as f:
        f.write("not parquet")

    r = view.refresh()
    assert r["skipped"] is False and r["applied_version"] == cur
    assert _rows(view.state()) == _rows(view.recompute())


def test_deletes_retract_groups(spark, tmp_root):
    """A group whose every row is deleted leaves the view."""
    from debezium_spark.lake import LakeTable

    lake = LakeTable(spark, f"{tmp_root}/lake", n_buckets=2)
    lake.create()
    ddl = (
        "repo: string, path: string, commit: string, lang: string, "
        "content: string, op: string, lsn: long"
    )
    lake.merge(
        spark.createDataFrame(
            [
                ("r", "a", "c1", "py", "xxxx", "c", 1),
                ("r", "b", "c1", "go", "yyyyyy", "c", 2),
            ],
            ddl,
        ),
        1,
    )
    view = MaterializedAggView(spark, lake, f"{tmp_root}/view")
    view.refresh()
    assert _rows(view.state()) == [("go", 1, 6), ("py", 1, 4)]

    lake.merge(
        spark.createDataFrame(
            [("r", "b", None, None, None, "d", 3)], ddl
        ),
        2,
    )
    view.refresh()
    assert _rows(view.state()) == [("py", 1, 4)]
    assert _rows(view.state()) == _rows(view.recompute())


def test_state_stays_group_sized(spark, tmp_root, lake_world):
    eng = Engine(spark, lake_world)
    eng.run()
    view = MaterializedAggView(spark, eng.lake, f"{tmp_root}/view")
    view.refresh()
    n_groups = view.recompute().count()
    assert view.state().count() == n_groups
    # single state file: the view is a driver-scale artifact
    ptr = view._pointer()
    files = [
        f
        for f in os.listdir(os.path.join(f"{tmp_root}/view", ptr["state"]))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1


def test_view_rides_the_engine_batch_callback(spark, tmp_root, lake_world):
    """The DebeziumEngine handleBatch composition: a consumer that
    refreshes the view after every committed batch keeps it current
    with zero lag — each refresh folds exactly that batch's commits."""
    import dataclasses

    views = []
    freshness = []

    def on_batch(engine, result):
        if not views:
            views.append(
                MaterializedAggView(spark, engine.lake, f"{tmp_root}/view")
            )
        v = views[0]
        v.refresh()
        freshness.append(
            v.applied_version() == engine.lake.current_version()
        )

    cfg = dataclasses.replace(lake_world, batch_callback=on_batch)
    eng = Engine(spark, cfg)
    eng.run()
    assert freshness and all(freshness)
    v = views[0]
    assert _rows(v.state()) == _rows(v.recompute())


def test_group_column_rename_between_refreshes(spark, tmp_root):
    """The view pins its columns by FIELD ID: after the lake renames
    lang -> language, the next refresh resolves the feed's new logical
    name and keeps folding the same column."""
    from debezium_spark.lake import LakeTable

    lake = LakeTable(spark, f"{tmp_root}/lake", n_buckets=2)
    lake.create()
    ddl = (
        "repo: string, path: string, commit: string, lang: string, "
        "content: string, op: string, lsn: long"
    )
    lake.merge(
        spark.createDataFrame([("r", "a", "c1", "py", "xxxx", "c", 1)], ddl),
        1,
    )
    view = MaterializedAggView(spark, lake, f"{tmp_root}/view")
    view.refresh()

    lake.apply_schema_change(
        {
            "change_type": "ALTER_RENAME_COLUMN",
            "prev_name": "lang",
            "column_name": "language",
            "schema_version": 1,
            "lsn": 2,
        }
    )
    # physical column name is rename-stable -> writes still say `lang`
    lake.merge(
        spark.createDataFrame([("r", "b", "c2", "go", "yyyyyy", "c", 3)], ddl),
        2,
    )
    view.refresh()
    assert _rows(view.state()) == [("go", 1, 6), ("py", 1, 4)]
    assert _rows(view.state()) == _rows(view.recompute())


# ---------------------------------------------------------------------------
# Property: view == recompute for ARBITRARY merge sequences (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_DDL = (
    "repo: string, path: string, commit: string, lang: string, "
    "content: string, op: string, lsn: long"
)

# one merge batch = one change per key (merge()'s input contract):
# {key_idx: (op, lang_idx|None, content_len|None)}. Six keys over two
# langs and 13 lengths so a single group can overfill the k+slack=3
# top-k buffer, drain it, and re-add below the truncation frontier —
# the class the r3 advisor's poisoning sequence lives in.
_batch = st.dictionaries(
    st.integers(0, 5),
    st.tuples(
        st.sampled_from(["c", "u", "d"]),
        st.one_of(st.none(), st.integers(0, 1)),
        st.one_of(st.none(), st.integers(0, 12)),
    ),
    min_size=1,
    max_size=6,
)
_batches = st.lists(
    st.tuples(_batch, st.booleans()),  # (batch, refresh after it?)
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_batches)
def test_view_matches_recompute_on_arbitrary_merge_sequences(
    spark, tmp_path_factory, seq
):
    from debezium_spark.lake import LakeTable

    root = str(tmp_path_factory.mktemp("prop_view"))
    lake = LakeTable(spark, f"{root}/lake", n_buckets=2)
    lake.create()
    view = MaterializedAggView(spark, lake, f"{root}/view")
    tkview = MaterializedTopKView(
        spark, lake, f"{root}/tkview", k=2, slack=1
    )

    lsn = 0
    for bi, (batch, do_refresh) in enumerate(seq, start=1):
        rows = []
        for ki, (op, li, cl) in sorted(batch.items()):
            lsn += 1
            lang = None if li is None else f"L{li}"
            content = None if cl is None else "x" * cl
            if op == "d":
                rows.append((f"r{ki % 2}", f"p{ki}", None, None, None, "d", lsn))
            else:
                rows.append(
                    (f"r{ki % 2}", f"p{ki}", f"c{lsn}", lang, content, op, lsn)
                )
        lake.merge(spark.createDataFrame(rows, _DDL), bi)
        if do_refresh:
            view.refresh()
            tkview.refresh()
            assert _rows(view.state()) == _rows(view.recompute())
            assert _tk(tkview.topk()) == _tk(tkview.recompute())

    view.refresh()
    tkview.refresh()
    assert _rows(view.state()) == _rows(view.recompute())
    assert _tk(tkview.topk()) == _tk(tkview.recompute())


# ---------------------------------------------------------------------------
# MaterializedTopKView — bounded-buffer top-k maintenance
# ---------------------------------------------------------------------------

from debezium_spark.streaming.aggview import MaterializedTopKView  # noqa: E402

_DDL2 = (
    "repo: string, path: string, commit: string, lang: string, "
    "content: string, op: string, lsn: long"
)


def _tk(df):
    return sorted(
        ((r["g"], r["rank"], r["v"], r["repo"], r["path"])
         for r in df.collect()),
        key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
    )


def _mk_lake(spark, root):
    from debezium_spark.lake import LakeTable

    lake = LakeTable(spark, root, n_buckets=2)
    lake.create()
    return lake


def _batch(spark, rows):
    return spark.createDataFrame(rows, _DDL2)


def test_topk_matches_recompute_and_survives_update_moves(spark, tmp_root):
    lake = _mk_lake(spark, f"{tmp_root}/lake")
    lake.merge(
        _batch(
            spark,
            [
                ("r0", "a", "c1", "py", "x" * 30, "c", 1),
                ("r0", "b", "c1", "py", "x" * 20, "c", 2),
                ("r0", "c", "c1", "py", "x" * 10, "c", 3),
                ("r1", "d", "c1", "go", "x" * 5, "c", 4),
                ("r1", "e", "c1", None, "x" * 7, "c", 5),  # NULL group
            ],
        ),
        1,
    )
    view = MaterializedTopKView(spark, lake, f"{tmp_root}/view", k=2, slack=1)
    r = view.refresh()
    assert r["underflow_groups"] == 0
    assert _tk(view.topk()) == _tk(view.recompute())

    # same-group update (the fold must keep the re-added row) + a
    # cross-group move (py -> go)
    lake.merge(
        _batch(
            spark,
            [
                ("r0", "a", "c2", "py", "x" * 35, "u", 6),
                ("r0", "b", "c2", "go", "x" * 50, "u", 7),
            ],
        ),
        2,
    )
    view.refresh()
    got = _tk(view.topk())
    assert got == _tk(view.recompute())
    assert (None, 1, 7, "r1", "e") in got
    assert ("go", 1, 50, "r0", "b") in got
    assert ("py", 1, 35, "r0", "a") in got


def test_topk_slack_absorbs_max_deletion(spark, tmp_root):
    lake = _mk_lake(spark, f"{tmp_root}/lake")
    lake.merge(
        _batch(
            spark,
            [
                ("r0", "a", "c1", "py", "x" * 40, "c", 1),
                ("r0", "b", "c1", "py", "x" * 30, "c", 2),
                ("r0", "c", "c1", "py", "x" * 20, "c", 3),
                ("r0", "d", "c1", "py", "x" * 10, "c", 4),
            ],
        ),
        1,
    )
    view = MaterializedTopKView(spark, lake, f"{tmp_root}/view", k=2, slack=1)
    view.refresh()
    # delete the current maximum: the runner-up must surface from the
    # buffered slack WITHOUT touching the table
    lake.merge(
        _batch(spark, [("r0", "a", None, None, None, "d", 5)]), 2
    )
    r = view.refresh()
    assert r["underflow_groups"] == 0
    assert _tk(view.topk()) == _tk(view.recompute())
    assert _tk(view.topk())[0][2] == 30  # new max


def test_topk_frontier_blocks_buffer_poisoning(spark, tmp_root):
    """ADVICE r3 (high): deletions leave the buffer below its k+slack
    cap; an add SMALLER than previously-truncated live rows must not
    enter the unsaturated buffer — otherwise a later deletion of a top
    row surfaces it as a false top-k member with no rebuild. The
    frontier gate rejects the add; the subsequent deletion underflows
    and the targeted rebuild restores the true answer."""
    lake = _mk_lake(spark, f"{tmp_root}/lake")
    rows = [
        ("r0", f"p{v}", "c1", "py", "x" * v, "c", i + 1)
        for i, v in enumerate([100, 90, 80, 70, 60, 50])
    ]
    lake.merge(_batch(spark, rows), 1)
    view = MaterializedTopKView(spark, lake, f"{tmp_root}/view", k=2, slack=1)
    view.refresh()  # buffer [100,90,80], frontier = key(70)
    lake.merge(_batch(spark, [("r0", "p100", None, None, None, "d", 7)]), 2)
    view.refresh()  # buffer [90,80] — slack consumed, frontier holds
    assert _tk(view.topk()) == _tk(view.recompute())

    # the poisoning add: 20 < truncated-but-live 70/60
    lake.merge(
        _batch(spark, [("r0", "p50", "c2", "py", "x" * 20, "u", 8)]), 3
    )
    view.refresh()
    assert _tk(view.topk()) == _tk(view.recompute())
    assert all(t[2] != 20 for t in _tk(view.topk()))

    lake.merge(_batch(spark, [("r0", "p90", None, None, None, "d", 9)]), 4)
    r = view.refresh()
    got = _tk(view.topk())
    assert got == _tk(view.recompute())
    assert [t[2] for t in got] == [80, 70]  # NOT [80, 20]
    assert r["underflow_groups"] == 1


def test_topk_group_column_rename_between_refreshes(spark, tmp_root):
    """ADVICE r3 (low): the top-k view pins its columns by FIELD ID
    like the agg view — a lang -> language rename between refreshes
    keeps folding the same column under its new logical name."""
    lake = _mk_lake(spark, f"{tmp_root}/lake")
    lake.merge(
        _batch(spark, [("r0", "a", "c1", "py", "x" * 4, "c", 1)]), 1
    )
    view = MaterializedTopKView(spark, lake, f"{tmp_root}/view", k=2, slack=1)
    view.refresh()
    lake.apply_schema_change(
        {
            "change_type": "ALTER_RENAME_COLUMN",
            "prev_name": "lang",
            "column_name": "language",
            "schema_version": 1,
            "lsn": 2,
        }
    )
    lake.merge(
        _batch(spark, [("r0", "b", "c2", "go", "x" * 6, "c", 3)]), 2
    )
    view.refresh()
    got = _tk(view.topk())
    assert got == _tk(view.recompute())
    assert ("go", 1, 6, "r0", "b") in got and ("py", 1, 4, "r0", "a") in got


def test_topk_null_sentinel_collision_fails_loudly(spark, tmp_root):
    """ADVICE r3 (low): a group value starting with \\x00 would be
    conflated with the NULL group by the in-band sentinel — the fold
    now asserts the invariant and fails the refresh instead."""
    lake = _mk_lake(spark, f"{tmp_root}/lake")
    lake.merge(
        _batch(spark, [("r0", "a", "c1", "\x00evil", "xx", "c", 1)]), 1
    )
    view = MaterializedTopKView(spark, lake, f"{tmp_root}/view", k=2, slack=1)
    with pytest.raises(Exception, match="NULL-group sentinel"):
        view.refresh()


def test_topk_underflow_triggers_targeted_rebuild(spark, tmp_root):
    lake = _mk_lake(spark, f"{tmp_root}/lake")
    rows = [
        ("r0", f"p{i}", "c1", "py", "x" * (10 * (i + 1)), "c", i + 1)
        for i in range(6)  # lengths 10..60
    ]
    lake.merge(_batch(spark, rows), 1)
    view = MaterializedTopKView(spark, lake, f"{tmp_root}/view", k=2, slack=1)
    view.refresh()
    # buffer holds 60/50/40; delete all three -> drained below k while
    # live=3 says rows remain -> targeted per-group rebuild
    lake.merge(
        _batch(
            spark,
            [
                ("r0", "p5", None, None, None, "d", 7),
                ("r0", "p4", None, None, None, "d", 8),
                ("r0", "p3", None, None, None, "d", 9),
            ],
        ),
        2,
    )
    r = view.refresh()
    assert r["underflow_groups"] == 1
    assert _tk(view.topk()) == _tk(view.recompute())
    assert [t[2] for t in _tk(view.topk())] == [30, 20]
