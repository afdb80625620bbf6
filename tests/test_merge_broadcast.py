"""Sparse-batch merge plan: the state side must never shuffle.

At the 10^10 steady state a micro-batch touches a tiny fraction of
keys; the compacted change set broadcasts, so the only exchange in the
whole apply is the upstream compaction shuffle. On Iceberg this is a
storage-partitioned join; these tests prove the same property on the
parquet stand-in — and that the broadcast plan is value-identical to
the dense full-outer fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_spark.lake import LakeTable

SCHEMA_DDL = (
    "repo: string, path: string, commit: string, lang: string, "
    "content: string, op: string, lsn: long"
)


def _rows(keys, op, lsn0, tag):
    return [
        (f"r{k % 4}", f"p{k:03d}", f"c-{tag}-{k}", "py", f"{tag}-{k}", op, lsn0 + k)
        for k in keys
    ]


def _changes(spark, rows):
    return spark.createDataFrame(rows, SCHEMA_DDL)


def _seed(spark, root, n_buckets=8, **kw):
    lt = LakeTable(spark, root, n_buckets=n_buckets, **kw)
    lt.create()
    lt.merge(_changes(spark, _rows(range(60), "c", 1000, "base")), 1)
    return lt


def _mixed_batch(spark):
    rows = (
        _rows(range(10), "u", 5000, "upd")  # beats state
        + _rows(range(10, 15), "d", 5000, "del")  # deletes
        + _rows(range(15, 20), "u", 0, "stale")  # loses the LSN guard
        + _rows(range(100, 110), "c", 5000, "ins")  # inserts
        + _rows([500], "d", 5000, "ghost")  # delete of a missing key
    )
    return _changes(spark, rows)


def _state(lt):
    return sorted(
        tuple(r)
        for r in lt.read_state(logical=False, with_sys=True).collect()
    )


def test_broadcast_merge_equals_full_outer_merge(spark, tmp_root):
    bc = _seed(spark, os.path.join(tmp_root, "bc"))  # default: broadcast
    fo = _seed(
        spark, os.path.join(tmp_root, "fo"), broadcast_merge_threshold=-1
    )
    bc.merge(_mixed_batch(spark), 2)
    fo.merge(_mixed_batch(spark), 2)
    s_bc, s_fo = _state(bc), _state(fo)
    assert s_bc == s_fo
    keys = {(r[0], r[1]) for r in s_bc}
    assert ("r0", "p100") in keys  # insert landed
    assert ("r2", "p010") not in keys  # delete applied
    by_key = {(r[0], r[1]): r for r in s_bc}
    assert by_key[("r0", "p016")][4] == "base-16"  # stale change lost
    assert by_key[("r0", "p000")][4] == "upd-0"  # update won


def test_sparse_merge_state_side_is_exchange_free(spark, tmp_root):
    """Plan pin: the sparse-batch apply has ZERO shuffle exchanges —
    state scan → broadcast joins → union. The only exchange of the
    whole batch is the upstream change-set compaction (which persists
    before the merge)."""
    import re

    lt = _seed(spark, os.path.join(tmp_root, "plan"))
    old = lt.read_state(logical=False, with_sys=True)
    changes = _mixed_batch(spark)
    ns = lt._merge_new_state(old, changes, lt.table_schema(), broadcast=True)
    plan = ns._sc._jvm.PythonSQLUtils.explainString(
        ns._jdf.queryExecution(), "formatted"
    )
    shuffles = re.findall(r"\(\d+\) Exchange", plan)
    assert shuffles == [], f"state-side shuffle in sparse merge:\n{plan}"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # dense fallback keeps the single full-outer shuffle shape
    ns_fo = lt._merge_new_state(old, changes, lt.table_schema(), broadcast=False)
    plan_fo = ns_fo._sc._jvm.PythonSQLUtils.explainString(
        ns_fo._jdf.queryExecution(), "formatted"
    )
    assert "Join FullOuter" in plan_fo or "SortMergeJoin" in plan_fo


def test_byte_gate_falls_back_and_stays_correct(spark, tmp_root):
    """The broadcast gate bounds BYTES too (an explicit broadcast hint
    bypasses autoBroadcastJoinThreshold; 50k rows of multi-KB payloads
    would blow the 8GB broadcast limit): a change set under the row
    threshold but over the byte bound must take the shuffled fallback
    and still produce the identical state."""
    tiny = _seed(
        spark, os.path.join(tmp_root, "bytegate"),
        broadcast_merge_max_bytes=100,  # forces the fallback
    )
    ref = _seed(spark, os.path.join(tmp_root, "bytegate_ref"))
    tiny.merge(_mixed_batch(spark), 2)
    ref.merge(_mixed_batch(spark), 2)
    assert _state(tiny) == _state(ref)


def test_merge_full_light_winner_plan_equals_wide_shuffle(spark, tmp_root):
    """merge_full's light winner election (pruned (key,lsn,src) shuffle
    + broadcast winner fetch — payloads never shuffle) must be value-
    identical to the wide max_by shuffle on every op mix, including the
    state-wins-lsn-ties guard."""
    light = _seed(
        spark,
        os.path.join(tmp_root, "mf_light"),
        lww_light_threshold=2_000_000,  # opt-in (default off, measured)
    )
    wide = _seed(spark, os.path.join(tmp_root, "mf_wide"))
    batch = _mixed_batch(spark).unionByName(
        # lsn tie with state: seed wrote k=30 at lsn 1030; an event at
        # the SAME lsn must lose (state wins ties, strict guard)
        _changes(spark, [("r2", "p030", "c-tie-30", "py", "tie-30", "u", 1030)])
    )
    light.merge_full(batch, 2)
    wide.merge_full(batch, 2)
    s_l, s_w = _state(light), _state(wide)
    assert s_l == s_w
    by_key = {(r[0], r[1]): r for r in s_l}
    assert by_key[("r2", "p030")][4] == "base-30"  # tie → state kept
    assert ("r0", "p100") in {(r[0], r[1]) for r in s_l}  # insert
    assert ("r2", "p010") not in {(r[0], r[1]) for r in s_l}  # delete


def test_broadcast_merge_respects_truncate(spark, tmp_root):
    lt = _seed(spark, os.path.join(tmp_root, "tr"))
    # truncate at 4000 wipes the seed (lsn 1000+k); post-truncate rows
    # survive
    lt.merge(
        _changes(spark, _rows(range(5), "c", 5000, "post")),
        2,
        truncate_lsn=4000,
    )
    st = lt.read_state(logical=False, with_sys=True)
    rows = st.collect()
    assert len(rows) == 5
    assert all(r["_lsn"] > 4000 for r in rows)
    assert {r["content"] for r in rows} == {f"post-{k}" for k in range(5)}
