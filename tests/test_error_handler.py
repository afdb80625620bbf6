"""Retriable-error restart loop (pipeline/ErrorHandler.java:1-146):
communication exceptions (or a custom message regex) restart the engine
within the retry budget; the restart resumes from committed offsets and
re-delivered batches fence out, so retries never duplicate effects."""

from __future__ import annotations

import pytest

from debezium_spark.errors import (
    RETRIES_DISABLED,
    RETRIES_UNLIMITED,
    ErrorHandler,
    run_resilient,
)
from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.streaming.engine import Engine, EngineConfig


# -- unit: classification + budget ---------------------------------------


def test_retriable_walks_the_cause_chain():
    h = ErrorHandler()
    inner = ConnectionResetError("peer reset")
    outer = RuntimeError("batch failed")
    outer.__cause__ = inner
    assert h.is_retriable(outer)
    assert not h.is_retriable(ValueError("schema mismatch"))


def test_retriable_sees_implicit_context_chaining():
    # `except OSError: raise RuntimeError(...)` without `from` stores
    # the communication error in __context__, not __cause__ — it must
    # still classify retriable
    try:
        try:
            raise ConnectionResetError("peer reset")
        except OSError:
            raise RuntimeError("batch failed")
    except RuntimeError as outer:
        assert ErrorHandler().is_retriable(outer)
    # `raise ... from None` suppresses the context — NOT retriable
    try:
        try:
            raise ConnectionResetError("peer reset")
        except OSError:
            raise RuntimeError("batch failed") from None
    except RuntimeError as outer:
        assert not ErrorHandler().is_retriable(outer)


def test_custom_retriable_regex_converts_non_retriable():
    # substring search: the natural CLI pattern, no .* anchoring needed
    h = ErrorHandler(custom_retriable_regex="quota")
    assert h.is_custom_retriable(ValueError("cloud quota exceeded"))
    assert not h.is_custom_retriable(ValueError("bad row"))
    assert not ErrorHandler().is_custom_retriable(ValueError("quota"))


def test_retry_budget_unlimited_disabled_and_inherited():
    assert not ErrorHandler(max_retries=RETRIES_DISABLED).has_more_retries()
    h = ErrorHandler(max_retries=2)
    assert h.has_more_retries() and h.has_more_retries()
    assert not h.has_more_retries()
    # the replacement handler inherits the running count (:46-48)
    h2 = ErrorHandler(max_retries=2, replaced=h)
    assert not h2.has_more_retries()
    h.reset_retries()
    assert h.has_more_retries()
    hu = ErrorHandler(max_retries=RETRIES_UNLIMITED)
    assert all(hu.has_more_retries() for _ in range(50))


# -- integration: restart resumes exactly --------------------------------


@pytest.fixture()
def world(spark, tmp_root):
    gen_source_table(spark, 4, 15).write.parquet(f"{tmp_root}/src")
    gen_change_log(spark, 4, 15, n_events=1200, snapshot_lsn_base=60).write.parquet(
        f"{tmp_root}/log"
    )
    return tmp_root


def _cfg(tmp_root):
    return EngineConfig(
        changelog_path=f"{tmp_root}/log",
        lake_root=f"{tmp_root}/lake",
        source_table_path=f"{tmp_root}/src",
        batch_lsn_span=400,
        n_buckets=8,
        snapshot_mode="never",
    )


class _FlakyEngine(Engine):
    """Raises a communication error after the first applied batch of
    the first ``fail_runs`` runs — a connection loss mid-replay."""

    instances = 0

    def __init__(self, spark, cfg, fail_runs):
        super().__init__(spark, cfg)
        type(self).instances += 1
        self._fail = type(self).instances <= fail_runs

    def _apply_batch(self, *a, **kw):
        res = super()._apply_batch(*a, **kw)
        if self._fail and not res.get("skipped"):
            raise RuntimeError("replica gone") from ConnectionError(
                "connection to source lost"
            )
        return res


def test_run_resilient_restarts_and_converges(spark, world):
    _FlakyEngine.instances = 0
    results = run_resilient(
        lambda: _FlakyEngine(spark, _cfg(world), fail_runs=2),
        run=lambda e: e.stream(),
        max_retries=5,
    )
    # two flaky runs each committed one live batch (1 then 2) and died;
    # the third run resumes EXACTLY at batch 3 off the lake's commit
    # fence — no re-delivery, no gap
    assert _FlakyEngine.instances == 3
    assert all(not r.get("skipped") for r in results)
    assert results and results[0]["batch_id"] == 3
    # final state equals a clean single-run replay
    ref_cfg = _cfg(world)
    ref_cfg.lake_root = f"{world}/lake_ref"
    ref = Engine(spark, ref_cfg)
    ref.stream()
    final = lambda e: {
        (r["repo"], r["path"]): r["content"]
        for r in e.final_state().collect()
    }
    eng = Engine(spark, _cfg(world))  # read the flaky lake's state
    assert final(eng) == final(ref)


def test_run_resilient_exhausts_budget_and_raises(spark, world):
    _FlakyEngine.instances = 0
    cfg = _cfg(world)
    cfg.lake_root = f"{world}/lake_exhaust"
    with pytest.raises(RuntimeError, match="replica gone"):
        run_resilient(
            lambda: _FlakyEngine(spark, cfg, fail_runs=99),
            run=lambda e: e.stream(),
            max_retries=1,
        )
    assert _FlakyEngine.instances == 2  # initial try + one retry


def test_run_resilient_non_retriable_raises_immediately(spark, world):
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        cfg = _cfg(world)
        cfg.lake_root = f"{world}/lake_nonret"
        return Engine(spark, cfg)

    with pytest.raises(ValueError, match="bad mapping"):
        run_resilient(
            factory,
            run=lambda e: (_ for _ in ()).throw(ValueError("bad mapping")),
            max_retries=5,
        )
    assert calls["n"] == 1
