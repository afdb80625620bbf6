"""JMX-metrics analogue (pipeline/metrics/traits/*MXBean.java): the
per-op / tx / filter counters ride the merge job's observation into the
commit manifests, and PipelineMetrics reads them back under the
reference bean names — no extra Spark jobs on the hot path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.streaming.engine import Engine, EngineConfig


@pytest.fixture()
def world(spark, tmp_root):
    gen_source_table(spark, 4, 15).write.parquet(f"{tmp_root}/src")
    gen_change_log(spark, 4, 15, n_events=1200, snapshot_lsn_base=60).write.parquet(
        f"{tmp_root}/log"
    )
    return tmp_root


def _cfg(tmp_root, **kw):
    base = dict(
        changelog_path=f"{tmp_root}/log",
        lake_root=f"{tmp_root}/lake",
        source_table_path=f"{tmp_root}/src",
        batch_lsn_span=500,
        n_buckets=8,
    )
    base.update(kw)
    return EngineConfig(**base)


def test_streaming_metrics_match_log_ground_truth(spark, world):
    eng = Engine(spark, _cfg(world))
    eng.run()
    m = eng.pipeline_metrics().streaming()

    log = spark.read.parquet(f"{world}/log")
    ops = {
        r["op"]: r["n"]
        for r in log.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    n_tombstones = log.filter("is_tombstone").count()

    assert m["TotalNumberOfEventsSeen"] == log.count()
    assert m["TotalNumberOfCreateEventsSeen"] == ops.get("c", 0)
    assert m["TotalNumberOfUpdateEventsSeen"] == ops.get("u", 0)
    # tombstones ride with op='d' rows and are dropped by the filter
    # chain, so they show up in Delete-seen AND in Filtered
    assert m["TotalNumberOfDeleteEventsSeen"] == ops.get("d", 0)
    assert m["NumberOfEventsFiltered"] == n_tombstones
    assert m["NumberOfErroneousEvents"] == 0
    # offsets mirror the per-partition log frontier
    frontier = {
        str(r["partition_id"]): r["m"]
        for r in log.groupBy("partition_id").agg(F.max("lsn").alias("m")).collect()
    }
    assert m["SourceEventPosition"] == frontier
    assert m["LastTransactionId"] is not None
    # boundary-straddling txs are de-overlapped; approx_count_distinct
    # carries <=5% rsd per batch
    n_tx_true = log.select("source.txId").distinct().count()
    assert (
        abs(m["NumberOfCommittedTransactions"] - n_tx_true)
        <= max(2, n_tx_true // 20)
    )
    assert m["MilliSecondsSinceLastEvent"] >= 0
    assert m["Connected"] is True

    # a pipeline that has never streamed reports -1, not "just now"
    cfg2 = _cfg(world, lake_root=f"{world}/lake_idle")
    m2 = Engine(spark, cfg2).pipeline_metrics().streaming()
    assert m2["MilliSecondsSinceLastEvent"] == -1
    assert m2["TotalNumberOfEventsSeen"] == 0


def test_filtered_counter_includes_skipped_operations(spark, world):
    eng = Engine(
        spark,
        _cfg(
            world,
            lake_root=f"{world}/lake_skipd",
            skipped_operations=("d",),
        ),
    )
    eng.run()
    m = eng.pipeline_metrics().streaming()
    log = spark.read.parquet(f"{world}/log")
    # dropped rows = every delete (skipped.operations) + every tombstone
    # (op=null companion rows, dropped by the tombstone filter)
    n_d_rows = log.filter("op = 'd'").count()
    n_tomb = log.filter("is_tombstone").count()
    assert m["NumberOfEventsFiltered"] == n_d_rows + n_tomb
    assert m["TotalNumberOfDeleteEventsSeen"] == n_d_rows


def test_snapshot_metrics_lifecycle_and_rows_scanned(spark, world):
    eng = Engine(spark, _cfg(world, lake_root=f"{world}/lake_snap"))
    pm = eng.pipeline_metrics()
    s0 = pm.snapshot()
    assert s0["SnapshotCompleted"] is False and s0["SnapshotRunning"] is False

    eng.run()
    s1 = pm.snapshot()
    assert s1["SnapshotCompleted"] is True
    assert s1["SnapshotRunning"] is False
    assert s1["RemainingTableCount"] == 0
    assert s1["TotalTableCount"] == 1
    src_rows = spark.read.parquet(f"{world}/src").count()
    assert s1["RowsScanned"]["repo_files"] == src_rows
    assert s1["SnapshotDurationInSeconds"] >= 0

    # incremental chunks add to RowsScanned and stamp chunk progress
    eng.incremental_snapshot(chunk_size=20)
    s2 = pm.snapshot()
    assert s2["RowsScanned"]["repo_files"] > src_rows
    assert s2["ChunkId"] is not None and s2["ChunkTo"] is not None
