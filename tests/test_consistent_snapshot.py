"""Transaction-consistent cross-table snapshots: the transaction-topic
consumer guarantee (TransactionMonitor BEGIN/END + per-collection
counts) re-derived as one pruned groupBy(txId) scan against the
per-table applied frontiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.generator import gen_change_log
from debezium_spark.streaming.multi_table import MultiTableEngine


def _tbl_col():
    # a table is a SET OF KEYS: hash-split the key space (the
    # generator's LSNs step by 2 and tombstones carry NULL lsns, so
    # lsn parity is not a usable split)
    return F.when(
        F.pmod(F.xxhash64("key.repo", "key.path"), 2) == 0, "A"
    ).otherwise("B")


def _mixed_log(spark, path):
    # one ordered log carrying two tables; every txId groups 8
    # consecutive LSNs, so most transactions span both tables — the
    # worst case for cross-table cuts
    log = gen_change_log(spark, 4, 25, n_events=2000, partitions=4)
    mixed = log.withColumn(
        "source",
        F.col("source")
        .withField("table", _tbl_col())
        .withField("txId", F.floor(F.col("lsn") / 8).cast("long")),
    )
    mixed.write.mode("overwrite").parquet(path)


def test_split_transactions_detected_then_converge(spark, tmp_root):
    log_path = tmp_root + "/mixed_log"
    _mixed_log(spark, log_path)
    mte = MultiTableEngine(
        spark,
        log_path,
        tmp_root + "/lakes",
        route="filter",
        snapshot_mode="never",
        n_buckets=4,
        batch_lsn_span=512,
    )
    eng = mte.engines()
    assert sorted(eng) == ["A", "B"]
    eng["A"].run()
    eng["B"].run(max_batches=1)
    fa, fb = eng["A"].applied_frontier(), eng["B"].applied_frontier()
    assert fa > fb
    viol = mte.consistency_violations()
    rows = viol.collect()
    assert rows, "a lagging table must split the shared transactions"
    # every violation really straddles the cut: has one applied and one
    # pending side, and (here) touches both tables
    for r in rows:
        assert r["applied_events"] > 0 and r["pending_events"] > 0
    assert any(r["tables"] == ["A", "B"] for r in rows)
    with pytest.raises(RuntimeError, match="split across"):
        mte.consistent_state()
    # converge the laggard -> consistent snapshot of BOTH tables
    eng["B"].run()
    assert mte.consistency_violations().count() == 0
    states = mte.consistent_state()
    assert sorted(states) == ["A", "B"]
    assert states["A"].count() > 0 and states["B"].count() > 0


def test_events_without_tx_metadata_never_block(spark, tmp_root):
    log_path = tmp_root + "/no_tx_log"
    log = gen_change_log(spark, 3, 20, n_events=600, partitions=2)
    log.withColumn(
        "source",
        F.col("source")
        .withField("table", _tbl_col())
        .withField("txId", F.lit(None).cast("long")),
    ).write.mode("overwrite").parquet(log_path)
    mte = MultiTableEngine(
        spark,
        log_path,
        tmp_root + "/lakes",
        route="filter",
        snapshot_mode="never",
        n_buckets=4,
        batch_lsn_span=256,
    )
    eng = mte.engines()
    eng["A"].run()
    eng["B"].run(max_batches=1)  # B lags, but no tx metadata exists
    assert mte.consistency_violations().count() == 0
    states = mte.consistent_state()
    assert sorted(states) == ["A", "B"]


def test_multi_table_publish_routes_per_table_topics(spark, tmp_root):
    # a shared publish dir must fan out to one topic subdir per table
    # (shared versions would collide across different lakes)
    import os

    from debezium_spark.publisher import read_published

    log_path = tmp_root + "/mixed_log2"
    _mixed_log(spark, log_path)
    topics = tmp_root + "/topics"
    mte = MultiTableEngine(
        spark,
        log_path,
        tmp_root + "/lakes",
        route="filter",
        snapshot_mode="never",
        n_buckets=4,
        batch_lsn_span=1024,
        publish_topic_dir=topics,
    )
    mte.run()
    assert sorted(os.listdir(topics)) == ["A", "B"]
    for t in ("A", "B"):
        eng = mte.engines()[t]
        rec = read_published(spark, f"{topics}/{t}")
        n_versions = rec.select("version").distinct().count()
        assert n_versions == eng.lake.current_version()
        assert rec.count() > 0


def test_violation_scan_prunes_with_bounded_tx_span(spark, tmp_root):
    # with a bounded tx LSN extent, the check reads only the tail
    # window behind min(frontier) — filter pushed to the parquet scan —
    # and still finds exactly the same split transactions
    log_path = tmp_root + "/mixed_log3"
    _mixed_log(spark, log_path)
    mte = MultiTableEngine(
        spark,
        log_path,
        tmp_root + "/lakes",
        route="filter",
        snapshot_mode="never",
        n_buckets=4,
        batch_lsn_span=512,
    )
    eng = mte.engines()
    eng["A"].run()
    eng["B"].run(max_batches=1)
    exact = {
        r["txId"] for r in mte.consistency_violations().collect()
    }
    # every tx spans 8 consecutive LSNs by construction
    pruned_df = mte.consistency_violations(max_tx_lsn_span=8)
    pruned = {r["txId"] for r in pruned_df.collect()}
    assert pruned == exact and exact
    plan = pruned_df._sc._jvm.PythonSQLUtils.explainString(
        pruned_df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lsn," in plan
