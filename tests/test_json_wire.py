"""Debezium JSON wire-format serde: lossless round trip and engine
replay off a JSON-lines changelog (engine/format/Json +
serde/json/JsonSerde consumer path)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from debezium_spark.generator import (
    gen_change_log,
    gen_source_table,
    schema_change_envelopes,
)
from debezium_spark.sources.json_wire import (
    read_wire_log,
    to_wire,
    from_wire,
    write_wire_log,
)
from debezium_spark.streaming.engine import Engine, EngineConfig


def _full_log(spark):
    log = gen_change_log(spark, 3, 12, n_events=400, snapshot_lsn_base=60)
    ddl = schema_change_envelopes(
        spark,
        [
            {
                "lsn": 200,
                "schema_version": 1,
                "change_type": "add_column",
                "column_name": "review_state",
                "new_type": "string",
            }
        ],
    )
    return log.unionByName(ddl)


def _rows(df):
    return sorted(
        (r.asDict(recursive=True) for r in df.collect()),
        key=lambda d: (d["partition_id"], d["lsn"], bool(d["is_tombstone"])),
    )


def test_wire_roundtrip_is_lossless(spark):
    log = _full_log(spark)
    back = from_wire(to_wire(log))
    orig = _rows(log)
    got = _rows(back)
    assert len(orig) == len(got)
    for o, g in zip(orig, got):
        if o["is_tombstone"]:
            # a tombstone's wire form is (key, null value): the record
            # attributes round-trip; envelope-side fields do not exist
            # on the wire (EventDispatcher.java:496-508).
            for f in ("partition_id", "lsn", "key", "is_tombstone"):
                assert g[f] == o[f]
            assert g["op"] is None and g["after"] is None
        else:
            assert g == o


def test_wire_file_roundtrip_and_engine_state_equality(spark, tmp_root):
    """Replaying the SAME stream from a JSON-lines wire log produces a
    byte-identical final table to the parquet-log replay — the consumer
    serde is a full-fidelity source."""
    src = gen_source_table(spark, 3, 12)
    src.write.parquet(f"{tmp_root}/src")
    log = gen_change_log(spark, 3, 12, n_events=400, snapshot_lsn_base=60)
    log.write.parquet(f"{tmp_root}/log_parquet")

    write_wire_log(log, f"{tmp_root}/wire")
    parsed = read_wire_log(spark, f"{tmp_root}/wire")
    parsed.write.parquet(f"{tmp_root}/log_from_wire")

    shas = {}
    for tag in ("log_parquet", "log_from_wire"):
        eng = Engine(
            spark,
            EngineConfig(
                changelog_path=f"{tmp_root}/{tag}",
                lake_root=f"{tmp_root}/lake_{tag}",
                source_table_path=f"{tmp_root}/src",
                batch_lsn_span=500,
                n_buckets=4,
            ),
        )
        eng.run()
        shas[tag] = {
            (r["repo"], r["path"]): hashlib.sha256(
                (r["content"] or "").encode()
            ).hexdigest()
            for r in eng.final_state().collect()
        }
    assert shas["log_parquet"] == shas["log_from_wire"]
    assert len(shas["log_parquet"]) > 0


def test_wire_parse_is_pure_codegen(spark):
    """from_wire is column-expressions only: no Python evaluation, no
    exchange — a JSON changelog parses at scan parallelism."""
    log = _full_log(spark)
    plan = from_wire(to_wire(log))._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan, plan
