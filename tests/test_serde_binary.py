"""Spec conformance of the binary Avro / Protobuf wire encodings: the
relational encoders must produce bytes an INDEPENDENT pure-Python
decoder (written directly from the Avro spec §binary encoding and the
protobuf wire-format doc) reads back to the original values."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debezium_spark.functions import serde_binary as B

EDGE_LONGS = [
    0, 1, -1, 63, 64, 127, 128, 300, -300,
    2**31, -(2**31), 2**62, -(2**62), 2**63 - 1, -(2**63),
]


# -- independent decoders (no shared code with the encoders) -----------


def _read_uvarint(b: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        byte = b[pos]
        pos += 1
        out |= (byte & 0x7F) << shift
        shift += 7
        if not byte & 0x80:
            return out, pos


def _read_zigzag(b: bytes, pos: int) -> tuple[int, int]:
    u, pos = _read_uvarint(b, pos)
    return (u >> 1) ^ -(u & 1), pos


def _read_avro_string(b: bytes, pos: int) -> tuple[str, int]:
    n, pos = _read_zigzag(b, pos)
    return b[pos : pos + n].decode(), pos + n


def decode_avro_record(b: bytes) -> dict:
    pos = 0
    lsn, pos = _read_zigzag(b, pos)
    branch, pos = _read_zigzag(b, pos)
    assert branch == 1
    op, pos = _read_avro_string(b, pos)
    branch, pos = _read_zigzag(b, pos)
    assert branch == 1
    key, pos = _read_zigzag(b, pos)
    branch, pos = _read_zigzag(b, pos)
    after = None
    if branch == 1:
        after, pos = _read_zigzag(b, pos)
    assert pos == len(b)
    return {"lsn": lsn, "op": op, "key": key, "after": after}


def decode_protobuf(b: bytes) -> dict:
    out: dict = {}
    pos = 0
    names = {1: "lsn", 2: "op", 3: "key", 4: "after"}
    while pos < len(b):
        tag, pos = _read_uvarint(b, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            u, pos = _read_uvarint(b, pos)
            if field == 4:  # sint64
                u = ((u & 0xFFFFFFFFFFFFFFFF) >> 1) ^ -(u & 1)
            elif u >= 2**63:  # int64 reinterpreted
                u -= 2**64
            out[names[field]] = u
        elif wire == 2:
            n, pos = _read_uvarint(b, pos)
            out[names[field]] = b[pos : pos + n].decode()
            pos += n
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    return out


# -- primitive round-trips ---------------------------------------------


def test_zigzag_varint_roundtrip_edge_longs(spark):
    df = spark.createDataFrame([(v,) for v in EDGE_LONGS], "n: long")
    rows = df.select("n", B.zigzag_varint_hex(F.col("n")).alias("h")).collect()
    for r in rows:
        got, pos = _read_zigzag(bytes.fromhex(r["h"]), 0)
        assert pos == len(r["h"]) // 2
        assert got == r["n"], r["h"]


def test_uvarint_roundtrip_edge_longs(spark):
    df = spark.createDataFrame([(v,) for v in EDGE_LONGS], "n: long")
    rows = df.select("n", B.uvarint_hex(F.col("n")).alias("h")).collect()
    for r in rows:
        u, pos = _read_uvarint(bytes.fromhex(r["h"]), 0)
        assert pos == len(r["h"]) // 2
        want = r["n"] & 0xFFFFFFFFFFFFFFFF
        assert u == want, r["h"]
        if r["n"] < 0:
            assert len(r["h"]) // 2 == 10  # negatives take 10 bytes


def test_avro_string_unicode(spark):
    df = spark.createDataFrame([("héllo wörld ☃",)], "s: string")
    h = df.select(B.avro_string_hex(F.col("s")).alias("h")).collect()[0]["h"]
    s, pos = _read_avro_string(bytes.fromhex(h), 0)
    assert s == "héllo wörld ☃" and pos == len(h) // 2


def test_known_golden_bytes(spark):
    # hand-computed fixtures from the Avro spec table: zigzag(1)=2 →
    # 0x02; zigzag(-1)=1 → 0x01; zigzag(150)=300 → 0xAC 0x02; plain
    # varint 150 → 0x96 0x01 (the protobuf doc's canonical example)
    df = spark.createDataFrame([(1, -1, 150)], "a: long, b: long, c: long")
    r = df.select(
        B.zigzag_varint_hex(F.col("a")).alias("za"),
        B.zigzag_varint_hex(F.col("b")).alias("zb"),
        B.zigzag_varint_hex(F.col("c")).alias("zc"),
        B.uvarint_hex(F.col("c")).alias("uc"),
    ).collect()[0]
    assert r["za"] == "02"
    assert r["zb"] == "01"
    assert r["zc"] == "AC02"
    assert r["uc"] == "9601"


# -- full-record round-trips through the catalog queries ----------------


@pytest.fixture()
def events_dir(spark, tmp_path):
    rows = [
        (1, 7, "signup", 12.34),
        (2, 1000000, "click", 0.0),
        (3, 42, "error", 99.99),  # delete → null after
        (4, 2**31, "view", -5.5),
        (5, 9, "view", None),  # NULL value → null union branch
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id: long, user_id: long, event_type: string, value: double"
    ).write.parquet(f"{d}/events.parquet")
    return d, rows


def test_avro_binary_export_roundtrip(spark, events_dir):
    from debezium_spark.queries import cdc_avro_binary_export

    d, rows = events_dir
    got = {r["event_id"]: r for r in cdc_avro_binary_export(spark, d).collect()}
    for eid, uid, etype, value in rows:
        rec = decode_avro_record(bytes.fromhex(got[eid]["avro_hex"]))
        op = {"signup": "c", "error": "d"}.get(etype, "u")
        assert rec["lsn"] == eid and rec["op"] == op and rec["key"] == uid
        if etype == "error" or value is None:
            assert rec["after"] is None
        else:
            import math

            assert rec["after"] == int(math.floor(value * 100))
        frame = bytes.fromhex(got[eid]["confluent_hex"])
        assert frame[0] == 0  # magic
        assert int.from_bytes(frame[1:5], "big") == 1  # schema id
        assert frame[5:] == bytes.fromhex(got[eid]["avro_hex"])


def test_protobuf_export_roundtrip(spark, events_dir):
    from debezium_spark.queries import cdc_protobuf_export

    d, rows = events_dir
    got = {r["event_id"]: r for r in cdc_protobuf_export(spark, d).collect()}
    for eid, uid, etype, value in rows:
        msg = decode_protobuf(bytes.fromhex(got[eid]["proto_hex"]))
        op = {"signup": "c", "error": "d"}.get(etype, "u")
        assert msg["lsn"] == eid and msg["op"] == op and msg["key"] == uid
        if etype == "error" or value is None:
            assert "after" not in msg
        else:
            import math

            assert msg["after"] == int(math.floor(value * 100))


def test_binary_exports_stay_in_codegen(spark, events_dir):
    from debezium_spark.queries import (
        cdc_avro_binary_export,
        cdc_protobuf_export,
    )

    d, _ = events_dir
    for q in (cdc_avro_binary_export, cdc_protobuf_export):
        df = q(spark, d)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
