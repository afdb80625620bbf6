"""Kafka Connect core SMT semantics (connect_smt module): full-match
routing, field insert/replace/cast, timestamp conversions, struct
hoist/extract/flatten round-trips, header edits, and the gated Filter."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debezium_spark.operators import connect_smt as C
from debezium_spark.operators import transforms as T


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        (1, "server1.view", 10, 4.9, 1704067200123, {"trace": "t1"}),
        (2, "server1.click", 11, -2.7, 1704153600456, {"trace": "t2"}),
        (3, "server1.purchase", 12, 99.99, 1704240000789, {}),
        (4, "other.view2", 13, 0.0, 1704326400000, {"x": "y"}),
    ]
    return spark.createDataFrame(
        rows, "lsn bigint, topic string, user_id bigint, value double, "
        "ts_ms bigint, headers map<string,string>"
    )


def test_regex_router_full_match_only(records):
    out = C.regex_router(
        records, r"server1\.(view|click)", "server1.interaction.$1"
    )
    got = {r["lsn"]: r["topic"] for r in out.collect()}
    assert got[1] == "server1.interaction.view"
    assert got[2] == "server1.interaction.click"
    # partial matches must NOT route: Pattern.matches semantics
    assert got[3] == "server1.purchase"
    assert got[4] == "other.view2"  # 'view' appears but not full-match


def test_timestamp_router_splice(records):
    out = C.timestamp_router(
        records, "${timestamp}.${topic}-v2", ts_format="yyyyMMdd"
    )
    got = {r["lsn"]: r["topic"] for r in out.collect()}
    # 1704067200123 ms = 2024-01-01 UTC
    assert got[1] == "20240101.server1.view-v2"
    assert got[2] == "20240102.server1.click-v2"


def test_insert_field_metadata_and_static(records):
    out = C.insert_field(
        records,
        static_field="region",
        static_value="us-east-1",
        topic_field="__topic",
        offset_field="__offset",
        timestamp_field="__ts",
    )
    r = out.filter(F.col("lsn") == 1).collect()[0]
    assert (r["region"], r["__topic"], r["__offset"], r["__ts"]) == (
        "us-east-1", "server1.view", 1, 1704067200123
    )


def test_replace_field_precedence(records):
    out = C.replace_field(
        records,
        exclude=("headers",),
        include=("lsn", "user_id", "value", "headers"),
        renames=("value:amount", "headers:h"),
    )
    # headers excluded before rename could apply; include keeps 3 cols
    assert out.columns == ["lsn", "user_id", "amount"]


def test_replace_field_bad_rename(records):
    with pytest.raises(ValueError):
        C.replace_field(records, renames=("justafield",))


def test_cast_fields_truncation(records):
    out = C.cast_fields(records, "value:int64,user_id:int16")
    types = dict(out.dtypes)
    assert types["value"] == "bigint" and types["user_id"] == "smallint"
    got = {r["lsn"]: r["value"] for r in out.collect()}
    assert got[1] == 4 and got[2] == -2  # toward zero, not rounding


def test_cast_fields_unknown_type(records):
    with pytest.raises(ValueError):
        C.cast_fields(records, "value:decimal")


def test_timestamp_converter_roundtrip(records):
    s = C.timestamp_converter(
        records, "ts_ms", "string", "yyyy-MM-dd HH:mm:ss"
    )
    r = {x["lsn"]: x["ts_ms"] for x in s.collect()}
    assert r[1] == "2024-01-01 00:00:00"
    # string → unix loses sub-second precision only
    back = C.timestamp_converter(s, "ts_ms", "unix", "yyyy-MM-dd HH:mm:ss")
    b = {x["lsn"]: x["ts_ms"] for x in back.collect()}
    assert b[1] == 1704067200000
    # already-numeric input passes through unchanged
    noop = C.timestamp_converter(records, "ts_ms", "unix")
    assert noop.filter(F.col("lsn") == 1).collect()[0]["ts_ms"] == 1704067200123


def test_timestamp_converter_date(records):
    out = C.timestamp_converter(records, "ts_ms", "date")
    assert dict(out.dtypes)["ts_ms"] == "date"
    assert str(out.filter(F.col("lsn") == 2).collect()[0]["ts_ms"]) == "2024-01-02"


def test_timestamp_converter_bad_target(records):
    with pytest.raises(ValueError):
        C.timestamp_converter(records, "ts_ms", "epochdays")


def test_hoist_extract_flatten_roundtrip(records):
    h = C.hoist_field(records, ("user_id", "value"), "payload")
    assert "user_id" not in h.columns and "payload" in h.columns
    e = C.extract_field(h, "payload", "user_id", "uid")
    f_ = C.flatten_struct(e, "payload", "_")
    r = f_.filter(F.col("lsn") == 3).collect()[0]
    assert r["uid"] == 12
    assert r["payload_user_id"] == 12 and r["payload_value"] == 99.99
    assert "payload" not in f_.columns


def test_value_to_key(records):
    out = C.value_to_key(records, ("user_id", "topic"), key_col="key")
    k = out.filter(F.col("lsn") == 4).collect()[0]["key"]
    assert (k["user_id"], k["topic"]) == (13, "other.view2")


def test_insert_header_overwrites_and_drop(records):
    out = C.insert_header(records, "trace", "replaced")
    got = {r["lsn"]: r["headers"] for r in out.collect()}
    assert got[1]["trace"] == "replaced" and len(got[1]) == 1
    assert got[3] == {"trace": "replaced"}  # added to empty map
    dropped = C.drop_headers(out, ("trace", "x"))
    got2 = {r["lsn"]: r["headers"] for r in dropped.collect()}
    assert got2[1] == {} and got2[4] == {}


def test_filter_records_standalone_and_gated(records):
    # standalone: drops matching records
    out = C.filter_records(records, "value < 0")
    assert sorted(r["lsn"] for r in out.collect()) == [1, 3, 4]
    # gated under a Connect predicate: drops exactly the gated ones
    gated = T.apply_with_predicate(
        records,
        C.filter_records,
        T.predicate_topic_name_matches(r"server1\..*"),
    )
    assert sorted(r["lsn"] for r in gated.collect()) == [4]
