"""Debezium JSON wire-format serde — the Kafka-record view of the
change stream.

The reference's primary output is one Kafka record per change event:
a JSON key plus a JSON value envelope (``debezium-api
.../engine/format/Json.java``; ``DebeziumEngine.create(Json.class)``),
and the consumer-side serde (``serde/DebeziumSerdes.java`` +
``serde/json/JsonSerde.java:63-104``) parses that wire back into typed
objects. This module gives the engine the same two directions over our
``EVENT_SCHEMA``:

``to_wire``
    envelope rows → the Kafka-record 4-tuple ``(key_json, value_json,
    partition, offset)``. ``value_json`` is the Debezium envelope
    ``{before, after, source, op, ts_ms, schema_version, message}``
    built with ``to_json`` (null fields omitted, as Connect's
    JsonConverter does); tombstones are ``value_json = NULL`` records,
    exactly the reference's delete-companion shape
    (``EventDispatcher.java:496-508``).

``from_wire``
    the lossless inverse via ``from_json`` against explicit schemas —
    never schema inference, so a malformed line surfaces as a NULL
    struct instead of silently re-typing the stream.
    ``is_tombstone ⇔ value_json IS NULL``. Tombstone rows round-trip
    to ``(partition, lsn, key, is_tombstone)`` — precisely the
    information the wire carries (a tombstone has no value by
    definition); every non-tombstone field round-trips bit-exact.

Scale notes: both directions are pure column expressions
(``to_json`` / ``from_json`` — JVM codegen, zero Python, zero
shuffle); a JSON-lines changelog directory parses with one narrow
projection at full scan parallelism, and LSN-range replay slicing
still prunes via the ``offset`` predicate pushed to the text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.envelope import EVENT_SCHEMA, KEY_SCHEMA

# The envelope part of the wire value: EVENT_SCHEMA minus the
# record-level (partition_id, lsn, key, is_tombstone), which ride the
# Kafka-record attributes (partition, offset, key) instead.
WIRE_VALUE_SCHEMA = T.StructType(
    [
        f
        for f in EVENT_SCHEMA.fields
        if f.name not in ("partition_id", "lsn", "key", "is_tombstone")
    ]
)

WIRE_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key_json", T.StringType(), False),
        T.StructField("value_json", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)

_VALUE_FIELDS = [f.name for f in WIRE_VALUE_SCHEMA.fields]


def to_wire(df: DataFrame) -> DataFrame:
    """EVENT_SCHEMA rows → Kafka-record-shaped wire rows."""
    return df.select(
        F.to_json(F.col("key")).alias("key_json"),
        F.when(
            ~F.col("is_tombstone"),
            F.to_json(F.struct(*_VALUE_FIELDS)),
        ).alias("value_json"),
        F.col("partition_id").alias("partition"),
        F.col("lsn").alias("offset"),
    )


def from_wire(df: DataFrame) -> DataFrame:
    """Wire rows → EVENT_SCHEMA rows (inverse of :func:`to_wire`)."""
    v = F.from_json(F.col("value_json"), WIRE_VALUE_SCHEMA)
    out = df.select(
        F.col("partition").cast("int").alias("partition_id"),
        F.col("offset").cast("long").alias("lsn"),
        v["op"].alias("op"),
        F.from_json(F.col("key_json"), KEY_SCHEMA).alias("key"),
        v["before"].alias("before"),
        v["after"].alias("after"),
        v["source"].alias("source"),
        v["ts_ms"].alias("ts_ms"),
        v["schema_version"].alias("schema_version"),
        F.col("value_json").isNull().alias("is_tombstone"),
        v["message"].alias("message"),
    )
    return out


def write_wire_log(df: DataFrame, path: str) -> None:
    """Materialize a changelog as JSON-lines (one Kafka-record object
    per line, null fields omitted) — what a Debezium Server JSON sink
    directory looks like."""
    to_wire(df).write.mode("overwrite").json(path)


def read_wire_log(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-lines changelog back as EVENT_SCHEMA. The explicit
    read schema keeps this a single pass (no inference job)."""
    return from_wire(spark.read.schema(WIRE_RECORD_SCHEMA).json(path))
