"""Kafka Connect core SMT analogues.

Debezium's SMT documentation configures its own transforms side by side
with the Apache Kafka Connect built-ins
(``org.apache.kafka.connect.transforms.*`` — RegexRouter, InsertField,
ReplaceField, Cast, TimestampConverter, TimestampRouter, ExtractField,
HoistField, Flatten, ValueToKey, InsertHeader, DropHeaders, Filter),
so a pipeline swapped onto this engine needs the same vocabulary. The
semantics below follow the public Apache Kafka transform javadocs and
config definitions (AK 3.x); the reference's own SMT chain plugs into
the identical Connect runtime (SURVEY §2.3).

All of these are pure column rewrites: JVM-side, inside whole-stage
codegen, no shuffle and no Python. Record "values" are flat columns or
an image struct, matching the rest of :mod:`transforms`; gate any of
them per record with :func:`transforms.apply_with_predicate`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Connect schema type names → Spark SQL cast targets
# (org.apache.kafka.connect.data.Schema.Type).
_CONNECT_TYPES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
    "bytes": "binary",
}


# ---------------------------------------------------------------------------
# Routers
# ---------------------------------------------------------------------------


def regex_router(
    df: DataFrame,
    regex: str,
    replacement: str,
    topic_col: str = "topic",
) -> DataFrame:
    """RegexRouter: rewrite the topic when the WHOLE topic matches the
    regex (``Pattern.matcher(topic).matches()`` — full match, unlike
    the find() semantics of a bare ``regexp_replace``); non-matching
    topics pass through unchanged. ``$1``-style group references work
    in ``replacement`` (both engines are Java-regex)."""
    anchored = f"^(?:{regex})$"
    t = F.col(topic_col)
    return df.withColumn(
        topic_col,
        F.when(
            t.rlike(anchored), F.regexp_replace(t, anchored, replacement)
        ).otherwise(t),
    )


def timestamp_router(
    df: DataFrame,
    topic_format: str = "${topic}-${timestamp}",
    ts_format: str = "yyyyMMdd",
    topic_col: str = "topic",
    ts_ms_col: str = "ts_ms",
) -> DataFrame:
    """TimestampRouter: render the record timestamp (epoch millis) with
    ``ts_format`` and splice it into ``topic_format``'s ``${topic}`` /
    ``${timestamp}`` placeholders. UTC rendering, like the Connect
    transform's default TimeZone."""
    rendered = F.date_format(
        F.from_utc_timestamp(F.timestamp_millis(F.col(ts_ms_col)), "UTC"),
        ts_format,
    )
    parts: list[Column] = []
    rest = topic_format
    while rest:
        idx_t = rest.find("${topic}")
        idx_s = rest.find("${timestamp}")
        nxt = min(i for i in (idx_t, idx_s, len(rest)) if i >= 0)
        if nxt > 0:
            parts.append(F.lit(rest[:nxt]))
            rest = rest[nxt:]
        elif rest.startswith("${topic}"):
            parts.append(F.col(topic_col))
            rest = rest[len("${topic}"):]
        else:
            parts.append(rendered)
            rest = rest[len("${timestamp}"):]
    return df.withColumn(topic_col, F.concat(*parts))


# ---------------------------------------------------------------------------
# Field-level value transforms
# ---------------------------------------------------------------------------


def insert_field(
    df: DataFrame,
    static_field: str | None = None,
    static_value: str | None = None,
    topic_field: str | None = None,
    offset_field: str | None = None,
    timestamp_field: str | None = None,
    topic_col: str = "topic",
    lsn_col: str = "lsn",
    ts_ms_col: str = "ts_ms",
) -> DataFrame:
    """InsertField$Value: add record metadata (topic / offset /
    timestamp) or a static literal into the value. The log offset of
    this engine is the LSN; the record timestamp is epoch millis,
    matching Connect's Timestamp logical type."""
    out = df
    if static_field is not None:
        out = out.withColumn(static_field, F.lit(static_value))
    if topic_field is not None:
        out = out.withColumn(topic_field, F.col(topic_col))
    if offset_field is not None:
        out = out.withColumn(offset_field, F.col(lsn_col))
    if timestamp_field is not None:
        out = out.withColumn(timestamp_field, F.col(ts_ms_col))
    return out


def replace_field(
    df: DataFrame,
    exclude: tuple[str, ...] = (),
    include: tuple[str, ...] = (),
    renames: tuple[str, ...] = (),
) -> DataFrame:
    """ReplaceField$Value: ``exclude`` drops fields, ``include`` (when
    non-empty) keeps only the listed fields, ``renames`` are
    ``from:to`` pairs applied to the surviving fields — the same
    precedence as the Connect transform (a field must survive the
    include/exclude filter to be renamed)."""
    rename_map: dict[str, str] = {}
    for spec in renames:
        src, _, dst = spec.partition(":")
        if not dst:
            raise ValueError(f"rename spec {spec!r} is not 'from:to'")
        rename_map[src] = dst
    cols = []
    for c in df.columns:
        if c in exclude:
            continue
        if include and c not in include:
            continue
        cols.append(F.col(c).alias(rename_map.get(c, c)))
    return df.select(*cols)


def cast_fields(df: DataFrame, spec: str) -> DataFrame:
    """Cast$Value: ``field:type[,field:type...]`` with Connect schema
    type names (int8..int64, float32/float64, boolean, string, bytes).
    Casts follow Spark/ANSI-off truncation semantics, which is what
    Connect's Values.convertTo does for numeric narrowing."""
    out = df
    for part in spec.split(","):
        field, _, ctype = part.strip().partition(":")
        if ctype not in _CONNECT_TYPES:
            raise ValueError(f"unknown Connect type {ctype!r}")
        out = out.withColumn(field, F.col(field).cast(_CONNECT_TYPES[ctype]))
    return out


def timestamp_converter(
    df: DataFrame,
    field: str,
    target_type: str = "string",
    fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """TimestampConverter$Value between Connect's Timestamp (epoch
    millis), formatted string, and Date representations. UTC, like the
    Connect transform's default. ``unix`` parses a formatted string (or
    re-emits millis); ``string`` renders millis with ``fmt``; ``date``
    truncates to the day as a DATE."""
    c = F.col(field)
    if target_type == "string":
        out = F.date_format(
            F.from_utc_timestamp(F.timestamp_millis(c), "UTC"), fmt
        )
    elif target_type == "unix":
        if dict(df.dtypes)[field] in ("bigint", "int", "long"):
            out = c.cast("bigint")
        else:
            out = F.unix_millis(F.to_utc_timestamp(F.to_timestamp(c, fmt), "UTC"))
    elif target_type == "date":
        out = F.from_utc_timestamp(F.timestamp_millis(c), "UTC").cast("date")
    else:
        raise ValueError(f"unknown target.type {target_type!r}")
    return df.withColumn(field, out)


# ---------------------------------------------------------------------------
# Structural transforms
# ---------------------------------------------------------------------------


def extract_field(
    df: DataFrame, struct_col: str, field: str, out_col: str | None = None
) -> DataFrame:
    """ExtractField$Value: pull one field out of a struct value,
    replacing (or aliasing) the record value with it. A null struct
    yields a null field, like the Connect transform with a null
    record."""
    return df.withColumn(
        out_col or struct_col, F.col(struct_col).getField(field)
    )


def hoist_field(
    df: DataFrame, cols: tuple[str, ...], into: str
) -> DataFrame:
    """HoistField$Value: wrap the value fields into a single named
    struct (the inverse of Flatten at depth 1)."""
    keep = [c for c in df.columns if c not in cols]
    return df.select(
        *keep, F.struct(*[F.col(c) for c in cols]).alias(into)
    )


def flatten_struct(
    df: DataFrame, struct_col: str, delimiter: str = "_"
) -> DataFrame:
    """Flatten$Value: promote a nested struct's fields to top level as
    ``<struct><delimiter><field>`` (Connect's default delimiter is '.',
    which Spark would require backticks for — pass '_' in catalogs)."""
    fields = df.schema[struct_col].dataType.fieldNames()
    keep = [c for c in df.columns if c != struct_col]
    return df.select(
        *keep,
        *[
            F.col(struct_col).getField(f_).alias(f"{struct_col}{delimiter}{f_}")
            for f_ in fields
        ],
    )


def value_to_key(
    df: DataFrame, fields: tuple[str, ...], key_col: str = "key"
) -> DataFrame:
    """ValueToKey: replace the record key with a struct of the listed
    value fields."""
    return df.withColumn(
        key_col, F.struct(*[F.col(f_) for f_ in fields])
    )


# ---------------------------------------------------------------------------
# Headers + record filter
# ---------------------------------------------------------------------------


def insert_header(
    df: DataFrame, key: str, value_literal: str, headers_col: str = "headers"
) -> DataFrame:
    """InsertHeader: add/overwrite one header (map<string,string>
    model, same as HeaderToValue's)."""
    return df.withColumn(
        headers_col,
        F.map_concat(
            F.map_filter(F.col(headers_col), lambda k, _: k != key),
            F.create_map(F.lit(key), F.lit(value_literal)),
        ),
    )


def drop_headers(
    df: DataFrame, keys: tuple[str, ...], headers_col: str = "headers"
) -> DataFrame:
    """DropHeaders: remove the listed header keys."""
    return df.withColumn(
        headers_col,
        F.map_filter(F.col(headers_col), lambda k, _: ~k.isin(*keys)),
    )


def filter_records(df: DataFrame, predicate=None) -> DataFrame:
    """Connect's Filter SMT drops every record it applies to. On its
    own with a predicate that is ``filter(NOT predicate)``; with none
    (the usual deployment — the Connect runtime gates it) it drops
    everything, so ``apply_with_predicate(df, filter_records, pred)``
    drops exactly the gated records. Both shapes stay pushed-filter
    scans."""
    if predicate is None:
        return df.limit(0)
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    return df.filter(~F.coalesce(pred.cast("boolean"), F.lit(False)))
