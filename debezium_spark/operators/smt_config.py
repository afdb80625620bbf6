"""Connect-style SMT chain configuration.

Debezium users don't call transforms — they configure them as
connector properties the Kafka Connect runtime assembles
(``transforms=a,b``, ``transforms.a.type=...``, per-transform keys,
plus ``predicates=p`` / ``transforms.a.predicate=p`` /
``transforms.a.negate``). This module parses exactly that property
shape (string keys/values, as in a .properties file or connector JSON
config) into a composed ``DataFrame → DataFrame`` chain over this
engine's transforms — so a reference user's SMT config block ports
verbatim.

Supported ``type`` names are the public Apache Kafka core transforms
(``org.apache.kafka.connect.transforms.*``) mapped onto
:mod:`connect_smt`, and the reference's own SMTs
(``io.debezium.transforms.*`` — spec files cited on each analogue
function) mapped onto :mod:`transforms`. Unknown types, unknown
predicate types, or a reference to an undeclared predicate raise
``ValueError`` at parse time — config errors fail at deploy, like the
Connect runtime's ConfigException, never silently at run time.

Config keys that name "the value struct" in Connect's record model
(ExtractField/HoistField/Flatten) take this engine's flat-column model
via the documented extension keys ``column`` / ``columns``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from debezium_spark.operators import connect_smt as C
from debezium_spark.operators import transforms as T

_AK = "org.apache.kafka.connect.transforms."
_DBZ = "io.debezium.transforms."


def _csv(v: str | None) -> tuple[str, ...]:
    return tuple(s.strip() for s in v.split(",") if s.strip()) if v else ()


def _field(v: str | None) -> str | None:
    # InsertField's '!' (required) / '?' (optional) suffixes configure
    # Connect schema nullability, which a DataFrame column carries
    # natively — strip them.
    if v and v[-1] in "!?":
        return v[:-1]
    return v


def _bool(v: str | None, default: bool = False) -> bool:
    return default if v is None else v.strip().lower() == "true"


def _build_one(cfg: dict[str, str]) -> Callable[[DataFrame], DataFrame]:
    t = cfg.get("type", "")
    g = cfg.get  # per-transform key lookup

    if t == _AK + "RegexRouter":
        return lambda df: C.regex_router(
            df, cfg["regex"], cfg["replacement"], g("topic.col", "topic")
        )
    if t == _AK + "TimestampRouter":
        return lambda df: C.timestamp_router(
            df,
            g("topic.format", "${topic}-${timestamp}"),
            g("timestamp.format", "yyyyMMdd"),
            g("topic.col", "topic"),
            g("ts.col", "ts_ms"),
        )
    if t == _AK + "InsertField$Value":
        return lambda df: C.insert_field(
            df,
            static_field=_field(g("static.field")),
            static_value=g("static.value"),
            topic_field=_field(g("topic.field")),
            offset_field=_field(g("offset.field")),
            timestamp_field=_field(g("timestamp.field")),
        )
    if t == _AK + "ReplaceField$Value":
        return lambda df: C.replace_field(
            df, _csv(g("exclude")), _csv(g("include")), _csv(g("renames"))
        )
    if t == _AK + "Cast$Value":
        return lambda df: C.cast_fields(df, cfg["spec"])
    if t == _AK + "TimestampConverter$Value":
        return lambda df: C.timestamp_converter(
            df,
            cfg["field"],
            g("target.type", "string"),
            g("format", "yyyy-MM-dd HH:mm:ss"),
        )
    if t == _AK + "ExtractField$Value":
        return lambda df: C.extract_field(
            df, cfg["column"], cfg["field"], g("target")
        )
    if t == _AK + "HoistField$Value":
        return lambda df: C.hoist_field(df, _csv(cfg["columns"]), cfg["field"])
    if t == _AK + "Flatten$Value":
        return lambda df: C.flatten_struct(
            df, cfg["column"], g("delimiter", "_")
        )
    if t == _AK + "ValueToKey":
        return lambda df: C.value_to_key(df, _csv(cfg["fields"]))
    if t == _AK + "InsertHeader":
        return lambda df: C.insert_header(
            df, cfg["header"], cfg["value.literal"]
        )
    if t == _AK + "DropHeaders":
        return lambda df: C.drop_headers(df, _csv(cfg["headers"]))
    if t == _AK + "Filter":
        return C.filter_records

    if t == _DBZ + "ExtractNewRecordState":
        # both delete-mode generations: delete.tombstone.handling.mode
        # (Default strategy) wins; legacy delete.handling.mode +
        # drop.tombstones map per LegacyDeleteHandlingStrategy
        mode = g("delete.tombstone.handling.mode") or g(
            "delete.handling.mode", "drop"
        )
        keep_tomb = None
        if "drop.tombstones" in cfg:
            keep_tomb = not _bool(cfg["drop.tombstones"], True)
        return lambda df: T.extract_new_record_state(
            df,
            delete_mode=mode,
            add_fields=_csv(g("add.fields")),
            add_fields_prefix=g("add.fields.prefix", "__"),
            route_by_field=g("route.by.field"),
            keep_tombstones=keep_tomb,
        )
    if t == _DBZ + "Filter":
        return lambda df: T.scripting_filter(df, cfg["condition"])
    if t == _DBZ + "ContentBasedRouter":
        return lambda df: T.content_based_router(df, cfg["topic.expression"])
    if t == _DBZ + "ByLogicalTableRouter":
        return lambda df: T.by_logical_table_router(
            df,
            cfg["topic.regex"],
            cfg["topic.replacement"],
            _bool(g("key.enforce.uniqueness")),
        )
    if t == _DBZ + "HeaderToValue":
        return lambda df: T.header_to_value(
            df,
            g("headers.col", "headers"),
            _csv(cfg["fields"]),
            g("operation", "copy"),
        )
    if t == _DBZ + "TimezoneConverter":
        return lambda df: T.timezone_converter(
            df, cfg["field"], cfg["converted.timezone"]
        )
    if t == _DBZ + "partitions.PartitionRouting":
        return lambda df: T.partition_routing(
            df,
            int(cfg["partition.topic.num"]),
            *_csv(cfg["partition.payload.fields"]),
        )
    if t == _DBZ + "SchemaChangeEventFilter":
        return lambda df: T.schema_change_event_filter(
            df, _csv(cfg["schema.change.event.include.list"])
        )
    if t.endswith("yugabytedb.PGCompatible"):
        return lambda df: T.pg_compatible_unwrap(df)

    raise ValueError(f"unsupported SMT type {t!r}")


_PRED = "org.apache.kafka.connect.transforms.predicates."


def _build_predicate(cfg: dict[str, str]):
    t = cfg.get("type", "")
    if t == _PRED + "TopicNameMatches":
        return T.predicate_topic_name_matches(
            cfg["pattern"], cfg.get("topic.col", "topic")
        )
    if t == _PRED + "HasHeaderKey":
        return T.predicate_has_header_key(
            cfg["name"], cfg.get("headers.col", "headers")
        )
    if t == _PRED + "RecordIsTombstone":
        return T.predicate_record_is_tombstone()
    raise ValueError(f"unsupported predicate type {t!r}")


def _sub_config(props: dict[str, str], prefix: str) -> dict[str, str]:
    pl = len(prefix)
    return {k[pl:]: v for k, v in props.items() if k.startswith(prefix)}


def smt_chain_from_config(
    props: dict[str, str],
) -> Callable[[DataFrame], DataFrame]:
    """Assemble the configured chain. ``props`` is the connector
    property map (already-parsed .properties / connector-config JSON);
    only the ``transforms*`` and ``predicates*`` keys are read, so the
    full connector config can be passed as-is. Transforms apply in the
    ``transforms=`` list order, each optionally gated by its
    ``predicate`` (+ ``negate``) through the same split/union gate the
    standalone predicates use."""
    preds = {}
    for alias in _csv(props.get("predicates")):
        preds[alias] = _build_predicate(
            _sub_config(props, f"predicates.{alias}.")
        )

    steps: list[Callable[[DataFrame], DataFrame]] = []
    for alias in _csv(props.get("transforms")):
        cfg = _sub_config(props, f"transforms.{alias}.")
        fn = _build_one(cfg)
        pred_alias = cfg.get("predicate")
        if pred_alias is not None:
            if pred_alias not in preds:
                raise ValueError(
                    f"transform {alias!r} references undeclared "
                    f"predicate {pred_alias!r}"
                )
            pred = preds[pred_alias]
            negate = _bool(cfg.get("negate"))
            steps.append(
                lambda df, fn=fn, pred=pred, negate=negate:
                T.apply_with_predicate(df, fn, pred, negate)
            )
        else:
            steps.append(fn)

    def chain(df: DataFrame) -> DataFrame:
        for step in steps:
            df = step(df)
        return df

    return chain
