"""Connect-style SMT chain config parsing: property-shape fidelity
(transforms=/predicates= lists, per-alias keys, predicate gating with
negate), chain ordering, and deploy-time failure on unknown types."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debezium_spark.operators.smt_config import smt_chain_from_config


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        (1, "server1.view", 10, 4.9, 1704067200123, {"trace": "t1"}),
        (2, "server1.click", 11, -2.7, 1704153600456, {}),
        (3, "server1.purchase", 12, 99.99, 1704240000789, {"x": "y"}),
    ]
    return spark.createDataFrame(
        rows, "lsn bigint, topic string, user_id bigint, value double, "
        "ts_ms bigint, headers map<string,string>"
    )


def test_config_chain_order_and_gating(records):
    props = {
        # unrelated connector keys must be ignored
        "connector.class": "io.debezium.connector.postgresql.PostgresConnector",
        "transforms": "route,audit,cast,prune",
        "transforms.route.type":
            "org.apache.kafka.connect.transforms.RegexRouter",
        "transforms.route.regex": r"server1\.(view|click)",
        "transforms.route.replacement": "server1.interaction.$1",
        "transforms.audit.type":
            "org.apache.kafka.connect.transforms.InsertField$Value",
        "transforms.audit.static.field": "region!",
        "transforms.audit.static.value": "us-east-1",
        "transforms.audit.offset.field": "__offset?",
        "transforms.cast.type":
            "org.apache.kafka.connect.transforms.Cast$Value",
        "transforms.cast.spec": "value:int64",
        # gated: rename only on interaction topics (post-route order!)
        "transforms.prune.type":
            "org.apache.kafka.connect.transforms.ReplaceField$Value",
        "transforms.prune.renames": "value:amount",
        "transforms.prune.predicate": "is_interaction",
        "predicates": "is_interaction",
        "predicates.is_interaction.type":
            "org.apache.kafka.connect.transforms.predicates.TopicNameMatches",
        "predicates.is_interaction.pattern": r"server1\.interaction\..*",
    }
    out = smt_chain_from_config(props)(records)
    rows = {r["lsn"]: r for r in out.collect()}
    assert rows[1]["topic"] == "server1.interaction.view"
    assert rows[1]["region"] == "us-east-1" and rows[1]["__offset"] == 1
    # gated rename: applied to routed topics, pass-through for others
    assert rows[1]["amount"] == 4 and rows[1]["value"] is None
    assert rows[3]["amount"] is None and rows[3]["value"] == 99


def test_config_negate_and_debezium_filter(records):
    props = {
        "transforms": "keep",
        "transforms.keep.type": "io.debezium.transforms.Filter",
        "transforms.keep.condition": "value > 0",
    }
    out = smt_chain_from_config(props)(records)
    assert sorted(r["lsn"] for r in out.collect()) == [1, 3]

    gated = {
        "transforms": "drop",
        "transforms.drop.type": "org.apache.kafka.connect.transforms.Filter",
        "transforms.drop.predicate": "tomb",
        "transforms.drop.negate": "true",
        "predicates": "tomb",
        "predicates.tomb.type":
            "org.apache.kafka.connect.transforms.predicates.HasHeaderKey",
        "predicates.tomb.name": "trace",
    }
    # negate=true → Filter applies to records WITHOUT the header
    out2 = smt_chain_from_config(gated)(records)
    assert sorted(r["lsn"] for r in out2.collect()) == [1]


def test_config_content_router_and_headers(records):
    props = {
        "transforms": "hdr,route",
        "transforms.hdr.type":
            "org.apache.kafka.connect.transforms.InsertHeader",
        "transforms.hdr.header": "pipeline",
        "transforms.hdr.value.literal": "cdc",
        "transforms.route.type":
            "io.debezium.transforms.ContentBasedRouter",
        "transforms.route.topic.expression":
            "CASE WHEN value >= 50 THEN 'high' ELSE 'low' END",
    }
    out = smt_chain_from_config(props)(records)
    r = {x["lsn"]: x for x in out.collect()}
    assert r[3]["__route"] == "high" and r[1]["__route"] == "low"
    assert r[1]["headers"]["pipeline"] == "cdc"


def test_config_unknown_type_fails_at_parse(records):
    with pytest.raises(ValueError, match="unsupported SMT type"):
        smt_chain_from_config({
            "transforms": "x",
            "transforms.x.type": "com.example.Bogus",
        })
    with pytest.raises(ValueError, match="unsupported predicate"):
        smt_chain_from_config({
            "predicates": "p",
            "predicates.p.type": "com.example.BogusPredicate",
        })
    with pytest.raises(ValueError, match="undeclared"):
        smt_chain_from_config({
            "transforms": "x",
            "transforms.x.type":
                "org.apache.kafka.connect.transforms.Filter",
            "transforms.x.predicate": "nope",
        })
