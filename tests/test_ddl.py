"""DDL render/parse round-trip and DDL-form schema history.

The reference stores schema history as DDL text + position and
re-parses it on restart (``relational/history/SchemaHistory.java``,
``relational/ddl/DdlParser.java``). These tests pin: (1) the render →
parse round trip for all three change types, (2) the Column-level
parser being byte-identical to the driver-side parser on the same
statements, (3) an engine whose history arrives as DDL-form payloads
recovering the exact same schema as one fed structured payloads."""

from __future__ import annotations

import json
import os

import pytest

from debezium_spark.ddl import change_to_ddl, parse_ddl, parse_ddl_cols
from debezium_spark.streaming.engine import Engine, EngineConfig

from tests.test_schema_evolution import (
    BASE,
    _changes,
    _world_with_messages,
)


def test_roundtrip_all_change_types():
    for ch in _changes():
        ddl = change_to_ddl(ch, table="repo_content")
        back = parse_ddl(ddl)
        assert back["change_type"] == ch["change_type"]
        assert back["table"] == "repo_content"
        assert back["column_name"] == ch["column_name"]
        assert back.get("new_type") == ch.get("new_type")
        assert back.get("prev_name") == ch.get("prev_name")


def test_parse_tolerance():
    # keyword case, extra whitespace, trailing semicolon, spaced types
    add = parse_ddl("  alter  TABLE repo_content ADD column sz Decimal( 10 , 2 ) ; ")
    assert add == {
        "change_type": "ALTER_ADD_COLUMN",
        "table": "repo_content",
        "column_name": "sz",
        "new_type": "decimal(10,2)",
        "prev_name": None,
    }
    ren = parse_ddl("ALTER TABLE t RENAME COLUMN a TO b")
    assert (ren["prev_name"], ren["column_name"]) == ("a", "b")
    wid = parse_ddl("alter table t alter column c set data type BIGINT")
    assert (wid["change_type"], wid["new_type"]) == ("ALTER_WIDEN_TYPE", "bigint")


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE t",
        "ALTER TABLE t ADD COLUMN c",  # missing type
        "ALTER TABLE t RENAME COLUMN a b",  # missing TO
        "CREATE TABLE t (a int)",
        "",
    ],
)
def test_parse_rejects_out_of_dialect(bad):
    with pytest.raises(ValueError, match="unparseable DDL"):
        parse_ddl(bad)


_STATEMENTS = [
    "ALTER TABLE t_1 ADD COLUMN c_9 int;",
    "alter table t_2 add column c_10 decimal(10,2)",
    "ALTER TABLE t_3 RENAME COLUMN old_c TO new_c",
    "alter table t_4 alter column c_11 set data type DOUBLE",
    "DROP TABLE t_5",
    "not ddl at all",
]


def test_column_parser_matches_driver_parser(spark):
    df = spark.createDataFrame([(s,) for s in _STATEMENTS], "ddl string")
    import pyspark.sql.functions as F

    cols = parse_ddl_cols(F.col("ddl"))
    names = ["change_type", "table", "column_name", "new_type", "prev_name"]
    rows = {
        r["ddl"]: r
        for r in df.select(
            "ddl", *[c.alias(n) for c, n in zip(cols, names)]
        ).collect()
    }
    for s in _STATEMENTS:
        try:
            exp = parse_ddl(s)
        except ValueError:
            exp = {
                "change_type": "UNPARSEABLE",
                "table": None,
                "column_name": None,
                "new_type": None,
                "prev_name": None,
            }
        got = rows[s]
        for k in names:
            assert got[k] == exp[k], (s, k, got[k], exp[k])


def _ddl_form(ch):
    """HistoryRecord-shaped payload: position + ddl text, no
    structured fields."""
    return json.dumps(
        {
            "lsn": ch["lsn"],
            "schema_version": ch["schema_version"],
            "ddl": change_to_ddl(ch),
        }
    )


def test_ddl_form_history_replays_identically(spark, tmp_root):
    changes = _changes()
    structured = [json.dumps(c) for c in changes]
    ddl_form = [_ddl_form(c) for c in changes]
    lsns = [c["lsn"] for c in changes]

    finals = []
    for tag, msgs in (("structured", structured), ("ddl", ddl_form)):
        src, log = _world_with_messages(
            spark, os.path.join(tmp_root, tag), msgs, lsns=lsns
        )
        eng = Engine(
            spark,
            EngineConfig(
                changelog_path=log,
                lake_root=os.path.join(tmp_root, tag, "lake"),
                source_table_path=src,
                batch_lsn_span=977,
                n_buckets=8,
            ),
        )
        assert eng.tracker.latest_version == len(changes)
        eng.run()
        finals.append(eng.final_state())

    a, b = finals
    assert a.columns == b.columns
    assert "size_bytes" in a.columns and "language" in a.columns
    assert a.schema == b.schema  # widen applied in both


def test_ddl_form_unparseable_respects_hardening(spark, tmp_root):
    bad = json.dumps({"lsn": BASE + 10, "schema_version": 1, "ddl": "DROP TABLE x"})
    src, log = _world_with_messages(spark, os.path.join(tmp_root, "hard"), [bad])
    cfg = dict(
        changelog_path=log,
        source_table_path=src,
        batch_lsn_span=977,
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="unparseable schema-change"):
        Engine(
            spark,
            EngineConfig(lake_root=os.path.join(tmp_root, "hard", "l1"), **cfg),
        )
    eng = Engine(
        spark,
        EngineConfig(
            lake_root=os.path.join(tmp_root, "hard", "l2"),
            schema_history_skip_unparseable=True,
            **cfg,
        ),
    )
    assert eng.tracker.latest_version == 0
