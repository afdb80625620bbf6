"""DDL render / parse round-trip for the schema history.

The reference historizes schema evolution as **DDL text** plus a log
position, and rebuilds table structure on restart by re-parsing that
text (``relational/history/SchemaHistory.java:34-101`` stores
``HistoryRecord`` = {position, ddl, tableChanges};
``relational/ddl/DdlParser.java`` / the ANTLR grammars under
``debezium-ddl-parser/`` do the re-parse). Our engine's native payload
is the structured JSON change dict — this module adds the reference's
other representation: render a change as one ANSI-ish ALTER statement,
and parse such a statement back into the structured dict, so a schema
history written as DDL strings recovers identically on cold restart
(engine._parse_schema_change accepts either form).

Dialect (exactly the four change types the lake applies,
schema_evolution.py:14; column removal per the reference's
``history/TableChanges.java:23-53`` IR):

  ALTER TABLE t ADD COLUMN c <type> [DEFAULT <literal>]
  ALTER TABLE t RENAME COLUMN a TO b
  ALTER TABLE t ALTER COLUMN c SET DATA TYPE <type>
  ALTER TABLE t DROP COLUMN c

where <literal> is an integer, a decimal number, or a single-quoted
string (the DefaultValueConverter subset:
``relational/DefaultValueConverter.java`` / ``Column.defaultValue``).

Identifiers are ``[A-Za-z_][A-Za-z0-9_]*``; types additionally allow a
parenthesized precision suffix (``decimal(10,2)``). Keywords are
case-insensitive and whitespace-tolerant, matching the reference
parser's tolerance for dump-formatted DDL.

There are two parsers with identical semantics:

- :func:`parse_ddl` — driver-side, for control-plane history replay
  (a handful of rows at init; never on a data path).
- :func:`parse_ddl_cols` — Column-level ``regexp_extract`` for the
  data-plane catalog op ``cdc_ddl_parse`` (pure JVM codegen; this is
  the shape a 10^10-row DDL audit log would be parsed with).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_ID = r"[A-Za-z_][A-Za-z0-9_]*"
_TYPE = r"[A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?"
_LIT = r"-?\d+(?:\.\d+)?|'[^']*'"

_ADD_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+ADD\s+COLUMN\s+({_ID})\s+({_TYPE})"
    rf"(?:\s+DEFAULT\s+({_LIT}))?\s*;?\s*$",
    re.IGNORECASE,
)
_RENAME_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+RENAME\s+COLUMN\s+({_ID})\s+TO\s+({_ID})\s*;?\s*$",
    re.IGNORECASE,
)
_WIDEN_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+ALTER\s+COLUMN\s+({_ID})"
    rf"\s+SET\s+DATA\s+TYPE\s+({_TYPE})\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_ID})\s+DROP\s+COLUMN\s+({_ID})\s*;?\s*$",
    re.IGNORECASE,
)


def _norm_type(t: str) -> str:
    return re.sub(r"\s+", "", t).lower()


def _render_literal(v) -> str:
    if isinstance(v, str):
        if "'" in v:
            # outside the documented '[^']*' literal dialect — refuse
            # loudly rather than silently corrupt the stored default
            raise ValueError(
                f"string default {v!r} contains a single quote; "
                "unsupported in the DDL literal dialect"
            )
        return "'" + v + "'"
    return str(v)


def _parse_literal(tok: str):
    if tok.startswith("'"):
        return tok[1:-1]
    return float(tok) if "." in tok else int(tok)


def change_to_ddl(change: dict, table: str = "repo_content") -> str:
    """Render a structured schema change as one ALTER statement."""
    ct = change["change_type"]
    tbl = change.get("table") or table
    if ct == "ALTER_ADD_COLUMN":
        ddl = (
            f"ALTER TABLE {tbl} ADD COLUMN "
            f"{change['column_name']} {change['new_type']}"
        )
        if change.get("default") is not None:
            ddl += f" DEFAULT {_render_literal(change['default'])}"
        return ddl
    if ct == "ALTER_RENAME_COLUMN":
        return (
            f"ALTER TABLE {tbl} RENAME COLUMN {change['prev_name']} "
            f"TO {change['column_name']}"
        )
    if ct == "ALTER_WIDEN_TYPE":
        return (
            f"ALTER TABLE {tbl} ALTER COLUMN {change['column_name']} "
            f"SET DATA TYPE {change['new_type']}"
        )
    if ct == "ALTER_DROP_COLUMN":
        return f"ALTER TABLE {tbl} DROP COLUMN {change['column_name']}"
    raise ValueError(f"unknown change_type {ct!r}")


def parse_ddl(ddl: str) -> dict:
    """Parse one ALTER statement into the structured change fields.

    Returns {change_type, table, column_name, new_type, prev_name}
    (position fields — lsn, schema_version — live in the enclosing
    history record, as in the reference's HistoryRecord envelope).
    Raises ValueError on anything outside the dialect, which the
    engine's ``schema_history_skip_unparseable`` mode downgrades to a
    warn-and-skip exactly like ``AbstractSchemaHistory``.
    """
    m = _ADD_RE.match(ddl)
    if m:
        out = {
            "change_type": "ALTER_ADD_COLUMN",
            "table": m.group(1),
            "column_name": m.group(2),
            "new_type": _norm_type(m.group(3)),
            "prev_name": None,
        }
        if m.group(4) is not None:
            out["default"] = _parse_literal(m.group(4))
        return out
    m = _RENAME_RE.match(ddl)
    if m:
        return {
            "change_type": "ALTER_RENAME_COLUMN",
            "table": m.group(1),
            "column_name": m.group(3),
            "new_type": None,
            "prev_name": m.group(2),
        }
    m = _WIDEN_RE.match(ddl)
    if m:
        return {
            "change_type": "ALTER_WIDEN_TYPE",
            "table": m.group(1),
            "column_name": m.group(2),
            "new_type": _norm_type(m.group(3)),
            "prev_name": None,
        }
    m = _DROP_RE.match(ddl)
    if m:
        return {
            "change_type": "ALTER_DROP_COLUMN",
            "table": m.group(1),
            "column_name": m.group(2),
            "new_type": None,
            "prev_name": None,
        }
    raise ValueError(f"unparseable DDL: {ddl!r}")


def parse_ddl_cols(ddl: Column) -> list[Column]:
    """Column-level parser — the same dialect as :func:`parse_ddl`,
    expressed as five ``regexp_extract`` columns so a DDL audit column
    parses inside whole-stage codegen (no Python on the data path).

    Returns [change_type, table, column_name, new_type, prev_name];
    unparseable rows get change_type = 'UNPARSEABLE' and NULL fields
    (callers pick fail/warn/skip, mirroring the engine's history
    hardening modes).
    """
    # regexp_extract returns '' on no-match; '' -> NULL via nullif
    add = (
        rf"(?i)^\s*ALTER\s+TABLE\s+({_ID})\s+ADD\s+COLUMN\s+({_ID})"
        rf"\s+({_TYPE})(?:\s+DEFAULT\s+(?:{_LIT}))?\s*;?\s*$"
    )
    ren = rf"(?i)^\s*ALTER\s+TABLE\s+({_ID})\s+RENAME\s+COLUMN\s+({_ID})\s+TO\s+({_ID})\s*;?\s*$"
    wid = (
        rf"(?i)^\s*ALTER\s+TABLE\s+({_ID})\s+ALTER\s+COLUMN\s+({_ID})"
        rf"\s+SET\s+DATA\s+TYPE\s+({_TYPE})\s*;?\s*$"
    )
    drp = rf"(?i)^\s*ALTER\s+TABLE\s+({_ID})\s+DROP\s+COLUMN\s+({_ID})\s*;?\s*$"

    def _x(pat: str, grp: int) -> Column:
        return F.nullif(F.regexp_extract(ddl, pat, grp), F.lit(""))

    is_add = ddl.rlike(add)
    is_ren = ddl.rlike(ren)
    is_wid = ddl.rlike(wid)
    is_drp = ddl.rlike(drp)
    change_type = (
        F.when(is_add, F.lit("ALTER_ADD_COLUMN"))
        .when(is_ren, F.lit("ALTER_RENAME_COLUMN"))
        .when(is_wid, F.lit("ALTER_WIDEN_TYPE"))
        .when(is_drp, F.lit("ALTER_DROP_COLUMN"))
        .otherwise(F.lit("UNPARSEABLE"))
    )
    table = F.coalesce(_x(add, 1), _x(ren, 1), _x(wid, 1), _x(drp, 1))
    column_name = F.coalesce(_x(add, 2), _x(ren, 3), _x(wid, 2), _x(drp, 2))
    raw_type = F.coalesce(_x(add, 3), _x(wid, 3))
    new_type = F.lower(F.regexp_replace(raw_type, r"\s+", ""))
    prev_name = _x(ren, 2)
    return [change_type, table, column_name, new_type, prev_name]
