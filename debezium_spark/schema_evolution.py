"""Field-id based table schema + Debezium-style evolution.

The reference historizes DDL into a schema-history topic and replays it
on restart to rebuild the in-memory schema at any offset
(``relational/history/SchemaHistory.java:34-101``,
``history/TableChanges.java:23-53,92-215``). We keep the same idea but
Iceberg-shaped: every column has an immutable **field id** and an
immutable **physical name** (its name at creation — what parquet files
store); renames only change the *logical* name, widens only change the
logical type. Reads project physical → logical; writes project
logical → physical. Add / rename / widen therefore never rewrite data.

Supported change types (FIXTURES.md §3):
``ALTER_ADD_COLUMN``, ``ALTER_RENAME_COLUMN``, ``ALTER_WIDEN_TYPE``.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

# Widening lattice — value-preserving promotions only (Iceberg rule set).
_WIDEN_OK = {
    ("int", "bigint"),
    ("float", "double"),
    ("int", "double"),
    ("smallint", "int"),
    ("smallint", "bigint"),
}

BASE_SCHEMA = [
    {"field_id": 1, "name": "repo", "type": "string", "physical": "repo"},
    {"field_id": 2, "name": "path", "type": "string", "physical": "path"},
    {"field_id": 3, "name": "commit", "type": "string", "physical": "commit"},
    {"field_id": 4, "name": "lang", "type": "string", "physical": "lang"},
    {"field_id": 5, "name": "content", "type": "string", "physical": "content"},
]


@dataclass
class TableSchema:
    """An ordered list of column dicts {field_id, name, type, physical}."""

    columns: list[dict] = field(default_factory=lambda: copy.deepcopy(BASE_SCHEMA))
    version: int = 0

    @classmethod
    def from_create(cls, change: dict) -> "TableSchema":
        """Build a version-0 schema from a parsed CREATE TABLE change
        (``history/TableChanges.java`` CREATE entry: full column list +
        primary key) — field ids assigned 1..n in declaration order,
        physical = logical at creation, defaults carried per column."""
        cols = []
        for i, c in enumerate(change["columns"]):
            col = {
                "field_id": i + 1,
                "name": c["name"],
                "type": c["type"],
                "physical": c["name"],
            }
            if c.get("default") is not None:
                col["default"] = c["default"]
            cols.append(col)
        names = {c["name"] for c in cols}
        if unknown := [k for k in change.get("primary_key", []) if k not in names]:
            raise ValueError(
                f"PRIMARY KEY references unknown columns {unknown}"
            )
        return cls(cols, 0)

    @property
    def logical_names(self) -> list[str]:
        return [c["name"] for c in self.columns]

    def col(self, name: str) -> dict:
        for c in self.columns:
            if c["name"] == name:
                return c
        raise KeyError(name)

    def apply_change(self, change: dict) -> "TableSchema":
        """Return a new schema with one change applied.

        ``change``: {change_type, column_name, new_type, prev_name,
        schema_version}.
        """
        out = TableSchema(copy.deepcopy(self.columns), self.version + 1)
        ct = change["change_type"]
        if ct == "ALTER_ADD_COLUMN":
            fid = max(c["field_id"] for c in out.columns) + 1
            col = {
                "field_id": fid,
                "name": change["column_name"],
                "type": change["new_type"],
                "physical": change["column_name"],
            }
            # column default (relational/DefaultValueConverter.java,
            # Column.defaultValue; Iceberg's `initial-default`): rows
            # that PREDATE the add read as the default — files written
            # before the column existed project it at read, and events
            # stamped with pre-add schema versions apply it at merge.
            # Rows written after the add with an explicit NULL stay
            # NULL (the file carries the column).
            if change.get("default") is not None:
                col["default"] = change["default"]
            out.columns.append(col)
        elif ct == "ALTER_RENAME_COLUMN":
            c = out.col(change["prev_name"])
            c["name"] = change["column_name"]
        elif ct == "ALTER_WIDEN_TYPE":
            c = out.col(change["column_name"])
            if (c["type"], change["new_type"]) not in _WIDEN_OK:
                raise ValueError(
                    f"non-widening type change {c['type']} -> {change['new_type']}"
                )
            c["type"] = change["new_type"]
        elif ct == "ALTER_DROP_COLUMN":
            # metadata-only drop (Iceberg semantics): the column leaves
            # the schema, old files keep the physical data, reads stop
            # projecting it, time travel to a pre-drop version still
            # sees it. The table PK is never droppable — the merge
            # keys on it (history/TableChanges.java:23-53 models the
            # same column-removal IR).
            c = out.col(change["column_name"])
            if c["physical"] in ("repo", "path"):
                raise ValueError(
                    f"cannot drop key column {change['column_name']!r}"
                )
            out.columns = [x for x in out.columns if x is not c]
        elif ct == "ALTER_MULTI":
            # one statement = one new table shape = ONE version bump
            # (the reference emits one SchemaChangeEvent per statement
            # however many actions it carries); actions fold in order
            folded = self
            for a in change["actions"]:
                folded = folded.apply_change(a)
            return TableSchema(folded.columns, self.version + 1)
        elif ct == "CREATE_TABLE":
            raise ValueError(
                "CREATE TABLE is the version-0 history head, not an "
                "evolution of an existing schema"
            )
        else:
            raise ValueError(f"unknown change_type {ct!r}")
        return out

    def to_ddl(self) -> str:
        return ", ".join(f"{c['name']} {c['type']}" for c in self.columns)


class SchemaTracker:
    """Folds the schema-change log into per-version schemas — the
    analogue of replaying the schema-history topic
    (``HistorizedRelationalDatabaseSchema.java:1-152``).

    ``version_of(schema_version)`` returns the schema for events stamped
    with that version; ``fields_added_at`` gates visibility of columns
    for events that predate the addition (mixed-schema batches,
    SURVEY §7.4).
    """

    def __init__(self, changes: list[dict] | None = None):
        self.schemas: dict[int, TableSchema] = {0: TableSchema()}
        self.changes_by_version: dict[int, dict] = {}
        for ch in sorted(changes or [], key=lambda c: c["lsn"]):
            self.apply(ch)

    @property
    def latest_version(self) -> int:
        return max(self.schemas)

    @property
    def latest(self) -> TableSchema:
        return self.schemas[self.latest_version]

    def apply(self, change: dict) -> TableSchema:
        v = int(change["schema_version"])
        if change["change_type"] == "CREATE_TABLE":
            # the history-head record: re-establishes the base shape a
            # cold replay starts from (the reference's history begins
            # with the captured table's CREATE). Only legal at v0 and
            # before any evolution has been folded.
            if v != 0:
                raise ValueError(
                    "CREATE TABLE only supported as the version-0 "
                    f"history head (got schema_version={v})"
                )
            if self.changes_by_version:
                raise ValueError(
                    "CREATE TABLE must precede all schema evolution "
                    "in the history"
                )
            self.schemas[0] = TableSchema.from_create(change)
            self.changes_by_version[0] = change
            return self.schemas[0]
        base = self.schemas[v - 1]
        self.schemas[v] = base.apply_change(change)
        self.changes_by_version[v] = change
        return self.schemas[v]

    def version_of(self, schema_version: int) -> TableSchema:
        return self.schemas[min(schema_version, self.latest_version)]

    def added_at_version(self, physical_name: str) -> int:
        """First schema version where the column (by physical name) exists."""
        for v in sorted(self.schemas):
            for c in self.schemas[v].columns:
                if c["physical"] == physical_name:
                    return v
        raise KeyError(physical_name)
