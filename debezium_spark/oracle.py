"""Pure-Python reference fold ("what Debezium's consumer would see").

Replays snapshot rows + change events in LSN order into a final table
state, exactly as a single-threaded Debezium consumer applying
last-writer-wins upserts would (the reference guarantees total order
per partition via its single-threaded coordinator,
``pipeline/ChangeEventSourceCoordinator.java:106``; keys never span
partitions, so per-key order == LSN order).

Used only by tests: the engine's distributed result must match this
fold per-row, including ``sha256(content)`` (input_hint invariant).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def fold_final_state(
    source_pdf: pd.DataFrame | None,
    changelog_pdf: pd.DataFrame,
    schema_changes: list[dict] | None = None,
) -> dict[tuple[str, str], dict]:
    """Return {(repo, path): row_dict} after replaying everything.

    ``source_pdf``: snapshot input (or None to start empty).
    ``changelog_pdf``: envelope rows (struct columns as dicts — the
    shape ``toPandas()`` produces).
    ``schema_changes``: list of {lsn, change_type, column_name,
    prev_name} applied in LSN order interleaved with data events.
    """
    state: dict[tuple[str, str], dict] = {}
    visible_cols = ["repo", "path", "commit", "lang", "content"]
    renames: dict[str, str] = {}
    # per-column (added_at_schema_version, default): events stamped
    # BELOW the add version contribute the default, not their (absent
    # → NULL) struct field — DefaultValueConverter semantics
    added_at: dict[str, tuple[int, object]] = {}

    if source_pdf is not None:
        for rec in source_pdf.to_dict("records"):
            state[(rec["repo"], rec["path"])] = {
                c: rec.get(c) for c in visible_cols
            }

    pending = sorted(schema_changes or [], key=lambda c: c["lsn"])

    def apply_schema_changes_upto(lsn: int):
        nonlocal pending
        while pending and pending[0]["lsn"] <= lsn:
            ch = pending.pop(0)
            if ch["change_type"] == "ALTER_MULTI":
                # one statement, actions folded in order at one version
                pending[:0] = [
                    {
                        **a,
                        "lsn": ch["lsn"],
                        "schema_version": ch.get("schema_version", 0),
                    }
                    for a in ch["actions"]
                ]
                continue
            if ch["change_type"] == "ALTER_ADD_COLUMN":
                visible_cols.append(ch["column_name"])
                added_at[ch["column_name"]] = (
                    int(ch.get("schema_version", 0)),
                    ch.get("default"),
                )
                for row in state.values():
                    row[ch["column_name"]] = ch.get("default")
            elif ch["change_type"] == "ALTER_RENAME_COLUMN":
                old, new = ch["prev_name"], ch["column_name"]
                src = renames.get(old, old)
                renames[new] = src
                visible_cols[visible_cols.index(old)] = new
                if old in added_at:
                    added_at[new] = added_at.pop(old)
                for row in state.values():
                    row[new] = row.pop(old, None)
            elif ch["change_type"] == "ALTER_DROP_COLUMN":
                name = ch["column_name"]
                visible_cols.remove(name)
                added_at.pop(name, None)
                renames.pop(name, None)
                for row in state.values():
                    row.pop(name, None)
            elif ch["change_type"] == "ALTER_WIDEN_TYPE":
                pass  # value-preserving; nothing to do in Python
            else:
                raise ValueError(
                    f"unknown schema change type {ch['change_type']!r} "
                    "in reference fold"
                )

    def project(image: dict, sv: int) -> dict:
        out = {}
        for c in visible_cols:
            v = image.get(renames.get(c, c))
            if c in added_at and sv < added_at[c][0]:
                v = added_at[c][1]  # pre-add event -> column default
            out[c] = v
        return out

    df = changelog_pdf.sort_values("lsn")
    for rec in df.to_dict("records"):
        apply_schema_changes_upto(int(rec["lsn"]))
        if rec.get("is_tombstone"):
            continue  # log-compaction plumbing, no table effect
        op = rec["op"]
        key = (rec["key"]["repo"], rec["key"]["path"])
        if op == "d":
            state.pop(key, None)
        elif op in ("r", "c", "u"):
            after = rec["after"]
            new_key = (after["repo"], after["path"])
            if op == "u" and new_key != key:
                # PK-change: DELETE(old)+CREATE(new)
                # (RelationalChangeRecordEmitter.java:171-185).
                state.pop(key, None)
            state[new_key] = project(
                after, int(rec.get("schema_version") or 0)
            )
        elif op == "t":
            state.clear()
    apply_schema_changes_upto(2**62)
    return state


def content_sha256_map(state: dict[tuple[str, str], dict]) -> dict[tuple[str, str], str]:
    return {
        k: hashlib.sha256((v.get("content") or "").encode()).hexdigest()
        for k, v in state.items()
    }
