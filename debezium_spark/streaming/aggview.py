"""Incrementally-maintained aggregate view over a lake's change feed.

The engine-level counterpart of the ``cdc_incremental_agg`` catalog
query: a Materialize- / Flink-retract-style materialized view that a
downstream consumer keeps current by folding the lake's committed NET
changes (:meth:`LakeTable.table_changes`) as signed deltas — +after
into the row's new group, −before out of its old group — instead of
re-aggregating the table. Debezium's own consumers build exactly such
views from the emitted topic (SURVEY §2.4, the "derived sink table"
pattern; reference consumers are external, so the reference has no
in-engine analogue — this is the Spark-native realization).

Scale posture: one ``refresh()`` reads only the buckets the manifest
diff says were rewritten (metadata-only pruning in ``table_changes``),
shuffles the DELTA rows once on the group key, and merges them into a
state table whose size is O(#groups), not O(table). At 10^10 rows the
view maintenance cost rides the change rate, never the accumulated
corpus — the property that makes the retract plan the only viable one
at that scale.

Exactly-once: the applied lake version is the fence. It is committed
in the same atomic ``os.replace`` as the state pointer, so a crash
anywhere in ``refresh()`` leaves the previous (version, state) pair
intact and the next refresh re-folds the same feed idempotently (the
fold is a pure function of the two endpoint manifests — NET diff, so
re-delivery cannot double-count).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.lake import LakeTable

_STATE_SCHEMA = "g string, live_rows bigint, agg_bytes bigint"


class MaterializedAggView:
    """Per-group ``(live_rows, agg_bytes)`` over a :class:`LakeTable`.

    ``group_col`` names a logical column whose value buckets rows
    (NULL groups as its own bucket); the measure is
    ``length(measure_col)`` in bytes (0 for NULL) — e.g. bytes of
    ``content`` per ``lang``, the corpus-composition view an ingest
    operator watches. The configured names are resolved ONCE against
    the lake schema and pinned by FIELD ID in the view pointer
    (Iceberg column identity): a schema-change rename between
    refreshes re-resolves to the column's current logical name —
    which is the name ``table_changes`` emits — so the view keeps
    folding the same column, not whatever now happens to wear the
    old name.
    """

    def __init__(
        self,
        spark: SparkSession,
        lake: LakeTable,
        root: str,
        group_col: str = "lang",
        measure_col: str = "content",
    ):
        self.spark = spark
        self.lake = lake
        self.root = root
        self.group_col = group_col
        self.measure_col = measure_col
        os.makedirs(root, exist_ok=True)

    # -- commit plumbing ------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "VIEW_POINTER.json")

    def _pointer(self) -> dict:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"applied_version": 0, "state": None}

    def applied_version(self) -> int:
        return self._pointer()["applied_version"]

    def state(self) -> DataFrame:
        """Current view contents ``(g, live_rows, agg_bytes)``."""
        p = self._pointer()
        if p["state"] is None:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        return self.spark.read.parquet(os.path.join(self.root, p["state"]))

    # -- column identity ------------------------------------------------

    def _resolved_cols(self) -> tuple[str, str, list[int]]:
        """(group_name, measure_name, [group_fid, measure_fid]) in the
        lake's CURRENT schema. Field ids pinned at first refresh; a
        fresh view resolves the configured names."""
        schema = self.lake.table_schema()
        fids = self._pointer().get("field_ids")
        if fids:
            by_id = {c["field_id"]: c["name"] for c in schema.columns}
            try:
                return by_id[fids[0]], by_id[fids[1]], fids
            except KeyError as e:
                raise ValueError(
                    f"view column (field id {e}) dropped from the lake"
                ) from None
        fids = [
            schema.col(self.group_col)["field_id"],
            schema.col(self.measure_col)["field_id"],
        ]
        return self.group_col, self.measure_col, fids

    # -- the fold -------------------------------------------------------

    def _deltas(self, feed: DataFrame, g: str, m: str) -> DataFrame:
        size = lambda side: F.coalesce(  # noqa: E731
            F.length(F.col(f"{side}.{m}")).cast("long"), F.lit(0)
        )
        after = F.when(
            F.col("after").isNotNull(),
            F.struct(
                F.col(f"after.{g}").cast("string").alias("g"),
                F.lit(1).cast("long").alias("dc"),
                size("after").alias("dv"),
            ),
        )
        before = F.when(
            F.col("before").isNotNull(),
            F.struct(
                F.col(f"before.{g}").cast("string").alias("g"),
                F.lit(-1).cast("long").alias("dc"),
                (-size("before")).alias("dv"),
            ),
        )
        return (
            feed.select(F.explode(F.array(after, before)).alias("x"))
            .filter(F.col("x").isNotNull())
            .select("x.*")
            .groupBy("g")
            .agg(
                F.sum("dc").alias("live_rows"),
                F.sum("dv").alias("agg_bytes"),
            )
        )

    def refresh(self) -> dict:
        """Fold all lake commits since the last refresh into the view.

        Returns ``{"skipped": True}`` when already current. One call =
        one delta aggregation (a shuffle of the changed rows only) +
        one O(#groups) state merge, committed atomically with the new
        fence.
        """
        cur = self.lake.current_version()
        applied = self.applied_version()
        if cur == applied:
            return {"skipped": True, "applied_version": applied}

        g, m, fids = self._resolved_cols()
        feed = self.lake.table_changes(applied, cur)
        merged = (
            self.state()
            .unionByName(self._deltas(feed, g, m))
            .groupBy("g")
            .agg(
                F.sum("live_rows").alias("live_rows"),
                F.sum("agg_bytes").alias("agg_bytes"),
            )
            # a group retracted to zero live rows leaves the view —
            # exact integer telescoping guarantees its byte sum is 0
            .filter(F.col("live_rows") > 0)
        )
        rel = f"state_v{cur}"
        out = os.path.join(self.root, rel)
        merged.coalesce(1).write.mode("overwrite").parquet(out)

        tmp = tempfile.NamedTemporaryFile(
            "w", dir=self.root, suffix=".json.tmp", delete=False
        )
        with tmp as f:
            json.dump(
                {"applied_version": cur, "state": rel, "field_ids": fids},
                f,
            )
        prev = self._pointer()["state"]
        os.replace(tmp.name, self._pointer_path())  # the commit point
        if prev and prev != rel:
            shutil.rmtree(os.path.join(self.root, prev), ignore_errors=True)
        return {
            "skipped": False,
            "applied_version": cur,
            "from_version": applied,
        }

    # -- verification ---------------------------------------------------

    def recompute(self) -> DataFrame:
        """The full-scan answer the view must equal — tests/ops use
        this to audit a refresh; production never needs it."""
        g, m, _ = self._resolved_cols()
        return (
            self.lake.read_state()
            .groupBy(F.col(g).cast("string").alias("g"))
            .agg(
                F.count("*").alias("live_rows"),
                F.sum(
                    F.coalesce(F.length(F.col(m)).cast("long"), F.lit(0))
                ).alias("agg_bytes"),
            )
        )
