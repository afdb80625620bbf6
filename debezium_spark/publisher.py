"""Outbound change-topic publisher — the Kafka sink leg of the engine.

The reference's whole job is to PUBLISH change events (one Kafka
record per change, delete followed by a tombstone —
``EventDispatcher.java:496-508``); our engine lands them in the lake
instead. This module closes the loop downstream: every lake commit's
per-commit change feed (:meth:`LakeTable.table_changes` chained
``(v-1, v)``) is serialized to Debezium wire records under one
directory per version, so any consumer can tail the lake as if it
were the reference's topic. The wire container is per-topic
(``_topic_format``): ``json`` text by default, ``parquet`` columnar
for scale; ``compact_published`` gives Kafka's compacted-topic
retention.

Delivery contract (the reference's offset-fenced semantics, applied
outbound):

* one directory ``v{N:08d}/`` per lake commit, written to a temp path
  and atomically renamed — consumers never observe a partial version;
* presence of the final directory IS the published marker, so
  re-publishing is idempotent and a crash mid-write leaves only a
  temp dir that the next call removes and rewrites;
* record content is deterministic (keys, images, op, guard LSNs — no
  wall-clock), so a rewrite after a crash is byte-identical.

Scale: each version's feed is already metadata-pruned to touched
buckets; serialization is ``to_json`` over dynamic structs (JVM
codegen, zero Python, zero shuffle), and the per-version loop is
O(new commits), not O(table).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from debezium_spark.lake import LakeTable


def _wire_read_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("key_json", T.StringType()),
            T.StructField("value_json", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            # only compacted-snapshot records carry version inline
            # (their path no longer encodes it); plain v-dir files
            # read NULL here and take it from the path instead
            T.StructField("version", T.IntegerType()),
        ]
    )


_WIRE_READ_SCHEMA = _wire_read_schema()


def _with_version(df):
    return df.withColumn(
        "version",
        F.coalesce(
            F.col("version"),
            F.regexp_extract(F.input_file_name(), r"/v(\d+)/", 1).cast(
                "int"
            ),
        ),
    ).withColumn("is_tombstone", F.col("value_json").isNull())


def _published_versions(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    return {
        int(n[1:])
        for n in os.listdir(out_dir)
        if n.startswith("v") and n[1:].isdigit()
    }


def _compacted_through(out_dir: str) -> int:
    """Highest version folded into a compacted snapshot (0 if none) —
    those versions COUNT as published even though their directories
    are gone."""
    if not os.path.isdir(out_dir):
        return 0
    return max(
        (
            int(n.split("-")[1])
            for n in os.listdir(out_dir)
            if n.startswith("compacted-") and n.split("-")[-1].isdigit()
        ),
        default=0,
    )


def _topic_format(out_dir: str, requested: str | None = None) -> str:
    """The topic's wire container, fixed at first publish via an
    atomic ``_format`` marker: ``json`` (Connect JsonConverter's
    text default — grep-able, interoperable) or ``parquet`` (columnar
    + compressed — the 100 TB choice: 3-5× smaller than JSON text and
    consumers prune to the columns they read). A topic never mixes
    containers; asking for a different one than the marker raises."""
    marker = os.path.join(out_dir, "_format")
    current = None
    if os.path.isfile(marker):
        with open(marker) as f:
            current = f.read().strip()
    if requested is None:
        return current or "json"
    if requested not in ("json", "parquet"):
        raise ValueError(f"unknown wire format {requested!r}")
    if current is not None and current != requested:
        raise ValueError(
            f"topic already published as {current!r}; cannot switch to "
            f"{requested!r}"
        )
    if current is None:
        os.makedirs(out_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(requested)
        os.rename(tmp, marker)
    return requested


def publish_changes(
    lake: LakeTable,
    out_dir: str,
    tombstones_on_delete: bool = True,
    up_to_version: int | None = None,
    file_format: str | None = None,
) -> dict:
    """Publish every unpublished lake commit's change feed as JSON
    wire records (``key_json``, ``value_json``, ``partition``,
    ``offset``); ``value_json`` is the Debezium envelope
    ``{before, after, op, lsn}`` with null fields omitted, a delete
    optionally followed by a tombstone record (``value_json`` NULL) —
    ``tombstones.on.delete``, ``CommonConnectorConfig.java:479-486``.

    ``partition`` is the key's lake bucket (what Kafka key-hashing
    gives the reference: all events of one key in one partition, in
    order); ``offset`` is the post-image guard LSN (pre-image for
    deletes, +1 for the tombstone companion so per-partition offsets
    stay unique and ordered).
    """
    current = (
        lake.current_version() if up_to_version is None else up_to_version
    )
    fmt = _topic_format(out_dir, file_format)
    done = _published_versions(out_dir)
    compacted = _compacted_through(out_dir)
    on_disk = set(lake.versions())
    os.makedirs(out_dir, exist_ok=True)
    published = []
    for v in range(1, current + 1):
        if v in done or v <= compacted:
            continue
        if v not in on_disk or (v - 1) not in on_disk:
            # expired before it was ever published — the feed for this
            # commit is unrecoverable; surface it rather than skip
            raise RuntimeError(
                f"commit v{v} expired before publish (run publish "
                "before expire_snapshots, or accept the gap explicitly)"
            )
        feed = lake.table_changes(v - 1, v)
        key_json = F.to_json(F.struct("repo", "path"))
        value = F.to_json(
            F.struct(
                F.col("before"),
                F.col("after"),
                F.col("op"),
                F.coalesce(F.col("lsn_post"), F.col("lsn_pre")).alias("lsn"),
            )
        )
        bucket = lake._bucket_col()
        offset = F.coalesce(F.col("lsn_post"), F.col("lsn_pre"))
        records = feed.select(
            key_json.alias("key_json"),
            value.alias("value_json"),
            bucket.alias("partition"),
            offset.cast("long").alias("offset"),
        )
        if tombstones_on_delete:
            tombs = feed.filter(F.col("op") == "d").select(
                key_json.alias("key_json"),
                F.lit(None).cast("string").alias("value_json"),
                bucket.alias("partition"),
                (F.col("lsn_pre") + 1).cast("long").alias("offset"),
            )
            records = records.unionByName(tombs)
        final = os.path.join(out_dir, f"v{v:08d}")
        tmp = os.path.join(out_dir, f".tmp-v{v:08d}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        getattr(records.write.mode("overwrite"), fmt)(tmp)
        os.rename(tmp, final)
        published.append(v)
    return {"published": published, "up_to": current}


def compact_published(
    spark,
    out_dir: str,
    through_version: int,
    keep_tombstones: bool = False,
) -> dict:
    """Log-compact the published topic through ``through_version`` —
    Kafka's compacted-topic retention: all version directories ≤ V are
    replaced by ONE snapshot directory holding the latest record per
    key (a key whose latest record is a delete/tombstone is dropped,
    or kept as a tombstone with ``keep_tombstones=True`` — the
    ``delete.retention.ms`` window for consumers that still need the
    delete marker). Versions > V are untouched, so a new consumer
    bootstraps in O(live keys) + the tail instead of O(history).

    Records in the snapshot carry their original ``version`` inline
    (the path no longer encodes it); readers coalesce path-derived and
    stored versions, so folds by ``(version, offset)`` are unchanged.

    Crash-safe: snapshot written to a temp dir and renamed before any
    old directory is removed — a crash mid-removal leaves duplicate
    history, which per-key LWW folding (how every consumer of a
    compacted topic must read anyway, Kafka semantics) makes
    harmless; re-running the compaction finishes the removal.

    NOTE (Kafka-faithful): an EXISTING checkpointed streaming consumer
    that has not passed V will see the snapshot as new files —
    re-delivery, not loss; its per-key fold converges identically.
    """
    done = sorted(_published_versions(out_dir))
    target = [v for v in done if v <= through_version]
    if not target:
        return {"compacted_through": None, "records": 0}
    rec = read_published(spark, out_dir).filter(
        F.col("version") <= through_version
    )
    w = F.max_by(
        F.struct("value_json", "partition", "offset", "version"),
        F.struct("version", "offset"),
    ).alias("w")
    latest = rec.groupBy("key_json").agg(w).select(
        "key_json",
        F.col("w.value_json").alias("value_json"),
        F.col("w.partition").alias("partition"),
        F.col("w.offset").alias("offset"),
        F.col("w.version").alias("version"),
    )
    if not keep_tombstones:
        latest = latest.filter(F.col("value_json").isNotNull())
    final = os.path.join(out_dir, f"compacted-{through_version:08d}")
    tmp = os.path.join(out_dir, f".tmp-compacted-{through_version:08d}")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    n = latest.count()
    getattr(latest.write.mode("overwrite"), _topic_format(out_dir))(tmp)
    if os.path.isdir(final):
        # re-run after a crash between rename and old-dir removal: the
        # fold above already read snapshot ∪ leftovers (duplicates are
        # max_by-identical), so replacing the snapshot is sound
        shutil.rmtree(final)
    os.rename(tmp, final)
    for v in target:
        shutil.rmtree(os.path.join(out_dir, f"v{v:08d}"), ignore_errors=True)
    # an older snapshot is fully superseded by the new one
    for name in os.listdir(out_dir):
        if name.startswith("compacted-") and name != os.path.basename(final):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    return {"compacted_through": through_version, "records": int(n)}


def stream_published(spark, out_dir: str):
    """Tail the published topic with Structured Streaming — the
    consumer-group view (a Kafka consumer's poll loop): the file
    source discovers each atomically-renamed ``v{N}/`` directory as
    it appears, so records enter the stream exactly once per version
    and never partially (the rename is the visibility barrier).
    Checkpointed downstream queries get the same resume semantics a
    committed consumer offset gives the reference's consumers."""
    fmt = _topic_format(out_dir)
    df = getattr(spark.readStream.schema(_WIRE_READ_SCHEMA), fmt)(
        f"{out_dir}/{{v,compacted-}}*"
    )
    return _with_version(df)


def read_published(spark, out_dir: str):
    """Read the full published topic back as typed records —
    ``is_tombstone ⇔ value_json IS NULL`` (the wire carries nothing
    else for a tombstone by definition). Versions ride the directory
    name so consumers can resume from any commit."""
    fmt = _topic_format(out_dir)
    df = getattr(spark.read.schema(_WIRE_READ_SCHEMA), fmt)(
        f"{out_dir}/{{v,compacted-}}*"
    )
    return _with_version(df)
