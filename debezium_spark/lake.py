"""Bucketed copy-on-write lake table with manifest commits — the MERGE
INTO sink.

Stands in for an Iceberg table (Iceberg jars aren't in this sandbox;
the layout below is deliberately Iceberg-shaped so the production path
is a drop-in ``MERGE INTO``):

- data files live under ``data/v{N}/bucket={b}/``, hash-bucketed on the
  key ``(repo, path)`` — the analogue of Iceberg's bucket partition
  transform. A merge only rewrites **touched buckets**; untouched
  buckets are carried forward by reference in the manifest, so merge
  cost scales with the change set, not the table (copy-on-write).
- a numbered JSON manifest per commit under ``_commits/`` records the
  live file set, the field-id table schema (see
  :mod:`debezium_spark.schema_evolution`), cumulative per-partition
  offsets, and ``last_batch_id``. Commit = write-temp + atomic rename —
  the analogue of an Iceberg snapshot commit.
- **fencing**: batch ids are monotone; re-delivery of an
  already-committed batch (``foreachBatch`` crash-replay) is detected
  against ``last_batch_id`` and skipped — this upgrades the reference's
  at-least-once offset flush (``embedded/EmbeddedEngine.java:815-905``)
  to exactly-once table effect.
- per-batch lineage rows under ``_lineage/`` (events applied, max LSN
  per source partition — the analogue of Debezium's
  SnapshotMeter/StreamingMeter JMX metrics,
  ``pipeline/meters/StreamingMeter.java:30-66``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.schema_evolution import TableSchema


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this manifest version first (optimistic
    concurrency, Iceberg ``CommitFailedException`` analogue)."""


class LakeTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        broadcast_merge_threshold: int = 50_000,
        broadcast_merge_max_bytes: int = 256 * 1024 * 1024,
        lww_light_threshold: int = 0,
        retain_tombstones: bool = False,
    ):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        # retain_tombstones=True keeps deletes as hidden tombstone rows
        # (key + _lsn + _deleted=true, values NULL) instead of removing
        # state — the Kafka-log-compaction design. With tombstones a
        # late LOWER-LSN event of a deleted key still has a row to lose
        # the LSN-guard against, so the merge becomes order-tolerant
        # across batches for deletes too (without them, a delete
        # consumed before a lower-LSN event of the same key is
        # resurrected by it). Consumer reads filter tombstones; only
        # with_sys readers (the merge itself) see them.
        self.retain_tombstones = retain_tombstones
        # compacted change sets at or under BOTH bounds merge via the
        # broadcast plan (state side exchange-free); larger ones fall
        # back to the shuffled full-outer join. The byte bound matters:
        # an explicit broadcast() hint bypasses
        # autoBroadcastJoinThreshold, and row count alone says nothing
        # when the payload column holds multi-KB documents (50k × 200KB
        # would blow past Spark's 8GB broadcast hard limit)
        self.broadcast_merge_threshold = broadcast_merge_threshold
        self.broadcast_merge_max_bytes = broadcast_merge_max_bytes
        # merge_full winner election: when the distinct-key count is at
        # or under this, LWW winners are elected over a column-pruned
        # (key, lsn, src) shuffle and winner rows are fetched map-side
        # via a broadcast filter — full payloads never shuffle.
        # DEFAULT OFF (0): measured on this host (tmpfs shuffle,
        # CPU-bound transforms) the double input pass costs MORE than
        # the 6× shuffle-byte saving — interleaved A/B at 54M events /
        # 8 cores: light 463-727k ev/s vs wide 806-905k (ratio
        # 1.11-1.86, BENCH_HISTORY lww_light_ab_r3). Opt in for
        # deployments where network shuffle of wide payloads is the
        # bottleneck and the input is cheap to rescan.
        self.lww_light_threshold = lww_light_threshold
        self._manifest_cache: dict[int, dict] = {}

    # -- layout helpers ------------------------------------------------
    @property
    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    @property
    def _lineage_dir(self) -> str:
        return os.path.join(self.root, "_lineage")

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._commits_dir, f"{version:08d}.json")

    # -- lifecycle -----------------------------------------------------
    def create(self, schema: TableSchema | None = None) -> dict:
        os.makedirs(self._commits_dir, exist_ok=True)
        os.makedirs(self._lineage_dir, exist_ok=True)
        schema = schema or TableSchema()
        manifest = {
            "version": 0,
            "batch_id": None,
            "last_batch_id": -1,
            "last_batch_ids": {},
            "files": {},
            "n_buckets": self.n_buckets,
            "schema": schema.columns,
            "schema_version": schema.version,
            "offsets": {},
            "metrics": {},
            "ts": time.time(),
        }
        self._write_manifest(manifest)
        return manifest

    def exists(self) -> bool:
        return os.path.isdir(self._commits_dir) and bool(os.listdir(self._commits_dir))

    def current_version(self) -> int:
        names = [n for n in os.listdir(self._commits_dir) if n.endswith(".json")]
        if not names:
            raise FileNotFoundError(f"no commits in {self._commits_dir}")
        return max(int(n.split(".")[0]) for n in names)

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v not in self._manifest_cache:
            with open(self._manifest_path(v)) as f:
                self._manifest_cache[v] = json.load(f)
        man = self._manifest_cache[v]
        if version is None and "n_buckets" in man:
            # the LATEST manifest's bucket spec is authoritative — a
            # client opening with a stale constructor width would
            # misroute keys (missing-bucket reads → duplicate inserts).
            # The constructor value only seeds create()/pre-spec lakes.
            self.n_buckets = int(man["n_buckets"])
        return man

    def _write_manifest(self, manifest: dict) -> None:
        """Atomic EXCLUSIVE commit — Iceberg's optimistic concurrency:
        ``link(tmp, final)`` both publishes atomically and fails with
        ``FileExistsError`` if another writer committed this version
        first (plain ``rename`` overwrites silently — a split-brain
        second driver would erase a committed merge). The loser must
        re-read the table and retry its commit against the new head;
        the single-writer engine never hits this."""
        v = manifest["version"]
        tmp = os.path.join(self._commits_dir, f".tmp.{v}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        final = self._manifest_path(v)
        try:
            os.link(tmp, final)  # atomic + exclusive
        except FileExistsError:
            os.unlink(tmp)
            raise ConcurrentCommitError(
                f"version {v} was committed by another writer; re-read "
                "the table head and retry"
            ) from None
        os.unlink(tmp)
        self._manifest_cache[v] = manifest

    def table_schema(self, version: int | None = None) -> TableSchema:
        m = self.manifest(version)
        return TableSchema(m["schema"], m["schema_version"])

    # -- read ----------------------------------------------------------
    def _bucket_col(self, repo="repo", path="path"):
        return F.pmod(F.xxhash64(F.col(repo), F.col(path)), self.n_buckets).cast("int")

    def read_state(
        self,
        buckets: list[int] | None = None,
        logical: bool = True,
        with_sys: bool = False,
        version: int | None = None,
    ) -> DataFrame:
        """Table state. ``logical=True`` projects physical file
        columns to logical names/types (field-id rename + widen at read,
        Iceberg-style); ``logical=False`` keeps physical names (used by
        merge so rewritten files stay in physical space). ``with_sys``
        includes the hidden ``_lsn`` column (the LSN that wrote each
        row — the merge guard).

        ``version`` pins a historical manifest — TIME TRAVEL, the
        Iceberg ``VERSION AS OF`` read: every commit's manifest is an
        immutable snapshot whose file entries point at the exact data
        files that were live then (untouched buckets keep their older
        ``data/v{k}`` paths), so a pinned read reproduces the table
        byte-for-byte as of that commit. Raises ``FileNotFoundError``
        if the version has been expired (:meth:`expire_snapshots`)."""
        man = self.manifest(version)
        schema = self.table_schema(version)
        entries = [
            e
            for b, e in man["files"].items()
            if buckets is None or int(b) in buckets
        ]
        sys_cols = [("_lsn", "bigint")] if with_sys else []
        if with_sys and self.retain_tombstones:
            sys_cols.append(("_deleted", "boolean"))
        if not entries:
            ddl = ", ".join(
                [
                    f"`{c['name' if logical else 'physical']}` {c['type']}"
                    for c in schema.columns
                ]
                + [f"`{n}` {t}" for n, t in sys_cols]
            )
            return self.spark.createDataFrame([], ddl)

        by_version: dict[int, list[str]] = {}
        for e in entries:
            by_version.setdefault(e["version"], []).append(
                os.path.join(self.root, e["path"])
            )

        parts = []
        for v, paths in by_version.items():
            file_schema = TableSchema(
                self.manifest(v)["schema"], self.manifest(v)["schema_version"]
            )
            present = {c["physical"]: c for c in file_schema.columns}
            df = self.spark.read.parquet(*paths)
            cols = []
            for c in schema.columns:
                name = c["name"] if logical else c["physical"]
                if c["physical"] in present:
                    cols.append(F.col(c["physical"]).cast(c["type"]).alias(name))
                else:
                    # file predates the column: Iceberg initial-default
                    # semantics — project the column's default (NULL
                    # when none). Rows written AFTER the add with an
                    # explicit NULL take the branch above and stay NULL.
                    cols.append(
                        F.lit(c.get("default")).cast(c["type"]).alias(name)
                    )
            for n, t in sys_cols:
                # `_deleted` may predate retention being switched on
                # (or the file was written by a non-retaining merge) —
                # absent means "live row"
                src = (
                    F.col(n)
                    if n != "_deleted" or "_deleted" in df.columns
                    else F.lit(False)
                )
                cols.append(src.cast(t).alias(n))
            if "_deleted" in df.columns and (
                not with_sys or not self.retain_tombstones
            ):
                # consumer-facing reads never see tombstones; a
                # NON-retaining lake drops them even from merge reads
                # (retention switched off ⇒ they are just garbage)
                df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def versions(self) -> list[int]:
        """All commit versions currently on disk, ascending."""
        return sorted(
            int(n.split(".")[0])
            for n in os.listdir(self._commits_dir)
            if n.endswith(".json")
        )

    def version_as_of(self, ts: float) -> int:
        """``TIMESTAMP AS OF``: the latest commit whose manifest
        timestamp is at or before ``ts`` (every commit records its
        wall-clock ``ts`` at manifest write). O(retained versions)
        cached metadata reads, no data access. Raises ``ValueError``
        when ``ts`` predates the earliest retained commit (earlier
        history may have been expired)."""
        best = None
        for v in self.versions():
            if self.manifest(v)["ts"] <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no retained commit at or before ts={ts} "
                f"(earliest retained: {self.versions()[:1]})"
            )
        return best

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg-style snapshot expiry (``expireSnapshots`` +
        orphan-file removal): retain the newest ``keep_last`` commits,
        delete every data directory no retained manifest references,
        then drop the expired manifest JSONs.

        Without this, the copy-on-write merge grows storage with every
        commit forever — at a 100 TB table with per-minute batches
        that is the difference between ~1× and ~1440× daily storage.

        Correctness under crash at any point:

        * data dirs are deleted only if NO retained manifest references
          them, so retained reads (current + time travel within the
          window) never lose a file;
        * manifest JSONs are kept while EITHER retained or still
          referenced as a file-schema source by a retained manifest's
          entries (untouched buckets keep old ``data/v{k}`` paths whose
          schema lives in manifest ``k``);
        * a crash mid-expiry leaves only already-unreferenced garbage,
          which the next expiry removes — it can never orphan a
          retained version.

        Driver-side file ops are O(versions + buckets) local renames/
        unlinks — metadata scale, no data pass. Returns counts.
        """
        import shutil

        all_versions = self.versions()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        retained = set(all_versions[-keep_last:])
        # manifests needed as schema sources by retained file entries
        needed = set(retained)
        referenced_dirs: set[str] = set()
        for v in retained:
            for e in self.manifest(v)["files"].values():
                needed.add(int(e["version"]))
                referenced_dirs.add(e["path"])

        removed_dirs = 0
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for vdir in sorted(os.listdir(data_root)):
                vpath = os.path.join(data_root, vdir)
                if not os.path.isdir(vpath):
                    continue
                for bdir in sorted(os.listdir(vpath)):
                    rel = f"data/{vdir}/{bdir}"
                    if (
                        bdir.startswith("bucket=")
                        and rel not in referenced_dirs
                    ):
                        shutil.rmtree(os.path.join(vpath, bdir))
                        removed_dirs += 1
                # once no bucket dir survives, drop the whole version
                # dir (removes Hadoop _SUCCESS/.crc markers too)
                if not any(
                    n.startswith("bucket=") for n in os.listdir(vpath)
                ):
                    shutil.rmtree(vpath)

        removed_manifests = 0
        for v in all_versions:
            if v not in needed:
                os.unlink(self._manifest_path(v))
                self._manifest_cache.pop(v, None)
                removed_manifests += 1
        return {
            "retained": sorted(retained),
            "removed_data_dirs": removed_dirs,
            "removed_manifests": removed_manifests,
        }

    def purge_tombstones(self, below_lsn: int) -> dict:
        """Drop retained delete tombstones with ``_lsn < below_lsn`` —
        Kafka's ``delete.retention.ms`` compaction analogue. Safe once
        every consumer/redelivery frontier has passed ``below_lsn``:
        an event older than that can no longer arrive, so the
        tombstone has nothing left to guard. One COW commit rewriting
        only the buckets that actually hold purgeable tombstones.
        """
        if not self.retain_tombstones:
            raise ValueError("lake does not retain tombstones")
        man = self.manifest()
        state = self.read_state(logical=False, with_sys=True)
        dead = F.col("_deleted") & (F.col("_lsn") < F.lit(below_lsn))
        touched = [
            r["bucket"]
            for r in state.filter(dead)
            .withColumn("bucket", self._bucket_col())
            .select("bucket")
            .distinct()
            .collect()
        ]
        if not touched:
            return {"purged_buckets": [], "version": man["version"]}
        new_version = man["version"] + 1
        keep = self.read_state(
            buckets=touched, logical=False, with_sys=True
        ).filter(~dead)
        out_dir = os.path.join(self.root, f"data/v{new_version}")
        (
            keep.withColumn("bucket", self._bucket_col())
            .repartition(max(len(touched), 1), "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(out_dir)
        )
        written = {
            int(n.split("=")[1])
            for n in os.listdir(out_dir)
            if n.startswith("bucket=")
        }
        files = dict(man["files"])
        for b in touched:
            if b in written:
                files[str(b)] = {
                    "path": f"data/v{new_version}/bucket={b}",
                    "version": new_version,
                }
            else:
                files.pop(str(b), None)
        manifest = {
            **man,
            "version": new_version,
            "files": files,
            "metrics": {"tombstone_purge_below": below_lsn},
            "ts": time.time(),
        }
        self._write_manifest(manifest)
        return {"purged_buckets": sorted(touched), "version": new_version}

    def rebucket(self, new_n_buckets: int) -> dict:
        """Partition-spec evolution: rewrite the table under a new
        bucket count — Iceberg's spec evolution + rewrite in one fenced
        commit. A fixed bucket width cannot follow table growth (32
        buckets at 100 TB is ~3 TB per bucket: COW rewrites and
        in-bucket joins stop fitting an executor), so the width must
        scale with the table; the new spec lands in the manifest and
        every later open adopts it from there (the manifest, not the
        client constructor, is authoritative — see :meth:`manifest`).

        One full shuffle of the table by the new bucket key, written
        bucket-partitioned; retained tombstones ride along. Crash-safe
        like any commit: the manifest rename is the commit point, and
        a half-written ``data/v{N}`` without its manifest is orphan
        garbage the next :meth:`expire_snapshots` removes.
        """
        if new_n_buckets < 1:
            raise ValueError(f"bad bucket count {new_n_buckets}")
        man = self.manifest()
        old_n = self.n_buckets
        if new_n_buckets == old_n:
            return {"version": man["version"], "n_buckets": old_n}
        state = self.read_state(logical=False, with_sys=True)
        new_version = man["version"] + 1
        out_dir = os.path.join(self.root, f"data/v{new_version}")
        self.n_buckets = new_n_buckets
        try:
            (
                state.withColumn("bucket", self._bucket_col())
                .repartition(new_n_buckets, "bucket")
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(out_dir)
            )
        except Exception:
            self.n_buckets = old_n
            raise
        files = {
            str(int(n.split("=")[1])): {
                "path": f"data/v{new_version}/bucket={int(n.split('=')[1])}",
                "version": new_version,
            }
            for n in sorted(os.listdir(out_dir))
            if n.startswith("bucket=")
        }
        manifest = {
            **man,
            "version": new_version,
            "batch_id": None,
            "files": files,
            "n_buckets": new_n_buckets,
            "metrics": {"rebucket_from": old_n, "rebucket_to": new_n_buckets},
            "ts": time.time(),
        }
        self._write_manifest(manifest)
        return {"version": new_version, "n_buckets": new_n_buckets}

    def table_changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Incremental read of the committed NET changes between two
        versions — the Delta CDF / Iceberg incremental-scan analogue,
        computed on read from the bucket-COW manifests (no stored
        change files). Downstream consumers poll this instead of
        re-diffing full table snapshots; it is the stream the
        reference engine itself would publish onward (SURVEY §2.4 —
        Debezium's emitted topic, re-derived here from any two lake
        commits).

        Scale: bucket pruning is METADATA-ONLY — a bucket is read (in
        both versions) iff its file entry differs between the two
        manifests, so at 100 TB with sparse batches the scan touches
        only rewritten buckets, never the table. Within those buckets
        the diff joins the two pinned reads per key and keeps rows
        whose guarding ``_lsn`` changed: carried-over neighbours of a
        rewritten bucket (same key, same ``_lsn``) are filtered out,
        so one hot key's rewrite does not spam the feed with its
        bucket-mates.

        Semantics: NET diff of endpoint states (intermediate churn
        between the two versions collapses; chain consecutive
        ``(v, v+1)`` calls for per-commit granularity). Rows come out
        Debezium-flavoured: key columns, ``op`` c/u/d,
        ``before``/``after`` structs in the ``v_to`` LOGICAL schema —
        schema evolution between the versions aligns by field id
        (physical names are rename-stable; columns added after
        ``v_from`` read NULL in ``before``) — plus the pre/post guard
        LSNs. Retained delete tombstones count as absence, so a
        delete is reported exactly once and never as a live row.

        Raises ``FileNotFoundError`` if either manifest has been
        expired (:meth:`expire_snapshots`).
        """
        if v_to is None:
            v_to = self.current_version()
        if not 0 <= v_from <= v_to:
            raise ValueError(f"bad version range {v_from}..{v_to}")
        m_from, m_to = self.manifest(v_from), self.manifest(v_to)
        touched = sorted(
            int(b)
            for b in set(m_from["files"]) | set(m_to["files"])
            if m_from["files"].get(b) != m_to["files"].get(b)
        )
        # an expired manifest can survive as a schema source while its
        # data dirs are gone — fail eagerly (O(touched) stat calls,
        # metadata scale) instead of mid-job
        for m in (m_from, m_to):
            for b in touched:
                e = m["files"].get(str(b))
                if e is not None and not os.path.isdir(
                    os.path.join(self.root, e["path"])
                ):
                    raise FileNotFoundError(
                        f"version {m['version']} data expired: {e['path']}"
                    )
        schema = self.table_schema(v_to)
        non_key = [
            c for c in schema.columns if c["name"] not in ("repo", "path")
        ]

        def _side(version: int, tag: str) -> DataFrame:
            df = self.read_state(
                buckets=touched,
                logical=False,
                with_sys=True,
                version=version,
            )
            if "_deleted" in df.columns:
                df = df.filter(
                    ~F.coalesce(F.col("_deleted"), F.lit(False))
                )
            img = [
                (
                    F.col(c["physical"])
                    if c["physical"] in df.columns
                    else F.lit(None)
                )
                .cast(c["type"])
                .alias(c["name"])
                for c in non_key
            ]
            return df.select(
                "repo",
                "path",
                F.struct(*img).alias(f"_{tag}_img"),
                F.col("_lsn").alias(f"_{tag}_lsn"),
            )

        j = _side(v_from, "o").join(
            _side(v_to, "n"), ["repo", "path"], "full_outer"
        )
        op = (
            F.when(F.col("_o_lsn").isNull(), "c")
            .when(F.col("_n_lsn").isNull(), "d")
            .otherwise("u")
        )
        return j.filter(
            F.col("_o_lsn").isNull()
            | F.col("_n_lsn").isNull()
            | (F.col("_o_lsn") != F.col("_n_lsn"))
        ).select(
            "repo",
            "path",
            op.alias("op"),
            F.when(F.col("_o_lsn").isNotNull(), F.col("_o_img")).alias(
                "before"
            ),
            F.when(F.col("_n_lsn").isNotNull(), F.col("_n_img")).alias(
                "after"
            ),
            F.col("_o_lsn").alias("lsn_pre"),
            F.col("_n_lsn").alias("lsn_post"),
        )

    # -- merge (the MERGE INTO analogue) --------------------------------
    def merge(
        self,
        changes: DataFrame,
        batch_id: int,
        offsets: dict | None = None,
        lineage_rows: list[dict] | None = None,
        metrics: dict | None = None,
        frontier_fn=None,
        phase: str = "stream",
        truncate_lsn: int | None = None,
    ) -> dict:
        """Apply a compacted change set — LSN-guarded MERGE.

        ``truncate_lsn``: a TRUNCATE event at that LSN was seen in the
        batch (data/Envelope.java:319 — no image; table effect =
        delete every row written below it). State rows with
        ``_lsn < truncate_lsn`` are wiped; the caller pre-filters
        change rows to ``lsn > truncate_lsn``. All buckets become
        touched (a truncate rewrites the table).

        ``changes`` columns: ``op``, ``lsn`` + the **physical** schema
        columns; ``op == 'd'`` deletes the key, anything else upserts:

            MERGE INTO t USING changes ON (repo, path)
              WHEN MATCHED AND op='d' AND changes.lsn > t._lsn THEN DELETE
              WHEN MATCHED AND changes.lsn > t._lsn THEN UPDATE SET *
              WHEN NOT MATCHED AND op<>'d' THEN INSERT *

        Exactly-once is belt-and-braces: (1) monotone ``batch_id``
        fencing skips whole re-delivered batches; (2) the per-row LSN
        guard (state keeps the hidden ``_lsn`` of the event that wrote
        each row) makes any stale or duplicated event a no-op, so even
        out-of-order batch delivery converges to the same final state.
        Only touched buckets are read and rewritten (copy-on-write).
        Sparse batches (change set ≤ ``broadcast_merge_threshold``)
        apply via :meth:`_merge_new_state`'s broadcast plan — the state
        side flows scan → broadcast join → write with zero shuffles,
        matching what Iceberg's storage-partitioned join gives the
        production path; dense batches fall back to one full-outer
        shuffle join (or use :meth:`merge_full`).
        """
        man = self.manifest()
        if batch_id <= self.last_batch_id(phase):
            return {"skipped": True, "version": man["version"], "batch_id": batch_id}

        schema = self.table_schema()
        new_version = man["version"] + 1
        changes = changes.withColumn("bucket", self._bucket_col())
        # Materialize the compacted change set ONCE: the same pass
        # yields touched buckets + change count (≤ n_buckets rows), and
        # the cached result feeds the merge join — without this the
        # upstream compaction shuffle would run three times.
        changes.persist()
        # one ≤n_buckets-row job yields touched buckets, change count,
        # AND a byte estimate (string payload lengths + 8B/scalar) that
        # gates the broadcast plan
        size_expr = F.lit(24)
        for c in schema.columns:
            if c["type"] == "string":
                size_expr = size_expr + F.coalesce(
                    F.octet_length(F.col(c["physical"])), F.lit(0)
                )
            else:
                size_expr = size_expr + F.lit(8)
        rows = (
            changes.groupBy("bucket")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(size_expr).alias("bytes"),
            )
            .collect()
        )
        bucket_counts = {r["bucket"]: r["cnt"] for r in rows}
        est_bytes = int(sum(r["bytes"] or 0 for r in rows))
        touched = sorted(bucket_counts)
        n_changes = int(sum(bucket_counts.values()))
        if truncate_lsn is not None:
            # every live bucket must be rewritten (or dropped)
            touched = sorted(
                set(touched) | {int(b) for b in man["files"]}
            )
        if frontier_fn is not None:
            # the action above materialized the engine's observed
            # per-partition metrics; pull offsets/lineage from them now,
            # still inside this commit
            offsets, lineage_rows, n_events, counters = frontier_fn()
            metrics = {**(metrics or {}), "events": n_events, **counters}
        files = dict(man["files"])
        if touched:
            old = self.read_state(buckets=touched, logical=False, with_sys=True)
            if truncate_lsn is not None:
                old = old.filter(F.col("_lsn") > truncate_lsn)
            use_bc = (
                n_changes <= self.broadcast_merge_threshold
                and est_bytes <= self.broadcast_merge_max_bytes
            )
            new_state = self._merge_new_state(
                old, changes, schema, broadcast=use_bc
            ).withColumn("bucket", self._bucket_col())
            out_dir = os.path.join(self.root, f"data/v{new_version}")
            # broadcast plan: no repartition either — the state flows
            # scan → broadcast-join → write with ZERO shuffles (tasks
            # align with the bucket-dir file splits at scale, so
            # partitionBy still emits ~one file per bucket)
            writer = (
                new_state
                if use_bc
                else new_state.repartition(max(len(touched), 1), "bucket")
            )
            (
                writer.write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(out_dir)
            )
            written = {
                int(n.split("=")[1])
                for n in os.listdir(out_dir)
                if n.startswith("bucket=")
            }
            for b in touched:
                if b in written:
                    files[str(b)] = {
                        "path": f"data/v{new_version}/bucket={b}",
                        "version": new_version,
                    }
                else:
                    # bucket emptied out entirely (all keys deleted)
                    files.pop(str(b), None)
        changes.unpersist()

        new_offsets = dict(man["offsets"])
        for k, v in (offsets or {}).items():
            new_offsets[str(k)] = max(int(v), int(new_offsets.get(str(k), -1)))
        phase_ids = {**man.get("last_batch_ids", {}), phase: batch_id}
        manifest = {
            "version": new_version,
            "batch_id": batch_id,
            "last_batch_id": max(int(man["last_batch_id"]), batch_id),
            "last_batch_ids": phase_ids,
            "files": files,
            "n_buckets": self.n_buckets,
            "schema": schema.columns,
            "schema_version": schema.version,
            "offsets": new_offsets,
            "metrics": {**(metrics or {}), "changes": n_changes},
            "ts": time.time(),
        }
        self._write_manifest(manifest)
        if lineage_rows:
            self._append_lineage(batch_id, lineage_rows, phase)
        return {"skipped": False, "version": new_version, "batch_id": batch_id}

    def _merge_new_state(
        self,
        old: DataFrame,
        changes: DataFrame,
        schema: TableSchema,
        broadcast: bool,
    ) -> DataFrame:
        """New state of the touched buckets after applying a KEY-UNIQUE
        compacted change set to ``old`` under the LSN guard.

        ``broadcast=True`` is the sparse-batch plan (the 10^10-scale
        steady state): the change set is small, so the big state side
        never shuffles —

            updates/deletes/carry: old LEFT JOIN broadcast(changes)
            inserts: changes ANTI broadcast(old-keys SEMI broadcast(changes))

        Every join builds on the broadcast side; the only scan of old
        beyond the main pass is a column-pruned (repo, path) key scan
        for insert detection. This is the parquet stand-in's proof of
        the claim that on Iceberg the merge is a storage-partitioned
        join: zero Exchange nodes on the state side (plan-pinned in
        test_plans).

        ``broadcast=False`` is the dense fallback: one full-outer
        shuffle join of both sides.
        """
        phys = [c["physical"] for c in schema.columns]
        types = {c["physical"]: c["type"] for c in schema.columns}
        non_key = [p for p in phys if p not in ("repo", "path")]
        retain = self.retain_tombstones
        o = old.select(
            "repo",
            "path",
            F.col("_lsn").alias("__o_lsn"),
            *[F.col(p).alias(f"__o_{p}") for p in non_key],
            *(
                [F.coalesce(F.col("_deleted"), F.lit(False)).alias("__o_del")]
                if retain
                else []
            ),
        )
        c = changes.select(
            "repo",
            "path",
            F.col("lsn").alias("__c_lsn"),
            F.col("op").alias("__c_op"),
            *[F.col(p).cast(types[p]).alias(f"__c_{p}") for p in non_key],
        )
        take = F.col("__c_lsn").isNotNull() & (
            F.col("__o_lsn").isNull() | (F.col("__c_lsn") > F.col("__o_lsn"))
        )
        deleted = take & (F.col("__c_op") == "d")
        picked = [
            "repo",
            "path",
            *[
                # a winning delete tombstones the row: values NULL so a
                # retained tombstone never leaks stale content
                (
                    F.when(deleted, F.lit(None).cast(types[p]))
                    .when(take, F.col(f"__c_{p}"))
                    .otherwise(F.col(f"__o_{p}"))
                    if retain
                    else F.when(take, F.col(f"__c_{p}")).otherwise(
                        F.col(f"__o_{p}")
                    )
                ).alias(p)
                for p in non_key
            ],
            F.when(take, F.col("__c_lsn"))
            .otherwise(F.col("__o_lsn"))
            .cast("bigint")
            .alias("_lsn"),
            *(
                [
                    F.when(take, F.col("__c_op") == "d")
                    .otherwise(F.coalesce(F.col("__o_del"), F.lit(False)))
                    .alias("_deleted")
                ]
                if retain
                else []
            ),
        ]
        if broadcast:
            upd = o.join(F.broadcast(c), ["repo", "path"], "left_outer")
            if not retain:
                upd = upd.filter(~deleted)
            upd = upd.select(*picked)
            # matched keys are ≤ |changes| rows — broadcastable for the
            # anti join, so insert detection costs only a key-pruned
            # scan of old, never a state-side shuffle
            matched = o.select("repo", "path").join(
                F.broadcast(c.select("repo", "path")),
                ["repo", "path"],
                "left_semi",
            )
            inserts = c.join(
                F.broadcast(matched), ["repo", "path"], "left_anti"
            )
            if not retain:
                # delete of a never-seen key is a no-op without
                # retention; WITH retention it must land as a tombstone
                # or a late lower-LSN insert would resurrect the key
                inserts = inserts.filter(F.col("__c_op") != "d")
            ins_del = F.col("__c_op") == "d"
            inserts = inserts.select(
                "repo",
                "path",
                *[
                    (
                        F.when(ins_del, F.lit(None).cast(types[p])).otherwise(
                            F.col(f"__c_{p}")
                        )
                        if retain
                        else F.col(f"__c_{p}")
                    ).alias(p)
                    for p in non_key
                ],
                F.col("__c_lsn").cast("bigint").alias("_lsn"),
                *([ins_del.alias("_deleted")] if retain else []),
            )
            return upd.unionByName(inserts)
        j = o.join(c, ["repo", "path"], "full_outer")
        survives = F.col("__o_lsn").isNotNull() | take
        if not retain:
            survives = ~deleted & survives
        return j.filter(survives).select(*picked)

    def merge_full(
        self,
        changes: DataFrame,
        batch_id: int,
        frontier_fn=None,
        metrics: dict | None = None,
        phase: str = "stream",
        truncate_lsn: int | None = None,
    ) -> dict:
        """Full-table merge-as-compaction — the dense-batch plan.
        ``truncate_lsn`` wipes state rows below it (see :meth:`merge`).

        When a batch touches most buckets (uniform update workloads,
        initial snapshot, backfills), the touched-bucket COW of
        :meth:`merge` degenerates to a full rewrite anyway but pays two
        extra jobs (bucket discovery + change-set cache). This path
        does the whole apply as ONE action:

            union(state rows as op='u' events at their stored _lsn,
                  change rows (op, lsn, physical cols) — possibly many
                  per key, compaction NOT required upstream)
            → LWW winner per (repo, path): either the light plan
              (argmax over a pruned (key, lsn, src) shuffle +
              broadcast winner fetch — payloads never shuffle; used
              when keys ≤ lww_light_threshold) or one wide max_by
              shuffle
            → drop winners whose op = 'd'
            → write, partitioned by bucket

        Ties on lsn break toward STATE (src=1), matching :meth:`merge`'s
        strict ``changes.lsn > state._lsn`` guard: an incremental-
        snapshot chunk stamped exactly at the watermark must NOT replace
        a row whose newest streamed update IS the watermark LSN — under
        the old event-wins tiebreak the two merge scopes disagreed on
        that case. Re-delivered identical events are unaffected either
        way. Fencing semantics match :meth:`merge`.
        """
        man = self.manifest()
        if batch_id <= self.last_batch_id(phase):
            return {"skipped": True, "version": man["version"], "batch_id": batch_id}

        schema = self.table_schema()
        new_version = man["version"] + 1
        phys = [c["physical"] for c in schema.columns]
        types = {c["physical"]: c["type"] for c in schema.columns}
        non_key = [p for p in phys if p not in ("repo", "path")]

        old = self.read_state(logical=False, with_sys=True)
        if truncate_lsn is not None:
            old = old.filter(F.col("_lsn") > truncate_lsn)
        retain = self.retain_tombstones
        # a retained state tombstone re-enters the election as the
        # delete event it came from, so it keeps guarding its key
        state_op = (
            F.when(F.coalesce(F.col("_deleted"), F.lit(False)), "d")
            .otherwise("u")
            if retain
            else F.lit("u")
        )
        o = old.select(
            state_op.alias("op"),
            F.col("_lsn").alias("lsn"),
            F.lit(1).alias("__src"),  # state wins lsn ties (strict guard)
            *[F.col(p) for p in phys],
        )
        c = changes.select(
            F.col("op"),
            F.col("lsn"),
            F.lit(0).alias("__src"),
            *[F.col(p).cast(types[p]).alias(p) for p in phys],
        )
        merged = o.unionByName(c)
        # Winner election, light plan (argmax pushdown): shuffle ONLY
        # (key, lsn, src) — a column-pruned pass the parquet scans
        # serve cheaply — then fetch the winning rows map-side with a
        # broadcast of the (small) winner set joined on the UNIQUE
        # identity (key, lsn, src). Full payloads never enter an
        # exchange: at ~2 KB/event this cuts per-batch shuffle bytes
        # ~6×, which is the guest-kernel/network path that caps replay
        # throughput. Falls back to the single wide max_by shuffle when
        # the key count exceeds the broadcastable threshold (the light
        # pass already paid is ~1/6 of the wide shuffle).
        # Precondition (engine invariant): (key, lsn, __src) is unique
        # — LSNs are unique per event, state contributes one row per
        # key, and the two halves of a PK-change split carry different
        # keys.
        win = None
        if self.lww_light_threshold:
            win = (
                merged.select("repo", "path", "lsn", "__src")
                .groupBy("repo", "path")
                .agg(F.max(F.struct("lsn", "__src")).alias("w"))
                .select(
                    "repo",
                    "path",
                    F.col("w.lsn").alias("lsn"),
                    F.col("w.__src").alias("__src"),
                )
            )
            win.persist()
            if win.count() > self.lww_light_threshold:
                win.unpersist()
                win = None
        if win is not None:
            new_state = merged.join(
                F.broadcast(win),
                ["repo", "path", "lsn", "__src"],
                "inner",
            )
            if not retain:
                new_state = new_state.filter(F.col("op") != "d")
            is_del = F.col("op") == "d"
            new_state = new_state.select(
                "repo",
                "path",
                *[
                    (
                        F.when(is_del, F.lit(None).cast(types[p])).otherwise(
                            F.col(p)
                        )
                        if retain
                        else F.col(p)
                    ).alias(p)
                    for p in non_key
                ],
                F.col("lsn").cast("bigint").alias("_lsn"),
                *([is_del.alias("_deleted")] if retain else []),
            ).withColumn("bucket", self._bucket_col())
        else:
            winner = F.max_by(
                F.struct(
                    F.col("op"),
                    F.col("lsn"),
                    *[F.col(p) for p in non_key],
                ),
                F.struct(F.col("lsn"), F.col("__src")),
            ).alias("w")
            new_state = merged.groupBy("repo", "path").agg(winner)
            if not retain:
                new_state = new_state.filter(F.col("w.op") != "d")
            w_del = F.col("w.op") == "d"
            new_state = new_state.select(
                "repo",
                "path",
                *[
                    (
                        F.when(w_del, F.lit(None).cast(types[p])).otherwise(
                            F.col(f"w.{p}")
                        )
                        if retain
                        else F.col(f"w.{p}")
                    ).alias(p)
                    for p in non_key
                ],
                F.col("w.lsn").cast("bigint").alias("_lsn"),
                *([w_del.alias("_deleted")] if retain else []),
            ).withColumn("bucket", self._bucket_col())
        out_dir = os.path.join(self.root, f"data/v{new_version}")
        (
            new_state.repartition(self.n_buckets, "bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(out_dir)
        )
        if win is not None:
            win.unpersist()
        written = {
            int(n.split("=")[1])
            for n in os.listdir(out_dir)
            if n.startswith("bucket=")
        }
        files = {
            str(b): {"path": f"data/v{new_version}/bucket={b}", "version": new_version}
            for b in sorted(written)
        }

        offsets, lineage_rows, n_events = {}, None, None
        if frontier_fn is not None:
            offsets, lineage_rows, n_events, counters = frontier_fn()
            metrics = {**(metrics or {}), "events": n_events, **counters}

        new_offsets = dict(man["offsets"])
        for k, v in (offsets or {}).items():
            new_offsets[str(k)] = max(int(v), int(new_offsets.get(str(k), -1)))
        phase_ids = {**man.get("last_batch_ids", {}), phase: batch_id}
        manifest = {
            "version": new_version,
            "batch_id": batch_id,
            "last_batch_id": max(int(man["last_batch_id"]), batch_id),
            "last_batch_ids": phase_ids,
            "files": files,
            "n_buckets": self.n_buckets,
            "schema": schema.columns,
            "schema_version": schema.version,
            "offsets": new_offsets,
            "metrics": {**(metrics or {}), "scope": "full"},
            "ts": time.time(),
        }
        self._write_manifest(manifest)
        if lineage_rows:
            self._append_lineage(batch_id, lineage_rows, phase)
        return {"skipped": False, "version": new_version, "batch_id": batch_id}

    # -- schema evolution ------------------------------------------------
    def apply_schema_change(self, change: dict) -> dict:
        """Commit a schema-only change (add / rename / widen) — no data
        rewrite, field-ids keep old files readable (Iceberg semantics;
        reference: schema-history replay,
        ``relational/history/SchemaHistory.java:34-101``)."""
        man = self.manifest()
        schema = self.table_schema().apply_change(change)
        manifest = {
            **man,
            "version": man["version"] + 1,
            "batch_id": None,
            "schema": schema.columns,
            "schema_version": schema.version,
            "metrics": {"schema_change": change["change_type"]},
            "ts": time.time(),
        }
        self._write_manifest(manifest)
        return manifest

    # -- offsets / lineage -------------------------------------------------
    def committed_offsets(self) -> dict[int, int]:
        return {int(k): int(v) for k, v in self.manifest()["offsets"].items()}

    def last_batch_id(self, phase: str | None = None) -> int:
        """Highest committed batch id — per phase (snapshot / stream /
        incremental keep independent monotone fences so an interleaved
        incremental snapshot cannot fence out later stream batches), or
        the global max when ``phase`` is None."""
        m = self.manifest()
        if phase is not None:
            return int(m.get("last_batch_ids", {}).get(phase, -1))
        ids = [int(v) for v in m.get("last_batch_ids", {}).values()]
        ids.append(int(m["last_batch_id"]))
        return max(ids)

    def _append_lineage(
        self, batch_id: int, rows: list[dict], phase: str = "stream"
    ) -> None:
        path = os.path.join(
            self._lineage_dir, f"{phase}_{batch_id:08d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, path)

    def lineage(self) -> list[dict]:
        rows = []
        for n in sorted(os.listdir(self._lineage_dir)):
            if n.endswith(".json"):
                with open(os.path.join(self._lineage_dir, n)) as f:
                    rows.extend(json.loads(line) for line in f if line.strip())
        return rows
