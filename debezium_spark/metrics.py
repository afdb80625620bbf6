"""Pipeline metrics — the JMX MXBean surface, computed from commit
artifacts.

Reference: ``pipeline/metrics/`` — snapshot and streaming metrics beans
(``traits/CommonEventMetricsMXBean.java``,
``traits/StreamingMetricsMXBean.java``,
``traits/SnapshotMetricsMXBean.java``) exposed over JMX per connector
task.

Spark re-expression: there is no JMX; every number the beans expose is
derivable from what the engine already persists — per-commit manifest
metrics (op/tx counters observed on the merge job itself), lineage
rows, and the notification log. :class:`PipelineMetrics` reads those
artifacts back and presents the reference's names. Driver-side metadata
reads only — O(versions) small JSON files, no Spark jobs.
"""

from __future__ import annotations

import time

from debezium_spark import notifications as N

TABLE_NAME = "repo_files"


class PipelineMetrics:
    def __init__(self, lake, notifications=None):
        self.lake = lake
        self.notifications = notifications

    # -- internals --------------------------------------------------------
    def _commits(self, phases: tuple[str, ...]) -> list[dict]:
        out = []
        for v in self.lake.versions():
            man = self.lake.manifest(v)
            mt = man.get("metrics") or {}
            if mt.get("phase") in phases and "events" in mt:
                out.append(mt)
        return out

    @staticmethod
    def _sum(commits: list[dict], key: str) -> int:
        return sum(int(c.get(key) or 0) for c in commits)

    @staticmethod
    def _tx_total(commits: list[dict]) -> int:
        """Distinct transactions across batches: per-batch
        approx-distinct sums minus boundary straddles — a transaction
        whose events span two LSN-window batches (txs are contiguous
        in commit order) would otherwise be counted once per batch."""
        total, prev_last = 0, None
        for c in commits:
            total += int(c.get("committed_tx_approx") or 0)
            if (
                prev_last is not None
                and c.get("first_tx_id") is not None
                and c["first_tx_id"] == prev_last
            ):
                total -= 1
            if c.get("last_tx_id") is not None:
                prev_last = c["last_tx_id"]
        return total

    # -- StreamingMetricsMXBean + CommonEventMetricsMXBean ----------------
    def streaming(self) -> dict:
        """Streaming metrics under the reference bean's attribute names
        (StreamingMetricsMXBean.java:13-27,
        CommonEventMetricsMXBean.java:13-27). ``NumberOfEventsFiltered``
        counts rows dropped by the dispatcher filter chain (tombstones,
        skipped operations, table filters) — erroneous rows are
        reported separately, as in the reference.
        ``NumberOfCommittedTransactions`` is an approx_count_distinct
        sum (exact per-batch distinct would add a shuffle to the hot
        path for a monitoring number)."""
        commits = self._commits(("stream",))
        seen = self._sum(commits, "events")
        erroneous = self._sum(commits, "events_erroneous")
        survived = self._sum(commits, "events_survived")
        last = commits[-1] if commits else {}
        now_ms = int(time.time() * 1000)
        last_ts = last.get("max_source_ts_ms")
        return {
            "Connected": self.lake.exists(),
            "TotalNumberOfEventsSeen": seen,
            "TotalNumberOfCreateEventsSeen": self._sum(commits, "events_create"),
            "TotalNumberOfUpdateEventsSeen": self._sum(commits, "events_update"),
            "TotalNumberOfDeleteEventsSeen": self._sum(commits, "events_delete"),
            "NumberOfEventsFiltered": max(seen - survived - erroneous, 0),
            "NumberOfErroneousEvents": erroneous,
            "LastEvent": last_ts,
            # -1 = no event ever seen (the reference's unset value) —
            # 0 would read as "an event arrived this instant" and a
            # dead pipeline would never trip staleness alerts
            "MilliSecondsSinceLastEvent": (
                now_ms - int(last["commit_wall_ms"])
                if last.get("commit_wall_ms")
                else -1
            ),
            "MilliSecondsBehindSource": (
                int(last["commit_wall_ms"]) - int(last_ts)
                if last.get("commit_wall_ms") and last_ts is not None
                else -1
            ),
            "SourceEventPosition": {
                str(p): int(lsn)
                for p, lsn in self.lake.committed_offsets().items()
            },
            "NumberOfCommittedTransactions": self._tx_total(commits),
            "LastTransactionId": last.get("last_tx_id"),
        }

    # -- SnapshotMetricsMXBean --------------------------------------------
    def snapshot(self) -> dict:
        """Snapshot metrics (SnapshotMetricsMXBean.java:13-41) from the
        notification log's lifecycle records + snapshot-phase commits.
        Single-table engine: TotalTableCount is 1 and RowsScanned keys
        on the one captured table."""
        recs = self.notifications.read() if self.notifications else []
        initial = [r for r in recs if r["aggregate_type"] == N.INITIAL_SNAPSHOT]
        incr = [
            r for r in recs if r["aggregate_type"] == N.INCREMENTAL_SNAPSHOT
        ]
        types = {r["type"] for r in initial}
        started = [r for r in initial if r["type"] == N.STARTED]
        ended = [
            r
            for r in initial
            if r["type"] in (N.COMPLETED, N.ABORTED)
        ]
        completed = N.COMPLETED in types
        aborted = N.ABORTED in types and not completed
        running = bool(started) and not (completed or aborted)
        duration_s = 0
        if started and ended:
            duration_s = max(
                (ended[-1]["ts_ms"] - started[0]["ts_ms"]) // 1000, 0
            )
        snap_commits = self._commits(("snapshot", "incremental"))
        rows_read = self._sum(snap_commits, "events_read")
        last_chunk = next(
            (
                r
                for r in reversed(incr)
                if r["type"] == N.IN_PROGRESS and "chunk" in r["additional_data"]
            ),
            None,
        )
        return {
            "CapturedTables": [TABLE_NAME],
            "TotalTableCount": 1,
            "RemainingTableCount": 1 if running else 0,
            "SnapshotRunning": running,
            "SnapshotPaused": False,
            "SnapshotCompleted": completed,
            "SnapshotAborted": aborted,
            "SnapshotDurationInSeconds": duration_s,
            "RowsScanned": {TABLE_NAME: rows_read},
            "ChunkId": (
                f"incr-{last_chunk['additional_data']['chunk']}"
                if last_chunk
                else None
            ),
            "ChunkFrom": None,
            "ChunkTo": (
                last_chunk["additional_data"].get("to_key")
                if last_chunk
                else None
            ),
        }
