"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship CDC replay; ``queries`` /
``oracle_sql`` expose the operator catalog from
:mod:`debezium_spark.queries` (one entry per SURVEY.md §2 operator,
each with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from debezium_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC engine replay (snapshot → LSN-ordered change
    stream → LWW compaction → fenced merge) to final table state with
    per-row content sha256 — the north_rule invariant."""
    return _catalog.cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
