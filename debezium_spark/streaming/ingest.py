"""Streaming corpus ingest — the CDC-fed training-data gate as a live
Structured Streaming job.

Batch twin: the ``pipeline_incremental_ingest`` catalog query. This
module runs the same keep-or-drop decision per micro-batch of newly
arrived documents: near-dup probe against a PERSISTED banded LSH index
(built once with :func:`build_lsh_index`; per-batch cost is one
broadcast join — the index is never re-signed, never reshuffled), then
token-count and language gates, then an append-only decisions sink.

Reference analogue: Debezium ends at the topic; a training pipeline's
consumer makes exactly this per-record admission decision downstream.
Owning it in-engine is the same ownership shift as the sessionization
and tumbling-window twins (streaming/sessions.py).

Scale shape per micro-batch: arrivals are batch-sized by construction,
so their banded keys broadcast; the stored index side joins
shuffle-free (and bucketed storage by (band, bkey) prunes the scan at
corpus scale). Decisions append with exactly-once file-sink semantics
under the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.functions.dedup import banded_signature, probe_lsh_index
from debezium_spark.functions.text import token_count

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def build_lsh_index(
    index_df: DataFrame,
    path: str,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    max_bucket: int | None = 64,
) -> None:
    """Persist the banded LSH index once; the signature aggregation is
    paid here, not per micro-batch. At corpus scale, write this
    bucketed by (band, bkey) so probes read matching buckets only.

    ``max_bucket`` bounds every (band, bkey) bucket's population at
    build time (keep the smallest ids — deterministic), the same
    bounded-bucket discipline as the capped n-gram postings and simhash
    buckets: a degenerate band key (near-empty documents, boilerplate)
    would otherwise make every probe that hits it emit O(bucket)
    candidates, growing linearly with corpus size. A capped bucket can
    only miss matches against the dropped members of already-saturated
    (hence already heavily duplicated) buckets — the standard LSH
    population-cap trade. ``None`` disables the cap."""
    from pyspark.sql.window import Window

    banded = banded_signature(index_df, num_hashes, bands, n)
    if max_bucket is not None:
        w = Window.partitionBy("band", "bkey").orderBy("id")
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_bucket)
            .drop("_rn")
        )
    banded.write.mode("overwrite").parquet(path)


def ingest_decisions(
    arrivals: DataFrame,
    index_banded: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en", "es"),
) -> DataFrame:
    """One batch of arrivals → one decision row per arrival
    (drop_dup > drop_short > drop_lang > ingest) — the exact logic of
    the ``pipeline_incremental_ingest`` oracle, factored so the batch
    query and the streaming job share it."""
    dup = probe_lsh_index(
        index_banded,
        arrivals,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        threshold=threshold,
    ).select(F.col("id").alias("doc_id"), "is_dup")
    feats = arrivals.select(
        "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
    )
    return feats.join(F.broadcast(dup), "doc_id").select(
        "doc_id",
        "lang",
        "n_tokens",
        "is_dup",
        F.when(F.col("is_dup"), "drop_dup")
        .when(F.col("n_tokens") < min_tokens, "drop_short")
        .when(~F.col("lang").isin(*langs), "drop_lang")
        .otherwise("ingest")
        .alias("decision"),
    )


def run_streaming_ingest(
    spark: SparkSession,
    arrivals_path: str,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    **gate_kwargs,
) -> None:
    """Tail an arrivals directory; per micro-batch, decide and append.
    availableNow + checkpoint give exactly-once decision rows across
    restarts (file-sink transaction log)."""
    index_banded = spark.read.parquet(index_path)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(arrivals_path)
    )

    def decide(batch_df: DataFrame, epoch_id: int) -> None:
        (
            ingest_decisions(batch_df, index_banded, **gate_kwargs)
            .withColumn("epoch", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )

    q = (
        stream.writeStream.foreachBatch(decide)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
