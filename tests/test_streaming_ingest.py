"""Streaming corpus ingest (streaming/ingest.py): live micro-batch
keep-or-drop decisions against a persisted LSH index, equivalent to the
batch pipeline_incremental_ingest decision kernel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from debezium_spark.streaming.ingest import (
    build_lsh_index,
    ingest_decisions,
    run_streaming_ingest,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest looking for food and water all day long"
)
SHORT = "too few words here"
FRENCH = (
    "le renard brun rapide saute par dessus le chien paresseux puis court "
    "au loin dans la foret verte profonde cherchant nourriture et eau"
)


def _index(spark):
    return spark.createDataFrame(
        [(i, f"{BASE} tail {i}", "en") for i in range(1, 9)]
        + [(9, BASE, "en")],
        "doc_id long, text string, lang string",
    )


def _arrivals(spark):
    return spark.createDataFrame(
        [
            (100, BASE, "en"),          # near-dup of 9 -> drop_dup
            (101, SHORT, "en"),         # -> drop_short
            (102, FRENCH, "fr"),        # -> drop_lang
            (103, FRENCH + " mais en anglais marque", "en"),  # -> ingest
        ],
        "doc_id long, text string, lang string",
    )


def test_streaming_matches_batch_decisions(spark, tmp_root):
    """Two arrival files tailed one per micro-batch produce exactly the
    batch kernel's decisions, each row stamped with its epoch."""
    idx_path = os.path.join(tmp_root, "lsh_index")
    arr_path = os.path.join(tmp_root, "arrivals")
    out_path = os.path.join(tmp_root, "decisions")
    build_lsh_index(_index(spark), idx_path)

    arr = _arrivals(spark)
    os.makedirs(arr_path)
    arr.filter(F.col("doc_id") < 102).coalesce(1).write.mode(
        "append"
    ).parquet(arr_path)
    arr.filter(F.col("doc_id") >= 102).coalesce(1).write.mode(
        "append"
    ).parquet(arr_path)

    run_streaming_ingest(
        spark,
        arr_path,
        idx_path,
        out_path,
        checkpoint_dir=os.path.join(tmp_root, "ckpt"),
        max_files_per_trigger=1,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in spark.read.parquet(out_path).collect()
    }
    want = {
        r["doc_id"]: r.asDict()
        for r in ingest_decisions(
            arr, spark.read.parquet(idx_path)
        ).collect()
    }
    assert set(got) == set(want) == {100, 101, 102, 103}
    for k in want:
        g = {x: got[k][x] for x in ("lang", "n_tokens", "is_dup", "decision")}
        w = {x: want[k][x] for x in ("lang", "n_tokens", "is_dup", "decision")}
        assert g == w, k
    assert got[100]["decision"] == "drop_dup"
    assert got[101]["decision"] == "drop_short"
    assert got[102]["decision"] == "drop_lang"
    assert got[103]["decision"] == "ingest"
    # one decision per arrival exactly once, across 2+ epochs
    assert len({got[k]["epoch"] for k in got}) >= 2


def test_restart_does_not_redecide(spark, tmp_root):
    """availableNow + checkpoint: a second run over the same directory
    appends nothing new (file-source offsets are committed)."""
    idx_path = os.path.join(tmp_root, "lsh_index")
    arr_path = os.path.join(tmp_root, "arrivals")
    out_path = os.path.join(tmp_root, "decisions")
    ckpt = os.path.join(tmp_root, "ckpt")
    build_lsh_index(_index(spark), idx_path)
    os.makedirs(arr_path)
    _arrivals(spark).coalesce(1).write.mode("append").parquet(arr_path)

    run_streaming_ingest(spark, arr_path, idx_path, out_path, ckpt)
    n1 = spark.read.parquet(out_path).count()
    run_streaming_ingest(spark, arr_path, idx_path, out_path, ckpt)
    n2 = spark.read.parquet(out_path).count()
    assert n1 == n2 == 4


def test_index_bucket_population_cap(spark, tmp_root):
    """build_lsh_index bounds every (band, bkey) bucket at max_bucket,
    keeping the smallest ids — a degenerate band key cannot make probe
    candidates grow with corpus size."""
    import os as _os

    # 30 identical docs -> every band bucket holds all 30 uncapped
    dup_corpus = spark.createDataFrame(
        [(i, BASE, "en") for i in range(30)],
        "doc_id long, text string, lang string",
    )
    p = _os.path.join(tmp_root, "capped_idx")
    build_lsh_index(dup_corpus, p, max_bucket=5)
    idx = spark.read.parquet(p)
    sizes = idx.groupBy("band", "bkey").count().collect()
    assert sizes and all(r["count"] <= 5 for r in sizes)
    kept = {r["id"] for r in idx.select("id").distinct().collect()}
    assert kept == set(range(5))  # smallest ids kept, deterministic
    # probing still finds the duplicates via the surviving members
    arr = spark.createDataFrame(
        [(100, BASE, "en")], "doc_id long, text string, lang string"
    )
    from debezium_spark.streaming.ingest import ingest_decisions

    (row,) = ingest_decisions(arr, idx).collect()
    assert row["decision"] == "drop_dup"
