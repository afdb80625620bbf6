"""Incremental near-dup: arrival batches probe the existing corpus LSH
index (dedup.incremental_lsh_dedup) — semantics + broadcast-join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.functions.dedup import incremental_lsh_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest looking for food and water all day long"
)


def test_exact_duplicate_arrival_matches_index(spark):
    index = _docs(spark, [(1, BASE), (2, "completely unrelated words here xyz abc")])
    arrivals = _docs(spark, [(100, BASE), (101, "nothing in common with anything qq ww ee rr tt yy uu ii oo pp")])
    out = {
        r["id"]: r.asDict()
        for r in incremental_lsh_dedup(
            index, arrivals, num_hashes=8, bands=4
        ).collect()
    }
    assert set(out) == {100, 101}
    assert out[100]["is_dup"] and out[100]["matched_id"] == 1
    assert out[100]["est_jaccard"] == 1.0
    assert not out[101]["is_dup"] and out[101]["matched_id"] is None


def test_tie_breaks_toward_smallest_index_id(spark):
    index = _docs(spark, [(7, BASE), (3, BASE)])
    arrivals = _docs(spark, [(100, BASE)])
    (row,) = incremental_lsh_dedup(index, arrivals, num_hashes=8, bands=4).collect()
    assert row["matched_id"] == 3 and row["is_dup"]


def test_no_index_vs_index_work_and_empty_arrival_text(spark):
    # an arrival with no shingles still gets an output row (not dropped)
    index = _docs(spark, [(1, BASE)])
    arrivals = _docs(spark, [(100, ""), (101, BASE)])
    out = {r["id"]: r.asDict() for r in incremental_lsh_dedup(index, arrivals).collect()}
    assert set(out) == {100, 101}
    assert not out[100]["is_dup"]
    assert out[101]["is_dup"]


def test_probe_join_is_broadcast(spark):
    """The index side must meet the arrival batch through a broadcast
    hash join — no sort-merge exchange of index rows at probe time."""
    index = _docs(spark, [(i, f"{BASE} {i}") for i in range(1, 40)])
    arrivals = _docs(spark, [(100, BASE)])
    plan = (
        incremental_lsh_dedup(index, arrivals, num_hashes=8, bands=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_string_ids_tie_break_smallest(spark):
    """id-type-agnostic election: string ids order lexicographically,
    ties still break toward the smallest index id."""
    index = spark.createDataFrame(
        [("doc-7", BASE), ("doc-3", BASE)], "doc_id string, text string"
    )
    arrivals = spark.createDataFrame(
        [("new-1", BASE)], "doc_id string, text string"
    )
    (row,) = incremental_lsh_dedup(
        index, arrivals, num_hashes=8, bands=4
    ).collect()
    assert row["is_dup"] and row["matched_id"] == "doc-3"
