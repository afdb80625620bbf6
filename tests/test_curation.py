"""Embedding-space corpus curation: SemDeDup + SSL-prototype pruning.

Both build on the shared deterministic IVF cell assignment
(similarity.ivf_assign — md5-sampled codebook, flat/routed argmax).
Contracts: the SemDeDup keep-rule (most-prototypical survivor,
deterministic tie-breaks), full-corpus output coverage, the exact
integer prune rule, and bounded-by-construction candidate work
(capped-postings pair stage, no cartesian on the data path).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from debezium_spark.functions.similarity import (
    semdedup,
    ssl_prototype_prune,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_semdedup_keeps_most_prototypical_of_dup_pair(spark):
    # two exact duplicates (cos=1.0) + two distinct singletons; with
    # identical vectors cs6 ties, so the LOWER id must survive
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = semdedup(
        _corpus(spark, rows), tau6=990000, n_centroids=4
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == 4  # every corpus doc gets a verdict row
    assert by_id[1]["kept"] == 1
    assert by_id[2]["kept"] == 0
    assert by_id[3]["kept"] == 1 and by_id[4]["kept"] == 1
    # duplicates landed in the same cell (sanity of the premise)
    assert by_id[1]["cid"] == by_id[2]["cid"]


def test_semdedup_below_threshold_keeps_everything(spark):
    rows = [
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.4, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    out = semdedup(
        _corpus(spark, rows), tau6=999999, n_centroids=2
    ).collect()
    assert all(r["kept"] == 1 for r in out)


def test_semdedup_deterministic(spark):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)]) for i in range(20)]
    df = _corpus(spark, rows)
    a = sorted(map(tuple, semdedup(df, tau6=900000, n_centroids=4).collect()))
    b = sorted(map(tuple, semdedup(df, tau6=900000, n_centroids=4).collect()))
    assert a == b


def test_semdedup_no_cartesian_on_data_path(spark):
    # candidate pairs come from the capped-postings groupBy (join-
    # free); the only nested-loop is the broadcast codebook assignment
    rows = [(i, [float((i * 3 + j) % 7) for j in range(4)]) for i in range(12)]
    plan = semdedup(
        _corpus(spark, rows), n_centroids=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ssl_prune_exact_quarter_rule(spark):
    # one cell of 8 near-identical vectors around an axis: prune rule
    # rank*4 <= cnt*1 -> exactly floor(8/4)=2 pruned, and they must be
    # the two MOST prototypical (highest similarity to centroid)
    rows = [(i, [100.0 - i, float(i), 0.0, 0.0]) for i in range(8)]
    out = ssl_prototype_prune(
        _corpus(spark, rows), drop_num=1, drop_den=4, n_centroids=1
    ).collect()
    assert len(out) == 8
    pruned = sorted(r["vec_id"] for r in out if r["pruned"] == 1)
    ranked = sorted(out, key=lambda r: r["cell_rank"])
    assert len(pruned) == 2
    assert sorted(r["vec_id"] for r in ranked[:2]) == pruned
    # prototypicality ordering is by cent_sim6 desc
    sims = [r["cent_sim6"] for r in ranked]
    assert sims == sorted(sims, reverse=True)


def test_ssl_prune_small_cells_untouched(spark):
    # cells of size < drop_den never lose a member under 1/4 pruning
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    out = ssl_prototype_prune(
        _corpus(spark, rows), drop_num=1, drop_den=4, n_centroids=2
    ).collect()
    assert all(r["pruned"] == 0 for r in out)


def test_ssl_prune_window_single_exchange_after_assignment(spark):
    # both window functions (rank + count) share partitionBy(cid):
    # exactly ONE cid exchange feeds them — the rule never adds a
    # second shuffle on top of the assignment
    rows = [(i, [float((i * 5 + j) % 9) for j in range(4)]) for i in range(16)]
    plan = ssl_prototype_prune(
        _corpus(spark, rows), n_centroids=4
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(cid") == 1
    assert "CartesianProduct" not in plan


def test_d4_prune_composes_dedup_then_survivor_rank(spark):
    from debezium_spark.functions.similarity import d4_prune

    # cell of 4 near-identical vectors: semdedup keeps the most
    # prototypical one of each tau-similar pair chain; the prune stage
    # then ranks ONLY survivors. With drop 1/2 over the survivors, the
    # top-ranked survivor is pruned, the rest kept.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # dup of 1 -> drop_dup
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = {
        r["vec_id"]: r["decision"]
        for r in d4_prune(
            _corpus(spark, rows), tau6=990000, n_centroids=1,
            drop_num=1, drop_den=2,
        ).collect()
    }
    assert out[2] == "drop_dup"
    assert sorted(out.values()).count("drop_dup") == 1
    # one shared cell -> 3 survivors; drop 1/2 prunes survivor rank 1
    # only (rank*2 <= 3), so exactly one prune_proto and two keeps —
    # and the dup does NOT occupy a survivor rank
    survivors = [v for k, v in out.items() if k != 2]
    assert survivors.count("prune_proto") == 1
    assert survivors.count("keep") == 2


def test_d4_prune_verdict_is_total_and_consistent_with_parts(spark):
    from debezium_spark.functions.similarity import (
        d4_prune,
        semdedup,
    )

    rows = [(i, [float((i * 7 + j * 3) % 5), 1.0, float(j)])
            for i in range(1, 13) for j in (0,)]
    corpus = _corpus(spark, rows)
    d4 = {r["vec_id"]: r for r in d4_prune(
        corpus, tau6=990000, n_centroids=4).collect()}
    sd = {r["vec_id"]: r for r in semdedup(
        corpus, tau6=990000, n_centroids=4).collect()}
    assert set(d4) == set(sd)  # one verdict per corpus vector
    for vid, row in d4.items():
        if sd[vid]["kept"] == 0:
            assert row["decision"] == "drop_dup"
        else:
            assert row["decision"] in ("prune_proto", "keep")
