"""Two-level routed IVF assignment (the ≥10^7-vector scale path).

With C ∝ √n (auto_centroid_count's FAISS-style rule) the flat
assignment pass is n·C dots; past C ≈ 10^3 the router cuts it to
≈ n·2√C. Routing is an approximation (hierarchical quantizers may
land a row one cell off the global argmax), so the contracts here are
determinism, exactness of the REPORTED similarities, and sane overlap
with the flat assignment — not bit-equality with it.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from debezium_spark.functions.similarity import (
    ann_ivf_topk,
    auto_centroid_count,
    cosine,
)


def _fixture(spark, n=3000, dim=16):
    cols = [
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1000)).cast(
                "double"
            )
            / 500.0
            - 1.0
        )
        for i in range(dim)
    ]
    e = spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    return e, q


def test_auto_centroid_count_sqrt_rule():
    # smallest rung ≥ 4√n — assignment n·C ∝ n^1.5, never O(n²)
    assert auto_centroid_count(16) == 16
    assert auto_centroid_count(500) == 256
    assert auto_centroid_count(2000) == 256
    assert auto_centroid_count(65536) == 1024
    assert auto_centroid_count(10**8) == 65536
    assert auto_centroid_count(10**10) == 262144
    # C stays sublinear: even at 10^10 the codebook is ~2.6e5, so the
    # broadcast stays MBs, and mean cell is n/C ≈ 4e4 (probe-bounded
    # further by max_cell)
    assert auto_centroid_count(10**10) ** 2 <= 16 * 10**10


def test_routed_assignment_deterministic_exact_and_sane(spark):
    e, q = _fixture(spark)
    kw = dict(k=5, n_centroids=1024, nprobe=4, max_cell=128)
    routed1 = ann_ivf_topk(e, q, route_threshold=1024, **kw).collect()
    routed2 = ann_ivf_topk(e, q, route_threshold=1024, **kw).collect()
    assert sorted(map(tuple, routed1)) == sorted(map(tuple, routed2))
    assert routed1  # non-empty

    # reported similarities are EXACT (floor(1e4·cos) of the true
    # vectors) — routing approximates candidate selection, never the
    # returned scores
    res = spark.createDataFrame(
        routed1, "query_id long, nbr_id long, rank long, sim_dmil long"
    )
    ev = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qv = e.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    chk = (
        res.join(ev, res.nbr_id == ev.vec_id)
        .join(qv, res.query_id == qv.qid)
        .select(
            "query_id",
            "nbr_id",
            "sim_dmil",
            F.floor(cosine(F.col("qv"), F.col("v")) * 1e4)
            .cast("long")
            .alias("true_dmil"),
        )
    )
    assert chk.filter("sim_dmil <> true_dmil").count() == 0

    # ranks are contiguous from 1 and ordered by (sim desc, id)
    per_q: dict = {}
    for r in routed1:
        per_q.setdefault(r["query_id"], []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r["sim_dmil"], r["nbr_id"]) for r in rows]
        assert keys == sorted(keys)

    # the router lands in the same neighborhood as the flat argmax for
    # a healthy share of results (loose bound: hierarchical routing on
    # near-uniform random vectors is the worst case)
    flat = ann_ivf_topk(e, q, route_threshold=1 << 30, **kw).collect()
    s_r = {(r["query_id"], r["nbr_id"]) for r in routed1}
    s_f = {(r["query_id"], r["nbr_id"]) for r in flat}
    assert len(s_r & s_f) >= len(s_f) * 0.2
