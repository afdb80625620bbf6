"""Product-quantization semantics: codebook determinism, nearest-
centroid encoding, ADC exactness when every vector is a centroid, and
the scan's plan shape (broadcast LUT, corpus never sort-merge joined)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debezium_spark.functions import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    # dim 4, n_sub 2 → sub_dim 2; well-separated clusters per sub-space
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),
        (1, [0.9, 0.1, 0.1, 0.9]),
        (2, [-1.0, 0.0, 1.0, -1.0]),
        (3, [-0.9, 0.1, 0.9, -1.1]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


def test_codebook_shape_and_determinism(spark, vecs):
    c1 = S.pq_codebook(vecs, dim=4, n_sub=2).collect()
    c2 = S.pq_codebook(vecs, dim=4, n_sub=2).collect()
    assert sorted(map(tuple, c1)) == sorted(map(tuple, c2))
    # k defaults to min(256, n)=4 → 4 ranks × 2 sub-spaces
    assert len(c1) == 8
    assert {r["m"] for r in c1} == {0, 1}
    assert {r["j"] for r in c1} == {1, 2, 3, 4}
    assert all(len(r["cv"]) == 2 for r in c1)


def test_encode_picks_nearest_centroid(spark, vecs):
    # with k=2 the codebook is 2 sampled vectors; every row must code
    # to the sample whose sub-vector is L2-closest
    cent = S.pq_codebook(vecs, dim=4, n_sub=2, k=2)
    crows = cent.collect()
    cb = {(r["m"], r["j"]): r["cv"] for r in crows}
    codes = {
        r["nbr_id"]: r["code"]
        for r in S.pq_encode(vecs, cent, dim=4, n_sub=2).collect()
    }
    data = {r["vec_id"]: r["v"] for r in vecs.collect()}
    for vid, v in data.items():
        for m in (0, 1):
            sub = v[m * 2 : m * 2 + 2]
            best = min(
                (j for (mm, j) in cb if mm == m),
                key=lambda j: (
                    sum((a - b) ** 2 for a, b in zip(sub, cb[(m, j)])),
                    j,
                ),
            )
            assert codes[vid][m] == best, (vid, m)


def test_adc_exact_when_all_vectors_are_centroids(spark, vecs):
    # k = n → every vector is its own nearest codebook entry, so the
    # ADC ranking equals the exact integer inner-product ranking
    cent = S.pq_codebook(vecs, dim=4, n_sub=2)
    codes = S.pq_encode(vecs, cent, dim=4, n_sub=2)
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    got = S.pq_topk(codes, q, cent, dim=4, n_sub=2, k=3).collect()
    data = {r["vec_id"]: r["v"] for r in vecs.collect()}
    exact = sorted(
        (
            (
                -sum(
                    # per-sub-space floor(·1e6), like the LUT
                    int(__import__("math").floor(
                        sum(a * b for a, b in zip(
                            data[0][m * 2 : m * 2 + 2],
                            v[m * 2 : m * 2 + 2]))
                        * 1e6))
                    for m in (0, 1)
                ),
                vid,
            )
            for vid, v in data.items()
            if vid != 0
        )
    )
    assert [r["nbr_id"] for r in got] == [vid for _, vid in exact]
    assert [r["ip6"] for r in got] == [-ip for ip, _ in exact]


def test_pq_scan_plan_broadcasts_lut_no_sortmerge(spark, vecs):
    cent = S.pq_codebook(vecs, dim=4, n_sub=2)
    codes = S.pq_encode(vecs, cent, dim=4, n_sub=2)
    q = vecs.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    plan = (
        S.pq_topk(codes, q, cent, dim=4, n_sub=2, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_pq_encode_carry_passthrough(spark, vecs):
    cent = S.pq_codebook(vecs, dim=4, n_sub=2, k=2)
    tagged = vecs.withColumn("cell", F.col("vec_id") % 2)
    out = S.pq_encode(
        tagged, cent, dim=4, n_sub=2, carry=("cell",)
    ).collect()
    assert {r["nbr_id"]: r["cell"] for r in out} == {
        0: 0, 1: 1, 2: 0, 3: 1
    }
    assert all(len(r["code"]) == 2 for r in out)


def test_ivfpq_subset_of_pq_ranking(spark):
    # IVFPQ with every cell probed must equal plain PQ ADC ranking
    # (same codebooks, same integer sums) — cell pruning only removes
    # candidates, never rescores them
    rows = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(4)])
            for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    full = S.ann_ivfpq_topk(
        df, q, dim=4, n_sub=2, k=3, nprobe=10**6, max_cell=None,
        n_centroids=4,
    ).collect()
    cent = S.pq_codebook(df, dim=4, n_sub=2)
    codes = S.pq_encode(df, cent, dim=4, n_sub=2)
    plain = S.pq_topk(codes, q, cent, dim=4, n_sub=2, k=3).collect()
    assert sorted((r["query_id"], r["rank"], r["nbr_id"], r["ip6"])
                  for r in full) == \
           sorted((r["query_id"], r["rank"], r["nbr_id"], r["ip6"])
                  for r in plain)
