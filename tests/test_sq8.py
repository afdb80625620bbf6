"""SQ8 scalar quantization semantics: code range/rounding, degenerate
dimensions, and agreement of the quantized top-k with the exact float
ranking on well-separated fixtures."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from debezium_spark.functions import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 5.0]),
        (1, [0.9, 0.1, 5.0]),   # near 0
        (2, [-1.0, 1.0, 5.0]),  # far from 0
        (3, [0.0, 0.5, 5.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


def test_sq8_stats_and_quantize(spark, vecs):
    mns, mxs = S.sq8_stats(vecs, "v")
    assert mns == [-1.0, 0.0, 5.0] and mxs == [1.0, 1.0, 5.0]
    codes = vecs.select(
        "vec_id", S.sq8_quantize(F.col("v"), mns, mxs).alias("c")
    ).collect()
    got = {r["vec_id"]: r["c"] for r in codes}
    # endpoints hit 0/255; midpoint floor(+0.5) rounding; degenerate
    # third dim (mn == mx) codes to 0
    assert got[0] == [255, 0, 0]
    assert got[2] == [0, 255, 0]
    assert got[3] == [128, 128, 0]  # floor(0.5*255+0.5)=128 both dims
    assert all(0 <= x <= 255 for c in got.values() for x in c)


def test_sq8_topk_matches_exact_ranking(spark, vecs):
    mns, mxs = S.sq8_stats(vecs, "v")
    codes = vecs.select(
        "vec_id", S.sq8_quantize(F.col("v"), mns, mxs).alias("c")
    )
    corpus = codes.select(
        F.col("vec_id").alias("nbr_id"), F.col("c").alias("qv8")
    )
    q = codes.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("c").alias("qq8")
    )
    out = S.sq8_topk(corpus, q, k=3).collect()
    assert [r["nbr_id"] for r in out] == [1, 3, 2]  # exact-float order
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["qsim_dmil"] > out[-1]["qsim_dmil"]


def test_sq8_zero_norm_guard(spark):
    # a corpus vector that quantizes to all-zero codes must sort last
    # with the sentinel similarity, not crash on divide-by-zero
    rows = [(0, [1.0, 1.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    mns, mxs = S.sq8_stats(df, "v")
    codes = df.select(
        "vec_id", S.sq8_quantize(F.col("v"), mns, mxs).alias("c")
    )
    out = S.sq8_topk(
        codes.select(F.col("vec_id").alias("nbr_id"), F.col("c").alias("qv8")),
        codes.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), F.col("c").alias("qq8")
        ),
        k=2,
    ).collect()
    sims = {r["nbr_id"]: r["qsim_dmil"] for r in out}
    assert sims[1] == -10000 and sims[2] > 0
