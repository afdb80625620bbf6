"""Line-level boilerplate dedup, Gopher word-level quality rules, and
the near-dup-cluster leakage-safe split.

Contracts: boilerplate flagged at the distinct-doc threshold (not
occurrence count), the kept-fingerprint excludes exactly the flagged
lines in order, every Gopher rule can fail independently, and
near-duplicate documents can never straddle a train/test boundary.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from debezium_spark.functions.dedup import line_dedup_stats
from debezium_spark.functions.text import gopher_stats


def _lines_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


def test_line_dedup_flags_cross_doc_boilerplate(spark):
    # "hdr" appears in 3 distinct docs (threshold 3); "twice" appears
    # twice in ONE doc — occurrence count must not count as sharing.
    rows = [
        (1, ["hdr", "alpha", "twice", "twice"]),
        (2, ["hdr", "beta"]),
        (3, ["hdr", "gamma"]),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup_stats(
            _lines_df(spark, rows), threshold=3
        ).collect()
    }
    assert out[1]["n_lines"] == 4
    assert out[1]["bp_lines"] == 1  # only hdr; 'twice' is single-doc
    assert out[2]["bp_lines"] == 1 and out[3]["bp_lines"] == 1
    # kept fingerprint = md5 of the doc minus boilerplate, in order
    assert (
        out[1]["kept_fp"]
        == hashlib.md5(b"alpha twice twice").hexdigest()
    )
    assert out[2]["kept_fp"] == hashlib.md5(b"beta").hexdigest()
    # boilerplate char mass: hdr=3 of 3+5+5+5=18 chars for doc 1
    assert out[1]["bp_char_micro"] == int(3 / 18 * 1e6)


def test_line_dedup_all_boilerplate_doc_fingerprints_empty(spark):
    rows = [(1, ["same"]), (2, ["same"]), (3, ["same"])]
    out = line_dedup_stats(_lines_df(spark, rows), threshold=2).collect()
    for r in out:
        assert r["bp_lines"] == 1 and r["bp_char_micro"] == 1000000
        assert r["kept_fp"] == hashlib.md5(b"").hexdigest()


def _gopher(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    g = gopher_stats(F.col("text"))
    return df.select(*[v.alias(k) for k, v in g.items()]).collect()[0]


def test_gopher_rules_fire_independently(spark):
    good = " ".join(
        ["the", "be", "to", "of"] + ["word"] * 60
    )  # 64 words, mean len ~3.6, stopwords present
    r = _gopher(spark, good)
    assert r["keep"] is True and r["n_words"] == 64
    # too short
    assert _gopher(spark, "the of few words here")["keep"] is False
    # mean word length out of range (all 1-char words)
    shorty = " ".join(["the", "of"] + ["a"] * 60)
    assert _gopher(spark, shorty)["keep"] is False
    # symbol ratio: >10% hash marks
    hashy = good + " " + "# # # # # # # #"
    r = _gopher(spark, hashy)
    assert r["symbol_word_micro"] > 100000 and r["keep"] is False
    # ellipsis runs count 1 per '...' (non-overlapping)
    dotty = good + " " + "... ... ..."
    assert _gopher(spark, dotty)["symbol_word_micro"] == int(
        3 / 67 * 1e6  # 64 good words + 3 '...' tokens
    )
    # alphabetic-word fraction: mostly numbers
    nummy = " ".join(["the", "be", "of"] + ["123"] * 60)
    r = _gopher(spark, nummy)
    assert r["alpha_word_micro"] < 800000 and r["keep"] is False
    # stop words: needs >= 2 distinct Gopher stop words
    nostop = " ".join(["word"] * 60 + ["the"])
    r = _gopher(spark, nostop)
    assert r["n_stop_gopher"] == 1 and r["keep"] is False


def test_gopher_zero_exchange_plan(spark):
    df = spark.createDataFrame(
        [(i, "the be word stuff") for i in range(10)],
        "doc_id long, text string",
    )
    g = gopher_stats(F.col("text"))
    plan = (
        df.select("doc_id", *[v.alias(k) for k, v in g.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_leakage_safe_split_keeps_near_dups_together(spark, tmp_path):
    # run the catalog query on the sf0.001 fixture and check the
    # invariant directly: every near-dup cluster lives in ONE split
    import debezium_spark.queries as Q

    out = Q.QUERIES["corpus_split_leakage_safe"](
        spark, "/root/testdata/sf0.001"
    )
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count("*").alias("n_docs"),
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    # sanity: the fixture actually has multi-doc near-dup clusters
    assert per_cluster.filter(F.col("n_docs") > 1).count() > 0
    # and the split is total: every doc got exactly one verdict
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert out.count() == n_docs
