"""Code-corpus curation ops: StarCoder-family file filters and
content-defined chunk dedup (functions/code.py).

Covers the published rule semantics (minified / auto-generated files
rejected), the CDC-chunking insert-stability property that justifies
rolling boundaries over fixed blocks, and the plan shapes that make
both viable at corpus scale (metrics = zero exchange; chunk sharing =
bounded exchanges, no nested-loop join).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from debezium_spark.functions import code as C

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _metrics(spark):
    d = _docs(spark)
    lines = C.synth_code_lines(
        F.col("text"), F.col("doc_id"), F.col("lang")
    )
    m = C.line_metrics(lines)
    return d.select("doc_id", *[v.alias(k) for k, v in m.items()])


def test_starcoder_rules_fire(spark):
    rows = {r["doc_id"]: r for r in _metrics(spark).collect()}
    assert len(rows) == 500
    for doc_id, r in rows.items():
        if doc_id % 7 == 0:
            # minified line injected -> max-line-length rule rejects
            assert r["max_line_len"] >= C.MINIFIED_LINE_LEN
            assert not r["keep"]
        if doc_id % 10 == 0:
            assert r["is_autogen"] and not r["keep"]
        if doc_id % 3 == 0 or doc_id % 10 == 0:
            assert r["comment_micro"] > 0
    kept = [r for r in rows.values() if r["keep"]]
    # the fixture is prose tokens in short lines: most non-flagged
    # docs must survive, otherwise the thresholds are miscalibrated
    assert len(kept) > 250
    assert all(
        not (r["is_autogen"] or r["max_line_len"] > C.MAX_LINE_LEN)
        for r in kept
    )


def test_code_metrics_plan_is_narrow(spark):
    plan = plan_of(_metrics(spark))
    assert n_exchanges(plan) == 0
    assert "Join" not in plan and "Generate" not in plan


def test_cut_bounds_kernel_matches_expr_spec(spark):
    # the Arrow kernel must produce byte-identical boundaries to the
    # JVM md5-expression spec (which is what the DuckDB oracle mirrors)
    d = _docs(spark).select("doc_id", F.col("text").alias("t")).limit(60)
    rows = (
        d.withColumn("__cuts", C.cut_positions_expr("t"))
        .select(
            "doc_id",
            C.cut_bounds(F.col("t")).alias("kb"),
            F.expr(
                "concat(array(0), filter(__cuts, i -> i < length(t)), "
                "array(length(t)))"
            ).alias("eb"),
        )
        .collect()
    )
    assert rows and all(r["kb"] == r["eb"] for r in rows)


def test_cdc_chunks_reassemble_and_are_insert_stable(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 8)],
        "doc_id long, t string",
    )
    base = C.with_cdc_chunks(df, "t").collect()[0]["chunks"]
    assert "".join(base) == df.collect()[0]["t"]
    assert len(base) > 3  # boundaries actually fire on ~360 chars

    # insert-stability: a single-char edit near the middle may only
    # perturb chunks overlapping the edit window; the chunk multiset
    # far from the edit is unchanged (the defining CDC property --
    # fixed-width blocks would shift EVERY downstream block)
    t = df.collect()[0]["t"]
    edited = t[:180] + "Z" + t[180:]
    df2 = spark.createDataFrame([(1, edited)], "doc_id long, t string")
    after = C.with_cdc_chunks(df2, "t").collect()[0]["chunks"]
    assert "".join(after) == edited
    from collections import Counter

    common = Counter(base) & Counter(after)
    shared_chars = sum(len(c) * n for c, n in common.items())
    # >=60% of the original bytes live in chunks identical after the
    # insert; a fixed-block chunker at the same grain keeps only the
    # prefix before the edit (here <=50%)
    assert shared_chars >= 0.6 * len(t)


def test_chunk_share_stats_counts_cross_doc_blocks(spark):
    df = spark.createDataFrame(
        [
            (1, "shared boilerplate header one two three " * 6 + "u1"),
            (2, "shared boilerplate header one two three " * 6 + "u2"),
            (3, "completely different private body text zz " * 6),
        ],
        "doc_id long, t string",
    )
    rows = {
        r["doc_id"]: r
        for r in C.chunk_share_stats(df).collect()
    }
    assert rows[1]["shared_chunks"] > 0
    assert rows[2]["shared_chunks"] > 0
    assert rows[1]["shared_char_micro"] > 500_000
    assert rows[3]["shared_chunks"] == 0
    assert rows[3]["shared_char_micro"] == 0
    for r in rows.values():
        assert r["n_chunks"] >= r["shared_chunks"]


def test_chunk_share_plan_bounded(spark):
    d = _docs(spark).select("doc_id", F.col("text").alias("t"))
    plan = plan_of(C.chunk_share_stats(d))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # chunk-key partial agg + equi-join + final per-doc agg: the
    # exchange count must stay constant, never corpus-dependent
    assert n_exchanges(plan) <= 5
    assert "partial_count" in plan or "partial" in plan.lower()


def test_license_filter_policy(spark):
    from debezium_spark.queries import QUERIES

    rows = {
        r["doc_id"]: r
        for r in QUERIES["code_license_filter"](spark, SF_DIR).collect()
    }
    want = {0: "MIT", 1: "Apache-2.0", 2: "BSD-3-Clause",
            3: "GPL-3.0", 4: "AGPL-3.0", 5: "NONE"}
    for doc_id, r in rows.items():
        assert r["license"] == want[doc_id % 6]
        assert r["keep"] == (doc_id % 6 in (0, 1, 2))
    # unlicensed and copyleft are both dropped (The Stack's policy)
    assert not rows[3]["keep"] and not rows[5]["keep"]


def test_secret_scan_counts_and_redaction_witness(spark):
    from debezium_spark.queries import QUERIES

    out = QUERIES["code_secret_scan"](spark, SF_DIR)
    rows = {r["doc_id"]: r for r in out.collect()}
    for doc_id, r in rows.items():
        if doc_id % 17 == 0:
            assert r["n_hex_secret"] == 1 and r["has_secret"]
        elif doc_id % 13 == 0:
            assert r["n_private_key"] == 1 and r["has_secret"]
        elif doc_id % 11 == 0:
            assert r["n_github_token"] == 1 and r["has_secret"]
        elif doc_id % 7 == 0:
            assert r["n_aws_key"] == 1 and r["has_secret"]
        else:
            assert r["n_secrets"] == 0 and not r["has_secret"]
    # redaction witness: a clean doc's redacted_md5 equals md5(text);
    # a dirty doc's differs (the secret was actually replaced)
    docs = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    import hashlib

    for doc_id in (1, 2):
        assert (
            rows[doc_id]["redacted_md5"]
            == hashlib.md5(docs[doc_id].encode()).hexdigest()
        )
    assert (
        rows[7]["redacted_md5"]
        != hashlib.md5(docs[7].encode()).hexdigest()
    )


def test_license_and_secret_plans_are_narrow(spark):
    from debezium_spark.queries import QUERIES

    for name in ("code_license_filter", "code_secret_scan"):
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert n_exchanges(plan) == 0, name
        assert "Join" not in plan, name


def test_repo_fork_pairs_finds_exactly_the_forks(spark):
    from debezium_spark.queries import QUERIES

    rows = QUERIES["dedup_repo_forks"](spark, SF_DIR).collect()
    assert rows, "fork construction must produce pairs"
    for r in rows:
        # every qualifying pair is fork<X> against its upstream
        # repo<Y> with Y ≡ X (mod 10) — never repo-repo or fork-fork
        assert r["repo_a"].startswith("fork")
        assert r["repo_b"].startswith("repo")
        x = int(r["repo_a"][4:])
        y = int(r["repo_b"][4:])
        assert y % 10 == x
        assert 0 < r["shared_files"] <= min(r["n_a"], r["n_b"])
        assert r["jaccard_micro"] >= 100000


def test_repo_fork_plan_join_free_candidates(spark):
    from debezium_spark.queries import QUERIES

    plan = plan_of(QUERIES["dedup_repo_forks"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the two size joins are broadcast (one row per repo)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_hopping_window_four_memberships(spark):
    from debezium_spark.queries import QUERIES

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = QUERIES["events_hopping_window"](spark, SF_DIR)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 4 * ev.count()
    # every window start sits on the 15-minute grid
    bad = out.filter(
        F.pmod(F.unix_timestamp("window_start"), F.lit(900)) != 0
    ).count()
    assert bad == 0
