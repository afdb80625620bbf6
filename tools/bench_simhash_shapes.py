"""Clean-window re-measure of the simhash signature build (judge round-2
follow-up): the r01→r02 wall-time swing of text_simhash /
dedup_simhash_near was measured in different noise windows on a host
with 4-6× interference, so it cannot be attributed to the shape change
without an interleaved A/B in ONE window.

A = current shape: ONE groupBy(id) with 65 aggregates
    (count + 64 per-bit set-counts) — single exchange.
B = r01 shape: explode(bit 0..31) → groupBy(id, bit) → groupBy(id)
    — 32× row blowup into two exchanges.

Methodology (BASELINE.md / sandbox-noise notes): same JVM, same input
(sf0.1 documents on tmpfs), JIT warmup first, then N interleaved
rounds of (A, B); per-round ratios are noise-immune because both legs
share the window. Output: one JSON line for BENCH_HISTORY.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from debezium_spark.functions import dedup as D  # noqa: E402
from debezium_spark.functions.text import portable_hash32  # noqa: E402
from debezium_spark.session import get_spark  # noqa: E402


def explode_parts(df, id_col="doc_id", text_col="text"):
    """r01 shape, kept verbatim for the A/B (two-level groupBy)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "\\s+"),
                    lambda t: t != F.lit(""),
                )
            )
        ).alias("tok"),
    )
    lohi = toks.select(
        "id",
        portable_hash32(F.col("tok"), salt="lo").alias("lo"),
        portable_hash32(F.col("tok"), salt="hi").alias("hi"),
    )
    bits = lohi.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
        "lo",
        "hi",
    ).select(
        "id",
        "bit",
        (F.expr("shiftright(lo, cast(bit as int))") % 2).alias("blo"),
        (F.expr("shiftright(hi, cast(bit as int))") % 2).alias("bhi"),
    )
    votes = bits.groupBy("id", "bit").agg(
        F.sum(F.col("blo") * 2 - 1).alias("vlo"),
        F.sum(F.col("bhi") * 2 - 1).alias("vhi"),
    )
    pow2 = F.expr("shiftleft(cast(1 as bigint), cast(bit as int))")
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("vhi") > 0, pow2).otherwise(F.lit(0).cast("long"))
        ).alias("simhash_hi"),
        F.sum(
            F.when(F.col("vlo") > 0, pow2).otherwise(F.lit(0).cast("long"))
        ).alias("simhash_lo"),
    )


def consume(df) -> tuple[float, int]:
    t0 = time.time()
    row = df.agg(
        F.sum(F.col("simhash_hi") + F.col("simhash_lo")).alias("s")
    ).collect()[0]
    return time.time() - t0, int(row["s"])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    local = None
    src = f"{sf_dir}/documents.parquet"
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/simhash_bench", exist_ok=True)
        dst = "/dev/shm/simhash_bench/documents.parquet"
        if not os.path.exists(dst):
            shutil.copy(src, dst)
        src = dst
        local = {"spark.local.dir": "/dev/shm/spark-local-simhash"}
    spark = get_spark(
        "simhash_shapes", cores=32, shuffle_partitions=32, extra_conf=local
    )
    docs = spark.read.parquet(src)
    stats = docs.select(
        F.count("*").alias("n"),
        F.avg(F.length("text")).alias("avg_len"),
    ).collect()[0]

    a = lambda: consume(D.simhash_parts(docs))  # noqa: E731
    b = lambda: consume(explode_parts(docs))  # noqa: E731
    # JIT/codegen warmup, also checks both shapes agree bit-for-bit
    (_, sa), (_, sb) = a(), b()
    assert sa == sb, "shapes disagree"

    rows = []
    for r in range(rounds):
        ta, _ = a()
        tb, _ = b()
        rows.append({"round": r, "one_groupby_s": round(ta, 3),
                     "explode_s": round(tb, 3),
                     "ratio_b_over_a": round(tb / ta, 3)})
        print(rows[-1], file=sys.stderr)
    med = sorted(x["ratio_b_over_a"] for x in rows)[len(rows) // 2]
    out = {
        "bench": "simhash_shape_ab",
        "sf_dir": sf_dir,
        "n_docs": int(stats["n"]),
        "avg_doc_len": round(float(stats["avg_len"]), 1),
        "rounds": rows,
        "best_one_groupby_s": min(x["one_groupby_s"] for x in rows),
        "best_explode_s": min(x["explode_s"] for x in rows),
        "median_ratio_explode_over_one_groupby": med,
        "verdict": (
            "one-groupby faster" if med > 1.05
            else "explode faster" if med < 0.95
            else "equivalent"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
