"""Operator-kernel scaling probe: the engine's core computation (envelope
projection → PK-change split → LWW max_by compaction) over IN-MEMORY
generated events — no parquet, no lake, no tmpfs in the timed path.

Separates two questions the end-to-end number conflates on this host:
(a) do the ENGINE'S PLANS scale with cores? (this probe), and
(b) what does the whole replay achieve through the sandbox's noisy
storage/memory stack? (tools/bench_scaling.py).

Usage: python tools/bench_kernel_scaling.py [events] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
cores = %(cores)d
from pyspark.sql import functions as F
from debezium_spark.session import get_spark
from debezium_spark.operators.compaction import compact
from debezium_spark.operators.transforms import (
    drop_tombstones, normalize_target_key, pk_change_split)
spark = get_spark(f"kern{cores}", cores=cores, shuffle_partitions=128,
    extra_conf={
        "spark.driver.extraJavaOptions":
            "-Xms40g -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        **({"spark.local.dir": f"/dev/shm/spark-local-{cores}"}
           if __import__("os").path.isdir("/dev/shm") else {}),
    })

def cheap_events(n):
    # envelope rows with the exact operator-facing shape but trivial
    # generation cost (no crypto hashes) — measures the operators, not
    # the generator
    df = spark.range(n, numPartitions=128)
    key = F.pmod(F.col("id") * 2654435761, 200000)
    op = (F.when(key %% 10 == 0, "d").when(key %% 10 == 1, "c")
          .otherwise("u"))
    repo = F.format_string("org/project-%%04d", (key / 200).cast("int"))
    path = F.format_string("src/file_%%05d.py", key %% 200)
    img = F.struct(
        repo.alias("repo"), path.alias("path"),
        F.format_string("c%%016x", F.col("id")).alias("commit"),
        F.lit("py").alias("lang"),
        F.repeat(F.format_string("x%%012d ", F.col("id")), 10).alias("content"),
        F.lit(None).cast("bigint").alias("size_bytes"))
    return df.select(
        F.pmod(F.col("id"), 32).cast("int").alias("partition_id"),
        F.col("id").alias("lsn"), op.alias("op"),
        F.struct(repo.alias("repo"), path.alias("path")).alias("key"),
        F.when(op == "d", img).alias("before"),
        F.when(op != "d", img).alias("after"),
        F.lit(None).cast(
            "struct<ts_ms:bigint,snapshot:string,txId:bigint,table:string>"
        ).alias("source"),
        F.col("id").alias("ts_ms"),
        F.lit(0).alias("schema_version"),
        F.lit(False).alias("is_tombstone"))

def pipeline(n_events):
    ev = normalize_target_key(pk_change_split(drop_tombstones(cheap_events(n_events))))
    compact(ev).write.mode("overwrite").format("noop").save()

pipeline(100_000)  # JIT warmup
n = %(events)d
t0 = time.time(); pipeline(n); el = time.time() - t0
print("RESULT", json.dumps({"cores": cores, "events": n,
    "wall_s": round(el, 2), "events_per_sec": round(n / el, 1)}))
"""


def run(cores: int, events: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", PROBE % {"repo": REPO, "cores": cores, "events": events}],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def main() -> None:
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for i in range(repeats):
        for cores in (8, 32):
            r = run(cores, events)
            runs[cores].append(r)
            print(f"run {i} cores={cores}: {r}", flush=True)
    best = {c: max(rs, key=lambda r: r["events_per_sec"]) for c, rs in runs.items()}
    eff = round(best[32]["events_per_sec"] / (4 * best[8]["events_per_sec"]), 3)
    out = {
        "events": events,
        "p8_best": best[8],
        "p32_best": best[32],
        "kernel_scaling_efficiency_8_to_32": eff,
        "all_runs": runs,
    }
    with open(os.path.join(REPO, "BENCH_KERNEL_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "all_runs"}))


if __name__ == "__main__":
    main()
