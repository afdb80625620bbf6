"""Multi-executor smoke: the engine must run unchanged under a REAL
multi-executor master (``local-cluster[2,4,2048]`` — two separate
executor JVMs + python workers, the spark-submit deployment shape),
not just local[N] threads. Catches any accidental driver-local
assumption (broadcast pickling, Arrow transfer, file visibility,
manifest commits) that single-JVM local mode would mask."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import hashlib, os, sys, tempfile
import pyspark
os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
sys.path.insert(0, %(repo)r)
from debezium_spark.session import get_spark
from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.oracle import fold_final_state
from debezium_spark.streaming.engine import Engine, EngineConfig

d = tempfile.mkdtemp(prefix="lc_engine_")
src, log = f"{d}/src", f"{d}/log"
spark = get_spark("lc_engine", master="local-cluster[2,4,2048]",
                  shuffle_partitions=8)
gen_source_table(spark, 4, 15).write.parquet(src)
gen_change_log(spark, 4, 15, n_events=300, snapshot_lsn_base=60
               ).write.parquet(log)
eng = Engine(spark, EngineConfig(
    changelog_path=log, lake_root=f"{d}/lake", source_table_path=src,
    batch_lsn_span=400, n_buckets=8))
res = eng.run()
assert res and all(not r.get("skipped") for r in res), res

src_pdf = spark.read.parquet(src).toPandas()
log_pdf = spark.read.parquet(log).toPandas()
for c in ("key", "before", "after"):
    log_pdf[c] = log_pdf[c].map(
        lambda v: v.asDict() if hasattr(v, "asDict") else v)
oracle = fold_final_state(src_pdf, log_pdf)
got = {(r["repo"], r["path"]): r["content"]
       for r in eng.final_state().collect()}
assert set(got) == set(oracle), (len(got), len(oracle))
for k, v in got.items():
    assert (hashlib.sha256(v.encode()).hexdigest()
            == hashlib.sha256(oracle[k]["content"].encode()).hexdigest()), k
print("LC_ENGINE_OK", len(got))
spark.stop()
"""


def test_engine_on_local_cluster_matches_oracle():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True,
        text=True,
        timeout=560,  # cluster startup dominates; host noise is 4-6x
    )
    assert "LC_ENGINE_OK" in out.stdout, (
        out.stdout[-2000:] + "\n---\n" + out.stderr[-2000:]
    )
