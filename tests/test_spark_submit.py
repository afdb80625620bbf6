"""spark-submit --py-files deployment smoke (north_rule's run mode):
package debezium_spark as a zip, submit a job against a REAL
multi-executor master with the zip as the ONLY source of the package
(cwd and PYTHONPATH do not contain the repo), and check the engine
replays to the oracle state. Catches packaging mistakes local imports
mask: missing subpackages in the zip, data files assumed next to the
source tree, executor-side imports resolved from the driver's cwd."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import hashlib
from pyspark.sql import SparkSession

# the zip from --py-files is the only place this import can resolve
from debezium_spark.generator import gen_change_log, gen_source_table
from debezium_spark.oracle import fold_final_state
from debezium_spark.streaming.engine import Engine, EngineConfig

import sys, tempfile
d = tempfile.mkdtemp(prefix="submit_job_")
spark = SparkSession.builder.appName("submit_smoke").config(
    "spark.sql.shuffle.partitions", "8").getOrCreate()
src, log = f"{d}/src", f"{d}/log"
gen_source_table(spark, 3, 12).write.parquet(src)
gen_change_log(spark, 3, 12, n_events=200, snapshot_lsn_base=40
               ).write.parquet(log)
eng = Engine(spark, EngineConfig(
    changelog_path=log, lake_root=f"{d}/lake", source_table_path=src,
    batch_lsn_span=300, n_buckets=4))
eng.run()

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
print("SUBMIT_OK", len(got))
spark.stop()
"""


def _package_zip(dest: str) -> str:
    zpath = os.path.join(dest, "debezium_spark.zip")
    pkg = os.path.join(REPO, "debezium_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_deployment():
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    d = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        zpath = _package_zip(d)
        job = os.path.join(d, "job.py")
        with open(job, "w") as f:
            f.write(JOB)
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("PYTHONPATH", "SPARK_HOME")
        }
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        out = subprocess.run(
            [
                submit,
                "--master",
                "local-cluster[2,4,2048]",
                "--py-files",
                zpath,
                job,
            ],
            capture_output=True,
            text=True,
            timeout=560,
            cwd=d,  # repo NOT on the path: the zip must carry it all
            env=env,
        )
        assert "SUBMIT_OK" in out.stdout, (
            out.stdout[-2000:] + "\n---\n" + out.stderr[-2000:]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
