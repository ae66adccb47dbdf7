"""Pre-build the shared input + index checkpoint for bench_search_scaling.

The search-only N->4N harness (tools/bench_search_scaling.py) measures
read-only batch_search against ONE checkpointed index, so the build is
legitimately outside the canary-gated measurement window.  This script
creates that checkpoint at 16 cores on the standalone cluster — run it
once (any host weather) before launching the collector, so gated attempts
spend their healthy window on the measured search legs only.

Usage: python tools/prebuild_search_ckpt.py [--docs 1000000]
       [--vocab 100000] [--ckpt /dev/shm/scaling-ckpt-16]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import DAEMON_ENV, MASTER, ensure_cluster  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession, functions as F
from seismic_spark.checkpoint import CheckpointedBuild
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages

spark = (SparkSession.builder.appName("prebuild-ckpt")
    .master("@MASTER@")
    .config("spark.cores.max", "16")
    .config("spark.executor.cores", "2")
    .config("spark.executor.memory", "7g")
    .config("spark.executorEnv.PYTHONPATH", "@REPO@")
    .config("spark.locality.wait", "1s")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

n_docs, vocab_size = @NDOCS@, @VOCAB@
input_path = "/dev/shm/scaling-input-%d-%d" % (n_docs, vocab_size)
if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
    pages = synth_pages(spark, n_docs, vocab_size=vocab_size, seed=42,
                        partitions=64)
    pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    ).write.mode("overwrite").parquet(input_path)
docs = spark.read.parquet(input_path)

t0 = time.time()
CheckpointedBuild(spark, "@CKPT@", resume=True, lineage_detail="light").build(
    docs, IndexConfig(n_postings=@NPOSTINGS@, pruning="fixed",
                      summary_energy=0.5, quant_ceil=True)
)
print("PREBUILD_DONE %.1fs" % (time.time() - t0), flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--ckpt", default="/dev/shm/scaling-ckpt-16")
    ap.add_argument("--n-postings", type=int, default=1000,
                    help="per-list pruning cap; 3000 = the reference's"
                         " published best config's posting mass (×3 the"
                         " campaign default) — the heavy-workload lever for"
                         " under-ceiling scaling pairs")
    args = ap.parse_args()

    ensure_cluster(workers=8)
    child = (
        CHILD.replace("@REPO@", REPO)
        .replace("@MASTER@", MASTER)
        .replace("@NDOCS@", str(args.docs))
        .replace("@VOCAB@", str(args.vocab))
        .replace("@CKPT@", args.ckpt)
        .replace("@NPOSTINGS@", str(args.n_postings))
    )
    env = dict(os.environ, PYTHONPATH=REPO, **DAEMON_ENV)
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", child], env=env,
                          timeout=7200)
    print("prebuild exit=%d wall=%.1fs" % (proc.returncode, time.time() - t0))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
