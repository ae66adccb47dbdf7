"""Search QPS vs batch size at 1M docs — is search efficiency overhead-bound?

The r4 scaling campaign (BENCH/BASELINE.md) measured 4→16-core SEARCH
efficiency of only 0.27–0.42 raw at 1M docs while BUILD hit 0.53–0.58,
and attributed the gap to per-batch fixed overhead (Spark job scheduling,
broadcast setup, Python-worker dispatch) rather than the scoring work
itself.  This harness tests that attribution directly: one index, one
parallelism level (16 cores), batch sizes 10 → 10 000.  If search were
work-bound, QPS would be flat in batch size; if overhead-bound, QPS rises
toward an asymptote as the fixed cost amortizes.

Doubles as a 1M-doc end-to-end test of checkpoint resume: the index is
restored from the scaling campaign's `/dev/shm/scaling-ckpt-16` via
`CheckpointedBuild(resume=True)` (same config fingerprint → every stage
skipped), and the harness reports `resume_sec` + which stages resumed.

Canary protocol: pre/post brackets + 30 s in-run watcher, exactly like
tools/bench_scaling.py run_level (see BENCH/BASELINE.md for why readings
taken without brackets on this host are garbage).

Usage: python tools/bench_batchsize.py [--docs 1000000] [--vocab 100000]
       [--cores 16] [--sizes 10,100,1000,5000,10000] [--reps 3]
       [--out /tmp/batchsize.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import DAEMON_ENV, MASTER, ensure_cluster, stop_cluster  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession, functions as F
from seismic_spark.checkpoint import CheckpointedBuild
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages
from bench import bench_queries

cores_max = @CORES@
n_docs = @NDOCS@
vocab_size = @VOCAB@
sizes = @SIZES@
reps = @REPS@
spark = (SparkSession.builder.appName("batchsize-%d" % cores_max)
    .master("@MASTER@")
    .config("spark.cores.max", str(cores_max))
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

input_path = "/dev/shm/scaling-input-%d-%d" % (n_docs, vocab_size)
if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
    pages = synth_pages(spark, n_docs, vocab_size=vocab_size, seed=42, partitions=64)
    pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    ).write.mode("overwrite").parquet(input_path)
docs = spark.read.parquet(input_path)

# resume=True: identical config fingerprint to the scaling campaign's
# 16-core leg, so every stage restores from /dev/shm/scaling-ckpt-%d
ckpt_path = "/dev/shm/scaling-ckpt-%d" % cores_max
t0 = time.time()
idx = CheckpointedBuild(spark, ckpt_path, resume=True, lineage_detail="light").build(
    docs, IndexConfig(n_postings=1000, pruning="fixed",
                      summary_energy=0.5, quant_ceil=True)
)
resume_sec = time.time() - t0
lineage = json.load(open(ckpt_path + "/lineage.json"))
resumed = [k for k, v in lineage.items()
           if isinstance(v, dict) and v.get("resumed")]

terms = [r["term"] for r in
         idx.vocab.filter(F.col("df") > 5).select("term").collect()]
qs_all = bench_queries(terms, n=max(sizes))  # list of (qid, terms, weights)

# warmup: spin up Python workers / broadcast machinery outside the timings
idx.batch_search(qs_all[:10], k=10, query_cut=10, heap_factor=0.8).count()

out = []
for b in sizes:
    qs = qs_all[:b]
    secs = []
    for _ in range(reps):
        t0 = time.time()
        idx.batch_search(qs, k=10, query_cut=10, heap_factor=0.8).count()
        secs.append(round(time.time() - t0, 2))
    med = sorted(secs)[len(secs) // 2]
    out.append({"batch": b, "secs": secs, "sec_med": med,
                "qps": round(b / med, 2)})

spark.stop()
print("RESULT " + json.dumps({
    "cores": cores_max, "docs": n_docs, "vocab": vocab_size,
    "resume_sec": round(resume_sec, 2), "resumed_stages": resumed,
    "batches": out,
}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--sizes", default="10,100,1000,5000,10000")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/batchsize.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import threading

    from canary import measure

    ensure_cluster()
    child = (
        CHILD.replace("@REPO@", REPO)
        .replace("@MASTER@", MASTER)
        .replace("@CORES@", str(args.cores))
        .replace("@NDOCS@", str(args.docs))
        .replace("@VOCAB@", str(args.vocab))
        .replace("@SIZES@", json.dumps(sizes))
        .replace("@REPS@", str(args.reps))
    )
    pre = measure()
    in_run: list[float] = []
    stop = threading.Event()

    def watch() -> None:
        while not stop.wait(30.0):
            in_run.append(measure()["first_touch_mbps"])

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        env = dict(os.environ, PYTHONPATH=REPO, **DAEMON_ENV)
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True,
            text=True, timeout=3000, env=env,
        )
    finally:
        stop.set()
        t.join(timeout=5)
    post = measure()
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None
    )
    if line is None:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
        sys.exit(1)
    res = json.loads(line[len("RESULT "):])
    res["ts"] = time.time()
    res["canary_pre_mbps"] = pre["first_touch_mbps"]
    res["canary_post_mbps"] = post["first_touch_mbps"]
    res["canary_in_run_min_mbps"] = min(in_run) if in_run else None
    res["canary_in_run"] = in_run
    with open(args.out, "w") as f:
        f.write(json.dumps(res) + "\n")
    print(json.dumps(res, indent=1))
    stop_cluster()


if __name__ == "__main__":
    main()
