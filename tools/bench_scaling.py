"""Scaling-efficiency evidence: N vs 4N executors on a LOCAL STANDALONE
Spark cluster (separate JVM per executor — the faithful sandbox stand-in for
the north rule's two cluster sizes; plain local[N] shares one JVM and its GC,
which anti-scales and measures nothing about the engine).

Topology: one master + 8 workers × (2 cores, 8 GiB) on this machine.
N = 2 executors (4 cores) vs 4N = 8 executors (16 cores) — chosen inside the
region where this box's hardware itself scales linearly (see the pure-CPU
calibration in BENCH/BASELINE.md; vCPUs beyond ~16 are oversubscribed).

Each level runs in its own subprocess (fresh driver), connecting to the
shared master with spark.cores.max capping the executor count.  Efficiency =
(T_N / T_4N) / 4 on wall time of the timed phases.

Usage:
    python tools/bench_scaling.py [--docs 200000] [--vocab 50000] [--write-md]
    python tools/bench_scaling.py --stop-cluster
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7077"
DAEMON_ENV = {
    "SPARK_LOG_DIR": "/tmp/spark-logs",
    "SPARK_PID_DIR": "/tmp/spark-pids",
    "SPARK_WORKER_DIR": "/tmp/spark-work",
    # the sandbox disk tops out at ~400 MB/s — a shared-disk shuffle
    # saturates with >4 executors and anti-scales; tmpfs removes disk
    # from the measurement (a real cluster has per-node local disks)
    "SPARK_LOCAL_DIRS": "/dev/shm/spark-local",
}

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession, functions as F
from seismic_spark.index import SeismicSparkIndex
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages
from bench import bench_queries

import os
cores_max = @CORES@
n_docs = @NDOCS@
vocab_size = @VOCAB@
spark = (SparkSession.builder.appName("scaling-%d" % cores_max)
    .master("@MASTER@")
    .config("spark.cores.max", str(cores_max))
    .config("spark.executor.cores", "@EXECCORES@")
    .config("spark.executor.memory", "@EXECMEM@")
    .config("spark.executorEnv.PYTHONPATH", "@REPO@")
    # single-machine pseudo-cluster: brief locality wait (the 3s default
    # stalls every wave; 0s causes cache-miss recompute storms)
    .config("spark.locality.wait", "1s")
    # 128, not 32: at 1M docs the vector-carrying posting shuffle needs
    # ~64MB tasks — 32 partitions made 250MB+ Arrow tasks that spill/GC and
    # serialize the stage (measured 2x: 197s -> 102s at local[16])
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# Input is a real table on storage (like the Iceberg table in the north
# rule), NOT a cached generator lineage — a non-local task must re-read a
# parquet split, never re-run Python generation.
input_path = "/dev/shm/scaling-input-%d-%d" % (n_docs, vocab_size)
if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
    pages = synth_pages(spark, n_docs, vocab_size=vocab_size, seed=42, partitions=64)
    pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    ).write.mode("overwrite").parquet(input_path)
docs = spark.read.parquet(input_path)

import shutil
from seismic_spark.checkpoint import CheckpointedBuild
ckpt_path = "/dev/shm/scaling-ckpt-%d" % cores_max
shutil.rmtree(ckpt_path, ignore_errors=True)
t0 = time.time()
idx = CheckpointedBuild(spark, ckpt_path, resume=False, lineage_detail="light").build(
    docs, IndexConfig(n_postings=1000, pruning="fixed",
                      summary_energy=0.5, quant_ceil=True)
)
build_sec = time.time() - t0

terms = [r["term"] for r in idx.vocab.filter(F.col("df") > 5).select("term").collect()]
qs = bench_queries(terms, n=1000)
searches = []
for rep in range(3):  # first rep includes Python-worker warmup; keep all
    t0 = time.time()
    idx.batch_search(qs, k=10, query_cut=10, heap_factor=0.8).count()
    searches.append(round(time.time() - t0, 2))

spark.stop()
search_med = sorted(searches)[len(searches) // 2]
stage_metrics = json.load(open(ckpt_path + "/metrics.json"))
print("RESULT " + json.dumps({
    "cores": cores_max, "build_sec": round(build_sec, 2),
    "search_secs": searches, "search_sec": search_med,
    "build_docs_per_sec": round(n_docs / build_sec, 1),
    "search_qps": round(len(qs) / search_med, 2),
    "stages": {k: v for k, v in stage_metrics.items() if k.endswith("_sec")},
}))
"""


def ensure_cluster(workers: int = 8) -> None:
    env = os.environ | DAEMON_ENV
    for d in DAEMON_ENV.values():
        os.makedirs(d, exist_ok=True)
    probe = subprocess.run(
        ["pgrep", "-f", "deploy.master.Master"], capture_output=True
    )
    if probe.returncode != 0:
        subprocess.run(
            [f"{SPARK_HOME}/sbin/start-master.sh", "--host", "127.0.0.1",
             "--port", "7077", "--webui-port", "8090"],
            env=env, check=True,
        )
        time.sleep(3)
    probe = subprocess.run(
        ["pgrep", "-cf", "deploy.worker.Worker"], capture_output=True, text=True
    )
    n_live = int(probe.stdout.strip() or 0) if probe.returncode == 0 else 0
    if n_live < workers:
        subprocess.run(
            [f"{SPARK_HOME}/sbin/start-worker.sh", MASTER,
             "--cores", "2", "--memory", "8g"],
            env=env | {"SPARK_WORKER_INSTANCES": str(workers)}, check=True,
        )
        time.sleep(4)


def stop_cluster() -> None:
    env = os.environ | DAEMON_ENV | {"SPARK_WORKER_INSTANCES": "8"}
    subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=env)
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=env)


def run_level(cores_max: int, n_docs: int, vocab: int,
              exec_cores: int = 2, exec_mem: str = "7g") -> dict:
    """Run one parallelism level, bracketed by host-memory canaries.

    This VM suffers host-level page-supply throttling (tools/canary.py):
    first-touch of new pages intermittently drops 30-100x while CPU and
    established-page bandwidth stay full speed.  A sample measured in such a
    window is meaningless, so each level records the canary before and after
    and the summary marks levels whose canaries are degraded.
    """
    import threading

    from canary import measure  # tools/ is on sys.path when run as a script

    pre = measure()
    in_run: list[float] = []
    stop = threading.Event()

    def watch() -> None:
        # the level's own page churn depresses these readings (self-
        # contention), so they are not comparable to quiet-box canaries —
        # but a HOST throttle dip mid-level reads catastrophically low
        # (<100 MB/s), which the pre/post brackets cannot see.
        while not stop.wait(30.0):
            in_run.append(measure()["first_touch_mbps"])

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        res = _run_level_inner(cores_max, n_docs, vocab, exec_cores, exec_mem)
    finally:
        stop.set()
        t.join(timeout=5)
    post = measure()
    res["canary_pre_mbps"] = pre["first_touch_mbps"]
    res["canary_post_mbps"] = post["first_touch_mbps"]
    res["canary_in_run_min_mbps"] = min(in_run) if in_run else None
    res["canary_in_run"] = in_run
    return res


def _run_level_inner(cores_max: int, n_docs: int, vocab: int,
                     exec_cores: int = 2, exec_mem: str = "7g") -> dict:
    code = (
        CHILD.replace("@REPO@", REPO)
        .replace("@CORES@", str(cores_max))
        .replace("@NDOCS@", str(n_docs))
        .replace("@VOCAB@", str(vocab))
        .replace("@MASTER@", MASTER)
        .replace("@EXECCORES@", str(exec_cores))
        .replace("@EXECMEM@", exec_mem)
    )
    env = os.environ | {"PYTHONPATH": REPO}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no RESULT from cores={cores_max}:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def collect(args) -> None:
    """Canary-gated sample collection (the round-3 protocol): wait for a
    healthy host window (two consecutive first-touch readings ≥ --healthy),
    run one N/4N pair on a FRESH cluster, record it with its four bracketing
    canaries, and mark it valid only if all four clear --valid.  Repeats
    until --collect valid samples exist in --out.  Alternate pairs run in
    opposite order (ABBA across samples) so drift can't favor a side."""
    from canary import measure

    def wait_healthy(deadline: float) -> bool:
        while time.time() < deadline:
            r1 = measure()
            if r1["first_touch_mbps"] >= args.healthy:
                time.sleep(20)
                if measure()["first_touch_mbps"] >= args.healthy:
                    return True
            time.sleep(120)
        return False

    def n_valid() -> int:
        if not os.path.exists(args.out):
            return 0
        with open(args.out) as f:
            return sum(1 for line in f if json.loads(line).get("valid"))

    deadline = time.time() + args.timeout_hours * 3600
    i = n_valid()
    attempt = 0
    while i < args.collect and time.time() < deadline:
        if not wait_healthy(deadline):
            break
        # alternate by ATTEMPT so rejected pairs don't pin one order; odd
        # attempts run the short (4N) leg first — if the host window is
        # brief, at least the cheap leg lands clean
        order = [args.n * 4, args.n] if attempt % 2 == 0 else [args.n, args.n * 4]
        attempt += 1
        lock = args.out + ".lock"  # signals "pair in flight — box must stay quiet"
        try:
            with open(lock, "w") as f:
                f.write(str(os.getpid()))
            stop_cluster()
            time.sleep(3)
            ensure_cluster(workers=8)
            pair = {str(c): run_level(c, args.docs, args.vocab,
                                       args.exec_cores, args.exec_mem)
                    for c in order}
            cN, c4N = pair[str(args.n)], pair[str(args.n * 4)]
            canaries = [
                cN["canary_pre_mbps"], cN["canary_post_mbps"],
                c4N["canary_pre_mbps"], c4N["canary_post_mbps"],
            ]
            in_run_mins = [
                x["canary_in_run_min_mbps"]
                for x in (cN, c4N)
                if x.get("canary_in_run_min_mbps") is not None
            ]
            rec = {
                "ts": round(time.time(), 1), "order": order,
                "docs": args.docs, "vocab": args.vocab,
                "exec_cores": args.exec_cores, "exec_mem": args.exec_mem,
                "pair": pair,
                "eff_build": round(cN["build_sec"] / c4N["build_sec"] / 4, 3),
                "eff_search": round(cN["search_sec"] / c4N["search_sec"] / 4, 3),
                "canaries": canaries,
                "in_run_min": min(in_run_mins) if in_run_mins else None,
                # brackets must be healthy AND no catastrophic mid-level host
                # dip (in-run readings are self-contended, so the floor is
                # far below the quiet-box gate; <args.inrun_floor means the
                # hypervisor stalled page supply mid-measurement)
                "valid": min(canaries) >= args.valid
                and (not in_run_mins or min(in_run_mins) >= args.inrun_floor),
            }
        except Exception as e:  # noqa: BLE001 — record and keep collecting
            rec = {"ts": round(time.time(), 1), "order": order,
                   "error": str(e)[:500], "valid": False}
        finally:
            if os.path.exists(lock):
                os.remove(lock)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if rec.get("valid"):
            i += 1
    stop_cluster()
    print(json.dumps({"valid_samples": n_valid(), "out": args.out}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument("--vocab", type=int, default=50000)
    ap.add_argument("--n", type=int, default=4, help="small size in CORES (2 executors)")
    # Under-ceiling pairs (round 5): --n 1 --exec-cores 1 runs the rule's
    # literal "N and 4N executors" as 1 -> 4 single-core executors, the
    # configuration where both legs sit under the host's page-supply
    # throttle threshold and the ratio measures the engine (see
    # tools/bench_search_scaling.py and BENCH/BASELINE.md round-5 section).
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem", default="7g")
    ap.add_argument("--reps", type=int, default=1,
                    help="ABBA repetitions per level (medians reported)")
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--stop-cluster", action="store_true")
    ap.add_argument("--collect", type=int, default=0,
                    help="collect N canary-valid samples (round-3 protocol)")
    ap.add_argument("--out", default="/tmp/scaling_samples.jsonl")
    ap.add_argument("--healthy", type=float, default=1300.0,
                    help="first-touch MB/s gate to START a sample")
    ap.add_argument("--valid", type=float, default=900.0,
                    help="first-touch MB/s floor for a sample to COUNT")
    ap.add_argument("--inrun-floor", type=float, default=60.0,
                    help="min in-run (self-contended) canary MB/s; below = "
                         "mid-level host stall, sample rejected")
    ap.add_argument("--timeout-hours", type=float, default=6.0)
    args = ap.parse_args()
    if args.stop_cluster:
        stop_cluster()
        return
    if args.collect:
        collect(args)
        return

    ensure_cluster(workers=8)
    # ABBA ordering cancels slow drift (page cache, thermal, background load)
    order = ([args.n, args.n * 4, args.n * 4, args.n] * args.reps)[: 2 * 2 * args.reps]
    if args.reps == 1:
        order = [args.n, args.n * 4]
    runs: dict[int, list[dict]] = {args.n: [], args.n * 4: []}
    for cores in order:
        runs[cores].append(run_level(cores, args.docs, args.vocab,
                                      args.exec_cores, args.exec_mem))

    def med(level: int, key: str) -> float:
        vals = sorted(r[key] for r in runs[level])
        return vals[len(vals) // 2]

    small = {"cores": args.n,
             "build_sec": med(args.n, "build_sec"),
             "search_sec": med(args.n, "search_sec"),
             "build_docs_per_sec": round(args.docs / med(args.n, "build_sec"), 1),
             "search_qps": round(1000 / med(args.n, "search_sec"), 2),
             "all": runs[args.n]}
    big = {"cores": args.n * 4,
           "build_sec": med(args.n * 4, "build_sec"),
           "search_sec": med(args.n * 4, "search_sec"),
           "build_docs_per_sec": round(args.docs / med(args.n * 4, "build_sec"), 1),
           "search_qps": round(1000 / med(args.n * 4, "search_sec"), 2),
           "all": runs[args.n * 4]}
    eff_build = round(small["build_sec"] / big["build_sec"] / 4, 3)
    eff_search = round(small["search_sec"] / big["search_sec"] / 4, 3)
    result = {
        "n_docs": args.docs, "vocab": args.vocab,
        "N": small, "4N": big,
        "scaling_efficiency_build": eff_build,
        "scaling_efficiency_search": eff_search,
    }
    print(json.dumps(result, indent=2))
    if args.write_md:
        ex_n, ex_4n = args.n // 2, args.n * 2
        md = f"""
## Scaling evidence — standalone cluster, {ex_n} vs {ex_4n} executors × 2 cores ({args.docs} pages, vocab {args.vocab})

| phase | {ex_n} executors | {ex_4n} executors | throughput N | throughput 4N | efficiency (T_N/T_4N)/4 |
|---|---|---|---|---|---|
| index build | {small['build_sec']} s | {big['build_sec']} s | {small['build_docs_per_sec']} docs/s | {big['build_docs_per_sec']} docs/s | {eff_build} |
| batch search (1000 q) | {small['search_sec']} s | {big['search_sec']} s | {small['search_qps']} QPS | {big['search_qps']} QPS | {eff_search} |
"""
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(md)


if __name__ == "__main__":
    main()
