"""Search-only N->4N scaling at the DESIGN POINT (index-scale batches).

The r4/r5 scaling pairs measured search efficiency at batch 1000, where the
batch-size sweep (tools/bench_batchsize.py, BENCH/BASELINE.md) showed a ~6 s
per-batch fixed cost still dominates — raw 4->16-core search efficiency of
0.27-0.42 is that fixed cost failing to amortize, not the scoring work
failing to parallelize.  The prediction that falls out: at batch 10 000,
where the marginal per-query work IS the cost, search efficiency should
rise toward the build numbers.  This harness tests that prediction — the
north-rule criterion at the batch size the engine is designed for.

Method: ONE index (restored from the scaling campaign's 16-core checkpoint;
search is read-only, so both parallelism levels legitimately share it —
build scaling is bench_scaling.py's job), the same batch of 10 000 queries,
run at N and 4N cores on fresh standalone clusters, reps per level with
medians.

Canary protocol — PAUSE-PROBE variant of the bench_scaling gates.  The
standing in-run floor conflates two signals for THIS workload: the canary
measures page-allocation supply, and a batch-10000 search leg saturates it
by itself (7/7 archived attempts in scaling_samples_r5_searchonly.jsonl:
16c in-rep minima 5-11 MB/s while the 4c legs of the SAME attempts read
189-936 — perfectly systematic, so it is self-contention, not weather).
The child therefore sleeps --pause-sec before each timed rep and prints
MARK lines; the watcher's samples that fall wholly inside those quiescent
windows read host health with the workload parked.  Validity = pre/post
brackets >= --valid AND every pause-window sample >= --pause-floor at both
levels.  In-rep minima are recorded for transparency but cannot gate.

Usage: python tools/bench_search_scaling.py [--docs 1000000]
       [--vocab 100000] [--n 4] [--batch 10000] [--reps 3]
       [--ckpt /dev/shm/scaling-ckpt-16] [--out /tmp/search_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
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
batch = @BATCH@
reps = @REPS@
spark = (SparkSession.builder.appName("search-scaling-%d" % cores_max)
    .master("@MASTER@")
    .config("spark.cores.max", str(cores_max))
    .config("spark.executor.cores", "@EXECCORES@")
    .config("spark.executor.memory", "@EXECMEM@")
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

t0 = time.time()
idx = CheckpointedBuild(spark, "@CKPT@", resume=True, lineage_detail="light").build(
    docs, IndexConfig(n_postings=@NPOSTINGS@, pruning="fixed",
                      summary_energy=0.5, quant_ceil=True)
)
resume_sec = time.time() - t0

terms = [r["term"] for r in
         idx.vocab.filter(F.col("df") > 5).select("term").collect()]
qs = bench_queries(terms, n=batch)

# warmup outside the timings (Python workers, broadcast machinery)
idx.batch_search(qs[:10], k=10, query_cut=10, heap_factor=0.8).count()

# Pause-probe protocol: the parent's canary watcher measures page-supply
# first-touch, which a saturating search rep ALWAYS drags down (the canary
# and the workload compete for the same page supply — 7/7 archived attempts
# show 16c in-rep minima of 5-11 MB/s while the 4c legs of the SAME attempts
# read 189-936).  Sleeping between reps exposes workload-free windows; the
# parent classifies its samples by these marks and gates host health on the
# PAUSE readings, where the only competitor is idle-JVM background.
pause = @PAUSE@
secs = []
for i in range(reps):
    print("MARK pause_start %f" % time.time(), flush=True)
    time.sleep(pause)
    print("MARK pause_end %f" % time.time(), flush=True)
    t0 = time.time()
    idx.batch_search(qs, k=10, query_cut=10, heap_factor=0.8).count()
    secs.append(round(time.time() - t0, 2))
med = sorted(secs)[len(secs) // 2]

spark.stop()
print("RESULT " + json.dumps({
    "cores": cores_max, "docs": n_docs, "vocab": vocab_size,
    "batch": batch, "resume_sec": round(resume_sec, 2),
    "secs": secs, "sec_med": med, "qps": round(batch / med, 2),
}))
"""


def run_level(cores: int, args) -> dict:
    from canary import measure

    child = (
        CHILD.replace("@REPO@", REPO)
        .replace("@MASTER@", MASTER)
        .replace("@CORES@", str(cores))
        .replace("@NDOCS@", str(args.docs))
        .replace("@VOCAB@", str(args.vocab))
        .replace("@BATCH@", str(args.batch))
        .replace("@REPS@", str(args.reps))
        .replace("@CKPT@", args.ckpt)
        .replace("@NPOSTINGS@", str(args.n_postings))
        .replace("@PAUSE@", str(args.pause_sec))
        .replace("@EXECMEM@", args.exec_mem)
        .replace("@EXECCORES@", str(args.exec_cores))
    )
    pre = measure()
    samples: list[tuple[float, float, float]] = []  # (t_start, t_end, mbps)
    stop = threading.Event()

    def watch() -> None:
        while not stop.wait(8.0):
            t0 = time.time()
            mbps = measure()["first_touch_mbps"]
            samples.append((t0, time.time(), mbps))

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        env = dict(os.environ, PYTHONPATH=REPO, **DAEMON_ENV)
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True,
            text=True, timeout=3600, env=env,
        )
    finally:
        stop.set()
        t.join(timeout=5)
    # The instant-post read lands while the hypervisor is still reclaiming
    # the child's just-freed executor heap (heap_ab_r5: 3/4 legs read
    # post ~450-500 against pre ~1000-1600 — a systematic teardown
    # artifact, not weather).  Settle, re-read, gate on the better of the
    # two; both stay in the record.
    post_raw = measure()
    time.sleep(getattr(args, "settle_sec", 30.0))
    post_settled = measure()
    post = max(post_raw, post_settled, key=lambda r: r["first_touch_mbps"])
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")), None
    )
    if line is None:
        raise RuntimeError(proc.stdout[-1500:] + "\n" + proc.stderr[-3000:])
    res = json.loads(line[len("RESULT "):])

    # classify watcher samples by the child's inter-rep pause marks: a
    # sample whose whole [t_start, t_end] lies inside a pause window read
    # the host's page supply with the workload quiescent — the host-health
    # signal; in-rep samples measure the leg's own page-supply contention
    # (reported, not gated: a saturating leg ALWAYS drags them down).
    marks = {"pause_start": [], "pause_end": []}
    for ln in proc.stdout.splitlines():
        if ln.startswith("MARK "):
            _, name, ts = ln.split()
            marks[name].append(float(ts))
    pauses = list(zip(marks["pause_start"], marks["pause_end"]))
    pause_reads = [
        m for (a, b, m) in samples
        if any(p0 + 0.5 <= a and b <= p1 - 0.5 for (p0, p1) in pauses)
    ]
    inrep_reads = [
        m for (a, b, m) in samples
        if not any(p0 - 0.5 <= a and b <= p1 + 0.5 for (p0, p1) in pauses)
    ]
    res["canary_pre_mbps"] = pre["first_touch_mbps"]
    res["canary_post_mbps"] = post["first_touch_mbps"]
    res["canary_post_raw_mbps"] = post_raw["first_touch_mbps"]
    res["canary_post_settled_mbps"] = post_settled["first_touch_mbps"]
    res["canary_pause_min_mbps"] = min(pause_reads) if pause_reads else None
    res["canary_pause"] = pause_reads
    res["canary_in_rep_min_mbps"] = min(inrep_reads) if inrep_reads else None
    res["canary_in_rep"] = inrep_reads
    return res


def run_pair(args, levels: list[int]) -> dict:
    pair = {}
    ensure_cluster(workers=8)
    try:
        for c in levels:
            pair[str(c)] = run_level(c, args)
    finally:
        stop_cluster()
    small, big = pair[str(args.n)], pair[str(args.n * 4)]
    canaries = [
        small["canary_pre_mbps"], small["canary_post_mbps"],
        big["canary_pre_mbps"], big["canary_post_mbps"],
    ]
    pause_mins = [
        x["canary_pause_min_mbps"] for x in (small, big)
        if x.get("canary_pause_min_mbps") is not None
    ]
    rec = {
        "ts": round(time.time(), 1), "order": levels,
        "docs": args.docs, "vocab": args.vocab, "batch": args.batch,
        "exec_cores": args.exec_cores, "exec_mem": args.exec_mem,
        "n_postings": args.n_postings,
        "pair": pair,
        "eff_search": round(small["sec_med"] / big["sec_med"] / 4, 3),
        "canaries": canaries,
        # gate on PAUSE readings (workload-quiescent host health); in-rep
        # minima stay in the record but cannot gate — see run_level comment
        "pause_min": min(pause_mins) if pause_mins else None,
        "in_rep_min": min(
            x["canary_in_rep_min_mbps"] for x in (small, big)
            if x.get("canary_in_rep_min_mbps") is not None
        ) if any(x.get("canary_in_rep_min_mbps") is not None
                 for x in (small, big)) else None,
        "valid": min(canaries) >= args.valid
        and len(pause_mins) == 2
        and min(pause_mins) >= args.pause_floor,
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(
        {k: v for k, v in rec.items() if k != "pair"}, indent=1
    ), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--n", type=int, default=4, help="small size in cores")
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ckpt", default="/dev/shm/scaling-ckpt-16")
    # Search is read-mostly: the persisted ubs frame for a 10k-query batch
    # is O(100 MB) cluster-wide, so the build campaign's 7g/executor is all
    # dead weight here — and on THIS host every freshly-faulted heap page
    # goes through the hypervisor's allocation-rate throttle (the r4
    # recalibration's measured mechanism).  The 16-core leg faults 8×heap
    # vs the 4-core leg's 2×heap, so oversized heaps bias the RATIO, not
    # just the level.  Same value at both levels keeps the pair fair.
    ap.add_argument("--exec-mem", default="4g")
    # The 4->16-core campaign's 19 archived attempts measured a ~210 QPS
    # single-box ceiling at this design point: a 4-core leg ALONE reaches
    # 190-213 QPS (attempts 17-19), so the big leg has no headroom to
    # demonstrate engine scaling — the ratio measures the HOST.  --exec-cores 1
    # with --n 1 runs the rule's literal "N and 4N executors" with BOTH legs
    # under the ceiling, where the ratio measures the ENGINE.
    ap.add_argument("--exec-cores", type=int, default=2)
    # The 1->4 single-core pairs showed the NEXT wall: a lone uncontended
    # core runs 71-81 QPS, so 4x of it (284-324) is already above the ~210
    # QPS box ceiling — the big leg lands on the wall and the ratio caps at
    # 0.65-0.74 by arithmetic.  n_postings=3000 (the reference best
    # config's posting mass) triples the per-query parallel work so 4x the
    # single-executor throughput fits UNDER the ceiling and the ratio can
    # finally measure the engine.
    ap.add_argument("--n-postings", type=int, default=1000)
    ap.add_argument("--valid", type=float, default=900.0)
    ap.add_argument("--pause-sec", type=float, default=20.0,
                    help="inter-rep quiescent window the child sleeps; the"
                         " watcher's samples inside it gate host health")
    ap.add_argument("--pause-floor", type=float, default=600.0,
                    help="min first-touch MB/s across pause-window samples"
                         " for a valid pair (workload quiescent, so a"
                         " healthy host reads near-bracket here)")
    ap.add_argument("--settle-sec", type=float, default=30.0,
                    help="wait before the second post-bracket read so the"
                         " hypervisor finishes reclaiming the child's heap;"
                         " the gate uses the better of the two reads")
    ap.add_argument("--healthy", type=float, default=1300.0,
                    help="--collect start gate: two consecutive first-touch"
                         " readings >= this before an attempt launches")
    ap.add_argument("--collect", type=int, default=0,
                    help="canary-gated collection: wait for a healthy window,"
                         " attempt, repeat until N valid pairs (ABBA order)")
    ap.add_argument("--timeout-hours", type=float, default=6.0)
    ap.add_argument("--order", default="small-first",
                    choices=["small-first", "big-first"])
    ap.add_argument("--out", default="/tmp/search_scaling.json")
    args = ap.parse_args()

    levels = [args.n, args.n * 4]
    if args.order == "big-first":
        levels = levels[::-1]

    if not args.collect:
        run_pair(args, levels)
        return

    # canary-gated collection, the bench_scaling protocol: wait for two
    # consecutive healthy probes, attempt a pair, alternate leg order per
    # attempt, stop at --collect valid pairs or the deadline
    from canary import measure

    deadline = time.time() + args.timeout_hours * 3600
    n_valid = 0
    attempt = 0
    while n_valid < args.collect and time.time() < deadline:
        r1 = measure()
        print(json.dumps({"probe": r1["first_touch_mbps"]}), flush=True)
        if r1["first_touch_mbps"] < args.healthy:
            time.sleep(120)
            continue
        time.sleep(20)
        if measure()["first_touch_mbps"] < args.healthy:
            time.sleep(120)
            continue
        order = levels if attempt % 2 == 0 else levels[::-1]
        attempt += 1
        try:
            rec = run_pair(args, order)
        except Exception as e:  # noqa: BLE001 — record and keep collecting
            rec = {"ts": round(time.time(), 1), "order": order,
                   "error": str(e)[:500], "valid": False}
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec)[:600], flush=True)
        if rec.get("valid"):
            n_valid += 1
    print(json.dumps({"valid_pairs": n_valid, "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
