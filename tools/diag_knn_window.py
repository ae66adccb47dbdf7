"""Diagnose the knn line under the CURRENT host window.

Runs build_knn_index + the knn graph job with the event log on, then prints
a per-stage decomposition (task-seconds, python-worker time, run time) so a
throttled-window inflation can be attributed to a specific stage.  Canary
readings bracket the run.

Usage: python tools/diag_knn_window.py [--reps 2] [--out /tmp/diag_knn.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from canary import measure  # noqa: E402

EVDIR = "/tmp/spark-events-diag"


def _ev_lines(evpath: str):
    """Yield event-log JSON lines from a file OR a rolling eventlog_v2 dir
    (zstd-compressed parts)."""
    import io
    import subprocess

    files = (
        sorted(glob.glob(os.path.join(evpath, "events_*")))
        if os.path.isdir(evpath)
        else [evpath]
    )
    for fn in files:
        if fn.endswith(".zstd"):
            p = subprocess.run(["zstd", "-dc", fn], capture_output=True)
            yield from io.StringIO(p.stdout.decode())
        else:
            with open(fn) as f:
                yield from f


def stage_table(evfile: str) -> list[dict]:
    rows = []
    if True:
        for line in _ev_lines(evfile):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                rows.append(
                    {
                        "stage": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "tasks": si["Number of Tasks"],
                        "wall_s": round((comp - sub) / 1000.0, 2)
                        if sub and comp
                        else None,
                    }
                )
            elif ev.get("Event") == "SparkListenerTaskEnd":
                pass
    return rows


def task_metrics(evfile: str) -> dict[int, dict]:
    agg: dict[int, dict] = {}
    if True:
        for line in _ev_lines(evfile):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            a = agg.setdefault(
                sid, {"task_s": 0.0, "cpu_s": 0.0, "n": 0, "gc_s": 0.0}
            )
            a["task_s"] += (tm.get("Executor Run Time") or 0) / 1000.0
            a["cpu_s"] += (tm.get("Executor CPU Time") or 0) / 1e9
            a["gc_s"] += (tm.get("JVM GC Time") or 0) / 1000.0
            a["n"] += 1
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/diag_knn.json")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    pre = measure()

    from pyspark.sql import SparkSession

    from seismic_spark.index import SeismicSparkIndex
    from seismic_spark import knn as knn_mod
    from seismic_spark.postings import IndexConfig
    from seismic_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder.config("spark.eventLog.enabled", "true").config(
        "spark.eventLog.dir", EVDIR
    )
    spark = (
        SparkSession.builder.appName("diag-knn")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .getOrCreate()
        if False
        else get_spark("diag-knn", cores=32, shuffle_partitions=32)
    )
    # get_spark doesn't set event log; rebuild with it
    spark.stop()
    from pyspark.sql import SparkSession as SS

    builder = SS.builder.appName("diag-knn").master("local[32]")
    for k, v in [
        ("spark.python.daemon.module", "seismic_spark.daemon"),
        ("spark.sql.shuffle.partitions", "32"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"),
        ("spark.driver.memory", "8g"),
        ("spark.ui.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.local.dir", "/dev/shm/spark-local"),
        ("spark.eventLog.enabled", "true"),
        ("spark.eventLog.dir", EVDIR),
    ]:
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()

    t0 = time.time()
    idx_geo = SeismicSparkIndex.build(
        spark, docs, IndexConfig(n_postings=1000, pruning="fixed", summary_energy=0.8)
    )
    idx_geo.postings.count()
    build_s = round(time.time() - t0, 2)

    knn_times = []
    marks = []
    for rep in range(args.reps):
        spark.sparkContext.setJobDescription(f"knn-rep{rep}")
        t0 = time.time()
        kdf = knn_mod.build_knn(idx_geo, nknn=5, query_cut=10, heap_factor=0.6)
        kdf = kdf.persist()
        kdf.count()
        t1 = time.time()
        kdf.unpersist()
        knn_times.append(round(t1 - t0, 2))
        marks.append((t0, t1))
        spark.sparkContext.setJobDescription(None)

    mid = measure()
    spark.stop()
    post = measure()

    evfiles = sorted(glob.glob(os.path.join(EVDIR, "*")), key=os.path.getmtime)
    stages = []
    tasks = {}
    if evfiles:
        stages = stage_table(evfiles[-1])
        tasks = task_metrics(evfiles[-1])
    big = [
        {
            **s,
            "task_s": round(tasks.get(s["stage"], {}).get("task_s", 0.0), 1),
            "cpu_s": round(tasks.get(s["stage"], {}).get("cpu_s", 0.0), 1),
            "gc_s": round(tasks.get(s["stage"], {}).get("gc_s", 0.0), 1),
        }
        for s in stages
        if (s["wall_s"] or 0) >= 0.3
    ]
    big.sort(key=lambda s: -(s["wall_s"] or 0))
    rec = {
        "canary_pre": pre["first_touch_mbps"],
        "canary_mid": mid["first_touch_mbps"],
        "canary_post": post["first_touch_mbps"],
        "build_knn_index_s": build_s,
        "knn_times": knn_times,
        "top_stages": big[:25],
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
