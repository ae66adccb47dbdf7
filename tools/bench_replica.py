"""Interactive serving: ServingReplica vs the Spark fast path at 1M docs.

The round-4/5 serving experiments established a ~4 s Spark floor per
interactive batch (two real scan jobs; deferred gaps / compact snapshots /
relation caching all measured and rejected — BENCH/serving_r5.json).  The
ServingReplica (seismic_spark/serving.py) removes the scheduler from the
interactive path entirely: hydrate the stored index into process memory
once, serve from numpy with bit-identical results.

This harness measures, in ONE window, interleaved per rep so host drift
cannot favor a side:
  - hydration wall time (the replica's startup cost, paid once),
  - replica batch latency at batch 1/10/100/1000 and Spark fast-path
    latency at batch 10/100 (its measured-best interactive regime),
  - a result-identity check (replica rows == engine rows, exact floats),
  - pre/post canary brackets (tools/canary.py) for the record.

Expected shape (and the honest framing): the replica wins interactive
batches by >10×; the distributed path keeps index-scale batches (its 327
QPS asymptote at batch 10 000 uses 16 cores; the replica is one core) and
everything DataFrame-scale (κ-NN).  The crossover is the routing rule.

Usage: python tools/bench_replica.py [--docs 1000000] [--vocab 100000]
       [--ckpt /dev/shm/scaling-ckpt-16] [--reps 3]
       [--out BENCH/replica_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from canary import measure  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--ckpt", default="/dev/shm/scaling-ckpt-16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--budget-gb", type=float, default=24.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "replica_r5.json"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from bench import bench_queries
    from seismic_spark.checkpoint import CheckpointedBuild
    from seismic_spark.postings import IndexConfig

    pre = measure()
    spark = (
        SparkSession.builder.appName("bench-replica")
        .master("local[16]")
        .config("spark.driver.memory", "48g")
        # hydration collects the 1M-row forward through the driver JVM
        .config("spark.driver.maxResultSize", "0")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    input_path = f"/dev/shm/scaling-input-{args.docs}-{args.vocab}"
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        from seismic_spark.sources.pages import synth_pages

        pages = synth_pages(
            spark, args.docs, vocab_size=args.vocab, seed=42, partitions=64
        )
        pages.select("url", "text").withColumn(
            "doc_id", F.abs(F.xxhash64("url"))
        ).write.mode("overwrite").parquet(input_path)
    docs = spark.read.parquet(input_path)

    t0 = time.time()
    idx = CheckpointedBuild(spark, args.ckpt, resume=True, lineage_detail="light").build(
        docs,
        IndexConfig(
            n_postings=1000, pruning="fixed", summary_energy=0.5, quant_ceil=True
        ),
    )
    resume_sec = round(time.time() - t0, 2)

    t0 = time.time()
    rep = idx.serving_replica(max_bytes=int(args.budget_gb * (1 << 30)))
    hydrate_sec = round(time.time() - t0, 2)
    print(json.dumps({"resume_sec": resume_sec, "hydrate_sec": hydrate_sec}),
          flush=True)

    terms = [
        r["term"]
        for r in idx.vocab.filter(F.col("df") > 5).select("term").collect()
    ]
    qs = bench_queries(terms, n=10_000)
    kw = dict(k=10, query_cut=10, heap_factor=0.8)

    # identity check: exact float equality on a shared batch
    eng = sorted(
        (r.query_id, int(r.rank), int(r.doc_id), float(r.score))
        for r in idx.batch_search(qs[:50], **kw).collect()
    )
    got = sorted(
        (r.query_id, int(r.rank), int(r.doc_id), float(r.score))
        for r in rep.batch_search(qs[:50], **kw).itertuples(index=False)
    )
    identical = eng == got
    print(json.dumps({"identity_50q": identical}), flush=True)

    # warm both paths outside the timings
    idx.batch_search(qs[:10], **kw).count()
    rep.batch_search(qs[:10], **kw)

    rows = []
    in_run = []
    for rp in range(args.reps):
        for batch in (1, 10, 100, 1000):
            t0 = time.time()
            rep.batch_search(qs[:batch], **kw)
            rows.append(
                {"side": "replica", "batch": batch, "rep": rp,
                 "sec": round(time.time() - t0, 4)}
            )
        for batch in (10, 100):
            t0 = time.time()
            idx.batch_search(qs[:batch], **kw).count()
            rows.append(
                {"side": "spark", "batch": batch, "rep": rp,
                 "sec": round(time.time() - t0, 4)}
            )
        in_run.append(measure()["first_touch_mbps"])

    post = measure()
    rec = {
        "docs": args.docs, "vocab": args.vocab,
        "resume_sec": resume_sec, "hydrate_sec": hydrate_sec,
        "identity_50q": identical, "rows": rows,
        "canary_pre_mbps": pre["first_touch_mbps"],
        "canary_post_mbps": post["first_touch_mbps"],
        "canary_in_run": in_run,
        "ts": round(time.time(), 1),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f)
    meds = {}
    for side in ("replica", "spark"):
        for batch in (1, 10, 100, 1000):
            s = sorted(
                r["sec"] for r in rows if r["side"] == side and r["batch"] == batch
            )
            if s:
                meds[f"{side}_b{batch}"] = s[len(s) // 2]
    print(json.dumps({"medians_sec": meds, "out": args.out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
