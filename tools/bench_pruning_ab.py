"""Focused interleaved A/B: exact vs the winning estimate-summary config at
1M docs, ABAB ordering so drift can't favor either side.  Reuses the
/dev/shm checkpoints that tools/bench_pruning_1m.py built (resume=True).

Usage: python tools/bench_pruning_ab.py [--reps 4] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--queries", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import bench_queries
    from seismic_spark.checkpoint import CheckpointedBuild
    from seismic_spark.postings import IndexConfig
    from seismic_spark.session import get_spark

    spark = get_spark("bench-ab", cores=args.cores, shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"/dev/shm/scaling-input-{args.docs}-{args.vocab}")

    cfgs = {
        "exact": (IndexConfig(n_postings=1000, pruning="fixed",
                              summary_energy=1.0, quant_ceil=True), 1.0, False),
        "pruned_hf09": (IndexConfig(
            n_postings=1000, pruning="fixed", blocking="kmeans",
            centroid_fraction=0.1, min_cluster_size=2, kmeans_doc_cut=15,
            summary_energy=0.5, quant_ceil=False), 0.9, False),
        "pruned_hf09_2p": (IndexConfig(
            n_postings=1000, pruning="fixed", blocking="kmeans",
            centroid_fraction=0.1, min_cluster_size=2, kmeans_doc_cut=15,
            summary_energy=0.5, quant_ceil=False), 0.9, True),
    }
    idx = {}
    for name, (cfg, _, _) in cfgs.items():
        ck = "exact" if name == "exact" else "kmeans_e05"
        idx[name] = CheckpointedBuild(
            spark, f"/dev/shm/bench-pruning-{ck}-{args.docs}",
            resume=True, lineage_detail="light",
        ).build(docs, cfg)

    terms = [r["term"] for r in
             idx["exact"].vocab.filter(F.col("df") > 5).select("term").collect()]
    qs = bench_queries(terms, n=args.queries)
    idx["exact"].batch_search(qs[:2], k=10).count()  # warm workers

    times = {k: [] for k in cfgs}
    order = list(cfgs) * args.reps
    for name in order:
        cfg, hf, tp = cfgs[name]
        t0 = time.time()
        idx[name].batch_search(
            qs, k=10, query_cut=10, heap_factor=hf, two_phase=tp
        ).count()
        times[name].append(round(time.time() - t0, 2))
        print(f"# {name}: {times[name][-1]} s", flush=True)

    out = {}
    for name, secs in times.items():
        med = sorted(secs)[len(secs) // 2]
        out[name] = {"secs": secs, "median": med,
                     "qps": round(args.queries / med, 1)}
    print(json.dumps({"n_docs": args.docs, "cores": args.cores,
                      "reps": args.reps, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
