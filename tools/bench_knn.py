"""κ-NN graph config sweep — attack the headline `knn` line (r4 verdict #5).

The r4 headline suite spends 23–26 s on the κ-NN graph (5000 docs as
queries, geometric e=0.8 index, query_cut=10, heap_factor=0.7) — the single
biggest line.  The batch-size sweep showed search is per-query-marginal-cost
bound at this batch size (~2–3 ms/query), so the lever is the work per
query: fewer matched posting lists (query_cut), tighter θ (two_phase), or
cheaper blocks.  The reference's own knn defaults are k=nknn+1, query_cut
(dynamic default 10), heap_factor=0.7 (inverted_index.rs:448-500) — this
sweep measures what trimming costs in graph accuracy on the SAME corpus so
the bench config is a measured choice, not a guess.

Accuracy: sampled docs' (doc_id % 100 == 0) approximate neighbor sets vs
exact (hf=1.0, unpruned index) self-search — identical to bench.py's
knn_accuracy extra.

Usage: python tools/bench_knn.py [--sf /root/testdata/sf0.1] [--cores 32]
       [--reps 2] [--out /tmp/knn_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/knn_sweep.json")
    ap.add_argument("--variants", default="",
                    help="comma-separated variant names (default: all)")
    args = ap.parse_args()

    from canary import measure

    from pyspark.sql import functions as F

    from seismic_spark import knn as knn_mod
    from seismic_spark import search as srch
    from seismic_spark.index import SeismicSparkIndex
    from seismic_spark.postings import IndexConfig
    from seismic_spark.session import get_spark

    pre = measure()["first_touch_mbps"]
    spark = get_spark("knn-sweep", cores=args.cores,
                      shuffle_partitions=max(32, args.cores))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    idx_geo = SeismicSparkIndex.build(
        spark, docs,
        IndexConfig(n_postings=1000, pruning="fixed", summary_energy=0.8),
    )
    idx_geo.postings.count()
    idx_full = SeismicSparkIndex.build(spark, docs, IndexConfig(n_postings=10**6))
    idx_full.postings.count()

    # exact ground truth once (bench.py's sampled accuracy protocol)
    sampleq = (
        idx_full.forward.filter(F.col("doc_id") % 100 == 0)
        .select(
            F.col("doc_id").cast("string").alias("query_id"),
            F.col("terms").alias("q_terms"),
            F.col("weights").alias("q_weights"),
        )
        .filter(F.size("q_terms") > 0)
    )
    exact_nb = (
        srch.batch_search(
            spark, idx_full.postings, idx_full.forward, sampleq,
            k=6, query_cut=10, heap_factor=1.0, broadcast_queries=False,
        )
        .withColumn("_q", F.col("query_id").cast("bigint"))
        .filter(F.col("doc_id") != F.col("_q"))
        .groupBy("_q")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "doc_id"))),
                    lambda s: s["doc_id"],
                ),
                1, 5,
            ).alias("exact_nb")
        )
        .persist()
    )
    exact_nb.count()

    def accuracy(knn_df) -> float:
        row = (
            knn_df.join(exact_nb, knn_df["doc_id"] == exact_nb["_q"])
            .agg(
                F.avg(
                    F.size(F.array_intersect("neighbors", "exact_nb"))
                    / F.least(F.size("exact_nb"), F.lit(5))
                ).alias("acc")
            )
            .collect()[0]
        )
        return round(float(row["acc"]), 4)

    # Round-5 sweep 1 (BENCH/knn_sweep_r5.json) measured query_cut as the
    # accuracy lever — qc5 drops graph accuracy 0.96 -> 0.824 because the
    # candidate pool IS the matched lists' union — while hf 0.7 -> 0.6 at
    # fixed qc cost nothing (0.824 == 0.824).  Sweep 2 therefore holds
    # qc=10 (full candidate pool) and pushes heap_factor down instead.
    all_variants = {
        "baseline_qc10_hf0.7": {"query_cut": 10, "heap_factor": 0.7,
                                "two_phase": False},
        "qc5_hf0.7": {"query_cut": 5, "heap_factor": 0.7, "two_phase": False},
        "qc4_hf0.7": {"query_cut": 4, "heap_factor": 0.7, "two_phase": False},
        "qc3_hf0.7": {"query_cut": 3, "heap_factor": 0.7, "two_phase": False},
        "qc5_hf0.7_2p": {"query_cut": 5, "heap_factor": 0.7,
                         "two_phase": True},
        "qc5_hf0.6": {"query_cut": 5, "heap_factor": 0.6, "two_phase": False},
        "qc10_hf0.6": {"query_cut": 10, "heap_factor": 0.6,
                       "two_phase": False},
        # shuffle-width lever (VERDICT r4 #5's AQE-coalescing suggestion):
        # at graph scale every shuffle partition is tiny, so the fixed
        # distributed chain is schedule-bound — fewer/wider partitions
        # trade parallelism for fewer tasks per stage.
        "qc10_hf0.6_sp8": {"query_cut": 10, "heap_factor": 0.6,
                           "two_phase": False, "shuffle_partitions": 8},
        "qc10_hf0.6_sp64": {"query_cut": 10, "heap_factor": 0.6,
                            "two_phase": False, "shuffle_partitions": 64},
        "qc10_hf0.5": {"query_cut": 10, "heap_factor": 0.5,
                       "two_phase": False},
        "qc8_hf0.6": {"query_cut": 8, "heap_factor": 0.6, "two_phase": False},
    }
    names = (args.variants.split(",") if args.variants
             else list(all_variants))
    variants = [{"name": n, **all_variants[n]} for n in names]

    # warm the UDF workers once, untimed
    knn_mod.build_knn(idx_geo, nknn=5, query_cut=3, heap_factor=0.7).count()

    results = []
    base_sp = spark.conf.get("spark.sql.shuffle.partitions")
    for rep in range(args.reps):
        for v in variants:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(v.get("shuffle_partitions", base_sp)))
            t0 = time.time()
            g = knn_mod.build_knn(
                idx_geo, nknn=5, query_cut=v["query_cut"],
                heap_factor=v["heap_factor"], two_phase=v["two_phase"],
            ).persist()
            g.count()
            sec = round(time.time() - t0, 2)
            spark.conf.set("spark.sql.shuffle.partitions", base_sp)
            acc = accuracy(g)
            g.unpersist()
            results.append({**v, "rep": rep, "sec": sec, "accuracy": acc,
                            "docs_per_sec": round(n_docs / sec, 1)})
            print(json.dumps(results[-1]), flush=True)

    spark.stop()
    post = measure()["first_touch_mbps"]
    out = {"sf": args.sf, "cores": args.cores, "n_docs": n_docs,
           "canary_pre_mbps": pre, "canary_post_mbps": post,
           "canary_valid": min(pre, post) >= 900.0, "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("canary_pre_mbps", "canary_post_mbps", "canary_valid")}))


if __name__ == "__main__":
    main()
