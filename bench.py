"""Headline benchmark — one JSON line for the driver.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Times the engine's headline paths:

  build         index build (tokenize → BM25 → postings w/ summaries)
  search_exact  batch top-10, heap_factor=1.0 (exact), 100 queries
  search_pruned batch top-10 on a statically pruned index, heap_factor=0.8
  search_2p     same pruned batch with two-phase θ tightening (first_sorted)
  knn           κ-NN graph — ONE distributed job over a geometric e=0.8
                index (r2's config, restored in r4: r3 built the graph on
                the kmeans serving index and measured it 1.6× slower
                side-by-side (50.6 vs 21.7 s) — nothing forces graph
                construction onto the serving index, so the bench uses the
                measured-cheapest config and reports graph accuracy vs
                exact self-search (knn_accuracy extra).  r4 knn IS
                comparable to r2 again; r3's number is the odd one out.
  bruteforce    exact full-scan top-10, 20 queries (oracle path)
  dedup_lsh     minhash signatures + LSH candidate pairs
  ann_cosine    brute-force cosine top-5 over embeddings

Extras include Accuracy@10 vs exact and the block skip rate for
hf ∈ {1.0, 0.9, 0.8} on the pruned index (run_experiments.py:287-309
analogue) — the numbers that show what dynamic pruning buys.

Canary-gated (the round-3 ``tools/bench_scaling.py --collect`` validity
protocol, applied here after the r3 headline regressed ~1.9x on
code-unchanged lines with only a single pre-run canary to judge it by):
the suite waits for a healthy host window (two consecutive first-touch
readings ≥ 1300 MB/s), runs bracketed by pre/post canaries plus a 30 s
in-run watcher, and the sample is **valid** only if both brackets clear
900 MB/s and the in-run minimum clears 60 MB/s (in-run readings are
self-contended by the suite's own page churn, hence the far lower floor —
below it means the hypervisor stalled page supply mid-measurement).
Invalid samples are retried (bounded); the LAST attempt is printed either
way, carrying ``bench_valid`` so a throttled number can never again be
mistaken for an engine number.  Env knobs: SPARK_GRAFT_BENCH_WAIT_SEC
(healthy-window budget per attempt, default 900), SPARK_GRAFT_BENCH_RETRIES
(re-runs after an invalid sample, default 2).

Prints: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "bench_valid": ...,
         canary fields, plus throughput extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

# canary gates — EXACTLY tools/bench_scaling.py --collect's defaults, so a
# "valid" headline sample and a "valid" scaling sample mean the same thing
HEALTHY_MBPS = 1300.0   # to START an attempt (two consecutive readings)
VALID_MBPS = 900.0      # pre/post bracket floor for the sample to COUNT
INRUN_FLOOR_MBPS = 60.0  # min self-contended in-run reading (host stall)


def _canary_measure() -> dict:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from canary import measure

    return measure()


def bench_queries(terms: list[str], n: int = 100, seed: int = 42):
    """Deterministic query batch over the corpus vocabulary."""
    import numpy as np

    from seismic_spark.sources.pages import _u01

    out = []
    terms = sorted(terms)
    for q in range(n):
        ids = np.arange(q * 97, q * 97 + 6, dtype=np.uint64)
        us = _u01(ids, 7, seed)
        picks = sorted({int(u * len(terms)) for u in us[:3 + q % 4]})
        ws = [float(0.5 + 2.5 * u) for u in us[: len(picks)]]
        out.append((f"b{q}", [terms[p] for p in picks], ws))
    return out


def run(sf_dir: str, cores: int, quiet: bool = False) -> dict:
    from seismic_spark.index import SeismicSparkIndex
    from seismic_spark.operators.ann import cosine_topk
    from seismic_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from seismic_spark.postings import IndexConfig
    from seismic_spark.session import get_spark

    spark = get_spark("seismic-bench", cores=cores, shuffle_partitions=max(32, cores))
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()

    t0 = time.time()
    idx = SeismicSparkIndex.build(spark, docs, IndexConfig(n_postings=10**6))
    idx.postings.count()  # materialize
    timings["build"] = round(time.time() - t0, 3)
    extras["build_docs_per_sec"] = round(n_docs / timings["build"], 1)

    terms = [r["term"] for r in idx.vocab.select("term").collect()]
    qs = bench_queries(terms, n=100)

    # warm the Python UDF workers + JIT once (2 queries, untimed) so timed
    # numbers measure the engine, not interpreter/JVM spin-up — the
    # per-session warmup is a constant that amortizes to zero at real scale
    idx.batch_search(qs[:2], k=10, query_cut=10, heap_factor=1.0).count()

    t0 = time.time()
    n_res = idx.batch_search(qs, k=10, query_cut=10, heap_factor=1.0).count()
    timings["search_exact"] = round(time.time() - t0, 3)
    extras["search_exact_qps"] = round(len(qs) / timings["search_exact"], 2)

    # the estimate-summary serving config that WINS at 1M docs
    # (BENCH/BASELINE.md round-3 table: kmeans blocking + energy=0.5,
    # hf=0.9 → 1.82× exact QPS at Accuracy@10=0.988)
    t0 = time.time()
    idx_pruned = SeismicSparkIndex.build(
        spark, docs, IndexConfig(
            n_postings=1000, pruning="fixed", blocking="kmeans",
            centroid_fraction=0.1, min_cluster_size=2, kmeans_doc_cut=15,
            summary_energy=0.5, quant_ceil=False,
        )
    )
    idx_pruned.postings.count()
    timings["build_pruned"] = round(time.time() - t0, 3)

    t0 = time.time()
    idx_pruned.batch_search(
        qs, k=10, query_cut=10, heap_factor=0.9, two_phase=False
    ).count()
    timings["search_pruned"] = round(time.time() - t0, 3)
    extras["search_pruned_qps"] = round(len(qs) / timings["search_pruned"], 2)

    t0 = time.time()
    idx_pruned.batch_search(
        qs, k=10, query_cut=10, heap_factor=0.9, two_phase=True
    ).count()
    timings["search_2p"] = round(time.time() - t0, 3)
    extras["search_2p_qps"] = round(len(qs) / timings["search_2p"], 2)

    # RAM-resident serving replica (r5, seismic_spark/serving.py): the
    # reference's own in-process serving architecture, hydrated from the
    # Spark-built serving index — bit-identical results (test_serving)
    # without the per-batch scheduler floor.  hydrate = one-time startup;
    # search_replica = the same 100-query batch the Spark lines run.
    t0 = time.time()
    replica = idx_pruned.serving_replica()
    timings["hydrate_replica"] = round(time.time() - t0, 3)
    t0 = time.time()
    replica.batch_search(qs, k=10, query_cut=10, heap_factor=0.9, two_phase=True)
    timings["search_replica"] = round(time.time() - t0, 3)
    extras["search_replica_qps"] = round(
        len(qs) / timings["search_replica"], 2
    )

    t0 = time.time()
    idx.bruteforce(qs[:20], k=10).count()
    timings["bruteforce"] = round(time.time() - t0, 3)

    # κ-NN graph: one distributed self-search job.  Built on a geometric
    # e=0.8 index (r2's config) — the measured-cheapest graph-construction
    # config (r3: kmeans-serving knn 1.6× slower side-by-side); the index
    # build is timed separately (build_knn_index) so `knn` is the graph job.
    # heap_factor=0.6 is the round-5 sweep's choice (BENCH/knn_sweep_r5*.json,
    # tools/bench_knn.py): query_cut is the accuracy lever (qc5 drops graph
    # accuracy 0.96 -> 0.824 — the candidate pool IS the matched lists'
    # union) while hf 0.7 -> 0.6 at qc10 holds accuracy at exactly 0.96 and
    # cut the graph job to ~0.64x in a same-window interleaved sweep.
    from seismic_spark import knn as knn_mod
    from seismic_spark import search as srch

    t0 = time.time()
    idx_geo = SeismicSparkIndex.build(
        spark, docs, IndexConfig(n_postings=1000, pruning="fixed",
                                 summary_energy=0.8)
    )
    idx_geo.postings.count()
    timings["build_knn_index"] = round(time.time() - t0, 3)

    t0 = time.time()
    knn_df = knn_mod.build_knn(idx_geo, nknn=5, query_cut=10, heap_factor=0.6)
    knn_df = knn_df.persist()
    knn_df.count()
    timings["knn"] = round(time.time() - t0, 3)
    extras["knn_docs_per_sec"] = round(n_docs / timings["knn"], 1)

    # graph accuracy: sampled docs' approximate neighbors vs exact
    # (hf=1.0, unpruned index) self-search — the quality the 0.6/geometric
    # shortcut actually delivers
    sampleq = (
        idx.forward.filter(F.col("doc_id") % 100 == 0)
        .select(
            F.col("doc_id").cast("string").alias("query_id"),
            F.col("terms").alias("q_terms"),
            F.col("weights").alias("q_weights"),
        )
        .filter(F.size("q_terms") > 0)
    )
    exact_nb = (
        srch.batch_search(
            spark, idx.postings, idx.forward, sampleq,
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
    )
    acc_row = (
        knn_df.join(exact_nb, knn_df["doc_id"] == exact_nb["_q"])
        .agg(
            F.avg(
                F.size(F.array_intersect("neighbors", "exact_nb"))
                / F.least(F.size("exact_nb"), F.lit(5))
            ).alias("acc")
        )
        .collect()[0]
    )
    extras["knn_accuracy"] = round(float(acc_row["acc"]), 4)
    knn_df.unpersist()

    # quality/efficiency grid (Accuracy@10 + skip rate per heap_factor)
    from seismic_spark.metrics import recall_grid

    grid = recall_grid(
        idx_pruned, qs[:20], k=10, query_cut=10, heap_factors=(1.0, 0.9, 0.8)
    )
    extras["accuracy_grid"] = {
        str(g["hf"]): {"accuracy": g["accuracy"], "skip_rate": g["skip_rate"]}
        for g in grid
    }

    full_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    lsh_candidate_pairs(minhash_signatures(full_docs, n_hashes=16)).count()
    timings["dedup_lsh"] = round(time.time() - t0, 3)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_emb = emb.filter(F.col("vec_id") % 50 == 0)
    c_emb = emb.filter(F.col("vec_id") % 50 != 0)
    t0 = time.time()
    cosine_topk(q_emb, c_emb, k=5).count()
    timings["ann_cosine"] = round(time.time() - t0, 3)

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "seismic_spark headline suite wall time (build + top-10 batch search + RAM-replica serve + knn graph + dedup + ann; serving config = kmeans/e0.5/hf0.9, knn on geometric e0.8 = r2-comparable; r4: canary-gated, see bench_valid)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cores": cores,
        "n_docs": n_docs,
        "n_queries": len(qs),
        "n_results": n_res,
        **extras,
    }


def _wait_healthy(budget_sec: float) -> bool:
    """Block until two consecutive canary readings clear HEALTHY_MBPS
    (bench_scaling.collect's start gate), or the budget runs out."""
    deadline = time.time() + budget_sec
    while True:
        r1 = _canary_measure()
        if r1["first_touch_mbps"] >= HEALTHY_MBPS:
            time.sleep(15)
            if _canary_measure()["first_touch_mbps"] >= HEALTHY_MBPS:
                return True
        if time.time() >= deadline:
            return False
        time.sleep(60)


def gated_run(sf_dir: str, cores: int) -> dict:
    """One bracketed + watched suite run, verdict attached (never raises on
    canary machinery — a box with no canary module still benches, just
    unvalidated)."""
    import threading

    try:
        pre = _canary_measure()
    except Exception:
        pre = None
    in_run: list[float] = []
    stop = threading.Event()

    def watch() -> None:
        while not stop.wait(30.0):
            try:
                in_run.append(_canary_measure()["first_touch_mbps"])
            except Exception:
                return

    t = threading.Thread(target=watch, daemon=True)
    t.start()
    try:
        res = run(sf_dir, cores)
    finally:
        stop.set()
        t.join(timeout=5)
    try:
        post = _canary_measure()
    except Exception:
        post = None
    brackets = [
        r["first_touch_mbps"] for r in (pre, post) if r is not None
    ]
    res["canary_pre_mbps"] = pre["first_touch_mbps"] if pre else None
    res["canary_post_mbps"] = post["first_touch_mbps"] if post else None
    res["canary_in_run_min_mbps"] = round(min(in_run), 0) if in_run else None
    res["canary_in_run"] = in_run
    res["bench_valid"] = bool(
        brackets
        and min(brackets) >= VALID_MBPS
        and (not in_run or min(in_run) >= INRUN_FLOOR_MBPS)
    )
    return res


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    wait_sec = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_SEC", "900"))
    retries = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "2"))
    result = None
    for attempt in range(1 + retries):
        try:
            _wait_healthy(wait_sec)
        except Exception:
            pass
        result = gated_run(sf_dir, cores)
        result["bench_attempt"] = attempt + 1
        if result["bench_valid"]:
            break
        print(
            json.dumps({"bench_attempt_invalid": attempt + 1,
                        "canaries": [result["canary_pre_mbps"],
                                     result["canary_post_mbps"]],
                        "in_run_min": result["canary_in_run_min_mbps"]}),
            file=sys.stderr, flush=True,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
