"""Headline benchmark — one JSON line for the driver.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Times the engine's headline paths:

  build         index build (tokenize → BM25 → postings w/ summaries)
  search_exact  batch top-10, heap_factor=1.0 (exact), 100 queries
  search_pruned batch top-10 on a statically pruned index, heap_factor=0.8
  search_2p     same pruned batch with two-phase θ tightening (first_sorted)
  knn           κ-NN graph over the pruned corpus — ONE distributed job.
                NOTE: r3 changed the pruned index under this line from
                geometric e=0.8 to the kmeans e=0.5 serving winner; kmeans
                makes ~5× more blocks, measured 1.6× slower knn side-by-side
                — r3 knn times are not comparable to r2's.
  bruteforce    exact full-scan top-10, 20 queries (oracle path)
  dedup_lsh     minhash signatures + LSH candidate pairs
  ann_cosine    brute-force cosine top-5 over embeddings

Extras include Accuracy@10 vs exact and the block skip rate for
hf ∈ {1.0, 0.9, 0.8} on the pruned index (run_experiments.py:287-309
analogue) — the numbers that show what dynamic pruning buys.

Prints: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., plus throughput extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


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

    t0 = time.time()
    idx.bruteforce(qs[:20], k=10).count()
    timings["bruteforce"] = round(time.time() - t0, 3)

    # κ-NN graph: one distributed self-search job over the pruned corpus
    from seismic_spark import knn as knn_mod

    t0 = time.time()
    knn_mod.build_knn(idx_pruned, nknn=5, query_cut=10, heap_factor=0.7).count()
    timings["knn"] = round(time.time() - t0, 3)
    extras["knn_docs_per_sec"] = round(n_docs / timings["knn"], 1)

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
    # host-health context: this sandbox suffers intermittent HOST-level
    # page-supply throttling (tools/canary.py; BENCH/BASELINE.md round 3) —
    # first-touch of new pages drops 30-100x while CPU stays full speed.
    # Healthy plateau ≈ 1400-1700 MB/s; numbers taken under ~<900 are
    # dominated by the hypervisor, not the engine.
    try:
        import sys as _sys

        _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from canary import measure as _canary

        host_mbps = _canary()["first_touch_mbps"]
    except Exception:
        host_mbps = None
    return {
        "metric": "seismic_spark headline suite wall time (build + top-10 batch search + knn graph + dedup + ann; r3: pruned config = the kmeans/e0.5/hf0.9 winner from BENCH/BASELINE.md)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cores": cores,
        "n_docs": n_docs,
        "n_queries": len(qs),
        "n_results": n_res,
        "host_first_touch_mbps": host_mbps,
        **extras,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result = run(sf_dir, cores)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
