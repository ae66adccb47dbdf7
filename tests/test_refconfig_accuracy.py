"""Accuracy@10 pin at the reference's PUBLISHED best-config operating point
(docs/Guidelines.md:41-70: n_postings=3000, centroid_fraction=0.2,
min_cluster_size=2, summary_energy=0.5, max_fraction=6; search k=10,
query_cut=10, heap_factor=0.8, sorted=False — the reference reports 99%
Accuracy@10 with this on its corpus).

The engine must hold >= 0.95 at the same parameters at test scale; the
1M-doc measurement lives in tools/bench_refconfig.py -> BENCH/BASELINE.md.
"""

import pytest
from pyspark.sql import functions as F

from seismic_spark.index import IndexConfig, SeismicSparkIndex
from seismic_spark.sources.pages import synth_pages

REF_BEST = IndexConfig(
    n_postings=3000, max_fraction=6.0, pruning="global",
    blocking="kmeans", centroid_fraction=0.2, min_cluster_size=2,
    kmeans_doc_cut=15, summary_energy=0.5, quant_ceil=False,
)


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth_pages(spark, 800, vocab_size=1200, seed=31)
    return (
        pages.select("url", "text")
        .withColumn("doc_id", F.abs(F.xxhash64("url")))
        .persist()
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["doc_id"])
    return out


def test_refconfig_accuracy_at_10(spark, corpus):
    from bench import bench_queries

    idx = SeismicSparkIndex.build(spark, corpus, REF_BEST)
    idx_exact = SeismicSparkIndex.build(
        spark, corpus,
        IndexConfig(n_postings=10**9, summary_energy=1.0, quant_ceil=True),
    )
    terms = [r["term"] for r in idx.vocab.select("term").collect()]
    qs = bench_queries(terms, n=40)
    approx = _topk_sets(
        idx.batch_search(qs, k=10, query_cut=10, heap_factor=0.8,
                         two_phase=False)
    )
    exact = _topk_sets(
        idx_exact.batch_search(qs, k=10, query_cut=10, heap_factor=1.0,
                               two_phase=False)
    )
    accs = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
    ]
    assert accs, "no queries resolved"
    acc = sum(accs) / len(accs)
    assert acc >= 0.95, f"Accuracy@10 {acc:.3f} below the 0.95 pin"
