"""Rank-identity harness (north rule): the Spark engine must reproduce the
deterministic numpy oracle's top-k on PRUNED/approximate configs, where the
exact-BM25 SQL oracle no longer applies.

Scores are compared at 6dp (distributed float summation order differs at
~1e-15); ranks are re-derived from (rounded score, doc_id) on both sides so
knife-edge ties can't flip the comparison.
"""

import pytest
from pyspark.sql import functions as F

from seismic_spark import oracle
from seismic_spark.index import SeismicSparkIndex
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages, synth_queries


def _normalize(rows):
    """[(qid, rank, doc, score)] → per-query rank list from rounded scores."""
    by_q = {}
    for qid, _, doc, score in rows:
        by_q.setdefault(qid, []).append((round(score, 6), doc))
    out = {}
    for qid, lst in by_q.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = lst
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth_pages(spark, 400, vocab_size=800, seed=42).persist()
    docs = pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    )
    pairs = [(r["doc_id"], r["text"]) for r in docs.collect()]
    return docs, pairs


@pytest.mark.parametrize(
    "cfg,hf,qc,tp",
    [
        (IndexConfig(n_postings=20, summary_energy=0.5, blocking="geometric"), 0.8, 5, False),
        (IndexConfig(n_postings=50, summary_energy=0.8, blocking="fixed", block_size=8), 0.9, 10, False),
        (IndexConfig(n_postings=10**6, summary_energy=1.0), 1.0, 50, False),
        (
            IndexConfig(
                n_postings=40, summary_energy=0.6, blocking="kmeans",
                centroid_fraction=0.2, min_cluster_size=2,
            ),
            0.8,
            8,
            False,
        ),
        (
            IndexConfig(n_postings=15, pruning="global", max_fraction=1.5,
                        summary_energy=0.7),
            0.9,
            10,
            False,
        ),
        (
            IndexConfig(n_postings=60, summary_energy=0.6, value_type="f16"),
            0.8,
            10,
            False,
        ),
        # value-type matrix (P5): bf16 + max-scaled fixed-point storage
        (
            IndexConfig(n_postings=60, summary_energy=0.6, value_type="bf16"),
            0.8,
            10,
            False,
        ),
        (
            IndexConfig(n_postings=60, summary_energy=0.6, value_type="fixedu8"),
            0.8,
            10,
            False,
        ),
        # two-phase θ tightening (first_sorted analogue) — pruned + exact cfg
        (IndexConfig(n_postings=20, summary_energy=0.5, blocking="geometric"), 0.8, 5, True),
        (IndexConfig(n_postings=10**6, summary_energy=1.0), 1.0, 50, True),
        # exact k-means assignment (B3 semantics): doc_cut=∞ scores full vectors
        (
            IndexConfig(
                n_postings=40, summary_energy=0.6, blocking="kmeans",
                centroid_fraction=0.2, min_cluster_size=2, kmeans_doc_cut=10**9,
            ),
            0.8,
            8,
            False,
        ),
        # B4 — II-accelerated k-means assign (utils.rs:316-412)
        (
            IndexConfig(
                n_postings=40, summary_energy=0.6, blocking="kmeans",
                centroid_fraction=0.2, min_cluster_size=2,
                kmeans_mode="ii", kmeans_pruning_factor=0.1, kmeans_doc_cut=8,
            ),
            0.8,
            8,
            False,
        ),
        # fixedu16 value storage (TomlInstructions.md:100-101) end-to-end
        (
            IndexConfig(n_postings=60, summary_energy=0.6, value_type="fixedu16"),
            0.8,
            10,
            False,
        ),
    ],
)
def test_rank_identity_vs_numpy_oracle(spark, corpus, cfg, hf, qc, tp):
    docs, pairs = corpus
    queries = synth_queries(800, n_queries=12, seed=42)
    idx = SeismicSparkIndex.build(spark, docs, cfg)
    got = [
        (r.query_id, r.rank, r.doc_id, r.score)
        for r in idx.batch_search(
            queries, k=10, query_cut=qc, heap_factor=hf, two_phase=tp
        ).collect()
    ]
    oidx = oracle.build(pairs, cfg)
    exp = oracle.search(oidx, queries, k=10, query_cut=qc, heap_factor=hf, two_phase=tp)
    g, e = _normalize(got), _normalize(exp)
    assert set(g) == set(e), f"query sets differ: {set(g) ^ set(e)}"
    for qid in e:
        assert g[qid] == e[qid], f"{qid}: {g[qid]} != {e[qid]}"


def test_oracle_bruteforce_agrees_with_unpruned_search(corpus, spark):
    _, pairs = corpus
    queries = synth_queries(800, n_queries=8, seed=7)
    cfg = IndexConfig(n_postings=10**6, summary_energy=1.0)
    oidx = oracle.build(pairs, cfg)
    a = _normalize(oracle.search(oidx, queries, k=10, query_cut=100, heap_factor=1.0))
    b = _normalize(oracle.bruteforce(oidx, queries, k=10))
    assert a == b
