"""Accuracy@k harness + skip-rate instrumentation + introspection (Q11/Q12).

The recall-95-style config (docs/Guidelines.md:41-70 scaled to the test
corpus: energy-truncated summaries, kmeans blocking, heap_factor sweep) must
hold Accuracy@10 ≥ 0.95, and the skip-rate metric must show that dynamic
pruning actually skips blocks at hf ≤ 1.0 with estimate summaries.
"""

import pytest
from pyspark.sql import functions as F

from seismic_spark.index import SeismicSparkIndex
from seismic_spark.metrics import accuracy_at_k, recall_grid
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages, synth_queries


@pytest.fixture(scope="module")
def corpus_index(spark):
    pages = synth_pages(spark, 400, vocab_size=800, seed=42).persist()
    docs = pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    )
    # recall-95 recipe analogue (Guidelines.md:41-70 scaled to this corpus):
    # generous list budget, energy-truncated summaries, kmeans blocking.
    cfg = IndexConfig(
        n_postings=2000, summary_energy=0.8, blocking="kmeans",
        centroid_fraction=0.2, min_cluster_size=2, max_fraction=6.0,
    )
    return SeismicSparkIndex.build(spark, docs, cfg)


def _zipf_queries(n=20, seed=11):
    """Zipfian queries only — the edge-case `q_head` (pure stopword query,
    near-zero BM25 weights) is the known blind spot of ESTIMATE summaries:
    energy truncation drops stopword components from every block summary, so
    its blocks score ub≈0 — faithful Seismic behavior (the reference's
    accuracy figures are on SPLADE vectors where such queries don't occur)."""
    return synth_queries(800, n_queries=n, seed=seed)[:n]


def test_accuracy_at_recall95_config(spark, corpus_index):
    queries = _zipf_queries()
    grid = recall_grid(
        corpus_index, queries, k=10, query_cut=10, heap_factors=(1.0, 0.9, 0.8)
    )
    by_hf = {g["hf"]: g for g in grid}
    assert by_hf[1.0]["accuracy"] >= 0.95
    assert by_hf[0.9]["accuracy"] >= 0.95
    # LOWER heap_factor relaxes the skip test (posting_list.rs:130): it scans
    # MORE blocks and accuracy can only improve.
    assert by_hf[0.8]["accuracy"] >= by_hf[1.0]["accuracy"] - 1e-9
    assert by_hf[0.8]["blocks_scanned"] >= by_hf[1.0]["blocks_scanned"]
    # the skip machinery reports consistent numbers, and pruning does prune
    for g in grid:
        assert g["blocks_scanned"] + g["blocks_skipped"] == g["blocks_matched"]
        assert 0.0 < g["skip_rate"] < 1.0


def test_stopword_query_exact_under_upper_bound_summaries(spark):
    """The estimate-summary blind spot (stopword-only queries) disappears
    under the exactness contract: energy=1.0 + ceil quantization + hf=1.0."""
    pages = synth_pages(spark, 200, vocab_size=400, seed=42)
    docs = pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    )
    idx = SeismicSparkIndex.build(
        spark, docs, IndexConfig(n_postings=10**6, summary_energy=1.0)
    )
    q = [("q_head", ["term_0", "term_1", "term_2"], [3.0, 2.0, 1.0])]
    got = idx.batch_search(q, k=10, query_cut=10, heap_factor=1.0)
    exact = idx.bruteforce(q, k=10)
    assert accuracy_at_k(got, exact, k=10) == 1.0


def test_two_phase_tightens_theta(spark, corpus_index):
    """Phase-1 θ tightening (first_sorted analogue) must increase the skip
    rate.  Like the reference's evolving heap threshold, the tighter θ costs
    recall at the SAME heap_factor with estimate summaries — the operating
    point moves: two_phase at a lower hf reaches one-phase recall with fewer
    scans.  Assert both sides of that tradeoff."""
    queries = _zipf_queries(15, seed=23)
    one = recall_grid(corpus_index, queries, k=10, query_cut=10,
                      heap_factors=(0.9,), two_phase=False)[0]
    two = recall_grid(corpus_index, queries, k=10, query_cut=10,
                      heap_factors=(0.9,), two_phase=True)[0]
    assert two["blocks_scanned"] <= one["blocks_scanned"]
    assert two["candidates"] <= one["candidates"]
    assert two["skip_rate"] >= one["skip_rate"]
    assert two["accuracy"] >= 0.85  # bounded loss at the same hf


def test_two_phase_exact_config_free_skips(spark):
    """Under the exactness contract (upper-bound summaries, hf=1.0) the
    tighter phase-1 θ skips strictly MORE blocks at zero recall cost —
    accuracy stays 1.0 (the provable case; rank-identity covers parity)."""
    pages = synth_pages(spark, 300, vocab_size=600, seed=42)
    docs = pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    )
    idx = SeismicSparkIndex.build(
        spark, docs, IndexConfig(n_postings=10**6, summary_energy=1.0)
    )
    queries = _zipf_queries(12, seed=5)
    one = recall_grid(idx, queries, k=10, query_cut=10,
                      heap_factors=(1.0,), two_phase=False)[0]
    two = recall_grid(idx, queries, k=10, query_cut=10,
                      heap_factors=(1.0,), two_phase=True)[0]
    assert one["accuracy"] == 1.0 and two["accuracy"] == 1.0
    assert two["blocks_scanned"] <= one["blocks_scanned"]
    assert two["candidates"] <= one["candidates"]


def test_accuracy_at_k_definition(spark):
    got = spark.createDataFrame(
        [("q", 1, 10, 1.0), ("q", 2, 11, 0.9)],
        "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE",
    )
    exact = spark.createDataFrame(
        [("q", 1, 10, 1.0), ("q", 2, 12, 0.9)],
        "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE",
    )
    assert accuracy_at_k(got, exact, k=2) == 0.5


def test_introspection_q11_q12(spark, corpus_index):
    # Q11: posting-list doc ids for one term == docs containing that term
    term_row = corpus_index.vocab.orderBy(F.col("df").desc()).first()
    got = {
        r.doc_id
        for r in corpus_index.get_doc_ids_in_postings(term_row.term_id).collect()
    }
    expect = {
        r.doc_id
        for r in corpus_index.forward.filter(
            F.array_contains("terms", term_row.term_id)
        ).collect()
    }
    assert got == expect and got
    # Q12: full component breakdown, all populated and consistent
    su = corpus_index.space_usage()
    for key in ("forward", "postings_packed", "offsets", "summaries", "total"):
        assert su[key] > 0
    assert su["total"] == (
        su["forward"] + su["postings_packed"] + su["offsets"] + su["summaries"]
    )
    assert su["postings_packed"] == su["gaps"] + su["weights"]


def test_mrr_at_k_definition(spark):
    from seismic_spark.metrics import mrr_at_k

    got = spark.createDataFrame(
        [("a", 1, 10, 1.0), ("a", 2, 11, 0.9),
         ("b", 1, 20, 1.0), ("b", 3, 21, 0.5),
         ("c", 1, 30, 1.0)],
        "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE",
    )
    qrels = spark.createDataFrame(
        [("a", 11), ("b", 21), ("c", 99), ("d", 1)],
        "query_id STRING, doc_id BIGINT",
    )
    # a: first relevant at rank 2 → 1/2; b: rank 3 → 1/3; c,d: no hit → 0
    assert mrr_at_k(got, qrels, k=10) == round((0.5 + 1/3) / 4, 4)


def test_ndcg_at_k_definition(spark):
    """Pinned hand-computed nDCG@3 (graded rels, (2^rel−1)/log2(rank+1))."""
    from math import log2

    from seismic_spark.metrics import ndcg_at_k

    got = spark.createDataFrame(
        [("q1", 1, 2, 9.0), ("q1", 2, 1, 8.0), ("q1", 3, 4, 7.0),
         ("q2", 1, 5, 9.0), ("q2", 2, 9, 8.0),
         ("q3", 1, 7, 9.0)],
        "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE",
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 3.0), ("q1", 2, 2.0), ("q1", 3, 1.0),
         ("q2", 9, 1.0),
         ("q3", 8, 0.0)],  # zero ideal gain → contributes 0
        "query_id STRING, doc_id BIGINT, rel DOUBLE",
    )
    dcg1 = 3 / log2(2) + 7 / log2(3)            # d2 at rank1, d1 at rank2
    idcg1 = 7 / log2(2) + 3 / log2(3) + 1 / log2(4)
    dcg2 = 1 / log2(3)                           # d9 at rank2
    want = round((dcg1 / idcg1 + dcg2 / 1.0 + 0.0) / 3, 4)
    assert ndcg_at_k(got, qrels, k=3) == want
