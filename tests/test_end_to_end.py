"""End-to-end: build a tiny index, search, compare against brute force.

Mirrors the reference's inverted_index.rs tests (716-807): tiny corpus,
exact expected results, empty vectors never retrieved — plus the
heap_factor=1.0 exactness contract (Accuracy@10 = 1.0 vs exact BM25).
"""

import pytest
from pyspark.sql import functions as F

from seismic_spark.index import SeismicSparkIndex
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages, synth_queries


@pytest.fixture(scope="module")
def tiny_index(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana cherry apple"),
            (1, "banana date"),
            (2, ""),  # empty vector — must never be retrieved
            (3, "cherry cherry cherry elderberry"),
            (4, "apple date elderberry fig"),
            (5, "   "),  # whitespace only — also empty
        ],
        "doc_id BIGINT, text STRING",
    )
    return SeismicSparkIndex.build(
        spark, docs, IndexConfig(n_postings=100, blocking="fixed", block_size=2)
    )


def test_tiny_build_stats(tiny_index):
    assert tiny_index.n_docs == 6
    assert tiny_index.dim == 6  # apple banana cherry date elderberry fig
    assert tiny_index.nnz() == 11


def test_tiny_search_matches_bruteforce(tiny_index):
    queries = [("q0", ["apple", "cherry"], [1.0, 2.0]), ("q1", ["date"], [1.0])]
    got = tiny_index.batch_search(queries, k=3, query_cut=10, heap_factor=1.0)
    exp = tiny_index.bruteforce(queries, k=3)
    g = [(r.query_id, r.rank, r.doc_id) for r in got.collect()]
    e = [(r.query_id, r.rank, r.doc_id) for r in exp.collect()]
    assert sorted(g) == sorted(e)
    scores = {(r.query_id, r.doc_id): r.score for r in got.collect()}
    escores = {(r.query_id, r.doc_id): r.score for r in exp.collect()}
    for key, s in scores.items():
        assert abs(s - escores[key]) < 1e-12


def test_empty_vectors_never_retrieved(tiny_index):
    queries = [("q0", ["apple", "banana", "cherry", "date", "elderberry", "fig"],
                [1.0] * 6)]
    got = tiny_index.batch_search(queries, k=6, heap_factor=1.0).collect()
    assert {r.doc_id for r in got} == {0, 1, 3, 4}


def test_unknown_and_empty_queries(tiny_index):
    queries = [("q_unknown", ["zzz", "yyy"], [1.0, 1.0]), ("q_empty", [], [])]
    got = tiny_index.batch_search(queries, k=3).collect()
    assert got == []


@pytest.fixture(scope="module")
def pages_index(spark):
    pages = synth_pages(spark, 300, vocab_size=500, seed=42).persist()
    docs = pages.select(
        F.xxhash64("url").alias("_h"), "url", "text"
    ).withColumn("doc_id", F.abs(F.col("_h"))).drop("_h")
    idx = SeismicSparkIndex.build(spark, docs, IndexConfig(n_postings=1000))
    return idx


def test_pages_exact_accuracy_at_10(spark, pages_index):
    """heap_factor=1.0 + unpruned index ⇒ Accuracy@10 = 1.0 vs exact BM25."""
    queries = [q for q in synth_queries(500, n_queries=15, seed=42)]
    got = pages_index.batch_search(queries, k=10, query_cut=50, heap_factor=1.0)
    exp = pages_index.bruteforce(queries, k=10)
    g = {(r.query_id, r.doc_id) for r in got.collect()}
    e = {(r.query_id, r.doc_id) for r in exp.collect()}
    assert g == e


def test_pages_deterministic_generation(spark):
    a = synth_pages(spark, 50, vocab_size=200, seed=42, partitions=2).collect()
    b = synth_pages(spark, 50, vocab_size=200, seed=42, partitions=7).collect()
    ka = sorted((r.url, r.text, r.lang, bytes(r.html)) for r in a)
    kb = sorted((r.url, r.text, r.lang, bytes(r.html)) for r in b)
    assert ka == kb


def test_convert_value_type_q13(spark, tiny_index):
    """Q13: converting an index to f16 storage re-encodes weights without
    re-tokenizing, and search over the converted index equals a from-scratch
    f16 build's search."""
    import numpy as np

    conv = tiny_index.convert("f16")
    w = conv.forward.select(F.explode("weights").alias("w")).collect()
    for r in w:  # every stored weight sits on the f16 grid
        assert np.float64(np.float16(r.w)) == r.w
    queries = [("q0", ["apple", "cherry"], [1.0, 2.0])]
    got = {(r.query_id, r.rank, r.doc_id)
           for r in conv.batch_search(queries, k=3, heap_factor=1.0).collect()}
    assert got  # and exactness still holds vs the converted forward
    exp = {(r.query_id, r.rank, r.doc_id)
           for r in conv.bruteforce(queries, k=3).collect()}
    assert got == exp
