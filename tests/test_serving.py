"""ServingReplica ≡ engine: the RAM-resident interactive tier must reproduce
`SeismicSparkIndex.batch_search` BITWISE on the same index — same survivor
set, same candidates, same IEEE f64 scores, same (score desc, doc_id asc)
tie order.  Exactness is the point: the replica exists so interactive
serving can skip the Spark scheduler without changing a single result bit
(seismic_spark/serving.py; the reference's own in-process serving,
inverted_index.rs:38, pylib/mod.rs:59-291)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from seismic_spark.index import SeismicSparkIndex
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages, synth_queries


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth_pages(spark, 300, vocab_size=600, seed=11).persist()
    return pages.select("url", "text").withColumn(
        "doc_id", F.abs(F.xxhash64("url"))
    )


def _rows(df_or_pdf):
    if hasattr(df_or_pdf, "toPandas"):
        df_or_pdf = df_or_pdf.toPandas()
    return sorted(
        (r.query_id, int(r.rank), int(r.doc_id), float(r.score))
        for r in df_or_pdf.itertuples(index=False)
    )


@pytest.mark.parametrize(
    "cfg,hf,qc,tp",
    [
        # approximate geometric blocks, hf<1, two-phase (its default-on zone)
        (IndexConfig(n_postings=20, summary_energy=0.5, blocking="geometric"),
         0.8, 5, None),
        # kmeans blocking + energy truncation
        (IndexConfig(n_postings=40, summary_energy=0.6, blocking="kmeans",
                     centroid_fraction=0.2, min_cluster_size=2), 0.8, 8, None),
        # exact unpruned path (θ skips nothing it shouldn't)
        (IndexConfig(n_postings=10**6, summary_energy=1.0), 1.0, 50, False),
        # quantized value storage
        (IndexConfig(n_postings=60, summary_energy=0.6, value_type="fixedu8"),
         0.9, 10, None),
    ],
)
def test_replica_bitwise_identical_to_engine(spark, corpus, cfg, hf, qc, tp):
    queries = synth_queries(600, n_queries=10, seed=3)
    idx = SeismicSparkIndex.build(spark, corpus, cfg)
    engine = _rows(
        idx.batch_search(queries, k=10, query_cut=qc, heap_factor=hf,
                         two_phase=tp)
    )
    rep = idx.serving_replica()
    got = _rows(
        rep.batch_search(queries, k=10, query_cut=qc, heap_factor=hf,
                         two_phase=tp)
    )
    assert got == engine  # exact float equality, not approx


def test_replica_from_saved_index(spark, corpus, tmp_path):
    cfg = IndexConfig(n_postings=30, summary_energy=0.7, blocking="geometric")
    queries = synth_queries(600, n_queries=6, seed=9)
    idx = SeismicSparkIndex.build(spark, corpus, cfg)
    idx.save(str(tmp_path / "idx"))
    loaded = SeismicSparkIndex.load(spark, str(tmp_path / "idx"))
    engine = _rows(loaded.batch_search(queries, k=10, heap_factor=0.8))
    got = _rows(
        loaded.serving_replica().batch_search(queries, k=10, heap_factor=0.8)
    )
    assert got == engine


def test_replica_budget_gate(spark, corpus):
    idx = SeismicSparkIndex.build(
        spark, corpus, IndexConfig(n_postings=20, summary_energy=0.8)
    )
    with pytest.raises(MemoryError, match="space_usage"):
        idx.serving_replica(max_bytes=1)


def test_replica_unknown_and_empty_queries(spark, corpus):
    idx = SeismicSparkIndex.build(
        spark, corpus, IndexConfig(n_postings=20, summary_energy=0.8)
    )
    rep = idx.serving_replica()
    out = rep.batch_search(
        [("q_unknown", ["zz-not-a-token"], [1.0]), ("q_empty", [], [])], k=5
    )
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "rank", "doc_id", "score"]


def test_replica_search_text_matches_engine(spark, corpus):
    idx = SeismicSparkIndex.build(
        spark, corpus, IndexConfig(n_postings=25, summary_energy=0.6)
    )
    rep = idx.serving_replica()
    sample_text = corpus.select("text").first()["text"]
    snippet = " ".join(sample_text.split(" ")[:8])
    engine = _rows(idx.search_text("q0", snippet, k=5, heap_factor=0.9))
    got = _rows(rep.search_text("q0", snippet, k=5, heap_factor=0.9))
    assert got == engine


def test_replica_scores_are_true_dot_products(spark, corpus):
    """Spot-check a replica score against an independent recomputation."""
    cfg = IndexConfig(n_postings=10**6, summary_energy=1.0)
    idx = SeismicSparkIndex.build(spark, corpus, cfg)
    rep = idx.serving_replica()
    queries = synth_queries(600, n_queries=2, seed=5)
    out = rep.batch_search(queries, k=3, query_cut=50, heap_factor=1.0)
    fwd = {
        int(r["doc_id"]): (list(r["terms"]), list(r["weights"]))
        for r in idx.forward.collect()
    }
    for r in out.itertuples(index=False):
        qid, doc = r.query_id, int(r.doc_id)
        terms, weights = next(
            (t, w) for (q, t, w) in queries if q == qid
        )
        qmap = {rep.vocab[t]: w for t, w in zip(terms, weights) if t in rep.vocab}
        dts, dws = fwd[doc]
        expected = sum(qmap.get(t, 0.0) * w for t, w in zip(dts, dws))
        assert np.isclose(r.score, expected, rtol=1e-9)


def test_replica_repeated_query_id_merges_like_engine(spark, corpus):
    """A batch repeating a query_id is ONE merged query in the engine
    (search.resolve_queries keys on qid) — the replica must merge the
    repeated tuples too, not answer each independently."""
    idx = SeismicSparkIndex.build(
        spark, corpus, IndexConfig(n_postings=25, summary_energy=0.6)
    )
    rep = idx.serving_replica()
    base = synth_queries(600, n_queries=1, seed=7)[0]
    _, terms, weights = base
    half = len(terms) // 2 or 1
    # same qid split across two tuples with disjoint token halves
    queries = [
        ("qrep", terms[:half], weights[:half]),
        ("qrep", terms[half:], weights[half:]),
    ]
    engine = _rows(idx.batch_search(queries, k=5, query_cut=10, heap_factor=0.9))
    got = _rows(rep.batch_search(queries, k=5, query_cut=10, heap_factor=0.9))
    assert got == engine
    # exactly one rank sequence for the merged query, no duplicate ranks
    ranks = [r[1] for r in got if r[0] == "qrep"]
    assert ranks == sorted(set(ranks))
