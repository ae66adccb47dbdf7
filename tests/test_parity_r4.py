"""Round-4 parity closures (VERDICT.md r3 "Next round" items 2/3/4/6 and the
ADVICE.md docmap-persistence fix):

- collision-safe dense doc ids for string-id vector builds (id_scheme);
- content ride-along + get_doc_text on vector-built indexes
  (inverted_index_wrapper.rs:93-107, 288-293; load_content default
  pylib/mod.rs:327-384);
- input_token_to_id_map parity — caller-supplied vocab shared across
  separately built indexes (pylib/mod.rs:333-384,
  inverted_index_wrapper.rs:398-422);
- n_knn in the search signature (pylib/mod.rs:490-533);
- docmap/content surviving save()/load();
- dim = max(term_id)+1, the reference definition (inverted_index.rs:400-403).
"""

import json

import pytest

from seismic_spark.index import IndexConfig, SeismicSparkIndex
from seismic_spark.sources.vectors import read_jsonl_vectors

DOCS = [
    ("url-b", {"apple": 1.5, "zebra": 0.25, "mango": 3.0}, "text of b"),
    ("url-a", {"apple": 2.0, "kiwi": 1.0}, "text of a"),
    ("url-c", {"kiwi": 0.5, "apple": 0.125}, "text of c"),
    ("url-d", {"zebra": 4.0}, "text of d"),
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "vecs.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"id": d, "vector": v, "content": c}) for d, v, c in DOCS
        )
        + "\n"
    )
    return str(p)


def _build(spark, jsonl_path, **kw):
    return SeismicSparkIndex.build_from_vectors(
        spark, read_jsonl_vectors(spark, jsonl_path), **kw
    )


def test_dense_id_scheme_default(spark, jsonl_path):
    """Default id_scheme='dense': internal ids are 0..n-1 in sorted-external
    order — collision-free by construction at any corpus size (the r3 verdict
    flagged abs(xxhash64)'s ~5e4 expected merged pairs at 10^12 docs)."""
    idx = _build(spark, jsonl_path)
    dm = {r["ext_id"]: r["doc_id"] for r in idx.docmap.collect()}
    assert dm == {"url-a": 0, "url-b": 1, "url-c": 2, "url-d": 3}
    # search still agrees with bruteforce and remaps to external ids
    q = [("q0", ["apple", "zebra"], [1.0, 1.0])]
    got = idx.remap_results(idx.batch_search(q, k=4)).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == ["url-d", "url-a", "url-b", "url-c"]
    assert [r["score"] for r in got] == pytest.approx([4.0, 2.0, 1.75, 0.125])


def test_hash64_id_scheme_still_available(spark, jsonl_path):
    idx = _build(spark, jsonl_path, id_scheme="hash64")
    dm = {r["ext_id"]: r["doc_id"] for r in idx.docmap.collect()}
    assert set(dm) == {"url-a", "url-b", "url-c", "url-d"}
    assert all(v >= 0 for v in dm.values())
    assert len(set(dm.values())) == 4  # no collision at this scale
    with pytest.raises(ValueError):
        _build(spark, jsonl_path, id_scheme="nope")


def test_content_rideline_and_get_doc_text(spark, jsonl_path):
    """load_content=True (the reference default) keeps (doc_id, content);
    get_doc_text serves it by external OR internal id."""
    idx = _build(spark, jsonl_path)
    assert idx.get_doc_text("url-c") == "text of c"
    internal = {r["ext_id"]: r["doc_id"] for r in idx.docmap.collect()}
    assert idx.get_doc_text(internal["url-a"]) == "text of a"
    assert idx.get_doc_text("url-zzz") is None
    idx2 = _build(spark, jsonl_path, load_content=False)
    assert idx2.content is None
    assert idx2.get_doc_text("url-a") is None


def test_save_load_persists_docmap_and_content(spark, jsonl_path, tmp_path):
    """ADVICE.md medium: save() persists the docmap (and content), load()
    restores both — the CLI vector-build path no longer loses external ids."""
    idx = _build(spark, jsonl_path)
    out = str(tmp_path / "idx")
    idx.save(out)
    back = SeismicSparkIndex.load(spark, out)
    assert back.docmap is not None and back.content is not None
    q = [("q0", ["zebra"], [1.0])]
    got = back.remap_results(back.batch_search(q, k=2)).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == ["url-d", "url-b"]
    assert back.get_doc_text("url-d") == "text of d"
    meta = json.loads(open(out + "/meta.json").read())
    assert meta["has_docmap"] and meta["has_content"]


def test_shared_vocab_across_indexes(spark, jsonl_path, tmp_path):
    """input_token_to_id_map parity: a second corpus built with the first
    index's vocab resolves the same query to the same term ids, so results
    from both shards are comparable (federated-shard routing)."""
    idx_a = _build(spark, jsonl_path)
    # second corpus: overlapping tokens, one novel token ("novel" must drop)
    p2 = tmp_path / "shard2.jsonl"
    p2.write_text(
        "\n".join(
            json.dumps({"id": d, "vector": v})
            for d, v in [
                ("s2-x", {"apple": 9.0, "novel": 5.0}),
                ("s2-y", {"zebra": 1.0, "kiwi": 2.0}),
            ]
        )
        + "\n"
    )
    idx_b = SeismicSparkIndex.build_from_vectors(
        spark, read_jsonl_vectors(spark, str(p2)), vocab=idx_a.vocab
    )
    va = {r["term"]: r["term_id"] for r in idx_a.vocab.collect()}
    vb = {r["term"]: r["term_id"] for r in idx_b.vocab.collect()}
    assert va == vb  # ids shared verbatim, reference semantics
    # the novel token was dropped (P3 silent-drop), not assigned a new id
    fb = idx_b.forward.collect()
    all_terms = {t for r in fb for t in r["terms"]}
    assert all_terms <= set(va.values())
    # same query resolves identically on both shards
    q = [("q0", ["apple"], [1.0])]
    ra = idx_a.remap_results(idx_a.batch_search(q, k=1)).collect()
    rb = idx_b.remap_results(idx_b.batch_search(q, k=1)).collect()
    assert ra[0]["score"] == pytest.approx(2.0)  # url-a apple weight
    assert rb[0]["doc_id"] == "s2-x" and rb[0]["score"] == pytest.approx(9.0)


def test_shared_vocab_text_build(spark):
    """build(..., vocab=...) on the text path: two text corpora share ids."""
    docs_a = spark.createDataFrame(
        [(1, "apple zebra apple"), (2, "kiwi mango")], "doc_id BIGINT, text STRING"
    )
    docs_b = spark.createDataFrame(
        [(10, "apple novel"), (11, "zebra")], "doc_id BIGINT, text STRING"
    )
    idx_a = SeismicSparkIndex.build(spark, docs_a)
    idx_b = SeismicSparkIndex.build(spark, docs_b, vocab=idx_a.vocab)
    va = {r["term"]: r["term_id"] for r in idx_a.vocab.collect()}
    vb = {r["term"]: r["term_id"] for r in idx_b.vocab.collect()}
    assert va == vb
    terms_b = {t for r in idx_b.forward.collect() for t in r["terms"]}
    assert terms_b <= set(va.values())  # "novel" dropped


def test_n_knn_search_param(spark):
    """n_knn on the search signature delegates to κ-NN refinement and equals
    the dedicated batch_search_knn path (pylib/mod.rs:490-533 takes n_knn on
    every search)."""
    docs = spark.createDataFrame(
        [
            (i, " ".join(w))
            for i, w in enumerate(
                [
                    ["apple", "banana", "cherry"],
                    ["apple", "banana", "dates"],
                    ["cherry", "dates", "elder"],
                    ["fig", "grape", "apple"],
                    ["banana", "cherry", "fig"],
                    ["grape", "elder", "dates"],
                ]
            )
        ],
        "doc_id BIGINT, text STRING",
    )
    idx = SeismicSparkIndex.build(spark, docs)
    idx.build_knn(nknn=3)
    q = [("q0", ["apple", "banana"], [1.0, 1.0])]
    via_param = idx.batch_search(q, k=3, n_knn=2).orderBy("rank").collect()
    via_method = idx.batch_search_knn(q, k=3, n_knn=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in via_param] == [
        (r["doc_id"], r["score"]) for r in via_method
    ]
    # single-query signature too
    single = idx.search("q0", ["apple", "banana"], [1.0, 1.0], k=3, n_knn=2)
    assert [(r["doc_id"], r["score"]) for r in single.orderBy("rank").collect()] == [
        (r["doc_id"], r["score"]) for r in via_param
    ]
    with pytest.raises(ValueError):
        SeismicSparkIndex.build(spark, docs).batch_search(q, k=3, n_knn=2)


def test_dim_is_max_component_plus_one(spark):
    """dim = largest component id + 1 (inverted_index.rs:400-403) — the
    S3/int-term identity-vocab path keeps NON-contiguous ids."""
    vecs = spark.createDataFrame(
        [(0, [2, 90], [1.0, 2.0]), (1, [5], [3.0])],
        "doc_id BIGINT, terms ARRAY<INT>, weights ARRAY<FLOAT>",
    )
    idx = SeismicSparkIndex.build_from_vectors(spark, vecs)
    assert idx.dim == 91  # max id 90, not the 3 distinct terms
