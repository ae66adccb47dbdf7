"""Driver contract for the spark-graft builder (PySpark target).

Every entry pairs a Spark implementation from ``seismic_spark`` with an
ANSI-SQL twin that DuckDB runs on the same parquet tables.  Column names,
types (BIGINT/DOUBLE/VARCHAR), and rounding (4dp on floats) are aligned on
both sides so the driver's order-insensitive value-hash matches.

Operator coverage map (SURVEY.md §2): S1/S5 scans → index build entries;
P1-P7 transforms → tokenize/vocab/forward/doc_lookup; I1/I2+B1+M1-M4 →
postings_stats + seismic_topk; Q1-Q6/Q9 → seismic_topk; Q10 →
bruteforce_topk.  Pipeline extras (dedup/ANN/text-analysis/multimodal) are
first-class entries per the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seismic_spark.functions.hashing import MERSENNE, hash_params, md5_int_sql
from seismic_spark.operators.textstats import FP_BASE, STOPWORDS

# ------------------------------------------------------------ fixtures ------

# fixed literal query set over the documents vocabulary (shared Spark ⇄ SQL)
SEARCH_QUERIES: list[tuple[str, list[str], list[float]]] = [
    ("q0", ["spark", "join", "window"], [2.0, 1.0, 1.5]),
    ("q1", ["customer", "merge"], [1.0, 1.0]),
    ("q2", ["the", "a"], [1.0, 2.0]),
    ("q3", ["vector", "query", "fast", "slow"], [1.5, 1.0, 0.5, 2.0]),
    ("q4", ["dup", "data"], [2.0, 0.5]),
    ("q5", ["scan", "order", "key", "hash", "batch"], [1.0] * 5),
]
K = 10
KNN_K = 5  # neighbors per doc in the knn_graph contract entry

# SQL fragments shared by oracles
TOK = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def _tune(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _build_index(spark, sf_dir, with_postings=True, **cfg_kw):
    from seismic_spark.index import SeismicSparkIndex
    from seismic_spark.postings import IndexConfig

    _tune(spark)
    cfg = IndexConfig(**({"n_postings": 10**6} | cfg_kw))
    return SeismicSparkIndex.build(
        spark, _docs(spark, sf_dir).select("doc_id", "text"), cfg,
        with_postings=with_postings,
    )


def _query_values_sql() -> str:
    rows = ", ".join(
        f"('{qid}', '{t}', CAST({w} AS DOUBLE))"
        for qid, ts, ws in SEARCH_QUERIES
        for t, w in zip(ts, ws)
    )
    return f"(VALUES {rows}) AS q(query_id, term, qw)"


def _bm25_topk_sql() -> str:
    """Brute-force BM25 top-K in DuckDB — oracle for both search entries."""
    return f"""
WITH docs AS (SELECT doc_id, {TOK} AS toks FROM documents),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM docs),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs),
tfc AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY ALL),
dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
w AS (
  SELECT tfc.doc_id, q.query_id,
         q.qw * ln(1 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5))
              * tfc.tf * 2.2
              / (tfc.tf + 1.2 * (0.25 + 0.75 * tfc.dl / stats.avgdl)) AS wgt
  FROM tfc JOIN dfc USING (term) JOIN {_query_values_sql()} ON q.term = tfc.term,
       stats),
s AS (SELECT query_id, doc_id, round(sum(wgt), 4) AS score FROM w GROUP BY ALL),
r AS (SELECT query_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
             doc_id, score
      FROM s WHERE score > 0)
SELECT query_id, rank, doc_id, score FROM r WHERE rank <= {K}
"""


def _ann_lsh_sql(n_planes: int = 6, dim: int = 64, k: int = 5) -> str:
    """DuckDB twin of operators/ann.lsh_bucketed_topk: md5-derived
    hyperplanes, 6dp-rounded sign dots, fold-dot cosine re-score."""
    from seismic_spark.operators.ann import planes_sql

    dot_fold = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(q.embedding) + 1), "
        "i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), (a, b) -> a + b)"
    )
    norm_fold = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform({e}, "
        "x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b))"
    )
    return f"""
WITH planes AS ({planes_sql(dim, n_planes)}),
q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
qf AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
              unnest(range(len(embedding)))::INT AS pos FROM q),
cf AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
              unnest(range(len(embedding)))::INT AS pos FROM c),
qd AS (SELECT vec_id, bit, round(sum(v * pv), 6) AS dot
       FROM qf JOIN planes USING (pos) GROUP BY vec_id, bit),
cd AS (SELECT vec_id, bit, round(sum(v * pv), 6) AS dot
       FROM cf JOIN planes USING (pos) GROUP BY vec_id, bit),
qb AS (SELECT vec_id AS query_id,
              sum(CASE WHEN dot > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS bucket
       FROM qd GROUP BY vec_id),
cb AS (SELECT vec_id,
              sum(CASE WHEN dot > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS bucket
       FROM cd GROUP BY vec_id),
cand AS (SELECT query_id, cb.vec_id FROM qb JOIN cb USING (bucket)),
p AS (SELECT cand.query_id, cand.vec_id,
             round({dot_fold} / ({norm_fold.format(e='q.embedding')}
                                 * {norm_fold.format(e='c.embedding')}), 4) AS cosine
      FROM cand JOIN q ON q.vec_id = cand.query_id
                JOIN c ON c.vec_id = cand.vec_id),
r AS (SELECT query_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank,
             vec_id, cosine FROM p)
SELECT query_id, rank, vec_id, cosine FROM r WHERE rank <= {k}
"""


def _neardup_sql(threshold: float, n_planes: int, dim: int = 64) -> str:
    """DuckDB twin of operators/dedup.embedding_neardup_pairs: same
    md5-derived planes / 6dp sign dots as the LSH ANN oracle, all pairs
    within a bucket, fold-dot cosine at 4dp, thresholded."""
    from seismic_spark.operators.ann import planes_sql

    dot_fold = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(x.embedding) + 1), "
        "i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)), (a, b) -> a + b)"
    )
    norm_fold = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform({e}, "
        "v -> v::DOUBLE * v::DOUBLE)), (a, b) -> a + b))"
    )
    return f"""
WITH planes AS ({planes_sql(dim, n_planes)}),
e AS (SELECT vec_id, embedding FROM embeddings),
ef AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
              unnest(range(len(embedding)))::INT AS pos FROM e),
ed AS (SELECT vec_id, bit, round(sum(v * pv), 6) AS dot
       FROM ef JOIN planes USING (pos) GROUP BY vec_id, bit),
eb AS (SELECT vec_id,
              sum(CASE WHEN dot > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS bucket
       FROM ed GROUP BY vec_id),
cand AS (SELECT l.vec_id AS a, r.vec_id AS b
         FROM eb l JOIN eb r USING (bucket) WHERE l.vec_id < r.vec_id),
s AS (SELECT cand.a, cand.b,
             round({dot_fold} / ({norm_fold.format(e='x.embedding')}
                                 * {norm_fold.format(e='y.embedding')}), 4) AS cosine
      FROM cand JOIN e x ON x.vec_id = cand.a JOIN e y ON y.vec_id = cand.b)
SELECT a, b, cosine FROM s WHERE cosine >= {threshold}
"""


def _ann_ivf_sql(n_cells: int = 8, n_probe: int = 2, k: int = 5) -> str:
    """DuckDB twin of operators/ann.ivf_bucketed_topk (md5-sampled
    centroids): centroid j = corpus vector with the j-th smallest
    md5('ivf_' || vec_id) key; assignment = argmax of the 6dp-rounded cosine
    (ties → lower cell); corpus vectors live in 1 cell, queries probe
    ``n_probe``; candidates re-scored with the fold dot at 4dp."""

    def fold_dot(e1: str, e2: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(range(1, len({e1}) + 1), "
            f"i -> {e1}[i]::DOUBLE * {e2}[i]::DOUBLE)), (a, b) -> a + b)"
        )

    def fold_norm(e: str) -> str:
        return (
            f"sqrt(list_reduce(list_prepend(0.0, list_transform({e}, "
            f"x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b))"
        )

    key = md5_int_sql("'ivf_' || vec_id")
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
cent AS (SELECT CAST(row_number() OVER (ORDER BY {key}) - 1 AS INT) AS cell,
                embedding
         FROM c ORDER BY {key} LIMIT {n_cells}),
csim AS (SELECT c.vec_id, cent.cell,
                round({fold_dot('c.embedding', 'cent.embedding')}
                      / ({fold_norm('c.embedding')} * {fold_norm('cent.embedding')}),
                      6) AS sim
         FROM c, cent),
cassign AS (SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM csim) WHERE rn = 1),
qsim AS (SELECT q.vec_id, cent.cell,
                round({fold_dot('q.embedding', 'cent.embedding')}
                      / ({fold_norm('q.embedding')} * {fold_norm('cent.embedding')}),
                      6) AS sim
         FROM q, cent),
qassign AS (SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
    FROM qsim) WHERE rn <= {n_probe}),
cand AS (SELECT DISTINCT query_id, cassign.vec_id
         FROM qassign JOIN cassign USING (cell)),
p AS (SELECT cand.query_id, cand.vec_id,
             round({fold_dot('q.embedding', 'c.embedding')}
                   / ({fold_norm('q.embedding')} * {fold_norm('c.embedding')}),
                   4) AS cosine
      FROM cand JOIN q ON q.vec_id = cand.query_id
                JOIN c ON c.vec_id = cand.vec_id),
r AS (SELECT query_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank,
             vec_id, cosine FROM p)
SELECT query_id, rank, vec_id, cosine FROM r WHERE rank <= {k}
"""


def _vocab_sql() -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest(list_distinct({TOK})) AS term FROM documents),
d AS (SELECT term, count(*) AS df FROM tok GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df,
       CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
FROM d
"""


# ------------------------------------------------------- Spark entries ------


def _q_tokenize_count(spark, sf_dir):
    from seismic_spark.operators.textstats import token_counts

    _tune(spark)
    return token_counts(_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    from seismic_spark.operators.textstats import quality_score

    _tune(spark)
    return quality_score(_docs(spark, sf_dir))


def _q_langid(spark, sf_dir):
    from seismic_spark.operators.textstats import langid_heuristic

    _tune(spark)
    return langid_heuristic(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    from seismic_spark.operators.textstats import fingerprint

    _tune(spark)
    return fingerprint(_docs(spark, sf_dir))


def _q_vocab(spark, sf_dir):
    from seismic_spark.textprep import tokenize
    from seismic_spark.vocab import build_vocab

    _tune(spark)
    v = build_vocab(tokenize(_docs(spark, sf_dir).select("doc_id", "text")))
    return v.select("term", F.col("df").cast("bigint").alias("df"),
                    F.col("term_id").cast("bigint").alias("term_id"))


def _q_forward_bm25(spark, sf_dir):
    from seismic_spark import textprep
    from seismic_spark.vocab import build_vocab

    _tune(spark)
    toks = textprep.tokenize(_docs(spark, sf_dir).select("doc_id", "text")).persist()
    n, avgdl = textprep.corpus_stats(toks)
    vocab = build_vocab(toks)
    dtw = textprep.bm25_weights(textprep.term_frequencies(toks), vocab, n, avgdl)
    return dtw.select(
        "doc_id",
        F.col("term_id").cast("bigint").alias("term_id"),
        F.round("weight", 4).alias("weight"),
    )


def _rerank_rounded(res: DataFrame, k: int) -> DataFrame:
    """Rank on the ROUNDED score (ties → doc_id asc).

    Raw double scores differ between engines at ~1e-15 (summation order), so
    near-duplicate docs would tie-break nondeterministically across engines.
    The engine retrieves k+margin by raw score, then both sides rank on the
    4dp-rounded score identically.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        res.select("query_id", "doc_id", F.round("score", 4).alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def _q_bruteforce_topk(spark, sf_dir):
    idx = _build_index(spark, sf_dir, with_postings=False)
    return _rerank_rounded(idx.bruteforce(SEARCH_QUERIES, k=K + 20), K)


def _q_seismic_topk(spark, sf_dir):
    idx = _build_index(spark, sf_dir)
    res = idx.batch_search(SEARCH_QUERIES, k=K + 20, query_cut=50, heap_factor=1.0)
    return _rerank_rounded(res, K)


def _q_serving_topk(spark, sf_dir):
    """RAM-resident serving replica (seismic_spark/serving.py): hydrate the
    Spark-built index into process memory (the reference's own in-process
    serving, inverted_index.rs:38) and answer the shared query batch in
    numpy — results are bit-identical to batch_search, proven here against
    the same independent DuckDB BM25 oracle the engine entry uses."""
    idx = _build_index(spark, sf_dir)
    rep = idx.serving_replica()
    pdf = rep.batch_search(SEARCH_QUERIES, k=K + 20, query_cut=50, heap_factor=1.0)
    res = spark.createDataFrame(
        pdf, "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE"
    )
    return _rerank_rounded(res, K)


def _q_postings_stats(spark, sf_dir):
    idx = _build_index(
        spark, sf_dir, n_postings=16, pruning="fixed", blocking="geometric",
        block_b0=8, block_cap=128,
    )
    return (
        idx.postings.groupBy("term_id")
        .agg(F.sum("n_docs").alias("nd"), F.sum(F.size("blocks")).alias("nb"))
        .select(
            F.col("term_id").cast("bigint").alias("term_id"),
            F.col("nd").cast("bigint").alias("n_docs"),
            F.col("nb").cast("bigint").alias("n_blocks"),
        )
    )


def _q_doc_lookup(spark, sf_dir):
    _tune(spark)
    return _docs(spark, sf_dir).filter(F.col("doc_id").isin(1, 2, 3, 42)).select(
        "doc_id", "text", "lang"
    )


def _q_term_id_compaction(spark, sf_dir):
    """u32/LV component-id remap (sources/vectors.compact_term_ids): high
    BIGINT component ids (>= 2^31, the reference's LV variant,
    pylib/mod.rs:1159-1166) compact to dense monotone int32 ids.  The
    vector table is synthesized arithmetically from `documents` so the
    DuckDB twin reproduces it exactly; the contract output is the id_map
    (old_id -> term_id), the join the remapped vectors themselves ride."""
    from seismic_spark.sources.vectors import compact_term_ids

    _tune(spark)
    base = F.lit(2147483648)  # 2^31 — every synthesized id is u32-high
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.array(
            *[
                (base + (F.col("doc_id") * 37 + F.lit(j * 1009)) % 1000003)
                .cast("bigint")
                for j in range(3)
            ]
        ).alias("terms"),
        F.array(*[F.lit(float(j + 1)) for j in range(3)]).alias("weights"),
    )
    _, id_map = compact_term_ids(docs)
    return id_map.select(
        F.col("old_id").cast("bigint").alias("old_id"),
        F.col("term_id").cast("int").alias("term_id"),
    )


def _q_dedup_exact(spark, sf_dir):
    from seismic_spark.operators.dedup import exact_dedup

    _tune(spark)
    return exact_dedup(_docs(spark, sf_dir))


def _q_minhash(spark, sf_dir):
    from seismic_spark.operators.dedup import minhash_signatures

    _tune(spark)
    return minhash_signatures(_docs(spark, sf_dir), n_hashes=16).select(
        "doc_id", F.col("sig_idx").cast("bigint").alias("sig_idx"), "minhash"
    )


def _q_lsh_pairs(spark, sf_dir):
    from seismic_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    _tune(spark)
    sigs = minhash_signatures(_docs(spark, sf_dir), n_hashes=16)
    return lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)


def _q_simhash(spark, sf_dir):
    from seismic_spark.operators.dedup import simhash

    _tune(spark)
    return simhash(_docs(spark, sf_dir), n_bits=16)


def _q_ngram_jaccard(spark, sf_dir):
    from seismic_spark.operators.dedup import ngram_jaccard_pairs

    _tune(spark)
    # near-dup cluster (docs containing 'dup') + a spread of regular docs
    subset = _docs(spark, sf_dir).filter(
        F.col("text").contains("dup") | (F.col("doc_id") % 10 == 0)
    )
    return ngram_jaccard_pairs(subset, shingle_n=3, threshold=0.3)


def _q_ann_cosine(spark, sf_dir):
    from seismic_spark.operators.ann import cosine_topk_fold

    _tune(spark)
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    c = emb.filter(F.col("vec_id") % 50 != 0)
    return cosine_topk_fold(q, c, k=5)


def _q_ann_lsh(spark, sf_dir):
    from seismic_spark.operators.ann import lsh_bucketed_topk

    _tune(spark)
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    c = emb.filter(F.col("vec_id") % 50 != 0)
    return lsh_bucketed_topk(q, c, k=5, n_planes=6, dim=64)


IVF_CELLS, IVF_PROBE = 8, 2


def _q_ann_ivf(spark, sf_dir):
    """IVF bucketed ANN with md5-sampled centroids (no Lloyd — the sampled
    variant is exactly SQL-expressible; Lloyd refinement is covered by
    test_operators)."""
    from seismic_spark.operators.ann import ivf_bucketed_topk

    _tune(spark)
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    c = emb.filter(F.col("vec_id") % 50 != 0)
    return ivf_bucketed_topk(
        q, c, k=5, n_cells=IVF_CELLS, n_probe=IVF_PROBE, dim=64
    )


def _q_knn_graph(spark, sf_dir):
    """Q8 as ONE distributed job: forward-as-queries self-search (no driver
    collect) — exact config (unpruned, hf=1.0) so the DuckDB brute-force
    twin applies; approximate configs are covered by test_knn."""
    from seismic_spark import search as srch

    idx = _build_index(spark, sf_dir)
    queries_df = idx.forward.select(
        F.col("doc_id").cast("string").alias("query_id"),
        F.col("terms").alias("q_terms"),
        F.col("weights").alias("q_weights"),
    ).filter(F.size("q_terms") > 0)
    res = srch.batch_search(
        spark, idx.postings, idx.forward, queries_df,
        k=KNN_K + 21, query_cut=100, heap_factor=1.0, broadcast_queries=False,
    ).filter(F.col("doc_id") != F.col("query_id").cast("bigint"))
    ranked = _rerank_rounded(res, KNN_K)
    return ranked.select(
        F.col("query_id").cast("bigint").alias("doc_id"),
        "rank",
        F.col("doc_id").alias("neighbor_id"),
        "score",
    )


def _q_multimodal(spark, sf_dir):
    from seismic_spark.operators.multimodal import decode_binary_column

    _tune(spark)
    payloads = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return decode_binary_column(payloads)


def _q_events_hourly(spark, sf_dir):
    # same code path as the Structured Streaming rollup (batch plan)
    from seismic_spark.streaming.events import hourly_rollup

    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hourly_rollup(ev)


NEARDUP_THRESHOLD, NEARDUP_PLANES = 0.3, 4


def _q_embedding_neardup(spark, sf_dir):
    from seismic_spark.operators.dedup import embedding_neardup_pairs

    _tune(spark)
    return embedding_neardup_pairs(
        _emb(spark, sf_dir), dim=64,
        threshold=NEARDUP_THRESHOLD, n_planes=NEARDUP_PLANES,
    )


def _q_multimodal_features(spark, sf_dir):
    from seismic_spark.operators.multimodal import extract_features

    _tune(spark)
    payloads = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return extract_features(payloads)


FRAME_STRIDE = 7


def _q_multimodal_frames(spark, sf_dir):
    from seismic_spark.operators.multimodal import sample_frames

    _tune(spark)
    payloads = _docs(spark, sf_dir).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return sample_frames(payloads, stride=FRAME_STRIDE)


SESSION_GAP_MIN = 30


def _q_sessionize(spark, sf_dir):
    # same contract as the applyInPandasWithState stream (test_sessions
    # pins stream == batch); the batch plan is the SQL-expressible twin
    from seismic_spark.streaming.sessions import sessionize

    _tune(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_minutes=SESSION_GAP_MIN)


# ------------------------------------------------------------- contract -----


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the Seismic-style index over sf0.001 documents and
    answer the fixed query batch with dynamic pruning (exact at hf=1.0)."""
    return _q_seismic_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize_count": _q_tokenize_count,
        "quality_score": _q_quality,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "vocab": _q_vocab,
        "forward_bm25": _q_forward_bm25,
        "bruteforce_topk": _q_bruteforce_topk,
        "seismic_topk": _q_seismic_topk,
        "serving_topk": _q_serving_topk,
        "postings_stats": _q_postings_stats,
        "doc_lookup": _q_doc_lookup,
        "term_id_compaction": _q_term_id_compaction,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash,
        "lsh_candidate_pairs": _q_lsh_pairs,
        "simhash": _q_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "ann_cosine_topk": _q_ann_cosine,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "knn_graph": _q_knn_graph,
        "multimodal_decode": _q_multimodal,
        "multimodal_features": _q_multimodal_features,
        "multimodal_frames": _q_multimodal_frames,
        "embedding_neardup": _q_embedding_neardup,
        "events_hourly": _q_events_hourly,
        "sessionize": _q_sessionize,
    }


def oracle_sql() -> dict[str, str]:
    params = hash_params(16, seed=42)
    params_sql = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    minhash_core = f"""
WITH d AS (SELECT doc_id, {TOK} AS toks FROM documents),
sh AS (SELECT doc_id,
              unnest(list_distinct(list_transform(
                  range(1, len(toks) - 1),
                  i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
       FROM d WHERE len(toks) >= 3),
h AS (SELECT doc_id, {md5_int_sql('shingle')} AS hv FROM sh),
mh AS (SELECT doc_id, CAST(p.sig_idx AS BIGINT) AS sig_idx,
              CAST(min((p.a * (hv % {MERSENNE}) + p.b) % {MERSENNE}) AS BIGINT) AS minhash
       FROM h, (VALUES {params_sql}) AS p(sig_idx, a, b)
       GROUP BY doc_id, p.sig_idx)
"""
    jaccard_sql = f"""
WITH d AS (SELECT doc_id, {TOK} AS toks FROM documents
           WHERE text LIKE '%dup%' OR doc_id % 10 = 0),
sh AS (SELECT doc_id,
              unnest(list_distinct(list_transform(
                  range(1, len(toks) - 1),
                  i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
       FROM d WHERE len(toks) >= 3),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
i AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS ni
      FROM sh x JOIN sh y USING (shingle)
      WHERE x.doc_id < y.doc_id GROUP BY ALL),
j AS (SELECT doc_a, doc_b,
             round(ni::DOUBLE / (sa.n + sb.n - ni), 4) AS jaccard
      FROM i JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.3
"""
    dot_fold = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(q.embedding) + 1), "
        "i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), (a, b) -> a + b)"
    )
    norm_fold = (
        "sqrt(list_reduce(list_prepend(0.0, list_transform({e}, "
        "x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b))"
    )
    return {
        "tokenize_count": f"""
SELECT doc_id,
       CAST(len({TOK}) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct({TOK})) AS BIGINT) AS n_distinct,
       CAST(length(text) AS BIGINT) AS n_chars_seen
FROM documents
""",
        "quality_score": f"""
WITH m AS (SELECT doc_id, len({TOK})::DOUBLE AS n,
                  len(list_filter({TOK}, t -> list_contains({STOP_SQL}, t)))::DOUBLE AS sh,
                  len(list_distinct({TOK}))::DOUBLE AS nd
           FROM documents)
SELECT doc_id,
       round(CASE WHEN n > 0 THEN sh / n ELSE 0 END, 4) AS stop_ratio,
       round(CASE WHEN n > 0 THEN nd / n ELSE 0 END, 4) AS distinct_ratio,
       round(CASE WHEN n > 0 THEN 0.4 * least(1.0, n / 100)
                                 + 0.3 * least(1.0, 4 * sh / n)
                                 + 0.3 * nd / n ELSE 0 END, 4) AS quality
FROM m
""",
        "langid": f"""
WITH m AS (SELECT doc_id, len({TOK})::DOUBLE AS n,
                  len(list_filter({TOK}, t -> list_contains({STOP_SQL}, t)))::DOUBLE AS sh
           FROM documents)
SELECT doc_id,
       CASE WHEN n > 0 AND sh / n >= 0.08 THEN 'en' ELSE 'unk' END AS lang_pred
FROM m
""",
        "fingerprint": f"""
SELECT doc_id,
       CAST(list_reduce(
           list_prepend(0, list_transform({TOK}, t -> {md5_int_sql('t')} % {MERSENNE})),
           (a, b) -> (a * {FP_BASE} + b) % {MERSENNE}) AS BIGINT) AS fingerprint
FROM documents
""",
        "vocab": _vocab_sql(),
        "forward_bm25": f"""
WITH docs AS (SELECT doc_id, {TOK} AS toks FROM documents),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM docs),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs),
tfc AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY ALL),
dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
v AS (SELECT term, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
      FROM dfc)
SELECT tfc.doc_id, v.term_id,
       round(ln(1 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5))
             * tfc.tf * 2.2
             / (tfc.tf + 1.2 * (0.25 + 0.75 * tfc.dl / stats.avgdl)), 4) AS weight
FROM tfc JOIN dfc USING (term) JOIN v USING (term), stats
""",
        "bruteforce_topk": _bm25_topk_sql(),
        "seismic_topk": _bm25_topk_sql(),
        "serving_topk": _bm25_topk_sql(),
        "postings_stats": f"""
WITH tok AS (SELECT doc_id, unnest(list_distinct({TOK})) AS term FROM documents),
dfc AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
v AS (SELECT term, df, CAST(row_number() OVER (ORDER BY term) - 1 AS BIGINT) AS term_id
      FROM dfc)
SELECT term_id, CAST(least(df, 16) AS BIGINT) AS n_docs,
       CAST(CASE WHEN least(df, 16) <= 8 THEN 1 ELSE 2 END AS BIGINT) AS n_blocks
FROM v
""",
        "doc_lookup": "SELECT doc_id, text, lang FROM documents WHERE doc_id IN (1, 2, 3, 42)",
        "term_id_compaction": """
WITH olds AS (
  SELECT DISTINCT 2147483648 + ((doc_id * 37 + j * 1009) % 1000003) AS old_id
  FROM documents, (VALUES (0), (1), (2)) AS t(j)
)
SELECT old_id, CAST(ROW_NUMBER() OVER (ORDER BY old_id) - 1 AS INT) AS term_id
FROM olds
""",
        "dedup_exact": """
SELECT min(doc_id) AS kept_doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
""",
        "minhash_signatures": minhash_core + "SELECT doc_id, sig_idx, minhash FROM mh",
        "lsh_candidate_pairs": minhash_core + """
, banded AS (SELECT doc_id, sig_idx // 4 AS band,
                    string_agg(minhash::VARCHAR, '_' ORDER BY sig_idx) AS band_key
             FROM mh GROUP BY doc_id, sig_idx // 4)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM banded x JOIN banded y ON x.band = y.band AND x.band_key = y.band_key
WHERE x.doc_id < y.doc_id
""",
        "simhash": f"""
WITH tok AS (SELECT doc_id, unnest({TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY ALL),
h AS (SELECT doc_id, tf, {md5_int_sql('term')} AS hv FROM tf),
bits AS (SELECT doc_id, b.bit,
                CASE WHEN (hv >> b.bit) & 1 = 1 THEN tf ELSE -tf END AS contrib
         FROM h, (SELECT unnest(range(0, 16)) AS bit) b),
s AS (SELECT doc_id, bit, sum(contrib) AS s FROM bits GROUP BY ALL)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM s GROUP BY doc_id
""",
        "ngram_jaccard": jaccard_sql,
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        "knn_graph": f"""
WITH docs AS (SELECT doc_id, {TOK} AS toks FROM documents),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM docs),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM docs),
tfc AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY ALL),
dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
w AS (SELECT tfc.doc_id, tfc.term,
             ln(1 + (stats.n - dfc.df + 0.5) / (dfc.df + 0.5))
             * tfc.tf * 2.2
             / (tfc.tf + 1.2 * (0.25 + 0.75 * tfc.dl / stats.avgdl)) AS wgt
      FROM tfc JOIN dfc USING (term), stats),
p AS (SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
             round(sum(a.wgt * b.wgt), 4) AS score
      FROM w a JOIN w b USING (term)
      WHERE a.doc_id <> b.doc_id GROUP BY ALL),
r AS (SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank,
             neighbor_id, score
      FROM p)
SELECT doc_id, rank, neighbor_id, score FROM r WHERE rank <= {KNN_K}
""",
        "ann_cosine_topk": f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 <> 0),
p AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {dot_fold} AS dot,
             {norm_fold.format(e='q.embedding')} AS qn,
             {norm_fold.format(e='c.embedding')} AS cn
      FROM q, c),
s AS (SELECT query_id, vec_id, round(dot / (qn * cn), 4) AS cosine FROM p),
r AS (SELECT query_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank,
             vec_id, cosine FROM s)
SELECT query_id, rank, vec_id, cosine FROM r WHERE rank <= 5
""",
        "multimodal_decode": """
WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents)
SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes,
       CAST(16 + nb % 624 AS INT) AS width,
       CAST(16 + (nb * 7919) % 464 AS INT) AS height,
       floor((CASE WHEN nb = 0 THEN 0.0
             ELSE list_reduce(list_prepend(0.0, list_transform(string_split(text, ''),
                  ch -> ascii(ch)::DOUBLE)), (a, b) -> a + b) / nb END) * 10000 + 0.5)
           / 10000 AS mean_byte
FROM b
""",
        "events_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY ALL
""",
        "embedding_neardup": _neardup_sql(NEARDUP_THRESHOLD, NEARDUP_PLANES),
        # the two multimodal oracles below slice/bin CHARACTERS while the
        # Spark side works on UTF-8 BYTES — equal only because the synthetic
        # documents are pure ASCII (same standing assumption as the
        # mean_byte oracle above; asserted against testdata in round 3)
        "multimodal_features": """
WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
by AS (SELECT doc_id, unnest(list_transform(string_split(text, ''),
              ch -> ascii(ch) // 16)) AS bin
       FROM b WHERE nb > 0),
h AS (SELECT doc_id, bin, count(*) AS c FROM by GROUP BY doc_id, bin),
g AS (SELECT b.doc_id, b.nb, r.range::INT AS bin FROM b, range(16) r)
SELECT g.doc_id, g.bin,
       floor(coalesce(h.c, 0) / greatest(g.nb, 1)::DOUBLE * 10000 + 0.5)
           / 10000 AS frac
FROM g LEFT JOIN h ON h.doc_id = g.doc_id AND h.bin = g.bin
""",
        "multimodal_frames": f"""
WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
f AS (SELECT doc_id, text, CAST(1 + nb % 120 AS INT) AS n_frames,
             greatest(1, nb // (1 + nb % 120)) AS fsize FROM b),
x AS (SELECT doc_id, n_frames, fsize, text,
             unnest(range(0, n_frames, {FRAME_STRIDE}))::INT AS frame_idx FROM f),
s AS (SELECT doc_id, frame_idx, n_frames,
             substr(text, frame_idx * fsize + 1, fsize) AS sl FROM x)
SELECT doc_id, frame_idx, n_frames,
       CAST(octet_length(encode(sl)) AS BIGINT) AS frame_bytes,
       md5(sl) AS frame_md5
FROM s
""",
        "sessionize": f"""
WITH o AS (SELECT user_id, ts, event_id, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           > {SESSION_GAP_MIN * 60_000_000} THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
t AS (SELECT user_id, ts, value,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
                 AS session_seq
      FROM o)
SELECT user_id, session_seq,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM t GROUP BY user_id, session_seq
""",
    }
