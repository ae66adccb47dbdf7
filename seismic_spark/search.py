"""Batch top-k search with Seismic-style dynamic pruning, Spark-first.

Reference semantics (inverted_index.rs:153-234, posting_list.rs:115-215):
scan only the posting lists of the top-``query_cut`` query terms; skip blocks
whose summary-estimated dot product is below ``heap_factor × θ`` (θ = current
k-th best score); exactly re-score survivors against full doc vectors.

Distributed re-design (deterministic — SURVEY.md §7.3): the reference's θ
evolves inside one thread; a naive port would need a driver round-trip to
share it.  Instead θ is derived **inside the plan** from block-max lower
bounds, so the whole batch is ONE Spark job:

  For a query term t with weight qw_t, every doc in a block b of t's posting
  list scores at least qw_t × (its own stored weight); the block's best doc
  scores ≥ qw_t × bmax_b.  Blocks of one list hold DISTINCT docs, so the
  k-th largest qw_t·bmax over t's blocks is witnessed by k distinct docs →
  it lower-bounds the final k-th best score.  θ_q = max over matched terms
  of that per-term k-th largest (computed with a window over the same
  matched-blocks frame — no action, no driver loop).

  Blocks with ``summary_ub < heap_factor × θ_q`` are skipped; survivors are
  decoded, deduped across lists (the reference's `visited` set), exactly
  re-scored against full doc vectors, and top-k'ed per query.

With upper-bound summaries (summary_energy=1.0, quant_ceil) and
heap_factor=1.0 this is EXACT w.r.t. scanning the cut-term posting lists:
any true top-k doc sits in a block whose ub ≥ its score ≥ θ_final ≥ θ_q.

Physical plan: queries are broadcast (a few KB); `postings ⋈ query_terms` is
a broadcast hash join that touches only matching term rows (partition-pruned
when the postings table is term-hash partitioned); candidate→forward is a
shuffle join on doc_id (bucket-able at scale); top-k is window row_number —
never a driver-side loop over docs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seismic_spark import codec

QVec = tuple[np.ndarray, np.ndarray]  # (term_ids sorted asc int64, weights f64)


# ------------------------------------------------------ query resolution ----


def resolve_queries(
    spark: SparkSession,
    queries: list[tuple[str, list[str], list[float]]],
    vocab: DataFrame,
) -> dict[str, QVec]:
    """Token → term_id resolution; unknown tokens silently dropped, result
    sorted by term id (P3, inverted_index_wrapper.rs:75-91)."""
    rows = [
        (qid, t, float(w))
        for qid, terms, weights in queries
        for t, w in zip(terms, weights)
    ]
    if not rows:
        return {}
    qdf = spark.createDataFrame(rows, "query_id STRING, term STRING, qw DOUBLE")
    resolved = (
        vocab.join(F.broadcast(qdf), "term")
        .select("query_id", "term_id", "qw")
        .collect()
    )
    out: dict[str, QVec] = {}
    by_q: dict[str, list[tuple[int, float]]] = {}
    for r in resolved:
        by_q.setdefault(r["query_id"], []).append((r["term_id"], r["qw"]))
    for qid, pairs in by_q.items():
        pairs.sort()
        t = np.asarray([p[0] for p in pairs], dtype=np.int64)
        w = np.asarray([p[1] for p in pairs], dtype=np.float64)
        out[qid] = (t, w)
    return out


def cut_terms_df(
    spark: SparkSession, qvecs: dict[str, QVec], query_cut: int
) -> DataFrame:
    """Top-``query_cut`` terms per query by weight (inverted_index.rs:187-190)
    as a small DataFrame for the broadcast join."""
    rows = []
    for qid, (t, w) in qvecs.items():
        if t.size == 0:
            continue
        keep = np.argsort(-w, kind="stable")[:query_cut]
        for i in keep:
            rows.append((qid, int(t[i])))
    return spark.createDataFrame(rows, "query_id STRING, term_id INT")


# -------------------------------------------------------------- scoring -----


def exact_score(
    cands: DataFrame, forward: DataFrame, qvecs: dict[str, QVec], id_col: str = "doc_id"
) -> DataFrame:
    """Exact dot product of full query vector vs full doc vectors.

    cands(query_id, doc_id) ⋈ forward → vectorized CSR dot in a pandas UDF
    (merge via np.searchsorted — Q5 analogue).  Returns
    (query_id, doc_id, score DOUBLE).
    """
    joined = cands.join(forward, id_col).select("query_id", id_col, "terms", "weights")

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            outs = []
            for qid, grp in pdf.groupby("query_id", sort=False):
                qt, qw = qvecs[qid]
                terms_list = [np.asarray(a, dtype=np.int64) for a in grp["terms"]]
                w_list = [np.asarray(a, dtype=np.float64) for a in grp["weights"]]
                lens = np.fromiter((a.size for a in terms_list), dtype=np.int64)
                if lens.sum() == 0 or qt.size == 0:
                    scores = np.zeros(len(grp))
                else:
                    ft = np.concatenate(terms_list)
                    fw = np.concatenate(w_list)
                    idx = np.searchsorted(qt, ft)
                    idx_c = np.minimum(idx, qt.size - 1)
                    m = qt[idx_c] == ft
                    contrib = fw * qw[idx_c] * m
                    cs = np.concatenate(([0.0], np.cumsum(contrib)))
                    ends = np.cumsum(lens)
                    starts = ends - lens
                    scores = cs[ends] - cs[starts]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "doc_id": grp[id_col].to_numpy(),
                            "score": scores,
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return joined.mapInPandas(
        score_batches, "query_id STRING, doc_id BIGINT, score DOUBLE"
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k, ties broken by doc_id asc (pinned total order,
    SURVEY.md §7.3) — (query_id, rank, doc_id, score)."""
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# ------------------------------------------------------ block UB scan -------


def _block_ubs(
    postings_matched: DataFrame, qvecs: dict[str, QVec]
) -> DataFrame:
    """Per (query, posting-row, block): summary upper-bound dot (Q2) and the
    block's encoded doc ids, via mapInPandas (Arrow-vectorized)."""

    out_schema = (
        "query_id STRING, term_id INT, salt INT, block INT, ub DOUBLE, "
        "lb DOUBLE, gaps BINARY"
    )

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            rows: dict[str, list] = {
                "query_id": [], "term_id": [], "salt": [], "block": [],
                "ub": [], "lb": [], "gaps": [],
            }
            for r in pdf.itertuples(index=False):
                qt, qw = qvecs[r.query_id]
                # this list's query weight (for the block-max lower bound)
                ti = np.searchsorted(qt, r.term_id)
                qw_t = float(qw[ti]) if ti < qt.size and qt[ti] == r.term_id else 0.0
                blocks = r.blocks
                for i in range(len(blocks)):
                    st = np.asarray(r.summary_terms[i], dtype=np.int64)
                    codes = np.frombuffer(r.summary_codes[i], dtype=np.uint8)
                    vals = codec.dequantize_u8(codes, r.summary_min[i], r.summary_quant[i])
                    if st.size and qt.size:
                        idx = np.searchsorted(qt, st)
                        idx_c = np.minimum(idx, qt.size - 1)
                        m = qt[idx_c] == st
                        ub = float(np.dot(qw[idx_c][m], vals.astype(np.float64)[m]))
                    else:
                        ub = 0.0
                    rows["query_id"].append(r.query_id)
                    rows["term_id"].append(r.term_id)
                    rows["salt"].append(r.salt)
                    rows["block"].append(int(blocks[i]))
                    rows["ub"].append(ub)
                    rows["lb"].append(qw_t * float(r.block_max[i]))
                    rows["gaps"].append(bytes(r.doc_gaps[i]))
            yield pd.DataFrame(rows)

    return postings_matched.mapInPandas(scan, out_schema)


def _decode_docs(block_rows: DataFrame) -> DataFrame:
    """(query_id, gaps) → distinct (query_id, doc_id) candidates."""

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            qids, dids = [], []
            for r in pdf.itertuples(index=False):
                ids = codec.delta_decode(bytes(r.gaps)).astype(np.int64)
                qids.extend([r.query_id] * ids.size)
                dids.append(ids)
            yield pd.DataFrame(
                {
                    "query_id": qids,
                    "doc_id": np.concatenate(dids) if dids else np.empty(0, np.int64),
                }
            )

    return (
        block_rows.select("query_id", "gaps")
        .mapInPandas(decode, "query_id STRING, doc_id BIGINT")
        .distinct()
    )


# ---------------------------------------------------------- batch search ----


def batch_search(
    spark: SparkSession,
    postings: DataFrame,
    forward: DataFrame,
    qvecs: dict[str, QVec],
    k: int = 10,
    query_cut: int = 10,
    heap_factor: float = 1.0,
) -> DataFrame:
    """Dynamically-pruned batch top-k (Q1/Q9 analogue), single logical plan.

    Returns (query_id, rank, doc_id, score) for all queries; no driver-side
    loops or mid-plan actions — the threshold θ is a window aggregate over
    the same matched-blocks frame (see module docstring for the bound).
    """
    qterms = cut_terms_df(spark, qvecs, query_cut)
    matched = postings.join(F.broadcast(qterms), "term_id")
    ubs = _block_ubs(matched, qvecs)

    # θ_q = max over terms of the k-th largest per-term block-max lower bound
    wt = Window.partitionBy("query_id", "term_id").orderBy(F.col("lb").desc())
    theta = (
        ubs.select("query_id", "term_id", "lb")
        .withColumn("_r", F.row_number().over(wt))
        .filter(F.col("_r") == k)
        .groupBy("query_id")
        .agg(F.max("lb").alias("theta"))
    )
    # θ is one row per query — always broadcast (stats are unknown to AQE
    # because it hangs off a Python UDF output)
    survivors = ubs.join(F.broadcast(theta), "query_id", "left").filter(
        F.col("theta").isNull() | (F.col("ub") >= F.lit(heap_factor) * F.col("theta"))
    )
    cands = _decode_docs(survivors)
    scored = exact_score(cands, forward, qvecs)
    return topk(scored, k)


def bruteforce_search(
    spark: SparkSession,
    forward: DataFrame,
    qvecs: dict[str, QVec],
    k: int = 10,
) -> DataFrame:
    """Exact full-scan top-k (Q10 analogue / ground-truth oracle).

    Explode-join-free: scores every doc via the vectorized CSR dot.
    """
    qids = list(qvecs)
    qdf = spark.createDataFrame([(q,) for q in qids], "query_id STRING")
    cands = qdf.crossJoin(forward.select("doc_id"))
    scored = exact_score(cands, forward, qvecs).filter(F.col("score") > 0)
    return topk(scored, k)
