"""Batch top-k search with Seismic-style dynamic pruning, Spark-first.

Reference semantics (inverted_index.rs:153-234, posting_list.rs:115-215):
scan only the posting lists of the top-``query_cut`` query terms; skip blocks
whose summary-estimated dot product is below ``heap_factor × θ`` (θ = current
k-th best score); exactly re-score survivors against full doc vectors.

Distributed re-design (deterministic — SURVEY.md §7.3): the reference's θ
evolves inside one thread; a naive port would need a driver round-trip to
share it.  Instead θ is derived **inside the plan**, so the whole batch is
ONE Spark job:

  Phase-0 bound (always on): for a query term t with weight qw_t, every doc
  in a block b of t's posting list scores at least qw_t × (its own stored
  weight); the block's best doc scores ≥ qw_t × bmax_b.  Blocks of one list
  hold DISTINCT docs, so the k-th largest qw_t·bmax over t's blocks is
  witnessed by k distinct docs → it lower-bounds the final k-th best score.
  θ_q = max over matched terms of that per-term k-th largest.

  Phase-1 tightening (``two_phase=True`` — the first_sorted analogue,
  posting_list.rs:149-185): exactly score the single best-ub block of every
  matched list (a bounded candidate set), take the per-query k-th best exact
  score θ', and use θ_q ← max(θ_q, θ').  Like the reference's evolving heap
  after the first sorted list, this tightens θ before the main scan — still
  one logical plan, no driver action.

  Blocks with ``summary_ub < heap_factor × θ_q`` are skipped; survivors are
  decoded, deduped across lists (the reference's `visited` set), exactly
  re-scored against full doc vectors, and top-k'ed per query.

With upper-bound summaries (summary_energy=1.0, quant_ceil) and
heap_factor=1.0 this is EXACT w.r.t. scanning the cut-term posting lists.

QUERIES ARE A DATAFRAME, not a driver-side dict: (query_id, q_terms, q_weights)
rows travel through the plan as Arrow array columns, so the same code path
serves 6 interactive queries (arrays broadcast) and 10^9 self-join queries
for κ-NN graph construction (shuffle join on query_id) — no per-task pickled
closures, no driver memory proportional to the query set.

Physical plan: `postings ⋈ cut_terms` is a term_id join that touches only
matching term rows (broadcast for small batches, shuffle on the postings
partition key otherwise); candidate→forward is a shuffle join on doc_id
(bucket-able at scale); top-k is window row_number — never a driver loop.

Float parity with the numpy oracle (oracle.py): every upper bound and every
exact score is a `codec.segment_sums` (np.add.reduceat) over identically
ordered f64 contribution arrays, which is a position-independent pure
function of the segment — engine and oracle floats are bitwise equal, so
knife-edge skip decisions (ub vs hf·θ) can never diverge between them.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from seismic_spark import codec

QVec = tuple[np.ndarray, np.ndarray]  # (term_ids sorted asc int64, weights f64)

QUERIES_SCHEMA = "query_id STRING, q_terms ARRAY<INT>, q_weights ARRAY<DOUBLE>"

_KEY_SHIFT = np.int64(1) << np.int64(32)  # (row, term) → sortable combined key
# dense query-weight LUT gate for _score_pairs_csr (one f64 slot per term id,
# 32 MB at the 4M default — the serving replica's §13b gate, same rationale);
# larger id spaces fall back to the value-identical searchsorted gather
_SCORE_LUT_MAX_DIM = 1 << 22
# driver-side vocab map gate for resolve_queries (strings + ids; ~60 MB at
# the 1M default) — over it, token resolution stays a per-batch join
_VOCAB_MAP_MAX_TERMS = int(os.environ.get("SEISMIC_VOCAB_MAP_MAX_TERMS", str(1 << 20)))


# ------------------------------------------------------ query resolution ----


def resolve_queries(
    spark: SparkSession,
    queries: list[tuple[str, list[str], list[float]]],
    vocab: DataFrame,
    cache: dict | None = None,
) -> dict[str, QVec]:
    """Token → term_id resolution; unknown tokens silently dropped, result
    sorted by term id (P3, inverted_index_wrapper.rs:75-91).

    ``cache`` (r6 pass 3): a caller-scoped dict (SeismicSparkIndex passes
    its per-instance cache) holding a driver-side ``{term: term_id}`` map of
    the immutable vocab table, collected ONCE per index instance when the
    vocab fits ``_VOCAB_MAP_MAX_TERMS`` — every later batch resolves with
    dict lookups instead of a per-batch join job (measured 0.43 s of fixed
    job cost per interactive batch at sf0.1).  Result-identical by
    construction: ``term`` is unique in vocab, the join keeps exactly the
    tokens the dict lookup keeps, and both paths merge duplicates through
    the same pinned :func:`merge_sorted_terms` (order-independent).  Over
    the cap (or ``SEISMIC_LOCAL_RESOLVE=0``) the join path runs unchanged.
    """
    rows = [
        (qid, t, float(w))
        for qid, terms, weights in queries
        for t, w in zip(terms, weights)
    ]
    if not rows:
        return {}
    by_q: dict[str, list[tuple[int, float]]] = {}
    vmap = None
    if cache is not None and os.environ.get("SEISMIC_LOCAL_RESOLVE", "1") == "1":
        vmap = cache.get("vocab_map")
        if vmap is None and not cache.get("vocab_map_overflow"):
            capped = (
                vocab.select("term", "term_id")
                .limit(_VOCAB_MAP_MAX_TERMS + 1)
                .collect()
            )
            if len(capped) > _VOCAB_MAP_MAX_TERMS:
                cache["vocab_map_overflow"] = True
            else:
                vmap = {r["term"]: int(r["term_id"]) for r in capped}
                cache["vocab_map"] = vmap
    if vmap is not None:
        for qid, t, w in rows:
            tid = vmap.get(t)
            if tid is not None:
                by_q.setdefault(qid, []).append((tid, w))
    else:
        qdf = spark.createDataFrame(
            rows, "query_id STRING, term STRING, qw DOUBLE"
        )
        resolved = (
            vocab.join(F.broadcast(qdf), "term")
            .select("query_id", "term_id", "qw")
            .collect()
        )
        for r in resolved:
            by_q.setdefault(r["query_id"], []).append((r["term_id"], r["qw"]))
    out: dict[str, QVec] = {}
    for qid, pairs in by_q.items():
        # repeated tokens (or distinct tokens resolving to one term id) merge
        # by summing weights — routed through THE pinned merge so the float
        # is independent of .collect() row order (merge_sorted_terms contract)
        out[qid] = merge_sorted_terms(
            np.asarray([p[0] for p in pairs], dtype=np.int64),
            np.asarray([p[1] for p in pairs], dtype=np.float64),
        )
    return out


def queries_df_from_qvecs(spark: SparkSession, qvecs: dict[str, QVec]) -> DataFrame:
    """Driver-side resolved queries → the canonical queries DataFrame."""
    rows = [
        (qid, [int(x) for x in t], [float(x) for x in w])
        for qid, (t, w) in qvecs.items()
    ]
    return spark.createDataFrame(rows, QUERIES_SCHEMA)


def _as_queries_df(spark: SparkSession, queries) -> tuple[DataFrame, bool]:
    """Accept a dict-of-qvecs (small, driver-side) or a queries DataFrame.

    Returns (queries_df, is_small) — is_small drives broadcast decisions.
    """
    if isinstance(queries, DataFrame):
        return queries, False
    return queries_df_from_qvecs(spark, queries), True


def cut_terms(queries_df: DataFrame, query_cut: int) -> DataFrame:
    """Top-``query_cut`` terms per query by (weight desc, term_id asc) —
    inverted_index.rs:187-190's k_largest_by.  Returns (query_id, term_id, qw).

    r6: a NARROW per-row selection (mapInArrow over the query arrays) —
    the cut is a pure function of one row, so the old explode → groupBy →
    window formulation paid two exchanges plus a window sort for nothing
    (guide §2.4); worse, AQE coalesced its tiny shuffle to ONE partition at
    bench scale, serializing everything downstream of it in the same stage
    (event-log measured: a 5.9 s single-task stage in the κ-NN chain).
    Zero-copy Arrow flattening; duplicate term ids within a row merge
    through the pinned (term asc, weight asc) reduceat order
    (merge_sorted_terms' contract), value-identical to the old groupBy-sum
    for the duplicate-free rows every engine path produces.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def gen(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in it:
            n = rb.num_rows
            if n == 0:
                continue
            qt = rb.column(rb.schema.get_field_index("q_terms"))
            qw = rb.column(rb.schema.get_field_index("q_weights"))
            lens = pc.list_value_length(qt).to_numpy().astype(np.int64)
            t_flat = qt.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            w_flat = qw.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            row_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
            key = row_rep * _KEY_SHIFT + t_flat
            # merge duplicate (row, term): (term asc, weight asc) reduceat —
            # THE pinned merge order (see merge_sorted_terms)
            order = np.lexsort((w_flat, key))
            k_s, w_s = key[order], w_flat[order]
            if k_s.size > 1 and np.any(np.diff(k_s) == 0):
                starts = np.flatnonzero(
                    np.concatenate(([True], np.diff(k_s) != 0))
                )
                w_s = np.add.reduceat(w_s, starts)
                k_s = k_s[starts]
            row_m = k_s // _KEY_SHIFT
            t_m = k_s - row_m * _KEY_SHIFT
            # top-query_cut per row by (weight desc, term asc)
            sel = np.lexsort((t_m, -w_s, row_m))
            rr = row_m[sel]
            rstarts = np.flatnonzero(
                np.concatenate(([True], rr[1:] != rr[:-1]))
            )
            seg_lens = np.diff(np.concatenate((rstarts, [rr.size])))
            rank = np.arange(rr.size, dtype=np.int64) - np.repeat(
                rstarts, seg_lens
            )
            keep = sel[rank < query_cut]
            idx = pa.array(row_m[keep])
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(rb.column(rb.schema.get_field_index("query_id")), idx),
                    pa.array(t_m[keep].astype(np.int32)),
                    pa.array(w_s[keep]),
                ],
                ["query_id", "term_id", "qw"],
            )

    return queries_df.select("query_id", "q_terms", "q_weights").mapInArrow(
        gen, "query_id STRING, term_id INT, qw DOUBLE"
    )


# ------------------------------------------------- flattened batch utils ----


def _concat(arrays: list[np.ndarray], dtype) -> np.ndarray:
    return np.concatenate(arrays) if arrays else np.empty(0, dtype=dtype)


def _query_keys(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten per-row query arrays → (qkey sorted asc, qw_all, qlens).

    qkey = row_index·2^32 + term_id; rows ascend and q_terms are sorted
    ascending within a row, so the concatenation is globally sorted — one
    np.searchsorted serves every row of the batch at once.

    A user-supplied queries DataFrame (QUERIES_SCHEMA) with UNSORTED q_terms
    is repaired here (in-row sort, weights permuted identically); duplicate
    term ids within one row are MERGED by summing their weights — for a dot
    product `q·d` a repeated component contributes `(w1+w2)·dv`, so the merge
    is score-identical to the caller's intent and never aborts the batch.
    """
    qt_list = [np.asarray(a, dtype=np.int64) for a in pdf["q_terms"]]
    qlens = np.fromiter((a.size for a in qt_list), dtype=np.int64, count=len(qt_list))
    qt_all = _concat(qt_list, np.int64)
    qw_all = _concat(
        [np.asarray(a, dtype=np.float64) for a in pdf["q_weights"]], np.float64
    )
    row_rep = np.repeat(np.arange(len(pdf), dtype=np.int64), qlens)
    qkey = row_rep * _KEY_SHIFT + qt_all
    qkey, qw_all = _repair_qkey(qkey, qw_all)
    return qkey, qw_all, qlens


def _repair_qkey(
    qkey: np.ndarray, qw_all: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Shared tail of :func:`_query_keys`: in-place-order repair of an
    unsorted flattened query-key array + duplicate merge (stable argsort,
    reduceat in original-order-within-group) — extracted so the Arrow-flat
    scoring path reuses the exact same float behavior."""
    if qkey.size > 1:
        d = np.diff(qkey)
        if not np.all(d > 0):
            order = np.argsort(qkey, kind="stable")
            qkey, qw_all = qkey[order], qw_all[order]
            dup = np.diff(qkey) == 0
            if np.any(dup):
                starts = np.flatnonzero(
                    np.concatenate(([True], ~dup))
                )
                qw_all = np.add.reduceat(qw_all, starts)
                qkey = qkey[starts]
    return qkey, qw_all


def _binary_flat(a) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (flat uint8 data in element order, per-element byte length)
    view of a pyarrow Binary array — a binary column is one contiguous data
    buffer plus offsets (guide §4.2), so re-slicing replaces a per-cell
    ``np.frombuffer`` + concatenate."""
    n = len(a)
    bufs = a.buffers()
    if n == 0 or bufs[1] is None or bufs[2] is None:
        return np.empty(0, dtype=np.uint8), np.zeros(n, dtype=np.int64)
    off = np.frombuffer(bufs[1], dtype=np.int32)[a.offset : a.offset + n + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
    return data, np.diff(off).astype(np.int64)


def _gather_qw(
    qkey: np.ndarray, qw_all: np.ndarray, row_of: np.ndarray, terms: np.ndarray
) -> np.ndarray:
    """Per-element query weight (0.0 when the term isn't in that row's query)."""
    skey = row_of * _KEY_SHIFT + terms
    idx = np.searchsorted(qkey, skey)
    idx_c = np.minimum(idx, max(qkey.size - 1, 0))
    hit = qkey[idx_c] == skey if qkey.size else np.zeros(skey.size, dtype=bool)
    return np.where(hit, qw_all[idx_c] if qw_all.size else 0.0, 0.0)


# -------------------------------------------------------------- scoring -----


def exact_score(
    cands: DataFrame,
    forward: DataFrame,
    queries,
    id_col: str = "doc_id",
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Exact dot product of full query vector vs full doc vectors.

    cands(query_id, doc_id) ⋈ forward ⋈ queries → one vectorized CSR pass
    per Arrow batch (combined-key searchsorted + per-doc segment sums — Q5
    analogue).  Returns (query_id, doc_id, score DOUBLE).  Scores are
    bitwise-reproducible across partitionings (segment_sums is a pure
    function of the doc's own contribution array).
    """
    qdf, small = _as_queries_df(cands.sparkSession, queries)
    if broadcast_queries is None:
        broadcast_queries = small
    qj = F.broadcast(qdf) if broadcast_queries else qdf
    joined = (
        cands.join(forward, id_col)
        .join(qj, "query_id")
        .select("query_id", id_col, "terms", "weights", "q_terms", "q_weights")
    )

    import pyarrow as pa
    import pyarrow.compute as pc

    def score_batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        # r6: Arrow-native flat buffers (guide §4.2) — the candidate-pair
        # volume is rows × full vectors (κ-NN: 2.2×10^7 pairs at sf0.1), and
        # the old pandas path paid a per-row np.asarray on four nested
        # columns; flatten()/list_value_length are O(1) buffer views.  The
        # scoring floats are the SAME flat f64 arrays in the same order, so
        # every score is bitwise unchanged.
        for rb in it:
            n = rb.num_rows
            if n == 0:
                continue
            cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            qlens = pc.list_value_length(cols["q_terms"]).to_numpy().astype(np.int64)
            qt_all = cols["q_terms"].flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            qw_all = cols["q_weights"].flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            qrow = np.repeat(np.arange(n, dtype=np.int64), qlens)
            qkey = qrow * _KEY_SHIFT + qt_all
            qkey, qw_all = _repair_qkey(qkey, qw_all)

            lens = pc.list_value_length(cols["terms"]).to_numpy().astype(np.int64)
            t_all = cols["terms"].flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            w_all = cols["weights"].flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            row_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
            qw_elem = _gather_qw(qkey, qw_all, row_rep, t_all)
            contrib = qw_elem * w_all
            starts = np.cumsum(lens) - lens
            scores = codec.segment_sums(contrib, starts, lens)
            yield pa.RecordBatch.from_arrays(
                [
                    cols["query_id"],
                    pc.cast(cols[id_col], pa.int64()),
                    pa.array(scores),
                ],
                ["query_id", "doc_id", "score"],
            )

    return joined.mapInArrow(
        score_batches, "query_id STRING, doc_id BIGINT, score DOUBLE"
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k, ties broken by doc_id asc (pinned total order,
    SURVEY.md §7.3) — (query_id, rank, doc_id, score)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# ------------------------------------------------------ block UB scan -------


def _block_ubs(postings_matched: DataFrame, with_gaps: bool = True) -> DataFrame:
    """Per (query, posting-row, block): summary upper-bound dot (Q2), the
    block-max lower bound, and (``with_gaps``) the block's encoded doc ids.

    Fully vectorized per Arrow batch: all blocks of all rows are flattened
    into concatenated summary-element arrays; one searchsorted resolves every
    (element, query) weight; per-block UBs are segment sums.  No per-row or
    per-block Python math.

    ``with_gaps=False`` drops the ``doc_gaps`` column from the scan entirely
    (Parquet column pruning — the gap blobs are never read, decoded, or
    shipped through Arrow); the deferred-gaps fast path re-fetches gaps for
    SURVIVING blocks only via :func:`_fetch_gaps`.
    """
    out_schema = (
        "query_id STRING, term_id INT, salt INT, block INT, ub DOUBLE, "
        "lb DOUBLE" + (", gaps BINARY" if with_gaps else "")
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    def scan(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        # r6: Arrow-native flat buffers (guide §4.2) — the old pandas path
        # paid a per-CELL np.asarray over doubly-nested summary columns
        # (summary lists per block per row); flatten()/list_value_length are
        # O(1) buffer views and the gap blobs pass through as one untouched
        # Arrow binary column.  All float math is unchanged dtype-for-dtype,
        # so every ub/lb is bitwise identical to the pandas formulation.
        for rb in it:
            nrow = rb.num_rows
            if nrow == 0:
                continue
            cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            qlens = pc.list_value_length(cols["q_terms"]).to_numpy().astype(np.int64)
            qt_all = cols["q_terms"].flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            qw_all = cols["q_weights"].flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            qrow = np.repeat(np.arange(nrow, dtype=np.int64), qlens)
            qkey, qw_all = _repair_qkey(qrow * _KEY_SHIFT + qt_all, qw_all)

            # ---- block level -------------------------------------------
            nb = pc.list_value_length(cols["blocks"]).to_numpy().astype(np.int64)
            row_of_block = np.repeat(np.arange(nrow, dtype=np.int64), nb)
            blocks_flat = cols["blocks"].flatten()
            bmax_all = (
                cols["block_max"].flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            qw_row = cols["qw"].to_numpy(zero_copy_only=False)
            lb = qw_row[row_of_block] * bmax_all

            # ---- summary-element level ----------------------------------
            st_inner = cols["summary_terms"].flatten()  # list<int> per block
            slen = pc.list_value_length(st_inner).to_numpy().astype(np.int64)
            st_all = st_inner.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            codes_bin = cols["summary_codes"].flatten()  # binary per block
            codes_all, _ = _binary_flat(codes_bin)
            mins_all = (
                cols["summary_min"].flatten().to_numpy(zero_copy_only=False)
            )  # float32, same values the pandas path saw
            quants_all = (
                cols["summary_quant"].flatten().to_numpy(zero_copy_only=False)
            )
            # dequantize (identical f32 arithmetic to codec.dequantize_u8)
            vals = (
                np.repeat(mins_all, slen)
                + codes_all.astype(np.float32) * np.repeat(quants_all, slen)
            ).astype(np.float32)
            row_of_elem = np.repeat(row_of_block, slen)
            qw_elem = _gather_qw(qkey, qw_all, row_of_elem, st_all)
            contrib = qw_elem * vals.astype(np.float64)
            elem_starts = np.cumsum(slen) - slen
            ub = codec.segment_sums(contrib, elem_starts, slen)

            idx = pa.array(row_of_block)
            arrays = [
                pc.take(cols["query_id"], idx),
                pc.take(cols["term_id"], idx),
                pc.take(cols["salt"], idx),
                blocks_flat,
                pa.array(ub),
                pa.array(lb),
            ]
            names = ["query_id", "term_id", "salt", "block", "ub", "lb"]
            if with_gaps:
                arrays.append(cols["doc_gaps"].flatten())
                names.append("gaps")
            yield pa.RecordBatch.from_arrays(arrays, names)

    cols_df = postings_matched.select(
        "query_id", "term_id", "salt", "qw", "q_terms", "q_weights",
        "blocks", "block_max",
        *(("doc_gaps",) if with_gaps else ()),
        "summary_terms", "summary_codes", "summary_min", "summary_quant",
    )
    return cols_df.mapInArrow(scan, out_schema)


def _vectors_csr(
    df: DataFrame, id_col: str, t_col: str, w_col: str, with_qkey: bool = False
):
    """Collect an (id, terms, weights) DataFrame into flat CSR numpy arrays
    for executor-side broadcast (guide §3.1 / §8: ship the small vector table
    once per executor instead of once per candidate pair).

    Returns ``(ids_sorted, perm, starts, lens, t_flat, w_flat)`` — ids sorted
    for searchsorted lookup, ``perm`` mapping sorted position → original row,
    and per-original-row (start, len) slices into the flat term/weight
    arrays.  ``with_qkey=True`` additionally returns the prebuilt
    ``(qkey, qw)`` pair for :func:`_gather_qw` — the same
    row·2^32+term combined-key construction (and the same
    :func:`_repair_qkey` duplicate merge) the join-path scorer applies per
    Arrow batch, so gathered weights are bitwise identical.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    tbl = df.select(id_col, t_col, w_col).toArrow().combine_chunks()
    n = tbl.num_rows
    ids_col = tbl.column(0)
    ids_col = ids_col.chunk(0) if ids_col.num_chunks else pa.array([], ids_col.type)
    if pa.types.is_string(ids_col.type) or pa.types.is_large_string(ids_col.type):
        ids = np.asarray(ids_col.to_pylist(), dtype=np.str_)
    else:
        ids = ids_col.to_numpy(zero_copy_only=False).astype(np.int64)
    t_a = tbl.column(1)
    t_a = t_a.chunk(0) if t_a.num_chunks else pa.array([], t_a.type)
    w_a = tbl.column(2)
    w_a = w_a.chunk(0) if w_a.num_chunks else pa.array([], w_a.type)
    lens = pc.list_value_length(t_a).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.cumsum(lens) - lens
    t_flat = t_a.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    w_flat = w_a.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    perm = np.argsort(ids, kind="stable")
    out = (ids[perm], perm.astype(np.int64), starts, lens, t_flat, w_flat)
    if not with_qkey:
        return out
    row_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
    qkey, qw = _repair_qkey(row_rep * _KEY_SHIFT + t_flat, w_flat)
    return out + (qkey, qw)


def _score_pairs_csr(
    qi_pair: np.ndarray,
    di_v: np.ndarray,
    f_starts: np.ndarray,
    f_lens: np.ndarray,
    f_t: np.ndarray,
    f_w: np.ndarray,
    q_key: np.ndarray,
    q_w: np.ndarray,
    threads: int = 1,
) -> np.ndarray:
    """Exact scores for (query-index, doc-position) pairs against CSR
    vectors — the same flat f64 contribution arrays, in doc-element order,
    as :func:`exact_score`'s Arrow batches, so every score is bitwise
    identical.

    Scored in bounded element slices: one unsliced pass allocates
    element-length temporaries of tens-to-hundreds of MB, which glibc mmaps
    and returns to the OS on free — every call then faults fresh pages, and
    under a throttled host page supply the pass stalls for minutes
    (event-log measured: 121 s vs 2.3 s python time for identical input).
    ≤ ~12 MB temporaries stay under the allocator's dynamic mmap threshold
    and are recycled in-heap.  Per-pair contribution arrays and their
    segment_sums are unchanged by the slicing.

    ``threads > 1`` scores the (independent, disjoint-output) slices on a
    thread pool — the hot numpy ops release the GIL, measured ~4× at 8
    threads.  Per-slice computation is untouched, so scores stay bitwise
    identical at any thread count.  DRIVER callers use it; executor-side
    callers keep 1 (their parallelism is the task grid).

    Query-weight gather (r6 pass 3): the per-element ``_gather_qw``
    binary search (log|q_key| comparisons PER ELEMENT) was this pass's
    dominant cost — microbenched ~18× slower than a fancy-index gather at
    the knn design point, and the fused-rescore stage's task-seconds were
    ≈ the searchsorted cost alone.  The pair stream arrives in per-query
    runs, so the serving replica's dense-LUT trick (§13b) applies: scatter
    the current run's repaired weights into a per-thread dense table,
    gather by term id, zero the run's slots.  Value-identical by
    construction — stored (duplicate-merged) weight at hits, 0.0 at misses,
    the same floats `_gather_qw` returns — so every score is bitwise
    unchanged (pinned by test_r6_optimizations).  Falls back to the
    searchsorted gather when the term-id space exceeds ``_SCORE_LUT_MAX_DIM``
    (dense table > 32 MB) or ``SEISMIC_SCORE_LUT=0``.
    """
    lens = f_lens[di_v]
    ends = np.cumsum(lens)
    scores = np.empty(qi_pair.size, dtype=np.float64)
    cap = 1_500_000
    npair = qi_pair.size
    bounds: list[tuple[int, int]] = []
    lo = 0
    while lo < npair:
        base = int(ends[lo - 1]) if lo else 0
        hi = int(np.searchsorted(ends, base + cap, side="right"))
        hi = min(max(hi, lo + 1), npair)
        bounds.append((lo, hi))
        lo = hi

    lut_dim = 0
    if q_key.size and os.environ.get("SEISMIC_SCORE_LUT", "1") == "1":
        # all gathered term ids are < _KEY_SHIFT by construction; dim covers
        # both the forward element ids and the query term ids
        dim = 1 + max(
            int(f_t.max()) if f_t.size else 0,
            int((q_key % _KEY_SHIFT).max()),
        )
        if dim <= _SCORE_LUT_MAX_DIM:
            lut_dim = dim
    _luts: dict[int, np.ndarray] = {}

    def _slice(b: tuple[int, int]) -> None:
        lo, hi = b
        sl = slice(lo, hi)
        l_sl = lens[sl]
        pstarts = np.cumsum(l_sl) - l_sl
        tot = int(pstarts[-1] + l_sl[-1]) if l_sl.size else 0
        idx = np.repeat(f_starts[di_v[sl]] - pstarts, l_sl) + np.arange(
            tot, dtype=np.int64
        )
        if lut_dim:
            import threading

            tid = threading.get_ident()
            lut = _luts.get(tid)
            if lut is None:
                lut = np.zeros(lut_dim, dtype=np.float64)
                _luts[tid] = lut
            terms_el = f_t[idx]
            qi_sl = qi_pair[sl]
            qw_elem = np.empty(tot, dtype=np.float64)
            run_s = np.flatnonzero(
                np.concatenate(([True], qi_sl[1:] != qi_sl[:-1]))
            )
            run_e = np.concatenate((run_s[1:], [qi_sl.size]))
            el_of = np.concatenate((pstarts, [tot]))
            for rs, re_ in zip(run_s, run_e):
                q = int(qi_sl[rs])
                a = int(np.searchsorted(q_key, q * _KEY_SHIFT, side="left"))
                bq = int(
                    np.searchsorted(q_key, (q + 1) * _KEY_SHIFT, side="left")
                )
                es, ee = int(el_of[rs]), int(el_of[re_])
                if a == bq:  # query absent from q_key → all misses (0.0)
                    qw_elem[es:ee] = 0.0
                    continue
                qt_r = (q_key[a:bq] % _KEY_SHIFT).astype(np.int64)
                lut[qt_r] = q_w[a:bq]
                qw_elem[es:ee] = lut[terms_el[es:ee]]
                lut[qt_r] = 0.0
            scores[sl] = codec.segment_sums(qw_elem * f_w[idx], pstarts, l_sl)
            return
        qw_elem = _gather_qw(
            q_key, q_w, np.repeat(qi_pair[sl], l_sl), f_t[idx]
        )
        scores[sl] = codec.segment_sums(qw_elem * f_w[idx], pstarts, l_sl)

    if threads > 1 and len(bounds) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(_slice, bounds))
    else:
        for b in bounds:
            _slice(b)
    return scores


def _topk_select(
    qi: np.ndarray, ds: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query top-k selection over scored pairs by the pinned
    (score desc, doc_id asc) total order :func:`topk`'s row_number uses.
    Returns (selected pair indices, int32 ranks 1..k) — negating finite f64
    scores is order-exact, so the selection equals the window's."""
    order = np.lexsort((ds, -scores, qi))
    qo = qi[order]
    ostarts = np.flatnonzero(np.concatenate(([True], qo[1:] != qo[:-1])))
    olens = np.diff(np.concatenate((ostarts, [qo.size])))
    rank = np.arange(qo.size, dtype=np.int64) - np.repeat(ostarts, olens)
    keepk = rank < k
    return order[keepk], (rank[keepk] + 1).astype(np.int32)


def _fused_candidates(
    ubs: DataFrame, k: int, heap_factor: float, rescore=None
) -> DataFrame:
    """θ derivation + skip filter + gap decode + cross-list dedup in ONE
    streamed operator — the two_phase=False tail of the in-plan path.

    ``rescore=(fwd_bc, q_bc)`` (broadcast CSR tuples from
    :func:`_vectors_csr`) additionally exact-scores the decoded candidates
    against the broadcast vectors and emits the FINAL per-query top-k rows
    (query_id, rank, doc_id, score) — the whole rescore tail collapses into
    this one operator: no candidate×vector join, no 10^7-pair Arrow
    boundary, no corpus-wide top-k exchange (guide §8: every decision uses
    broadcast metadata; only k rows per query leave).  Scores are bitwise
    identical to :func:`exact_score` (same flat f64 contribution arrays in
    doc-element order, same `_gather_qw`/`_repair_qkey` floats, same
    `segment_sums`), and the per-query rank order is the same pinned
    (score desc, doc_id asc) total order :func:`topk` uses — pinned by
    test_r6_optimizations.py.  Pairs whose doc or query id is absent from
    the broadcast tables are dropped, matching the inner joins they
    replace.

    Replaces the window-based `_theta_survivors` → `_decode_docs` →
    `.distinct()` chain (3 exchanges, two of them sorting the gap-blob-laden
    ubs rows) with a single repartition("query_id") — guide §2.4 (remove
    shuffles outright) + §2.3 (don't move heavy payloads through exchanges
    they don't need): the gap blobs cross exactly one exchange, and the θ
    aggregation/filter/decode/dedup all happen in one vectorized pass over
    each query's co-located block rows.

    Value-parity with the windowed derivation (and the driver fast path):
    θ_q = max over matched terms of the k-th largest per-(query, term) lb —
    the k-th largest VALUE is tie-order independent, so np.lexsort + segment
    ranks select exactly the lb the `wt` window's row_number()==k row held;
    the skip predicate ``ub >= heap_factor × θ`` is the same IEEE-f64
    comparison, so the surviving block set — and every downstream score — is
    bitwise identical (test_parity_r4/r5 pin this against the fast path).

    Queries with NO term reaching k blocks keep all their blocks (the
    windowed path's `theta IS NULL` arm).  Dedup is per query group, which
    equals the old global `.distinct()` because one query's rows are fully
    co-located.
    """
    hf = float(heap_factor)
    out_schema = (
        "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE"
        if rescore is not None
        else "query_id STRING, doc_id BIGINT"
    )

    def _score_groups(
        qids_g: np.ndarray, qs_m: np.ndarray, ds_m: np.ndarray
    ) -> pd.DataFrame | None:
        """Exact-score deduped (group, doc) pairs against the broadcast CSRs
        and keep the per-query top-k — see the rescore contract above."""
        f_bc, q_bc = rescore
        f_ids, f_perm, f_starts, f_lens, f_t, f_w = f_bc.value
        q_ids, q_perm, _qs, _ql, _qt, _qw_flat, q_key, q_w = q_bc.value
        guids = np.asarray(qids_g, dtype=np.str_)
        gq = np.searchsorted(q_ids, guids)
        gq_c = np.minimum(gq, max(q_ids.size - 1, 0))
        g_ok = (
            q_ids[gq_c] == guids
            if q_ids.size
            else np.zeros(guids.size, dtype=bool)
        )
        qi_g = np.where(g_ok, q_perm[gq_c] if q_perm.size else 0, -1)
        di = np.searchsorted(f_ids, ds_m)
        di_c = np.minimum(di, max(f_ids.size - 1, 0))
        d_ok = (
            f_ids[di_c] == ds_m if f_ids.size else np.zeros(ds_m.size, dtype=bool)
        )
        ok = d_ok & (qi_g[qs_m] >= 0)
        if not ok.all():
            qs_m, ds_m, di_c = qs_m[ok], ds_m[ok], di_c[ok]
        if qs_m.size == 0:
            return None
        di_v = f_perm[di_c]
        scores = _score_pairs_csr(
            qi_g[qs_m], di_v, f_starts, f_lens, f_t, f_w, q_key, q_w
        )
        sel, ranks = _topk_select(qs_m, ds_m, scores, k)
        return pd.DataFrame(
            {
                "query_id": qids_g[qs_m[sel]],
                "rank": ranks,
                "doc_id": ds_m[sel],
                "score": scores[sel],
            }
        )

    def process(pdf: pd.DataFrame) -> pd.DataFrame | None:
        qids = pdf["query_id"].to_numpy()
        g_starts = np.flatnonzero(np.concatenate(([True], qids[1:] != qids[:-1])))
        g_lens = np.diff(np.concatenate((g_starts, [len(pdf)])))
        q_of = np.repeat(np.arange(g_starts.size, dtype=np.int64), g_lens)
        term = pdf["term_id"].to_numpy(dtype=np.int64)
        ub = pdf["ub"].to_numpy(dtype=np.float64)
        lb = pdf["lb"].to_numpy(dtype=np.float64)

        # per-(query, term) k-th largest lb, maxed per query (θ phase 0)
        order = np.lexsort((-lb, term, q_of))
        qo, to, lbo = q_of[order], term[order], lb[order]
        seg = np.concatenate(
            ([True], (qo[1:] != qo[:-1]) | (to[1:] != to[:-1]))
        )
        seg_starts = np.flatnonzero(seg)
        seg_lens = np.diff(np.concatenate((seg_starts, [lbo.size])))
        rank = np.arange(lbo.size, dtype=np.int64) - np.repeat(
            seg_starts, seg_lens
        )
        kth = rank == k - 1
        theta = np.full(g_starts.size, -np.inf)
        kq, kv = qo[kth], lbo[kth]
        if kq.size:
            gs = np.flatnonzero(np.concatenate(([True], kq[1:] != kq[:-1])))
            theta[kq[gs]] = np.maximum.reduceat(kv, gs)

        keep = np.ones(len(pdf), dtype=bool)
        hasrow = theta[q_of] > -np.inf
        keep[hasrow] = ub[hasrow] >= hf * theta[q_of][hasrow]

        gaps_col = pdf["gaps"].to_numpy()
        kept_idx = np.flatnonzero(keep)
        if kept_idx.size == 0:
            return None
        ids, counts = codec.delta_decode_multi(
            [bytes(gaps_col[i]) for i in kept_idx]
        )
        qrep = np.repeat(q_of[kept_idx], counts)
        ids = ids.astype(np.int64)
        order2 = np.lexsort((ids, qrep))
        qs_, ds_ = qrep[order2], ids[order2]
        mask = np.concatenate(
            ([True], (qs_[1:] != qs_[:-1]) | (ds_[1:] != ds_[:-1]))
        )
        if rescore is not None:
            return _score_groups(qids[g_starts], qs_[mask], ds_[mask])
        return pd.DataFrame(
            {"query_id": qids[g_starts][qs_[mask]], "doc_id": ds_[mask]}
        )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in it:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            qids = pdf["query_id"].to_numpy()
            cut = int(np.flatnonzero(qids == qids[-1])[0])
            complete, rest = pdf.iloc[:cut], pdf.iloc[cut:]
            carry = rest.reset_index(drop=True) if len(rest) else None
            if len(complete):
                out = process(complete)
                if out is not None:
                    yield out
        if carry is not None and len(carry):
            out = process(carry)
            if out is not None:
                yield out

    parted = (
        ubs.select("query_id", "term_id", "ub", "lb", "gaps")
        .repartition("query_id")
        .sortWithinPartitions("query_id")
    )
    return parted.mapInPandas(gen, out_schema)


def _decode_docs(block_rows: DataFrame) -> DataFrame:
    """(query_id, gaps) → distinct (query_id, doc_id) candidates (the
    reference's cross-list `visited` dedup, posting_list.rs:206-214).

    One vectorized continuation-bit pass decodes ALL gap buffers of an Arrow
    batch (codec.delta_decode_multi) — no per-row Python on the query path.
    """

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ids, counts = codec.delta_decode_multi(
                [bytes(b) for b in pdf["gaps"]]
            )
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["query_id"].to_numpy(), counts),
                    "doc_id": ids.astype(np.int64),
                }
            )

    return (
        block_rows.select("query_id", "gaps")
        .mapInPandas(decode, "query_id STRING, doc_id BIGINT")
        .distinct()
    )


# ---------------------------------------------------------- batch search ----

# Interactive batches up to this size take the driver-θ fast path (override
# with $SEISMIC_DRIVER_THETA_MAX; 0 disables).  Bound: the driver holds one
# narrow row per matched block — batch × query_cut × blocks-per-list rows of
# six scalars — plus the surviving-keys literal it ships back.
_DRIVER_THETA_MAX = int(os.environ.get("SEISMIC_DRIVER_THETA_MAX", "1024"))

# Hard row cap on the narrow block table the fast path collects: the gate
# above bounds batch × query_cut, but blocks-per-list is data-dependent (a
# head-term-heavy batch on a many-block index can multiply it arbitrarily).
# The collect is issued as limit(cap+1); hitting the cap aborts to the
# in-plan θ derivation (result-identical), so driver memory is bounded by
# construction: cap rows × 6 scalars ≈ 50 MB at the default.
_DRIVER_THETA_MAX_ROWS = int(
    os.environ.get("SEISMIC_DRIVER_THETA_MAX_ROWS", "1000000")
)

# Deferred-gaps fast path (experiment, BENCH/BASELINE.md round-5 interactive
# floor): the block-UB scan job reads NO doc_gaps column at all (Parquet
# column pruning), so nothing is persisted; gaps are re-fetched from the
# postings scan for SURVIVING blocks only.  Trades the ubs persist + wide
# scan for one extra narrow scan job.
#
# MEASURED AND REJECTED as a default (tools/bench_serving.py, 1M docs,
# canary-valid interleaved ABAB, BENCH/serving_r5.json): the extra fetch
# jobs cost more than skipping the gaps column saves at every batch size
# (batch 10 median 6.17 s vs 4.20 s base; batch 100: 6.96 vs 4.33).  The
# gap blobs are small relative to the summaries the UB scan must read
# anyway, and the persisted ubs frame makes the survivor filter free.
# Kept env-gated for storage layouts where the gaps column is genuinely
# expensive to read (e.g. remote object storage with wide blobs).
_FASTPATH_DEFER_GAPS = (
    os.environ.get("SEISMIC_FASTPATH_DEFER_GAPS", "0") == "1"
)

# In-plan dict batches push the union of all query term ids into the postings
# scan as an IN predicate (result-neutral pruning).  Above this many ids the
# literal list itself bloats Catalyst optimization / Parquet predicate
# conversion more than the scan pruning saves, so skip it (the cut-terms
# join already restricts the scan output).  The cost is NOT marginal: at the
# batch-10000 design point (~30k ids, 1M docs) the literal IN cost an
# event-log-measured 14.5 s driver-only planning gap plus serialized-plan
# bloat in every task — removing it took the 4-core leg from ~46 s to ~27 s
# and the 1-core leg from ~134 s to ~96 s, and even at batch 1000 (~4.4k
# ids) an interleaved A/B read 13.5-16.1 s with vs 11.2-12.1 s without
# (BENCH/BASELINE.md round-5 serial-fraction section).  At-scale row-group
# pruning belongs to the term-bucket partitioned snapshot path
# (SeismicSparkIndex._postings_for: <= n_buckets literals), so the generic
# id-literal list only stays where it is provably cheap.
_SCAN_PRUNE_MAX_IDS = int(os.environ.get("SEISMIC_SCAN_PRUNE_MAX_IDS", "2048"))

# Fallback ubs-cache lifecycle for direct batch_search callers that pass no
# registry: previous caches are retired here on the next call, so a
# long-lived session never accumulates dead persisted RDDs.
# SeismicSparkIndex passes its per-instance registry instead, keeping
# interleaved searches on different indexes from thrashing each other.
_DEFAULT_CACHE_REGISTRY: list[DataFrame] = []


def merge_sorted_terms(t, w) -> QVec:
    """THE pinned duplicate-term merge — single source of truth for the
    fast-path / in-plan / serving-replica bitwise-identity contract.

    (term asc, weight asc) lexsort, then one reduceat per duplicate group:
    the summation order is a pure function of the (term, weight) multiset,
    so the merged float is reproducible regardless of input order.  Every
    caller that merges duplicate query terms MUST route through here
    (_merge_dup_qvecs, _cut_qvecs, serving.ServingReplica._resolve) — a
    divergent copy silently breaks the documented bitwise guarantees.
    """
    t = np.asarray(t, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    order = np.lexsort((w, t))
    t, w = t[order], w[order]
    if t.size > 1 and np.any(np.diff(t) == 0):
        starts = np.flatnonzero(np.concatenate(([True], np.diff(t) != 0)))
        w = np.add.reduceat(w, starts)
        t = t[starts]
    return t, w


def _merge_dup_qvecs(qvecs: dict[str, QVec]) -> dict[str, QVec]:
    """Deterministically merge duplicate term ids within each query vector.

    Dict batches are normalized ONCE here, before path selection, so the
    driver-θ fast path and the in-plan derivation both see duplicate-free,
    term-sorted queries — which is what makes their documented bitwise
    identity hold even for queries that repeat a term: any float summation
    the two paths would otherwise do independently (Python insertion-order
    vs Spark aggregation-order) happens exactly once, over a pinned element
    order (term id asc, then weight asc within a duplicate group) — the
    reduceat's association is numpy's but the inputs are a pure function of
    the multiset, so the merged float is reproducible.
    """
    return {qid: merge_sorted_terms(t, w) for qid, (t, w) in qvecs.items()}


def _cut_qvecs(qvecs: dict[str, QVec], query_cut: int) -> list[tuple]:
    """Driver-side cut_terms over resolved query vectors: top-``query_cut``
    terms per query by (weight desc, term_id asc), duplicate ids merged by
    weight sum — value-identical to the window in :func:`cut_terms`, zero
    Spark jobs."""
    rows: list[tuple] = []
    for qid, (t, w) in qvecs.items():
        t = np.asarray(t, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)
        if t.size == 0:
            continue
        if np.unique(t).size != t.size:
            t, w = merge_sorted_terms(t, w)
        order = np.lexsort((t, -w))[:query_cut]
        rows.extend(
            (qid, int(t[i]), float(w[i])) for i in order.tolist()
        )
    return rows


def _compact_rescore(
    block_rows: DataFrame, forward: DataFrame, qdf: DataFrame, k: int
) -> DataFrame:
    """Low-latency rescore tail for SMALL surviving-block sets: decode and
    dedup candidates in ONE task (replacing _decode_docs' `.distinct()`
    shuffle with an in-partition np.unique), then broadcast the candidate
    ids into the forward join — the forward scan stays parallel, but the
    only exchange left in the chain is the final tiny top-k window.

    Callers gate on block count (``_COMPACT_TAIL_MAX_BLOCKS``): candidates
    are broadcast, so this path is for interactive batches where the
    distributed tail's 5–6 AQE stage jobs are pure scheduling overhead
    (measured ~2 s per chain at 1M docs regardless of data size).
    """

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one coalesced partition → a partition-wide dedup is a full dedup
        frames = []
        for pdf in it:
            if pdf.empty:
                continue
            ids, counts = codec.delta_decode_multi(
                [bytes(b) for b in pdf["gaps"]]
            )
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(pdf["query_id"].to_numpy(), counts),
                        "doc_id": ids.astype(np.int64),
                    }
                )
            )
        if frames:
            yield pd.concat(frames, ignore_index=True).drop_duplicates()

    cands = (
        block_rows.select("query_id", "gaps")
        .coalesce(1)
        .mapInPandas(decode, "query_id STRING, doc_id BIGINT")
        .hint("broadcast")
    )
    scored = exact_score(cands, forward, qdf, broadcast_queries=True)
    return topk(scored, k)


def _fetch_gaps(postings: DataFrame, keys: pd.DataFrame) -> DataFrame:
    """(query_id, gaps) rows for an explicit set of surviving block keys.

    ``keys`` is a small driver-side frame (query_id, term_id, salt, block) —
    bounded by the fast-path gate.  The postings scan reads ONLY
    (term_id, salt, blocks, doc_gaps) for the keys' term ids (IN-pruned row
    groups), explodes to block granularity JVM-side (arrays_zip — no Python),
    and a broadcast join keeps exactly the requested (query, block) pairs.
    Feeds :func:`_compact_rescore` / :func:`_decode_docs` unchanged.
    """
    spark = postings.sparkSession
    term_ids = sorted({int(t) for t in keys["term_id"].unique()})
    kdf = spark.createDataFrame(
        keys[["query_id", "term_id", "salt", "block"]],
        "query_id STRING, term_id INT, salt INT, block INT",
    )
    if len(term_ids) <= _SCAN_PRUNE_MAX_IDS:
        # same literal-list cap as everywhere else (see _SCAN_PRUNE_MAX_IDS);
        # the broadcast kdf join below keeps the result identical without it
        postings = postings.filter(F.col("term_id").isin(term_ids))
    else:
        # above the cap, prune via a broadcast semi-join instead of dropping
        # pruning entirely: unlike the post-explode kdf join, this term_id
        # join sits BELOW the Generate node, so non-matching posting rows
        # are discarded before their gap blobs are exploded to block rows
        # (r5 ADVICE item; result-identical — the kdf join is a further
        # subset of these term ids).
        tdf = postings.sparkSession.createDataFrame(
            [(int(t),) for t in term_ids], "term_id INT"
        )
        postings = postings.join(F.broadcast(tdf), "term_id")
    exploded = (
        postings
        .select(
            "term_id", "salt",
            F.explode(F.arrays_zip("blocks", "doc_gaps")).alias("z"),
        )
        .select(
            "term_id", "salt",
            F.col("z.blocks").alias("block"),
            F.col("z.doc_gaps").alias("gaps"),
        )
    )
    return exploded.join(F.broadcast(kdf), ["term_id", "salt", "block"]).select(
        "query_id", "gaps"
    )


# Compact-tail gate: blocks hold at most a few hundred docs, so ≤4096
# surviving blocks keeps the broadcast candidate set ≲ 1M (query, doc)
# pairs ≈ tens of MB — comfortably under executor broadcast budgets.
_COMPACT_TAIL_MAX_BLOCKS = 4096

# Local fast-path gate (r6): collect the block table WITH its gap blobs in
# one bounded toPandas (limit(cap+1)) and decode candidates on the driver —
# the whole θ/p1/survivor machinery then needs no persisted ubs frame, no
# broadcast-key joins back into the cache, and no separate decode stage, so
# an interactive batch runs 2 Spark action chains (3 with two_phase) instead
# of the 12–18 AQE jobs the cached formulation paid (each ~0.2–0.7 s of
# scheduling floor — event-log measured).  The transfer is bounded: cap rows
# × (~24 B narrow + the row's gap blob, ≤ a few hundred B) ≈ tens of MB.
# Above the cap the persisted-ubs path runs unchanged (gap blobs stay on
# executors), so the gate is scale-safe.
_DRIVER_GAPS_MAX_ROWS = int(
    os.environ.get("SEISMIC_DRIVER_GAPS_MAX_ROWS", "131072")
)

# Driver-CSR scoring gate: interactive dict batches on an index whose
# forward table fits this byte budget (est. n_docs·avgdl·16 B) are scored
# entirely on the driver against a once-collected CSR copy of the forward
# index — the reference's own in-process architecture, applied when the
# corpus is small enough that one process holds it (the serving replica's
# hydration budget, in miniature).  Above the cap nothing is collected and
# the distributed formulations run unchanged, so the gate is scale-safe.
# Default sizing: avgdl counts TOKENS, so for tokenized corpora the
# estimate overshoots true forward nnz bytes ~5–10× — 384 MB estimated is
# ≤ ~50–80 MB actually collected there, and at worst (pre-weighted
# vectors, avgdl == nnz) a one-time 384 MB pull on an 8 GB driver.
_LOCAL_SCORE_MAX_BYTES = int(
    os.environ.get("SEISMIC_LOCAL_SCORE_MAX_BYTES", str(384 << 20))
)

_OVERFLOW = object()  # sentinel: local fast path exceeded its row cap


def _theta0_from_narrow(narrow: pd.DataFrame, k: int) -> dict[str, float]:
    """Phase-0 θ per query from a collected block table: per (query, term)
    k-th largest block-max lower bound, maxed over the query's matched terms
    — the same f64 values the in-plan window aggregates select."""
    neg_inf = float("-inf")
    theta: dict[str, float] = {}
    for (qid, _tid), grp in narrow.groupby(["query_id", "term_id"], sort=False):
        lb = grp["lb"].to_numpy(dtype=np.float64)
        if lb.size >= k:
            kth = float(np.partition(lb, lb.size - k)[lb.size - k])
            if kth > theta.get(qid, neg_inf):
                theta[qid] = kth
    return theta


def _decode_rows_coded(
    rows: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side decode + cross-list dedup of collected block rows — the
    same codec call `_compact_rescore` runs in its coalesced executor task,
    deduped by the same lexsort/mask pass `_fused_candidates` uses (integer
    codes, not pandas object rows: an exact-search batch decodes hundreds of
    thousands of (query, doc) pairs and object-dtype drop_duplicates is
    ~10× slower).  Dedup is set-identity, so the candidate set is unchanged.
    Returns ``(unique_qids sorted, per-pair qid code, per-pair doc_id)``."""
    ids, counts = codec.delta_decode_multi([bytes(b) for b in rows["gaps"]])
    uq, qcodes = np.unique(rows["query_id"].to_numpy(), return_inverse=True)
    qrep = np.repeat(qcodes.astype(np.int64), counts)
    d = ids.astype(np.int64)
    order = np.lexsort((d, qrep))
    qs_, ds_ = qrep[order], d[order]
    m = np.concatenate(
        ([True], (qs_[1:] != qs_[:-1]) | (ds_[1:] != ds_[:-1]))
    )
    return uq, qs_[m], ds_[m]


def _qside_from_qvecs(
    qvecs: dict[str, QVec]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side combined-key query table from resolved query vectors:
    the same row·2^32+term construction (and `_repair_qkey` merge) the
    Arrow-batch scorers apply, so `_gather_qw` returns bitwise-identical
    weights.  Rows follow sorted-qid order; lookup by searchsorted."""
    qids = sorted(qvecs)
    ts = [np.asarray(qvecs[q][0], dtype=np.int64) for q in qids]
    lens = np.fromiter((t.size for t in ts), dtype=np.int64, count=len(ts))
    t_flat = np.concatenate(ts) if ts else np.empty(0, dtype=np.int64)
    w_flat = (
        np.concatenate([np.asarray(qvecs[q][1], dtype=np.float64) for q in qids])
        if ts
        else np.empty(0, dtype=np.float64)
    )
    row_rep = np.repeat(np.arange(len(ts), dtype=np.int64), lens)
    qkey, qw = _repair_qkey(row_rep * _KEY_SHIFT + t_flat, w_flat)
    return np.asarray(qids, dtype=np.str_), qkey, qw


def _score_topk_driver(
    uq: np.ndarray,
    qs: np.ndarray,
    ds: np.ndarray,
    qids_sorted: np.ndarray,
    qkey: np.ndarray,
    qw: np.ndarray,
    fwd_csr,
    k: int,
) -> pd.DataFrame:
    """Exact-score coded candidate pairs against the collected forward CSR
    and keep the per-query top-k — the driver twin of the fused operator's
    `_score_groups` (same `_score_pairs_csr` floats, same `_topk_select`
    pinned order).  Pairs whose doc id is absent from the forward table are
    dropped, matching the inner join they replace."""
    f_ids, f_perm, f_starts, f_lens, f_t, f_w = fwd_csr
    qi_of_code = np.searchsorted(qids_sorted, np.asarray(uq, dtype=np.str_))
    di = np.searchsorted(f_ids, ds)
    di_c = np.minimum(di, max(f_ids.size - 1, 0))
    ok = f_ids[di_c] == ds if f_ids.size else np.zeros(ds.size, dtype=bool)
    if not ok.all():
        qs, ds, di_c = qs[ok], ds[ok], di_c[ok]
    if qs.size == 0:
        return pd.DataFrame(
            {"query_id": np.empty(0, dtype=object),
             "rank": np.empty(0, dtype=np.int32),
             "doc_id": np.empty(0, dtype=np.int64),
             "score": np.empty(0, dtype=np.float64)}
        )
    scores = _score_pairs_csr(
        qi_of_code[qs], f_perm[di_c], f_starts, f_lens, f_t, f_w, qkey, qw,
        threads=min(8, os.cpu_count() or 1),
    )
    sel, ranks = _topk_select(qs, ds, scores, k)
    return pd.DataFrame(
        {
            "query_id": uq[qs[sel]],
            "rank": ranks,
            "doc_id": ds[sel],
            "score": scores[sel],
        }
    )


def _driver_theta_local(
    spark: SparkSession,
    matched: DataFrame,
    qvecs: dict[str, QVec],
    k: int,
    heap_factor: float,
    two_phase: bool,
    fwd_csr,
) -> DataFrame:
    """One-collect, fully-local fast path (see ``_DRIVER_GAPS_MAX_ROWS``):
    block table + gap blobs arrive in a single bounded toPandas; θ (phase 0
    and the two_phase tightening), the skip filter, candidate decode, exact
    rescore (against the caller's size-gated forward CSR — the reference's
    own in-process scoring architecture, inverted_index.rs:153-234) and
    top-k ALL run on the driver.  The batch costs exactly ONE Spark job —
    the block-UB scan feeding the collect — instead of the persisted-ubs
    formulation's 12–18 AQE stage jobs (each ~0.2–0.7 s of scheduling
    floor).

    Value parity is exact and pinned (test_search_fastpath): θ is selected
    from the same collected f64 ub/lb values, phase-1 scores and final
    scores come from `_score_pairs_csr` (bitwise-identical contribution
    arrays to `exact_score`), the skip predicate is the same IEEE
    comparison, and ranking is `_topk_select`'s pinned total order.
    Returns ``_OVERFLOW`` when the block table exceeds the cap — the caller
    falls back to the persisted-ubs formulation, which keeps gap blobs on
    the executors.
    """
    ubs = _block_ubs(matched)
    tbl = ubs.limit(_DRIVER_GAPS_MAX_ROWS + 1).toPandas()
    if len(tbl) > _DRIVER_GAPS_MAX_ROWS:
        return _OVERFLOW
    schema = "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE"
    if tbl.empty:
        return spark.createDataFrame([], schema)
    neg_inf = float("-inf")
    theta = _theta0_from_narrow(tbl, k)
    qids_sorted, qkey, qw = _qside_from_qvecs(qvecs)

    if two_phase:
        best = tbl.sort_values(
            ["query_id", "term_id", "ub", "salt", "block"],
            ascending=[True, True, False, True, True],
            kind="stable",
        ).groupby(["query_id", "term_id"], sort=False).head(1)
        p1 = _score_topk_driver(
            *_decode_rows_coded(best), qids_sorted, qkey, qw, fwd_csr, k
        )
        kth = p1[p1["rank"] == k]
        for qid, sc in zip(kth["query_id"], kth["score"]):
            if sc > theta.get(qid, neg_inf):
                theta[qid] = float(sc)

    if theta:
        th = tbl["query_id"].map(theta).to_numpy(dtype=np.float64)
        has = ~np.isnan(th)
        keep = np.ones(len(tbl), dtype=bool)
        # identical IEEE f64 predicate to the in-plan filter
        keep[has] = tbl["ub"].to_numpy(dtype=np.float64)[has] >= (
            heap_factor * th[has]
        )
        survivors = tbl if keep.all() else tbl.loc[keep]
    else:
        survivors = tbl
    res = _score_topk_driver(
        *_decode_rows_coded(survivors), qids_sorted, qkey, qw, fwd_csr, k
    )
    if res.empty:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(res, schema)


def _driver_theta_search(
    spark: SparkSession,
    postings: DataFrame,
    forward: DataFrame,
    qvecs: dict[str, QVec],
    qdf: DataFrame,
    k: int,
    query_cut: int,
    heap_factor: float,
    two_phase: bool,
    cache_registry: list[DataFrame] | None,
    fwd_csr=None,
) -> DataFrame:
    """Interactive-batch fast path: θ evolves ON THE DRIVER, like the
    reference's in-process heap (inverted_index.rs:153-234), instead of
    inside the plan.

    Motivation (measured, BENCH/BASELINE.md round-4 batch-size section): the
    in-plan θ derivation is one logical plan but AQE materializes its every
    tiny shuffle/broadcast stage as a separate job — 17–24 jobs per batch,
    ~6 s of scheduling fixed cost at any corpus size, which dominates
    batches under ~1000 queries.  For a driver-side dict the narrow block
    table (query_id, term_id, salt, block, ub, lb — no gap blobs) is a few
    hundred rows per query at most, so the θ aggregation that costs several
    window/aggregate stages in-plan is a microsecond numpy pass locally:

      job 1   materialize + cache the block-UB scan, collect narrow columns
      (job 2) two_phase only: exact-score the best-ub block per matched
              list, collect the per-query k-th best (phase-1 tightening,
              posting_list.rs:149-185)
      job 3   filter the CACHED ubs frame to the surviving block keys
              (broadcast literal), decode, exact re-score, top-k — the gap
              blobs never leave the executors

    Float parity with the in-plan path is exact: θ is selected by
    comparisons over the same f64 values the plan would aggregate (k-th
    largest lb, k-th best phase-1 score), and the skip predicate
    ``ub >= heap_factor × θ`` is evaluated in IEEE f64 either way, so the
    survivor set — and therefore every downstream score — is bitwise
    identical (tested: test_search_fastpath.py).

    DataFrame-scale query sets (κ-NN graph: millions of queries) keep the
    in-plan windowed derivation — collecting their block table would be a
    driver bottleneck, which is exactly why the in-plan variant exists.

    Returns None when the narrow block table exceeds
    ``_DRIVER_THETA_MAX_ROWS`` (collected via limit(cap+1), so the transfer
    itself is bounded) — the caller then falls back to the in-plan path.
    """
    cut_rows = _cut_qvecs(qvecs, query_cut)
    empty = spark.createDataFrame(
        [], "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE"
    )
    if not cut_rows:
        return empty
    cterms = spark.createDataFrame(
        cut_rows, "query_id STRING, term_id INT, qw DOUBLE"
    )
    # Result-neutral scan pruning: the join keeps only these term_ids anyway,
    # but an explicit IN predicate reaches the postings SCAN — Parquet
    # row-group stats skip non-matching groups (postings files are
    # term-sorted, postings.py stream builder) and InMemoryTableScan skips
    # cached batches.  Measured ~0.2-0.3 s off the UB scan at 1M docs
    # locally; the real payoff is bucket-partitioned snapshots at scale,
    # where it stacks with _postings_for's file-level bucket pruning.
    term_ids = sorted({int(r[1]) for r in cut_rows})
    if len(term_ids) <= _SCAN_PRUNE_MAX_IDS:
        # same cap as the in-plan path: above it the literal list costs
        # Catalyst more than the scan pruning saves (measured, see
        # _SCAN_PRUNE_MAX_IDS) — the auto-gate keeps auto-engaged batches
        # under it, but an explicit driver_theta=True caller may not be
        postings = postings.filter(F.col("term_id").isin(term_ids))
    matched = (
        postings
        .join(F.broadcast(cterms), "term_id")
        .join(F.broadcast(qdf), "query_id")
    )
    defer = _FASTPATH_DEFER_GAPS
    if cache_registry is not None:
        retire_caches(cache_registry)
    if fwd_csr is not None and not defer:
        # r6 local fast path: one bounded collect (block table + gaps),
        # then θ, decode, exact rescore (driver CSR) and top-k all local —
        # result-identical, ONE Spark job instead of the persisted-ubs
        # formulation's 12–18 AQE jobs.  _OVERFLOW (block table over the
        # cap) falls through to the persisted-ubs path below (one extra run
        # of the UB scan in that rare regime).
        res = _driver_theta_local(
            spark, matched, qvecs, k, heap_factor, two_phase, fwd_csr
        )
        if res is not _OVERFLOW:
            return res
    ubs = _block_ubs(matched, with_gaps=not defer)
    if not defer:
        # gaps ride along in the ubs frame: persist it so the rescore tail
        # filters the cached frame instead of re-running the scan
        ubs = ubs.persist()
        if cache_registry is not None:
            cache_registry.append(ubs)

    # Collect with a hard row cap: the auto-gate bounds batch × query_cut,
    # but blocks-per-list is data-dependent, so a head-term-heavy batch on a
    # many-block index could otherwise collect an unexpectedly wide table.
    # limit(cap+1) bounds the transfer itself; hitting the cap returns None
    # and the caller falls back to the in-plan θ derivation.
    narrow = (
        ubs.select("query_id", "term_id", "salt", "block", "ub", "lb")
        .limit(_DRIVER_THETA_MAX_ROWS + 1)
        .toPandas()
    )
    if len(narrow) > _DRIVER_THETA_MAX_ROWS:
        return None
    if narrow.empty:
        return empty

    neg_inf = float("-inf")
    # phase 0: per (query, term) k-th largest block-max lower bound, maxed
    # over the query's matched terms (same value as the wt window + rank-k
    # filter — the k-th largest VALUE is order-independent)
    theta = _theta0_from_narrow(narrow, k)

    if two_phase:
        best = (
            narrow.sort_values(
                ["query_id", "term_id", "ub", "salt", "block"],
                ascending=[True, True, False, True, True],
                kind="stable",
            )
            .groupby(["query_id", "term_id"], sort=False)
            .head(1)[["query_id", "term_id", "salt", "block"]]
        )
        if defer:
            best_blocks = _fetch_gaps(postings, best)
        else:
            best_df = spark.createDataFrame(
                best, "query_id STRING, term_id INT, salt INT, block INT"
            )
            best_blocks = ubs.join(
                F.broadcast(best_df), ["query_id", "term_id", "salt", "block"]
            )
        if len(best) <= _COMPACT_TAIL_MAX_BLOCKS:
            p1_topk = _compact_rescore(best_blocks, forward, qdf, k)
        else:
            p1_topk = topk(
                exact_score(
                    _decode_docs(best_blocks), forward, qdf,
                    broadcast_queries=True,
                ),
                k,
            )
        for r in (
            p1_topk
            .filter(F.col("rank") == k)
            .select("query_id", "score")
            .collect()
        ):
            if r["score"] > theta.get(r["query_id"], neg_inf):
                theta[r["query_id"]] = r["score"]

    if theta:
        th = narrow["query_id"].map(theta).to_numpy(dtype=np.float64)
        has = ~np.isnan(th)
        keep = np.ones(len(narrow), dtype=bool)
        # identical IEEE f64 predicate to the in-plan filter
        keep[has] = narrow["ub"].to_numpy(dtype=np.float64)[has] >= (
            heap_factor * th[has]
        )
    else:
        keep = np.ones(len(narrow), dtype=bool)

    if defer:
        # no cached frame to filter — fetch gaps for the surviving keys
        survivors = _fetch_gaps(
            postings, narrow.loc[keep, ["query_id", "term_id", "salt", "block"]]
        )
    elif keep.all():
        survivors = ubs
    else:
        keys = narrow.loc[keep, ["query_id", "term_id", "salt", "block"]]
        survivors = ubs.join(
            F.broadcast(
                spark.createDataFrame(
                    keys, "query_id STRING, term_id INT, salt INT, block INT"
                )
            ),
            ["query_id", "term_id", "salt", "block"],
        )
    if int(keep.sum()) <= _COMPACT_TAIL_MAX_BLOCKS:
        return _compact_rescore(survivors, forward, qdf, k)
    cands = _decode_docs(survivors)
    scored = exact_score(cands, forward, qdf, broadcast_queries=True)
    return topk(scored, k)


def retire_caches(cache_registry: list[DataFrame]) -> None:
    """Unpersist every DataFrame in a caller-scoped cache registry.

    ubs frames persisted by previous batch_search calls are retired at the
    caller's next call so a long-lived session issuing many searches never
    accumulates dead cached RDDs in executor storage memory.  A result
    DataFrame collected AFTER the retirement recomputes its subtree —
    correct, just un-cached.
    """
    while cache_registry:
        df = cache_registry.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


def batch_search(
    spark: SparkSession,
    postings: DataFrame,
    forward: DataFrame,
    queries,
    k: int = 10,
    query_cut: int = 10,
    heap_factor: float = 1.0,
    two_phase: bool = False,
    broadcast_queries: bool | None = None,
    cache_registry: list[DataFrame] | None = None,
    driver_theta: bool | None = None,
    rescore_bcast: bool = False,
    local_score: bool = False,
    csr_cache: dict | None = None,
) -> DataFrame:
    """Dynamically-pruned batch top-k (Q1/Q9 analogue), single logical plan.

    ``queries`` is a dict {query_id: (term_ids, weights)} (interactive path,
    broadcast) or a DataFrame with QUERIES_SCHEMA (bulk path, e.g. every doc
    as a query for κ-NN).  ``q_terms`` SHOULD be sorted ascending per row
    with distinct ids; unsorted rows are repaired batch-side and duplicate
    ids merged by weight sum (see _query_keys).  Returns (query_id, rank,
    doc_id, score); no driver-side loops or mid-plan actions.

    ``cache_registry``: caller-scoped lifecycle for the persisted ubs frame
    (SeismicSparkIndex passes a per-instance list, so interleaved searches on
    DIFFERENT indexes never thrash each other's cache).  Previous entries are
    retired, the new cache appended.  With None a module-level default
    registry is used, so direct callers in a long session still have each
    call retire the previous call's cache instead of accumulating persisted
    RDDs until LRU/disk pressure.

    ``driver_theta``: derive θ on the driver instead of in-plan (see
    :func:`_driver_theta_search` — result-identical, ~3 jobs instead of
    17–24).  Default (None) auto-enables for driver-side dict batches of at
    most ``$SEISMIC_DRIVER_THETA_MAX`` (1024) queries; DataFrame query sets
    always use the in-plan derivation.

    ``rescore_bcast`` (two_phase=False in-plan tail only): collect forward
    and query vectors into broadcast CSR arrays and fuse exact rescore +
    per-query top-k into the candidate operator (:func:`_fused_candidates`)
    — result-identical; candidate×vector pair rows never materialize.  The
    CALLER must gate on vector-table size (see knn.build_knn — two bounded
    collects of ≈ n·avgdl·16 B each); ungated DataFrame-scale corpora
    belong on the default join path.

    ``local_score`` (fast-path dict batches only): collect the forward
    table once into a driver-side CSR (cached in ``csr_cache`` when the
    caller provides one — SeismicSparkIndex passes a per-instance dict)
    and run θ, decode, rescore and top-k entirely on the driver
    (:func:`_driver_theta_local`) — result-identical, one Spark job per
    batch.  The CALLER must gate on forward size (see
    ``_LOCAL_SCORE_MAX_BYTES`` and SeismicSparkIndex.batch_search).
    """
    if not isinstance(queries, DataFrame):
        # normalize duplicate term ids ONCE, deterministically, before path
        # selection — both θ paths then see identical duplicate-free floats
        # (the documented fast-path/in-plan bitwise identity)
        queries = _merge_dup_qvecs(queries)
    if cache_registry is None:
        cache_registry = _DEFAULT_CACHE_REGISTRY
    qdf, small = _as_queries_df(spark, queries)
    if broadcast_queries is None:
        broadcast_queries = small
    if driver_theta is None:
        # Auto-engage only where the compact rescore tail can engage too:
        # phase-1 decodes one block per matched list, and the batch has at
        # most len(queries) × query_cut lists.  Above the compact-tail bound
        # the fast path degenerates to the same distributed chains as the
        # in-plan derivation PLUS serial job barriers — measured SLOWER at
        # batch 1000 × cut 10 in a same-window interleaved ABAB (1M docs,
        # BENCH/BASELINE.md), while batch ≤ ~400 wins every rep.
        driver_theta = (
            small
            and 0 < len(queries) <= _DRIVER_THETA_MAX
            and len(queries) * query_cut <= _COMPACT_TAIL_MAX_BLOCKS
        )
    if driver_theta and small:
        fwd_csr = None
        if local_score and not _FASTPATH_DEFER_GAPS:
            fwd_csr = csr_cache.get("forward") if csr_cache is not None else None
            if fwd_csr is None:
                fwd_csr = _vectors_csr(forward, "doc_id", "terms", "weights")
                if csr_cache is not None:
                    csr_cache["forward"] = fwd_csr
        res = _driver_theta_search(
            spark, postings, forward, queries, qdf, k, query_cut,
            heap_factor, two_phase, cache_registry, fwd_csr=fwd_csr,
        )
        if res is not None:
            return res
        # Block-table row cap hit — fall through to the in-plan derivation.
        # Retire the fast path's abandoned persisted ubs NOW: the in-plan
        # tail only retires when broadcast_queries/two_phase is set, so a
        # caller pinning both off would otherwise leak the cache until a
        # later fast-path call happened to retire it.
        retire_caches(cache_registry)
    qdf = qdf.filter(F.size("q_terms") > 0)
    if small:
        # Dict batches routed in-plan still know their term union on the
        # driver; an IN predicate on the SUPERSET of all query terms is
        # result-neutral (the cut-terms join restricts further) and reaches
        # the postings scan for row-group / cached-batch / bucket-file
        # pruning, same as the fast path's filter.  Above the cap the
        # literal list costs Catalyst more than the pruning saves — skip.
        all_ids = sorted({int(t) for ts, _ in queries.values() for t in ts})
        if all_ids and len(all_ids) <= _SCAN_PRUNE_MAX_IDS:
            postings = postings.filter(F.col("term_id").isin(all_ids))
    cterms = cut_terms(qdf, query_cut)
    qj = F.broadcast(cterms) if broadcast_queries else cterms
    matched = postings.join(qj, "term_id")
    qvec_j = F.broadcast(qdf) if broadcast_queries else qdf
    matched = matched.join(qvec_j, "query_id")
    ubs = _block_ubs(matched)
    if not two_phase:
        # Fused tail (r6): θ + skip filter + decode + dedup in one streamed
        # operator over query-co-located block rows — one exchange instead
        # of the wt/wq windows + distinct (guide §2.4), no persist needed
        # (single consumer), gap blobs cross exactly one shuffle.  Result
        # bitwise-identical (see _fused_candidates).
        if cache_registry is not None:
            retire_caches(cache_registry)
        if rescore_bcast:
            sc = spark.sparkContext
            rs = (
                sc.broadcast(_vectors_csr(forward, "doc_id", "terms", "weights")),
                sc.broadcast(
                    _vectors_csr(
                        qdf, "query_id", "q_terms", "q_weights", with_qkey=True
                    )
                ),
            )
            return _fused_candidates(ubs, k, heap_factor, rescore=rs)
        cands = _fused_candidates(ubs, k, heap_factor)
        scored = exact_score(
            cands, forward, qdf, broadcast_queries=broadcast_queries
        )
        return topk(scored, k)
    if broadcast_queries or two_phase:
        # small query batches: cache the block scan — θ is an aggregate of
        # ubs, and without the cache Catalyst executes the whole
        # postings-join→block-scan subtree once per consumer
        if cache_registry is not None:
            retire_caches(cache_registry)
        ubs = ubs.persist()
        if cache_registry is not None:
            cache_registry.append(ubs)

    survivors = _theta_survivors(
        ubs, forward, qdf, k, heap_factor, two_phase, broadcast_queries
    )
    cands = _decode_docs(survivors)
    scored = exact_score(cands, forward, qdf, broadcast_queries=broadcast_queries)
    return topk(scored, k)


def _theta_survivors(
    ubs: DataFrame,
    forward: DataFrame,
    qdf: DataFrame,
    k: int,
    heap_factor: float,
    two_phase: bool,
    broadcast_queries: bool,
) -> DataFrame:
    """θ derivation + skip filter over the ubs frame.

    θ_q (phase 0) = max over matched terms of the k-th largest per-term
    block-max lower bound.  Two physical strategies, same value:

    - broadcast (small) query batches: ubs is persisted by the caller, θ is
      a narrow aggregate of the cache joined back as a per-query broadcast —
      no shuffle of the gap blobs.
    - DataFrame-scale query sets (κ-NN: the ubs frame is too big to cache):
      WINDOW functions over the ubs frame itself (rank within (query, term),
      then a per-query max of the rank-k values) — one pass, no self-join,
      so the postings-join→block-scan subtree is never executed twice.

    two_phase adds the first_sorted-style tightening: exact-score the
    best-ub block per matched list; the per-query k-th best exact score is
    broadcast back and maxed into θ.
    """
    wt = Window.partitionBy("query_id", "term_id").orderBy(F.col("lb").desc())
    if broadcast_queries:
        theta0 = (
            ubs.select("query_id", "term_id", "lb")
            .withColumn("_r", F.row_number().over(wt))
            .filter(F.col("_r") == k)
            .groupBy("query_id")
            .agg(F.max("lb").alias("theta"))
        )
        ubs = ubs.join(F.broadcast(theta0), "query_id", "left")
    else:
        wq = Window.partitionBy("query_id")
        ubs = ubs.withColumn("_r", F.row_number().over(wt)).withColumn(
            "theta",
            F.max(F.when(F.col("_r") == k, F.col("lb"))).over(wq),
        )

    if two_phase:
        wb = Window.partitionBy("query_id", "term_id").orderBy(
            F.col("ub").desc(), F.col("salt").asc(), F.col("block").asc()
        )
        best = (
            ubs.select("query_id", "term_id", "salt", "block", "ub", "gaps")
            .withColumn("_rb", F.row_number().over(wb))
            .filter(F.col("_rb") == 1)
        )
        p1 = exact_score(
            _decode_docs(best), forward, qdf, broadcast_queries=broadcast_queries
        )
        wqs = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        theta2 = (
            p1.withColumn("_r", F.row_number().over(wqs))
            .filter(F.col("_r") == k)
            .groupBy("query_id")
            .agg(F.max("score").alias("theta2"))
        )
        # θ2 is one row per query — always broadcast (stats are unknown to
        # AQE because it hangs off a Python UDF output)
        ubs = ubs.join(F.broadcast(theta2), "query_id", "left").withColumn(
            "theta",
            F.greatest(
                F.coalesce("theta", F.lit(float("-inf"))),
                F.coalesce("theta2", F.lit(float("-inf"))),
            ),
        ).withColumn(
            "theta",
            F.when(F.col("theta") == float("-inf"), F.lit(None)).otherwise(
                F.col("theta")
            ),
        )

    return ubs.filter(
        F.col("theta").isNull() | (F.col("ub") >= F.lit(heap_factor) * F.col("theta"))
    )


def search_stats(
    spark: SparkSession,
    postings: DataFrame,
    forward: DataFrame,
    queries,
    k: int = 10,
    query_cut: int = 10,
    heap_factor: float = 1.0,
    two_phase: bool = False,
) -> dict[str, float]:
    """Skip-rate instrumentation for a query batch: how many matched blocks
    the dynamic pruning skipped, and how many candidate docs survived.

    Mirrors batch_search's candidate selection exactly (same θ derivation);
    used by the accuracy/efficiency harness — the analogue of the
    reference's per-run reporting (scripts/run_experiments.py:287-309).
    """
    qdf, _ = _as_queries_df(spark, queries)
    qdf = qdf.filter(F.size("q_terms") > 0)
    cterms = cut_terms(qdf, query_cut)
    matched = postings.join(F.broadcast(cterms), "term_id").join(
        F.broadcast(qdf), "query_id"
    )
    ubs = _block_ubs(matched).persist()
    survivors = _theta_survivors(
        ubs, forward, qdf, k, heap_factor, two_phase, broadcast_queries=True
    ).persist()
    matched_n = ubs.count()
    scanned = survivors.count()
    n_cands = _decode_docs(survivors).count()
    survivors.unpersist()
    ubs.unpersist()
    return {
        "blocks_matched": matched_n,
        "blocks_scanned": scanned,
        "blocks_skipped": matched_n - scanned,
        "skip_rate": round(1.0 - scanned / matched_n, 4) if matched_n else 0.0,
        "candidates": int(n_cands),
    }


# Driver bruteforce gate: total scored elements = n_queries × corpus nnz;
# under this, the full scan is a single vectorized numpy pass on the driver
# against the collected forward CSR — above it (or for DataFrame queries)
# the distributed crossJoin oracle runs unchanged.
_BRUTE_LOCAL_MAX_ELEMS = int(
    os.environ.get("SEISMIC_BRUTE_LOCAL_MAX_ELEMS", str(50_000_000))
)


def bruteforce_search(
    spark: SparkSession,
    forward: DataFrame,
    queries,
    k: int = 10,
    local_score: bool = False,
    csr_cache: dict | None = None,
) -> DataFrame:
    """Exact full-scan top-k (Q10 analogue / ground-truth oracle).

    ``local_score`` (dict batches, caller-gated like batch_search's): score
    every (query, doc) pair on the driver against the collected forward CSR
    — the same `_score_pairs_csr` floats, the same ``score > 0`` IEEE
    predicate, the same pinned top-k order, so results are identical to the
    crossJoin formulation."""
    qdf, small = _as_queries_df(spark, queries)
    if small and local_score and queries:
        qvecs = {
            q: v for q, v in queries.items()
            if np.asarray(v[0]).size > 0
        }
        fwd_csr = csr_cache.get("forward") if csr_cache is not None else None
        if fwd_csr is None:
            fwd_csr = _vectors_csr(forward, "doc_id", "terms", "weights")
            if csr_cache is not None:
                csr_cache["forward"] = fwd_csr
        f_ids, f_perm, f_starts, f_lens, f_t, f_w = fwd_csr
        schema = "query_id STRING, rank INT, doc_id BIGINT, score DOUBLE"
        nq = len(qvecs)
        if nq == 0 or f_ids.size == 0:
            return spark.createDataFrame([], schema)
        if nq * f_t.size <= _BRUTE_LOCAL_MAX_ELEMS:
            qids_sorted, qkey, qw = _qside_from_qvecs(qvecs)
            qs = np.repeat(np.arange(nq, dtype=np.int64), f_ids.size)
            di = np.tile(np.arange(f_ids.size, dtype=np.int64), nq)
            ds = f_ids[di]
            scores = _score_pairs_csr(
                qs, f_perm[di], f_starts, f_lens, f_t, f_w, qkey, qw,
                threads=min(8, os.cpu_count() or 1),
            )
            pos = scores > 0.0
            qs, ds, scores = qs[pos], ds[pos], scores[pos]
            if qs.size == 0:
                return spark.createDataFrame([], schema)
            sel, ranks = _topk_select(qs, ds, scores, k)
            return spark.createDataFrame(
                pd.DataFrame(
                    {
                        "query_id": qids_sorted[qs[sel]].astype(object),
                        "rank": ranks,
                        "doc_id": ds[sel],
                        "score": scores[sel],
                    }
                ),
                schema,
            )
    qdf = qdf.filter(F.size("q_terms") > 0)
    cands = qdf.select("query_id").crossJoin(forward.select("doc_id"))
    scored = exact_score(cands, forward, qdf, broadcast_queries=small).filter(
        F.col("score") > 0
    )
    return topk(scored, k)
