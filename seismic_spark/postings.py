"""Posting-list construction: static pruning → blocking → summaries → encode.

Spark-first re-expression of the reference's index build
(inverted_index.rs:293-389 pruning; posting_list.rs:217-225 blocking;
posting_list.rs:302-368 summaries; utils.rs:68-90 quantization):

- **Static pruning** (I1/I2): per-term top-`n_postings` via salted two-level
  window top-k (no single hot partition for head terms), or GlobalThreshold —
  keep the globally largest `n_terms × n_postings` entries, per-list cap
  `n_postings × max_fraction`.
- **Blocking** (B1): rank entries weight-descending per term, chunk into
  fixed or geometric blocks (geometric per BASELINE.json north star: sizes
  b0·2^i capped at `block_cap`, then linear).
- **Summaries** (M1/M2): per (term, block), component-wise max over member
  docs' FULL forward vectors.  Computed inside ONE ``applyInPandas`` per
  (term, salt) group: member vectors ride along the single entries⋈forward
  join as Arrow array columns (a narrow-row explode→aggregate formulation
  was 10× slower: it shuffles Σ entries×nnz individual rows).  Optional
  energy-preserving truncation (posting_list.rs:329-368) + u8 affine
  quantization, all numpy.  With ``summary_energy=1.0`` and
  ``quant_ceil=True`` the dequantized summary dot upper-bounds every member
  doc's true dot product → block skipping at heap_factor=1.0 is EXACT.
- **Encoding**: per block, doc ids sorted ascending → delta-gap + varint
  BINARY; weights → f16 BINARY (codec.py), per north rule.

Output table (one row per (term_id, salt); salt splits giant lists):
    term_id INT, salt INT, n_docs INT,
    blocks ARRAY<INT>, block_lens ARRAY<INT>,
    doc_gaps ARRAY<BINARY>, weights_f16 ARRAY<BINARY>, block_max ARRAY<FLOAT>,
    summary_terms ARRAY<ARRAY<INT>>, summary_codes ARRAY<BINARY>,
    summary_min ARRAY<FLOAT>, summary_quant ARRAY<FLOAT>

At cluster scale the table is written repartitioned by hash(term_id) so query
lookups prune partitions; rows are bounded by `blocks_per_row` so a head term
(df ~ 10^9 pre-pruning) never concentrates in one task.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from seismic_spark import codec


@dataclass(frozen=True)
class IndexConfig:
    """Build parameters; defaults mirror the reference's
    (configurations.rs:61-117) where they transfer."""

    n_postings: int = 3500
    max_fraction: float = 1.5
    pruning: str = "fixed"  # "fixed" (I1) | "global" (I2) | "none"
    blocking: str = "geometric"  # "fixed" (B1) | "geometric" | "kmeans" (B2/B5)
    block_size: int = 64  # fixed blocking
    block_b0: int = 8  # geometric: first block size
    block_cap: int = 128  # geometric: max block size
    # kmeans blocking (reference defaults, configurations.rs:113-117)
    centroid_fraction: float = 0.1
    min_cluster_size: int = 2
    kmeans_doc_cut: int = 15
    kmeans_seed: int = 1142  # reference's approx-kmeans seed (utils.rs:163)
    kmeans_mode: str = "approx"  # "approx" (B5, reference default,
    # configurations.rs:115) | "ii" (B4: pruned centroid mini-index generates
    # candidates, EXACT dots on touched centroids decide —
    # utils.rs:316-412 via compute_centroid_assignments_dot_product)
    kmeans_pruning_factor: float = 0.005  # B4 pruned-list size factor
    # (pruned_list_size = max(5, len·factor), RustUsage.md:33)
    summary_energy: float = 1.0  # 1.0 = exact upper-bound summaries
    quant_ceil: bool = True  # round-up codes → dequant ≥ true max
    blocks_per_row: int = 4096  # salt rows so one list row stays bounded
    salt_buckets: int = 8  # two-level top-k pre-aggregation fan-out
    postings_partitions: int = 0  # partition count for the vector-carrying
    # posting shuffle; 0 = spark.sql.shuffle.partitions.  Size it so tasks
    # land ~64MB (≈ entries × (12B × avg nnz) / 64MB) — 250MB+ Arrow tasks
    # spill/GC-serialize the stage (measured 2×, BENCH/BASELINE.md)
    value_type: str = "f64"  # "f64" | "f32" | "f16" | "bf16" | "fixedu8" |
    # "fixedu16" — the reference's value-type matrix (TomlInstructions.md:79,
    # build_inverted_index.rs:246-291; its default is f16 storage + f32
    # compute, pylib/mod.rs:27-39).  Weights are round-tripped through the
    # selected storage type before indexing/scoring
    # (textprep.value_round_trip_col); fixed-point grids are scaled by the
    # corpus max weight (documented adaptation — BM25 weights aren't [0,1)).


# ------------------------------------------------------------- pruning ------


def topk_per_term(
    dtw: DataFrame, n: int, salt_buckets: int = 8, id_col: str = "doc_id",
    max_group: int | None = None,
) -> DataFrame:
    """Per-term top-n by (weight desc, doc_id asc) — FixedSize pruning (I1).

    Two-level: first top-n within (term, doc_id % salt_buckets), then top-n
    per term.  The first window bounds any single partition's input to
    ~df/salt_buckets rows, taming head-term skew; the second sees at most
    n × salt_buckets rows per term.

    The first level is purely a skew/performance device — a sub-group top-n
    keeps every candidate for the global top-n, so skipping it NEVER changes
    the output.  ``max_group`` (the corpus doc count on the build path) makes
    that skip scale-adaptive (r6, guide §2.4): when ``n × salt_buckets ≥
    max_group`` the second window's per-term input is ≤ max_group rows with
    or without level 1, so level 1 can only add a full extra exchange+sort
    of every entry — measured as one of two entry-sized shuffles in the
    sf0.1 builds, where n_postings × 8 always exceeds the corpus.
    """
    order = [F.col("weight").desc(), F.col(id_col).asc()]
    level1_useful = max_group is None or n * salt_buckets < max_group
    if salt_buckets > 1 and level1_useful:
        w1 = Window.partitionBy("term_id", F.col(id_col) % salt_buckets).orderBy(*order)
        dtw = dtw.withColumn("_r1", F.row_number().over(w1)).filter(
            F.col("_r1") <= n
        ).drop("_r1")
    w2 = Window.partitionBy("term_id").orderBy(*order)
    return dtw.withColumn("rank", F.row_number().over(w2) - 1).filter(F.col("rank") < n)


GLOBAL_CUT_SLICE_CAP = 200_000  # max rows ever collected to the driver


def global_threshold_cut(dtw: DataFrame, budget: int) -> float:
    """Exact weight of the `budget`-th largest entry with a BOUNDED driver
    collect (≤ GLOBAL_CUT_SLICE_CAP rows) at any scale and any tie
    distribution.

    Semantics (ours, documented): keep all entries with weight >= cut — ties
    at the cut are all kept (the reference breaks ties by arrival order,
    inverted_index.rs:365-378; a distributed engine has no arrival order, so
    we widen to the deterministic closure).

    Algorithm: value-range bisection on the weight.  Each round either
    shrinks the bracket (lo, hi] that contains the boundary (adjusting the
    residual rank `need`), or detects a massive tie (bracket can't shrink)
    and returns the tied value directly — adversarial tie distributions
    therefore never trigger an unbounded collect.  approxQuantile guides the
    split point so typical data converges in 1–2 rounds.
    """
    total = dtw.count()
    if total <= budget:
        return float("-inf")
    lo, hi = float("-inf"), float("inf")
    need = budget  # rank of the boundary within (lo, hi]
    in_bracket = total
    for _ in range(64):
        if in_bracket <= min(GLOBAL_CUT_SLICE_CAP, max(need, 1) * 2):
            break
        bracket = dtw
        if lo != float("-inf"):
            bracket = bracket.filter(F.col("weight") > lo)
        if hi != float("inf"):
            bracket = bracket.filter(F.col("weight") <= hi)
        # split guided by the target rank within the bracket
        (mid,) = bracket.stat.approxQuantile(
            "weight", [max(0.0, min(1.0, 1.0 - need / in_bracket))], 0.001
        )
        if not (lo < mid < hi):
            # quantile landed on a bracket edge — try the arithmetic midpoint
            mid = (lo + hi) / 2.0
            if not (lo < mid < hi):
                # interval exhausted → a tie block straddles the boundary;
                # the closure semantics keep every tied entry.
                return float(hi)
        upper = bracket.filter(F.col("weight") > mid)
        n_upper = upper.count()
        if n_upper >= need:
            lo, in_bracket = mid, n_upper
        else:
            hi, need, in_bracket = mid, need - n_upper, in_bracket - n_upper
        if in_bracket <= 0:  # numeric corner: nothing left — hi is the cut
            return float(hi)
    bracket = dtw
    if lo != float("-inf"):
        bracket = bracket.filter(F.col("weight") > lo)
    if hi != float("inf"):
        bracket = bracket.filter(F.col("weight") <= hi)
    boundary = (
        bracket.select("weight")
        .orderBy(F.col("weight").desc())
        .limit(min(need, GLOBAL_CUT_SLICE_CAP))
        .collect()
    )
    if len(boundary) >= need:
        return float(boundary[need - 1][0])
    return float(boundary[-1][0]) if boundary else float(hi)


def global_threshold_pruning(
    dtw: DataFrame,
    n_terms: int,
    cfg: IndexConfig,
    id_col: str = "doc_id",
    precomputed_cut: float | None = None,
    max_group: int | None = None,
) -> DataFrame:
    """GlobalThreshold pruning (I2, inverted_index.rs:354-389): keep the
    globally largest ~`n_terms × n_postings` entries, cap each list at
    `n_postings × max_fraction`.

    ``precomputed_cut`` lets a batched build compute the threshold ONCE on
    the full entry set and apply it per wave — the union of waves is then
    exactly the unbatched output (checkpoint._run_postings_batched)."""
    cut = (
        precomputed_cut
        if precomputed_cut is not None
        else global_threshold_cut(dtw, n_terms * cfg.n_postings)
    )
    kept = dtw if cut == float("-inf") else dtw.filter(F.col("weight") >= cut)
    cap = int(cfg.n_postings * cfg.max_fraction)
    return topk_per_term(kept, cap, cfg.salt_buckets, id_col, max_group)


def prune(
    dtw: DataFrame,
    n_terms: int,
    cfg: IndexConfig,
    id_col: str = "doc_id",
    global_cut: float | None = None,
    max_group: int | None = None,
) -> DataFrame:
    """Dispatch on cfg.pruning → (doc_id, term_id, weight, rank).

    ``max_group``: upper bound on any term's list length (the corpus doc
    count) — lets the two-level top-k drop its redundant first level when it
    provably cannot filter (see :func:`topk_per_term`)."""
    if cfg.pruning == "global":
        return global_threshold_pruning(
            dtw, n_terms, cfg, id_col, global_cut, max_group
        )
    n = cfg.n_postings if cfg.pruning == "fixed" else 2**31 - 1
    return topk_per_term(dtw, n, cfg.salt_buckets, id_col, max_group)


# ------------------------------------------------------------ blocking ------


def geometric_boundaries(b0: int, cap: int) -> list[int]:
    """Cumulative start offsets of geometric blocks: sizes b0, 2b0, … cap."""
    bounds = [0]
    size = b0
    while size < cap:
        bounds.append(bounds[-1] + size)
        size *= 2
    bounds.append(bounds[-1] + cap)  # first cap-sized block start..end
    return bounds  # blocks beyond use fixed `cap` size


def block_of_rank_col(rank: Column, cfg: IndexConfig) -> Column:
    """Block index for a 0-based rank — pure integer CASE, no float log.

    For kmeans blocking the block is a function of doc VECTORS, not rank —
    it's assigned inside the posting builder; rows carry block 0 here (lists
    are bounded by pruning, so row salting by block is not needed)."""
    if cfg.blocking == "kmeans":
        return F.lit(0).cast("int")
    if cfg.blocking == "fixed":
        return (rank / cfg.block_size).cast("int")
    bounds = geometric_boundaries(cfg.block_b0, cfg.block_cap)
    tail_start = bounds[-1]
    n_geo = len(bounds) - 1
    expr: Column = (
        F.lit(n_geo) + ((rank - tail_start) / cfg.block_cap).cast("int")
    )
    for i in range(n_geo - 1, -1, -1):
        expr = F.when(rank < bounds[i + 1], i).otherwise(expr)
    return expr.cast("int")


def block_of_rank_np(rank: np.ndarray, cfg: IndexConfig) -> np.ndarray:
    """Numpy twin of :func:`block_of_rank_col` (shared with the oracle)."""
    r = np.asarray(rank, dtype=np.int64)
    if cfg.blocking == "fixed":
        return (r // cfg.block_size).astype(np.int32)
    bounds = np.asarray(geometric_boundaries(cfg.block_b0, cfg.block_cap), dtype=np.int64)
    n_geo = len(bounds) - 1
    out = np.searchsorted(bounds, r, side="right") - 1
    tail = r >= bounds[-1]
    out[tail] = n_geo + (r[tail] - bounds[-1]) // cfg.block_cap
    return out.astype(np.int32)


# ----------------------------------------------------- kmeans blocking ------


def _kmeans_prep(
    d_terms: list[np.ndarray],
    d_weights: list[np.ndarray],
    cfg: IndexConfig,
    term_id: int,
):
    """Shared front of both k-means variants: trivial-list guard, Philox
    centroid draw keyed by (kmeans_seed, term_id), centroid matrix over the
    union of centroid terms, and the CSR flatten of all member docs.
    Returns None when the list is trivially one block."""
    n = len(d_terms)
    k = max(1, int(cfg.centroid_fraction * n))
    if n <= 1 or k >= n:
        return None
    rng = np.random.Generator(
        np.random.Philox(key=[cfg.kmeans_seed, term_id & 0x7FFFFFFF])
    )
    centroid_idx = rng.choice(n, size=k, replace=False)
    centroid_idx.sort()
    c_terms = np.unique(np.concatenate([d_terms[i] for i in centroid_idx]))
    C = np.zeros((c_terms.size, k), dtype=np.float32)
    for j, i in enumerate(centroid_idx):
        rows = np.searchsorted(c_terms, d_terms[i])
        C[rows, j] = d_weights[i]
    lens = np.fromiter((t.size for t in d_terms), dtype=np.int64, count=n)
    t_all = np.concatenate(d_terms) if lens.sum() else np.empty(0, np.int64)
    w_all = np.concatenate(d_weights) if lens.sum() else np.empty(0, np.float64)
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), lens)
    return n, k, centroid_idx, c_terms, C, lens, t_all, w_all, doc_rep


def _doc_cut_select(
    t_all: np.ndarray,
    w_all: np.ndarray,
    doc_rep: np.ndarray,
    lens: np.ndarray,
    doc_cut: int,
) -> np.ndarray | None:
    """Indices of each doc's top-``doc_cut`` components by (weight desc,
    position asc), in flat order — None when no doc exceeds the cut."""
    if lens.max(initial=0) <= doc_cut:
        return None
    pos = np.arange(t_all.size, dtype=np.int64)
    order = np.lexsort((pos, -w_all, doc_rep))
    sorted_starts = np.cumsum(lens) - lens
    rank = pos - np.repeat(sorted_starts, lens)
    return np.sort(order[rank < doc_cut])


def _lookup_rows(
    c_terms: np.ndarray, t: np.ndarray, w: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Map flat components onto centroid-matrix rows; weights of components
    absent from the centroid term union become 0 (they can't contribute)."""
    rows = np.searchsorted(c_terms, t)
    rows_c = np.minimum(rows, max(c_terms.size - 1, 0))
    hit = c_terms[rows_c] == t if c_terms.size else np.zeros(t.size, bool)
    return rows_c, np.where(hit, w, 0.0).astype(np.float32)


def _segment_scores(
    wh: np.ndarray,
    rows_c: np.ndarray,
    cnt: np.ndarray,
    starts: np.ndarray,
    C: np.ndarray,
    n: int,
) -> np.ndarray:
    """(n × k) doc·centroid scores: per-doc segment sums of elementwise
    contributions (utils.rs:106-144's accumulate, vectorized), chunked so
    the (elements × k) contribution buffer stays bounded."""
    k = C.shape[1]
    S = np.zeros((n, k), dtype=np.float32)
    elems_per_chunk = max(1, 8_000_000 // max(k, 1))
    d0 = 0
    while d0 < n:
        d1 = d0
        acc = 0
        while d1 < n and (acc == 0 or acc + cnt[d1] <= elems_per_chunk):
            acc += cnt[d1]
            d1 += 1
        s, e = starts[d0], starts[d1 - 1] + cnt[d1 - 1]
        if e > s:
            contrib = wh[s:e, None] * C[rows_c[s:e]]
            local = np.arange(d0, d1)[cnt[d0:d1] > 0]
            if local.size:
                S[local] = np.add.reduceat(contrib, starts[local] - s, axis=0)
        d0 = d1
    return S


def _dissolve_and_remap(a: np.ndarray, k: int, min_cluster_size: int, reassign):
    """Clusters ≤ min_cluster_size dissolve; members reassign among the
    survivors via ``reassign(surviving_mask) -> global centroid ids``; block
    ids renumber densely in surviving-centroid order (utils.rs:189-236)."""
    counts = np.bincount(a, minlength=k)
    surviving = counts > min_cluster_size
    if surviving.any() and not surviving.all():
        surv_ids = np.flatnonzero(surviving)
        a2 = reassign(surviving)
        dissolved = ~surviving[a]
        a[dissolved] = a2[dissolved]
        remap = -np.ones(k, dtype=np.int32)
        remap[surv_ids] = np.arange(surv_ids.size, dtype=np.int32)
        a = remap[a]
    return a.astype(np.int32)


def kmeans_blocks(
    d_terms: list[np.ndarray],
    d_weights: list[np.ndarray],
    cfg: IndexConfig,
    term_id: int,
) -> np.ndarray:
    """RandomKmeans blocking (B2/B5, posting_list.rs:227-300 +
    utils.rs:153-237): pick ⌈centroid_fraction·n⌉ member docs as centroids,
    assign each doc to its argmax-dot centroid scoring only the doc's
    top-``kmeans_doc_cut`` components (the reference's approx variant,
    doc_cut=15), dissolve clusters ≤ min_cluster_size and reassign to
    survivors.  Returns a block id per entry (entry order preserved within a
    block downstream).

    Determinism deviation from the reference (documented, SURVEY.md §7.3):
    the reference draws centroids from one global RNG stream (seed 1142);
    a distributed engine needs per-list determinism under task retries, so
    the stream is keyed by (kmeans_seed, term_id) via Philox counters.

    ``cfg.kmeans_mode='ii'`` dispatches to :func:`kmeans_blocks_ii` (B4).
    """
    if cfg.kmeans_mode == "ii":
        return kmeans_blocks_ii(d_terms, d_weights, cfg, term_id)
    prep = _kmeans_prep(d_terms, d_weights, cfg, term_id)
    if prep is None:
        return np.zeros(len(d_terms), dtype=np.int32)
    n, k, _, c_terms, C, lens, t_all, w_all, doc_rep = prep

    # approx variant scores ONLY each doc's top-doc_cut components
    sel = _doc_cut_select(t_all, w_all, doc_rep, lens, cfg.kmeans_doc_cut)
    if sel is not None:
        t_all, w_all, doc_rep = t_all[sel], w_all[sel], doc_rep[sel]
    cnt = np.bincount(doc_rep, minlength=n)
    starts = np.cumsum(cnt) - cnt
    rows_c, wh = _lookup_rows(c_terms, t_all, w_all)
    # scores are computed ONCE over all k columns; assignment under a
    # survivor mask is a masked argmax of the same matrix (identical to
    # re-scoring the surviving columns — scores are ≥ 0 and column sums
    # don't depend on the mask)
    S = _segment_scores(wh, rows_c, cnt, starts, C, n)

    def assign(mask: np.ndarray | None) -> np.ndarray:
        Sm = S if mask is None else np.where(mask[None, :], S, np.float32(-1.0))
        return np.argmax(Sm, axis=1).astype(np.int32)

    a = assign(None)
    return _dissolve_and_remap(a, k, cfg.min_cluster_size, assign)


def kmeans_blocks_ii(
    d_terms: list[np.ndarray],
    d_weights: list[np.ndarray],
    cfg: IndexConfig,
    term_id: int,
) -> np.ndarray:
    """B4 — II-accelerated k-means assignment with exact re-scoring
    (utils.rs:316-412 ``do_random_kmeans_on_docids_ii_dot_product``):

    - a mini inverted index over the CENTROIDS keeps, per component, the
      ``max(5, n·kmeans_pruning_factor)`` centroids with the largest value;
    - each doc's candidate centroids = union of the pruned lists of its top
      ``kmeans_doc_cut`` components;
    - the winner is the EXACT full-vector dot-product argmax over candidates
      only (a centroid the mini-index never surfaces cannot win — that is
      the approximation), requiring dot > 0 to beat the default (first
      allowed centroid, utils.rs:284-285);
    - a centroid doc always assigns to itself (utils.rs:260-263);
    - clusters ≤ min_cluster_size dissolve; members reassign among survivors
      through the same candidate flow (utils.rs:367-401).

    Deterministic deviations (documented, SURVEY.md §7.3): Philox
    (kmeans_seed, term_id) centroid draw instead of the reference's global
    seed-42 stream; dot ties broken toward the lowest centroid index.
    """
    prep = _kmeans_prep(d_terms, d_weights, cfg, term_id)
    if prep is None:
        return np.zeros(len(d_terms), dtype=np.int32)
    n, k, centroid_idx, c_terms, C, lens, t_all, w_all, doc_rep = prep

    # exact dots use FULL doc vectors (no doc_cut on the scoring side)
    cnt = np.bincount(doc_rep, minlength=n)
    starts = np.cumsum(cnt) - cnt
    rows_c, wh = _lookup_rows(c_terms, t_all, w_all)
    S = _segment_scores(wh, rows_c, cnt, starts, C, n)

    # ---- candidate mask from the pruned centroid mini-index --------------
    pls = max(5, int(n * cfg.kmeans_pruning_factor))
    # per-component rank of each centroid by (value desc, centroid idx asc)
    order = np.argsort(-C, axis=1, kind="stable")
    ranks = np.empty_like(order)
    np.put_along_axis(ranks, order, np.broadcast_to(np.arange(k), order.shape).copy(), axis=1)
    P = (C > 0) & (ranks < pls)  # (c_terms × k) pruned-list membership

    # candidates come from each doc's top-doc_cut components only
    sel = _doc_cut_select(t_all, w_all, doc_rep, lens, cfg.kmeans_doc_cut)
    sel_t, sel_doc = (t_all, doc_rep) if sel is None else (t_all[sel], doc_rep[sel])
    sel_rows_c, sel_wh = _lookup_rows(c_terms, sel_t, np.ones(sel_t.size))
    sel_hit = sel_wh > 0
    M = np.zeros((n, k), dtype=bool)
    if sel_hit.any():
        np.logical_or.at(M, sel_doc[sel_hit], P[sel_rows_c[sel_hit]])

    def masked_assign(allowed: np.ndarray) -> np.ndarray:
        Sm = np.where(M & allowed, S, np.float32(0.0))
        a_ = np.argmax(Sm, axis=1).astype(np.int32)
        won = Sm[np.arange(n), a_] > 0
        default = int(np.flatnonzero(allowed)[0])
        return np.where(won, a_, np.int32(default)).astype(np.int32)

    a = masked_assign(np.ones(k, dtype=bool))
    a[centroid_idx] = np.arange(k, dtype=np.int32)  # self-assignment
    return _dissolve_and_remap(a, k, cfg.min_cluster_size, masked_assign)


# ------------------------------------------------- posting-row builder ------

POSTINGS_SCHEMA = StructType(
    [
        StructField("term_id", IntegerType()),
        StructField("salt", IntegerType()),
        StructField("n_docs", IntegerType()),
        StructField("blocks", ArrayType(IntegerType())),
        StructField("block_lens", ArrayType(IntegerType())),
        StructField("doc_gaps", ArrayType(BinaryType())),
        StructField("weights_f16", ArrayType(BinaryType())),
        StructField("block_max", ArrayType(FloatType())),
        StructField("summary_terms", ArrayType(ArrayType(IntegerType()))),
        StructField("summary_codes", ArrayType(BinaryType())),
        StructField("summary_min", ArrayType(FloatType())),
        StructField("summary_quant", ArrayType(FloatType())),
    ]
)


def _component_max(terms_arrays: list, weights_arrays: list) -> tuple[np.ndarray, np.ndarray]:
    """Component-wise max over member docs' (terms, weights) CSR rows."""
    t = np.concatenate([np.asarray(a, dtype=np.int64) for a in terms_arrays])
    w = np.concatenate([np.asarray(a, dtype=np.float64) for a in weights_arrays])
    order = np.argsort(t, kind="stable")
    t, w = t[order], w[order]
    uniq, starts = np.unique(t, return_index=True)
    mx = np.maximum.reduceat(w, starts)
    return uniq, mx


def truncate_energy(
    terms: np.ndarray, vals: np.ndarray, energy: float
) -> tuple[np.ndarray, np.ndarray]:
    """EnergyPreserving truncation (M2, posting_list.rs:329-368): sort values
    descending, keep the prefix whose running sum first reaches
    energy × total (take-while-inclusive), re-sort kept terms ascending."""
    if energy >= 1.0 or vals.size == 0:
        return terms, vals
    order = np.argsort(-vals, kind="stable")
    cum = np.cumsum(vals[order].astype(np.float64))
    keep_n = int(np.searchsorted(cum, energy * cum[-1], side="left")) + 1
    keep = np.sort(order[:keep_n])
    return terms[keep], vals[keep]


def _build_one_list(pdf: pd.DataFrame, cfg: IndexConfig, id_col: str) -> dict:
    """One (term_id, salt) slice (rank-sorted) → one postings row (as dict).

    All block slicing / encoding / summarization is vectorized numpy —
    mirrors PostingList::build (posting_list.rs:375-450) with the rayon
    per-term parallelism replaced by the shuffle into partitions.
    """
    term_id = int(pdf["term_id"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    blocks_arr = pdf["block"].to_numpy()
    doc_ids = pdf[id_col].to_numpy(dtype=np.int64)
    weights = pdf["weight"].to_numpy(dtype=np.float64)
    d_terms = pdf["terms"].to_numpy()
    d_weights = pdf["weights"].to_numpy()

    if cfg.blocking == "kmeans":
        dt = [np.asarray(a, dtype=np.int64) for a in d_terms]
        dw = [np.asarray(a, dtype=np.float64) for a in d_weights]
        blocks_arr = kmeans_blocks(dt, dw, cfg, term_id)
        order = np.argsort(blocks_arr, kind="stable")  # cluster reorder
        blocks_arr = blocks_arr[order]
        doc_ids, weights = doc_ids[order], weights[order]
        d_terms, d_weights = d_terms[order], d_weights[order]

    uniq_blocks, block_starts = np.unique(blocks_arr, return_index=True)

    blk, lens, gaps, wbins, bmaxs = [], [], [], [], []
    s_terms, s_codes, s_min, s_quant = [], [], [], []
    bounds = list(block_starts) + [len(pdf)]
    for bi, b in enumerate(uniq_blocks):
        s, e = bounds[bi], bounds[bi + 1]
        ids = doc_ids[s:e]
        ws = weights[s:e]
        order = np.argsort(ids, kind="stable")
        blk.append(int(b))
        lens.append(int(e - s))
        gaps.append(codec.delta_encode(ids[order].astype(np.uint64)))
        wbins.append(codec.f16_encode(ws[order]))
        bmaxs.append(codec.f32_floor(ws.max()))
        ut, mx = _component_max(list(d_terms[s:e]), list(d_weights[s:e]))
        ut32 = ut.astype(np.int32)
        # vectors arrived f32-rounded (shuffle payload) — one ulp up restores
        # the ≥-true-f64 upper-bound property for the summary path
        mx32 = np.nextafter(mx.astype(np.float32), np.float32(np.inf)).astype(
            np.float64
        )
        ut32, mx32 = truncate_energy(ut32, mx32, cfg.summary_energy)
        codes, lo, quant = codec.quantize_u8(mx32, ceil=cfg.quant_ceil)
        s_terms.append(ut32)
        s_codes.append(codes.tobytes())
        s_min.append(np.float32(lo))
        s_quant.append(np.float32(quant))

    return {
        "term_id": term_id,
        "salt": salt,
        "n_docs": len(pdf),
        "blocks": blk,
        "block_lens": lens,
        "doc_gaps": gaps,
        "weights_f16": wbins,
        "block_max": bmaxs,
        "summary_terms": s_terms,
        "summary_codes": s_codes,
        "summary_min": s_min,
        "summary_quant": s_quant,
    }


def make_stream_builder(cfg: IndexConfig, id_col: str = "doc_id"):
    """mapInPandas builder over term-hash-partitioned, (term,salt,rank)-sorted
    entries: processes MANY posting lists per Arrow batch.

    applyInPandas pays a per-group pandas conversion (~ms); with vocab-many
    tiny groups that overhead dominates the build and doesn't parallelize.
    Streaming over sorted partitions removes it: group boundaries are found
    with numpy change-detection, and a batch-spanning list is carried over
    to the next batch (lists are bounded by pruning + blocks_per_row, so the
    carry stays small).
    """

    def gen(it):
        carry: pd.DataFrame | None = None

        def flush_complete(pdf: pd.DataFrame, final: bool):
            keys = pdf["term_id"].to_numpy(dtype=np.int64) * (1 << 20) + pdf[
                "salt"
            ].to_numpy(dtype=np.int64)
            if final:
                cut = len(pdf)
            else:
                last_key = keys[-1]
                cut = int(np.searchsorted(keys, last_key, side="left"))
            complete, rest = pdf.iloc[:cut], pdf.iloc[cut:]
            rows = []
            if len(complete):
                ck = keys[:cut]
                starts = np.flatnonzero(np.concatenate(([True], ck[1:] != ck[:-1])))
                bounds = list(starts) + [len(complete)]
                for i in range(len(starts)):
                    rows.append(
                        _build_one_list(
                            complete.iloc[bounds[i]:bounds[i + 1]], cfg, id_col
                        )
                    )
            return rows, (rest if len(rest) else None)

        for pdf in it:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            rows, carry = flush_complete(pdf, final=False)
            if rows:
                yield pd.DataFrame(rows)
        if carry is not None and len(carry):
            rows, _ = flush_complete(carry, final=True)
            if rows:
                yield pd.DataFrame(rows)

    return gen


# --------------------------------------------------------------- build ------


def build_postings(
    dtw: DataFrame,
    forward: DataFrame,
    cfg: IndexConfig,
    n_terms: int,
    id_col: str = "doc_id",
    global_cut: float | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """(doc_id, term_id, weight) + forward → postings table (schema above).

    Dataflow: prune (salted window) → rank → block → join member docs' full
    vectors (shuffle join on doc_id; vectors travel as Arrow arrays) →
    repartition by hash(term_id, salt) + sortWithinPartitions →
    mapInPandas stream builder (many lists per Arrow batch — see
    make_stream_builder for why not applyInPandas).  Two shuffles total;
    list size is bounded by pruning (≤ n_postings × max_fraction entries)
    and `blocks_per_row` salting, so no task sees an unbounded head term.
    """
    pruned = prune(dtw, n_terms, cfg, id_col, global_cut, n_docs)
    entries = pruned.withColumn("block", block_of_rank_col(F.col("rank"), cfg))
    entries = entries.withColumn(
        "salt", (F.col("block") / cfg.blocks_per_row).cast("int")
    )
    # member vectors ride the shuffle as FLOAT (not DOUBLE): each doc's
    # vector is duplicated once per pruned entry, so this halves the
    # dominant shuffle payload.  Exactness is preserved by bumping every
    # summary component max one f32 ulp UP in the builder (≥ the true f64
    # value since f32-nearest error < 1 ulp); the entry `weight` column
    # (θ's block_max side) stays f64 and rounds DOWN (codec.f32_floor).
    fwd_payload = forward.select(
        id_col,
        "terms",
        F.transform("weights", lambda x: x.cast("float")).alias("weights"),
    )
    joined = entries.join(fwd_payload, id_col).select(
        "term_id", "salt", "block", "rank", id_col, "weight", "terms", "weights"
    )
    part_cols = [F.col("term_id"), F.col("salt")]
    parted = (
        joined.repartition(cfg.postings_partitions, *part_cols)
        if cfg.postings_partitions
        else joined.repartition(*part_cols)
    ).sortWithinPartitions("term_id", "salt", "rank")
    return parted.mapInPandas(make_stream_builder(cfg, id_col), POSTINGS_SCHEMA)
