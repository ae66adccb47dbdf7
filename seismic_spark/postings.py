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
  docs' FULL forward vectors — computed as a pure DataFrame aggregation
  (map-side combinable max), not a UDF; optional energy-preserving truncation
  (posting_list.rs:329-368) + u8 affine quantization in a scalar pandas UDF.
  With ``summary_energy=1.0`` and ``quant_ceil=True`` the dequantized summary
  dot upper-bounds every member doc's true dot product → block skipping at
  heap_factor=1.0 is EXACT.
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
from pyspark.sql.functions import pandas_udf
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
    blocking: str = "geometric"  # "fixed" (B1) | "geometric"
    block_size: int = 64  # fixed blocking
    block_b0: int = 8  # geometric: first block size
    block_cap: int = 128  # geometric: max block size
    summary_energy: float = 1.0  # 1.0 = exact upper-bound summaries
    quant_ceil: bool = True  # round-up codes → dequant ≥ true max
    blocks_per_row: int = 4096  # salt rows so one list row stays bounded
    salt_buckets: int = 8  # two-level top-k pre-aggregation fan-out


# ------------------------------------------------------------- pruning ------


def topk_per_term(
    dtw: DataFrame, n: int, salt_buckets: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Per-term top-n by (weight desc, doc_id asc) — FixedSize pruning (I1).

    Two-level: first top-n within (term, doc_id % salt_buckets), then top-n
    per term.  The first window bounds any single partition's input to
    ~df/salt_buckets rows, taming head-term skew; the second sees at most
    n × salt_buckets rows per term.
    """
    order = [F.col("weight").desc(), F.col(id_col).asc()]
    if salt_buckets > 1:
        w1 = Window.partitionBy("term_id", F.col(id_col) % salt_buckets).orderBy(*order)
        dtw = dtw.withColumn("_r1", F.row_number().over(w1)).filter(
            F.col("_r1") <= n
        ).drop("_r1")
    w2 = Window.partitionBy("term_id").orderBy(*order)
    return dtw.withColumn("rank", F.row_number().over(w2) - 1).filter(F.col("rank") < n)


def global_threshold_cut(dtw: DataFrame, budget: int) -> float:
    """Exact weight of the `budget`-th largest entry, in 3 jobs at any scale.

    approxQuantile brackets the boundary; one exact count fixes which side;
    only the boundary slice is sorted.  Semantics (ours, documented): keep
    all entries with weight >= cut — ties at the cut are all kept (the
    reference breaks ties by arrival order, inverted_index.rs:365-378; a
    distributed engine has no arrival order, so we widen to the
    deterministic closure).
    """
    total = dtw.count()
    if total <= budget:
        return float("-inf")
    q = 1.0 - budget / total
    lo_q, hi_q = max(0.0, q - 0.01), min(1.0, q + 0.01)
    lo, hi = dtw.stat.approxQuantile("weight", [lo_q, hi_q], 0.0001)
    n_above = dtw.filter(F.col("weight") > hi).count()
    if n_above >= budget:
        # boundary above hi — rare; fall back to exact sort of the tail above hi
        tail = dtw.filter(F.col("weight") > hi)
    else:
        tail = dtw.filter((F.col("weight") > lo) & (F.col("weight") <= hi))
        budget = budget - n_above
    boundary = (
        tail.select("weight").orderBy(F.col("weight").desc()).limit(budget).collect()
    )
    if not boundary:
        return float("-inf")
    return float(boundary[-1][0])


def global_threshold_pruning(
    dtw: DataFrame, n_terms: int, cfg: IndexConfig, id_col: str = "doc_id"
) -> DataFrame:
    """GlobalThreshold pruning (I2, inverted_index.rs:354-389): keep the
    globally largest ~`n_terms × n_postings` entries, cap each list at
    `n_postings × max_fraction`."""
    cut = global_threshold_cut(dtw, n_terms * cfg.n_postings)
    kept = dtw if cut == float("-inf") else dtw.filter(F.col("weight") >= cut)
    cap = int(cfg.n_postings * cfg.max_fraction)
    return topk_per_term(kept, cap, cfg.salt_buckets, id_col)


def prune(dtw: DataFrame, n_terms: int, cfg: IndexConfig, id_col: str = "doc_id") -> DataFrame:
    """Dispatch on cfg.pruning → (doc_id, term_id, weight, rank)."""
    if cfg.pruning == "global":
        return global_threshold_pruning(dtw, n_terms, cfg, id_col)
    n = cfg.n_postings if cfg.pruning == "fixed" else 2**31 - 1
    return topk_per_term(dtw, n, cfg.salt_buckets, id_col)


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
    """Block index for a 0-based rank — pure integer CASE, no float log."""
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


# ------------------------------------------------- summaries + encoding -----

_SUMMARY_SCHEMA = StructType(
    [
        StructField("terms", ArrayType(IntegerType())),
        StructField("codes", BinaryType()),
        StructField("smin", FloatType()),
        StructField("squant", FloatType()),
    ]
)


def make_summary_udf(energy: float, quant_ceil: bool):
    """Scalar pandas UDF: (terms[], maxvals[]) → truncated+quantized summary.

    Energy-preserving truncation mirrors posting_list.rs:329-368: sort values
    descending, keep the prefix whose running sum first reaches
    energy × total (take-while-inclusive), re-sort kept terms ascending.
    """

    @pandas_udf(_SUMMARY_SCHEMA)
    def summarize(terms: pd.Series, vals: pd.Series) -> pd.DataFrame:
        out_t, out_c, out_m, out_q = [], [], [], []
        for t, v in zip(terms, vals):
            t = np.asarray(t, dtype=np.int32)
            v = np.asarray(v, dtype=np.float32)
            if energy < 1.0 and v.size:
                order = np.argsort(-v, kind="stable")
                sv = v[order]
                cum = np.cumsum(sv.astype(np.float64))
                target = energy * cum[-1]
                keep_n = int(np.searchsorted(cum, target, side="left")) + 1
                keep = order[:keep_n]
                keep.sort()
                t, v = t[keep], v[keep]
            codes, lo, quant = codec.quantize_u8(v, ceil=quant_ceil)
            out_t.append(t)
            out_c.append(codes.tobytes())
            out_m.append(np.float32(lo))
            out_q.append(np.float32(quant))
        return pd.DataFrame(
            {"terms": out_t, "codes": out_c, "smin": out_m, "squant": out_q}
        )

    return summarize


@pandas_udf(BinaryType())
def encode_gaps_udf(ids: pd.Series) -> pd.Series:
    """ARRAY<BIGINT> (sorted asc) → delta-gap + varint BINARY."""
    return ids.map(lambda a: codec.delta_encode(np.asarray(a, dtype=np.uint64)))


@pandas_udf(BinaryType())
def encode_f16_udf(vals: pd.Series) -> pd.Series:
    """ARRAY<DOUBLE> → f16 BINARY."""
    return vals.map(lambda a: codec.f16_encode(np.asarray(a, dtype=np.float32)))


# --------------------------------------------------------------- build ------


def build_postings(
    dtw: DataFrame,
    forward: DataFrame,
    cfg: IndexConfig,
    n_terms: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term_id, weight) + forward → postings table (schema above).

    Dataflow (each arrow a Catalyst-planned stage; no driver loops):
      prune (salted window) → rank → block
      entries ⋈ forward-exploded on doc_id → groupBy(list_term, block,
        component) max → groupBy(list_term, block) collect → summary UDF
      entries groupBy(term, salt, block) collect → encode UDFs
      blocks ⋈ summaries on (term, salt) → postings rows
    """
    pruned = prune(dtw, n_terms, cfg, id_col)
    entries = pruned.withColumn("block", block_of_rank_col(F.col("rank"), cfg))
    entries = entries.withColumn(
        "salt", (F.col("block") / cfg.blocks_per_row).cast("int")
    )
    entries = entries.persist()

    # --- per-block component-wise max over member docs' full vectors ---
    fwd_flat = forward.select(
        id_col,
        F.explode(F.arrays_zip("terms", "weights")).alias("_c"),
    ).select(id_col, F.col("_c.terms").alias("c_term"), F.col("_c.weights").alias("c_w"))
    comp_max = (
        entries.select(F.col("term_id").alias("l_term"), "salt", "block", id_col)
        .join(fwd_flat, id_col)
        .groupBy("l_term", "salt", "block", "c_term")
        .agg(F.max("c_w").alias("c_max"))
    )
    summaries_raw = (
        comp_max.groupBy("l_term", "salt", "block")
        .agg(F.sort_array(F.collect_list(F.struct("c_term", "c_max"))).alias("_s"))
        .select(
            "l_term",
            "salt",
            "block",
            F.col("_s.c_term").alias("s_terms"),
            F.col("_s.c_max").alias("s_vals"),
        )
    )
    summarize = make_summary_udf(cfg.summary_energy, cfg.quant_ceil)
    summaries = summaries_raw.withColumn(
        "summ", summarize(F.col("s_terms"), F.col("s_vals"))
    ).select("l_term", "salt", "block", "summ.*")
    summary_rows = (
        summaries.groupBy("l_term", "salt")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("block", "terms", "codes", "smin", "squant"))
            ).alias("_b")
        )
        .select(
            F.col("l_term").alias("term_id"),
            "salt",
            F.col("_b.terms").alias("summary_terms"),
            F.col("_b.codes").alias("summary_codes"),
            F.col("_b.smin").alias("summary_min"),
            F.col("_b.squant").alias("summary_quant"),
        )
    )

    # --- per-block id/weight encoding ---
    by_block = (
        entries.groupBy("term_id", "salt", "block")
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("d"), "weight"))).alias(
                "_e"
            ),
            F.max("weight").alias("bmax"),
            F.count(F.lit(1)).alias("blen"),
        )
        .select(
            "term_id",
            "salt",
            "block",
            F.col("_e.d").alias("ids"),
            F.col("_e.weight").alias("ws"),
            F.col("bmax").cast("float").alias("bmax"),
            F.col("blen").cast("int").alias("blen"),
        )
        .withColumn("gaps", encode_gaps_udf(F.col("ids")))
        .withColumn("wbin", encode_f16_udf(F.col("ws")))
    )
    block_rows = (
        by_block.groupBy("term_id", "salt")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("block", "blen", "gaps", "wbin", "bmax"))
            ).alias("_b"),
            F.sum("blen").alias("n_docs"),
        )
        .select(
            "term_id",
            "salt",
            F.col("n_docs").cast("int").alias("n_docs"),
            F.col("_b.block").alias("blocks"),
            F.col("_b.blen").alias("block_lens"),
            F.col("_b.gaps").alias("doc_gaps"),
            F.col("_b.wbin").alias("weights_f16"),
            F.col("_b.bmax").alias("block_max"),
        )
    )
    postings = block_rows.join(summary_rows, ["term_id", "salt"])
    return postings
