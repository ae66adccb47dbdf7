"""Vocabulary: term → dense id assignment in sorted-term order + df counts.

Parity: the reference's offline converter assigns ids in sorted-token order
"to ensure portability" (scripts/convert_json_to_inner_format.py:109-111);
we do the same.

Scale note: a naive ``row_number() OVER (ORDER BY term)`` funnels the whole
vocabulary through one partition.  :func:`assign_ordered_ids` instead
range-partitions on the key, numbers within partitions, and adds collected
per-partition offsets — O(P) driver state, no single-partition bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_ordered_ids(
    df: DataFrame,
    key: str,
    id_col: str = "term_id",
    num_ranges: int | None = None,
    id_type: str = "int",
) -> DataFrame:
    """Add a dense 0-based ``id_col`` equal to the rank of ``key`` in global
    sorted order.  ``key`` values must be unique (post-groupBy).
    ``id_type="bigint"`` for id spaces that can exceed 2^31 (doc ids at the
    10^12-doc design point; term vocabularies stay int)."""
    sc_parallelism = df.sparkSession.sparkContext.defaultParallelism
    p = num_ranges or max(sc_parallelism, 8)
    parts = (
        df.repartitionByRange(p, F.col(key))
        .sortWithinPartitions(key)
        .withColumn("_pid", F.spark_partition_id())
    )
    parts = parts.persist()
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = parts.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _off BIGINT"
    )
    w = Window.partitionBy("_pid").orderBy(key)
    out = (
        parts.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_rn")).cast(id_type))
        .drop("_pid", "_rn", "_off")
    )
    return out


def build_vocab(tokenized_docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``(term, df, term_id)`` from tokenized docs (needs ``tokens`` column).

    df = number of docs containing the term (array_distinct before explode →
    map-side dedup, no doc_id×term shuffle blowup).
    """
    df_counts = (
        tokenized_docs.select(id_col, F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return assign_ordered_ids(df_counts, "term")
