"""Forward index: one row per doc, CSR-style sorted (terms[], weights[]).

Spark analogue of the reference's columnar ``SparseDataset`` forward index
(lib.rs:3-6, inverted_index.rs:98): ``forward(doc_id, terms ARRAY<INT> sorted
ascending, weights ARRAY<DOUBLE>)``.  Component sort per vector mirrors
inverted_index_wrapper.rs:465-470 (P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_forward(doc_term_weights: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term_id, weight) → forward rows with term-sorted arrays.

    One shuffle on doc_id; the sort happens inside ``sort_array`` on the
    collected structs (JVM-side, whole-stage codegen).
    """
    pairs = F.sort_array(F.collect_list(F.struct("term_id", "weight")))
    return (
        doc_term_weights.groupBy(id_col)
        .agg(pairs.alias("_ps"))
        .select(
            id_col,
            F.col("_ps.term_id").alias("terms"),
            F.col("_ps.weight").alias("weights"),
        )
    )


def forward_nnz(forward: DataFrame) -> int:
    """Total number of stored (doc, term) entries."""
    return forward.agg(F.sum(F.size("terms"))).collect()[0][0] or 0
