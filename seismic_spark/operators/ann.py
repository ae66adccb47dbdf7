"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact cosine top-k: the correctness
  baseline.  Dot products via posexplode + hash aggregate (JVM-side, double
  math → bit-reproducible in the DuckDB oracle).
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH buckets
  shrink the candidate set; exact cosine re-scoring inside buckets.
  Hyperplanes are derived deterministically (splitmix64), so results are
  stable across partitionings and retries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _flat(df: DataFrame, id_out: str, prefix: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_out),
        F.posexplode("embedding").alias("pos", f"{prefix}_v"),
    ).withColumn(f"{prefix}_v", F.col(f"{prefix}_v").cast("double"))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k of each query vs the corpus.

    Inputs: (vec_id, embedding array<float>).  Output:
    (query_id, rank, vec_id, cosine) — cosine rounded to 4dp, ties by vec_id.

    Plan: posexplode both sides, join on position, hash-aggregate dot
    products; norms via separate aggregates.  All shuffles are on narrow
    keys; for big corpora the position join broadcasts the (small) query
    side.
    """
    qf = _flat(queries, "query_id", "q")
    cf = _flat(corpus, "vec_id", "c")
    dots = (
        cf.join(F.broadcast(qf), "pos")
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("q_v") * F.col("c_v")).alias("dot"))
    )
    qn = qf.groupBy("query_id").agg(F.sqrt(F.sum(F.col("q_v") ** 2)).alias("qn"))
    cn = cf.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("c_v") ** 2)).alias("cn"))
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "vec_id")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_fold(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact cosine top-k with left-fold dot products (F.aggregate over
    zip_with) — summation order matches a sequential SQL list_reduce
    bit-for-bit, which the DuckDB oracle replicates.  Use for oracle-gated
    runs; :func:`cosine_topk` is the shuffle-friendly production shape."""

    def dot(a, b):  # left fold in array order, double math
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def norm(a):
        return F.sqrt(
            F.aggregate(
                F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.select("vec_id", F.col("embedding").alias("c_emb"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("q_emb"), F.col("c_emb"))
                / (norm(F.col("q_emb")) * norm(F.col("c_emb"))),
                4,
            ),
        )
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (standard-normal via splitmix64)."""
    from seismic_spark.sources.pages import _inv_norm, _u01

    ids = np.arange(dim * n_planes, dtype=np.uint64)
    g = _inv_norm(_u01(ids, 6, seed)).reshape(n_planes, dim)
    return [list(map(float, row)) for row in g]


def lsh_bucket(df: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Add a sign-pattern bucket id: bit_i = [embedding · plane_i > 0]."""
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in p])
        dot = F.aggregate(
            F.zip_with(emb, arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return df.withColumn("bucket", bucket)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the query's LSH bucket,
    exact cosine re-scoring within.  Recall rises with fewer planes /
    multi-probe; this is the partition-pruned path for 10^9+ vectors
    (bucket becomes the corpus table's partition key)."""
    planes = hyperplanes(dim, n_planes, seed)
    qb = lsh_bucket(queries, planes).select(
        F.col("vec_id").alias("query_id"), "bucket"
    )
    cb = lsh_bucket(corpus, planes).select("vec_id", "bucket")
    cand = qb.join(cb, "bucket").select("query_id", "vec_id")
    qf = _flat(queries, "query_id", "q")
    cf = _flat(corpus, "vec_id", "c")
    dots = (
        cand.join(cf, "vec_id")
        .join(F.broadcast(qf), ["query_id", "pos"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("q_v") * F.col("c_v")).alias("dot"))
    )
    qn = qf.groupBy("query_id").agg(F.sqrt(F.sum(F.col("q_v") ** 2)).alias("qn"))
    cn = cf.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("c_v") ** 2)).alias("cn"))
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "vec_id")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
