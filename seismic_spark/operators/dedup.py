"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the 100 TB story):
- exact dedup: one hash-aggregate shuffle keyed on the content hash —
  group by a 128-bit digest, never by the raw text.
- MinHash LSH: shingle → n universal hashes → per-doc min (map-side
  combinable aggregate) → band keys → self-join on (band, key).  The
  band-key join is the only shuffle that can skew; keys with huge buckets
  (boilerplate) should be capped/salted at scale.
- SimHash: per-(doc, bit) weighted sign sum — explode factor = n_bits,
  bounded by choosing 16 bits.
- n-gram Jaccard: exact verification for candidate pairs; quadratic, so only
  ever run it on an LSH-bucketed or sampled subset.

All hashing is md5-derived (functions/hashing.py) so DuckDB oracles can
replicate results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seismic_spark.functions.hashing import MERSENNE, affine_hash, hash_params, md5_int
from seismic_spark.textprep import tokens_col


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (kept_doc_id, n_copies) per distinct content.

    Groups on md5(text) (one shuffle on a short key); kept = min doc_id.
    """
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("_h"))
        .groupBy("_h")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("kept_doc_id", "n_copies")
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams, space-joined."""
    toks = tokens_col(F.col("text"))
    grams = F.filter(
        F.transform(
            toks, lambda _, i: F.array_join(F.slice(toks, i + 1, n), " ")
        ),
        lambda _, i: i < F.size(toks) - (n - 1),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 16, shingle_n: int = 3, seed: int = 42
) -> DataFrame:
    """(doc_id, sig_idx, minhash) — n universal-hash minima over shingles.

    The per-hash min is a map-side-combinable aggregate: explode shingles
    once, compute all n hashes as columns, stack, groupBy(doc) min.
    """
    sh = shingles(docs, shingle_n).withColumn("_h", md5_int(F.col("shingle")))
    params = hash_params(n_hashes, seed)
    cols = [
        F.struct(F.lit(i).alias("sig_idx"), affine_hash(F.col("_h"), a, b).alias("hv"))
        for i, (a, b) in enumerate(params)
    ]
    stacked = sh.select("doc_id", F.explode(F.array(*cols)).alias("s")).select(
        "doc_id", F.col("s.sig_idx").alias("sig_idx"), F.col("s.hv").alias("hv")
    )
    return stacked.groupBy("doc_id", "sig_idx").agg(F.min("hv").alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    bucket_cap: int = 10_000,
    n_salts: int = 16,
) -> DataFrame:
    """Banding: docs sharing any (band, band_key) become candidate pairs.

    band_key concatenates the band's minhashes; the self-join shuffles on
    (band, key).  Returns (doc_a, doc_b) with doc_a < doc_b, distinct.

    Mega-bucket salting: boilerplate content (empty pages, error templates)
    can put millions of docs in ONE band bucket, making a single join task
    quadratic.  Buckets larger than ``bucket_cap`` are salted: the left side
    is split into ``n_salts`` groups by hash(doc_a) and the right side is
    replicated to every salt, so each unordered pair still joins EXACTLY
    once (at doc_a's salt) — output identical to the unsalted join — while
    the biggest single join cell shrinks by n_salts×.
    """
    banded = (
        signatures.withColumn("band", (F.col("sig_idx") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sig_idx", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                "_",
            ).alias("band_key")
        )
    )
    w = Window.partitionBy("band", "band_key")
    banded = banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
    big = F.col("_bsz") > bucket_cap
    left = banded.select(
        F.col("doc_id").alias("doc_a"),
        "band",
        "band_key",
        F.when(big, F.pmod(F.hash("doc_id"), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .alias("salt"),
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"),
        "band",
        "band_key",
        F.explode(
            F.when(big, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.array(F.lit(0))
            )
        ).alias("salt"),
    )
    return (
        left.join(right, ["band", "band_key", "salt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, shingle_n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over word shingles for all pairs within ``docs``.

    (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥ threshold.
    Intersections via a shingle self-join; unions from per-doc counts.
    Quadratic — apply to LSH buckets or bounded subsets only.
    """
    sh = shingles(docs, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_int").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_int")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return j


def simhash(docs: DataFrame, n_bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — weighted-majority bit signature over tokens.

    bit_j(doc) = 1 iff Σ_t tf(t) · (±1 by bit j of md5(t)) > 0.
    Explode factor = n_bits; per-(doc,bit) sum is map-side combinable.
    """
    toks = tokens_col(F.col("text"))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("_h", md5_int(F.col("term")))
    )
    bits = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit"),
        F.col("tf"),
        F.col("_h"),
    ).withColumn(
        "contrib",
        F.when(F.expr("shiftright(_h, bit) % 2") == 1, F.col("tf"))
        .otherwise(-F.col("tf"))
        .cast("bigint"),
    )
    sums = bits.groupBy("doc_id", "bit").agg(F.sum("contrib").alias("s"))
    return (
        sums.withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.3,
    n_planes: int = 4,
    matmul: bool = False,
    bucket_cap: int = 100_000,
    n_salts: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket blocked.

    (a, b, cosine) with a < b and 4dp-rounded cosine ≥ ``threshold``;
    candidates come only from pairs sharing the sign-pattern bucket of
    ``n_planes`` md5-derived hyperplanes (ann.lsh_buckets — one bucket per
    vector, so no cross-bucket duplicates).  Fewer planes ⇒ higher recall: a
    qualifying pair is missed only when a plane separates the two vectors
    (probability ≈ n_planes · angle / π); recall is measured against the
    exact all-pairs oracle in tests.

    Scale: the only data shuffle joins on the bucket key.  Mega-buckets
    (near-zero or boilerplate embeddings collapse into one sign pattern) are
    salted exactly like :func:`lsh_candidate_pairs` — left side split into
    ``n_salts`` groups by hash(a), right side replicated — so each unordered
    pair joins exactly once and the output is identical to the unsalted
    join.  ``matmul=True`` buckets via one Arrow matmul per batch (the
    10^9-vector path); the default JVM join path has a DuckDB SQL oracle.
    """
    from seismic_spark.operators.ann import (
        _fold_dot,
        _fold_norm,
        lsh_buckets,
        lsh_buckets_matmul,
    )

    bucketer = lsh_buckets_matmul if matmul else lsh_buckets
    b = bucketer(embeddings, dim, n_planes).join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )
    w = Window.partitionBy("bucket")
    b = b.withColumn("_bsz", F.count(F.lit(1)).over(w))
    big = F.col("_bsz") > bucket_cap
    left = b.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("a_emb"),
        "bucket",
        F.when(big, F.pmod(F.hash("vec_id"), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .alias("salt"),
    )
    right = b.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("b_emb"),
        "bucket",
        F.explode(
            F.when(big, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.array(F.lit(0))
            )
        ).alias("salt"),
    )
    return (
        left.join(right, ["bucket", "salt"])
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            F.round(
                _fold_dot(F.col("a_emb"), F.col("b_emb"))
                / (_fold_norm(F.col("a_emb")) * _fold_norm(F.col("b_emb"))),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
