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
    """(doc_id, shingle) — distinct word n-grams, space-joined.

    The n-gram build + per-shingle hashing downstream is the expensive map
    work of every shingle consumer, and its parallelism is whatever the
    input scan gives — a corpus that arrives as one file runs it on ONE
    core (event-log measured: the whole minhash pipeline in a single 5.8 s
    task at bench scale).  Under-split inputs are redistributed first
    (session.ensure_min_parallelism); the per-doc output row set is
    partitioning-independent, so results are unchanged.
    """
    from seismic_spark.session import ensure_min_parallelism

    docs = ensure_min_parallelism(docs, "doc_id")
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
    # r6: all n mins in ONE hash-aggregate keyed on doc_id alone, then a
    # post-agg unpivot — value-identical to the old explode(n)->groupBy
    # (doc_id, sig_idx) min, but the n× row materialization before the
    # exchange is gone (guide §2.3 aggregate-before-shuffle) and downstream
    # per-doc consumers (LSH banding) reuse the hash(doc_id) partitioning
    # with no further exchange (guide §2.4).
    per_doc = sh.groupBy("doc_id").agg(
        *[
            F.min(affine_hash(F.col("_h"), a, b)).alias(f"_m{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    return per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("sig_idx"),
                        F.col(f"_m{i}").alias("minhash"),
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.sig_idx").alias("sig_idx"), F.col("s.minhash").alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    bucket_cap: int = 10_000,
    n_salts: int = 16,
) -> DataFrame:
    """Banding: docs sharing any (band, band_key) become candidate pairs.

    band_key concatenates the band's minhashes; the self-join shuffles on
    (band, key).  Returns (doc_a, doc_b) with doc_a < doc_b, distinct
    (the same pair can collide in several bands).
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
    return (
        _salted_group_pairs(
            banded, ["band", "band_key"], "doc_id", bucket_cap, n_salts
        )
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .distinct()
    )


def _salted_group_pairs(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    bucket_cap: int,
    n_salts: int,
) -> DataFrame:
    """All unordered id pairs (a, b), a < b, within each group of ``keys``.

    Mega-group salting: boilerplate content (empty pages, error templates,
    near-zero embeddings) can put millions of ids in ONE group, making a
    single join task quadratic.  Groups larger than ``bucket_cap`` are
    salted: the left side is split into ``n_salts`` subgroups by hash(a) and
    the right side is replicated to every salt, so each unordered pair still
    joins EXACTLY once (at a's salt) — output identical to the unsalted
    join — while the biggest single join cell shrinks by n_salts×.

    ``df`` should carry ONLY (id_col, *keys): wide payloads (embeddings)
    belong in a post-pairing join, not replicated n_salts× through this one.
    """
    w = Window.partitionBy(*keys)
    sized = df.withColumn("_bsz", F.count(F.lit(1)).over(w))
    big = F.col("_bsz") > bucket_cap
    left = sized.select(
        F.col(id_col).alias("a"),
        *keys,
        F.when(big, F.pmod(F.hash(id_col), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .alias("salt"),
    )
    right = sized.select(
        F.col(id_col).alias("b"),
        *keys,
        F.explode(
            F.when(big, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.array(F.lit(0))
            )
        ).alias("salt"),
    )
    return (
        left.join(right, [*keys, "salt"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
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

    Scale: pairing runs on (vec_id, bucket) rows ONLY — the bucket self-join
    never shuffles or replicates the wide embedding arrays; they join onto
    the surviving candidate pairs afterwards.  Mega-buckets (near-zero or
    boilerplate embeddings collapse into one sign pattern) are salted via
    the shared :func:`_salted_group_pairs` — each unordered pair joins
    exactly once, output identical to the unsalted join.  ``matmul=True``
    buckets via one Arrow matmul per batch (the 10^9-vector path); the
    default JVM join path has a DuckDB SQL oracle.
    """
    from seismic_spark.operators.ann import (
        _fold_dot,
        _fold_norm,
        lsh_buckets,
        lsh_buckets_matmul,
    )

    bucketer = lsh_buckets_matmul if matmul else lsh_buckets
    buckets = bucketer(embeddings, dim, n_planes).select("vec_id", "bucket")
    # one bucket per vector ⇒ pairs are already unique, no distinct needed
    pairs = _salted_group_pairs(
        buckets, ["bucket"], "vec_id", bucket_cap, n_salts
    )
    ea = embeddings.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("a_emb")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("b_emb")
    )
    return (
        pairs.join(ea, "a")
        .join(eb, "b")
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
