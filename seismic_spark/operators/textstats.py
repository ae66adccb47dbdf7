"""Text analysis operators for large-scale training-data pipelines.

All JVM-side DataFrame expressions (whole-stage codegen; no Python in the hot
path).  Every operator has an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seismic_spark.functions.hashing import MERSENNE, md5_int
from seismic_spark.textprep import tokens_col

# a tiny, fixed English stopword list (shared with the SQL oracle)
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

FP_BASE = 1000003  # fingerprint polynomial base


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars_seen) — token counting."""
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.length(F.col("text")).cast("bigint").alias("n_chars_seen"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic doc quality: length, stopword ratio, repetition.

    score = 0.4·min(1, n_tokens/100) + 0.3·min(1, 4·stop_ratio)
          + 0.3·(n_distinct/n_tokens); empty docs score 0.
    """
    toks = tokens_col(F.col("text"))
    n = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    ).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = stop_hits / n
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / 100.0)
        + F.lit(0.3) * F.least(F.lit(1.0), 4.0 * stop_ratio)
        + F.lit(0.3) * distinct_ratio
    )
    return docs.select(
        "doc_id",
        F.round(F.when(n > 0, stop_ratio).otherwise(0.0), 4).alias("stop_ratio"),
        F.round(F.when(n > 0, distinct_ratio).otherwise(0.0), 4).alias("distinct_ratio"),
        F.round(F.when(n > 0, score).otherwise(0.0), 4).alias("quality"),
    )


def langid_heuristic(docs: DataFrame) -> DataFrame:
    """Stopword-hit language ID: en if ≥8% of tokens are English stopwords,
    else unknown.  (An n-gram profile model slots in the same shape.)"""
    toks = tokens_col(F.col("text"))
    n = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    ).cast("double")
    pred = F.when((n > 0) & (stop_hits / n >= 0.08), "en").otherwise("unk")
    return docs.select("doc_id", pred.alias("lang_pred"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    md5-derived token hashes, mod a Mersenne prime (ANSI-overflow-safe)."""
    toks = tokens_col(F.col("text"))
    acc = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FP_BASE + md5_int(t) % MERSENNE) % MERSENNE,
    )
    return docs.select("doc_id", acc.alias("fingerprint"))
