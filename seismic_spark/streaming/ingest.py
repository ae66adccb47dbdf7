"""Incremental index ingest via Structured Streaming (S4 analogue).

The reference ingests incrementally with ``add_document`` (growable dataset,
inverted_index_wrapper.rs:680-719).  The Spark-native analogue: new pages
arrive as files in a directory; ``foreachBatch`` tokenizes/weights them and
appends **delta posting rows** to the index table.  Posting rows are additive
by construction — search already merges multiple (term_id, salt) rows per
term — so a delta batch is just new rows with a batch-unique salt offset.
Restart-safety comes from the streaming checkpoint (exactly-once foreachBatch
per epoch).

Documented approximation (vs a full rebuild): delta docs are BM25-weighted
with the stats (df/avgdl/N) of the base corpus snapshot — identical to the
reference's behavior of resolving against the existing token map; a periodic
compaction rebuild (CheckpointedBuild) re-trues the weights.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seismic_spark import forward as fwd
from seismic_spark import postings as pst
from seismic_spark import textprep
from seismic_spark.postings import IndexConfig

DELTA_SALT_STRIDE = 1 << 16


def build_delta_postings(
    spark: SparkSession,
    new_docs: DataFrame,
    vocab: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: IndexConfig,
    batch_id: int,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(delta_forward, delta_postings) for a batch of new docs.

    Unknown terms are dropped (vocab is the base snapshot's; the reference
    drops unmapped tokens the same way for queries and grows the map for
    docs — growth happens at compaction here).
    """
    toks = textprep.tokenize(new_docs.select(id_col, "text"))
    tf_df = textprep.term_frequencies(toks, id_col)
    dtw = textprep.bm25_weights(tf_df, vocab, n_docs, avgdl, id_col).persist()
    delta_forward = fwd.build_forward(dtw, id_col)
    n_terms = vocab.count()
    delta_postings = pst.build_postings(dtw, delta_forward, cfg, n_terms, id_col)
    # batch-unique salt so delta rows can't collide with base or other deltas
    delta_postings = delta_postings.withColumn(
        "salt", (F.col("salt") + (batch_id + 1) * DELTA_SALT_STRIDE).cast("int")
    )
    return delta_forward, delta_postings


def start_ingest(
    spark: SparkSession,
    pages_dir: str,
    index_path: str,
    cfg: IndexConfig | None = None,
    available_now: bool = True,
):
    """Stream pages parquet files from ``pages_dir`` into index deltas.

    ``available_now=True`` drains what's there and stops (testable,
    batch-incremental); ``False`` keeps a long-running micro-batch stream.
    """
    import json

    cfg = cfg or IndexConfig()
    with open(os.path.join(index_path, "meta.json")) as f:
        meta = json.load(f)
    vocab = spark.read.parquet(os.path.join(index_path, "vocab")).persist()

    pages_schema = (
        "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"
    )
    stream = spark.readStream.schema(pages_schema).parquet(pages_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select("url", "text").withColumn(
            "doc_id", F.abs(F.xxhash64("url"))
        )
        # drop already-indexed doc ids: re-ingesting an existing URL must not
        # create duplicate forward rows (they would double-count in scoring)
        # or duplicate docs across a term's blocks (θ assumes distinct docs).
        existing = spark.read.parquet(os.path.join(index_path, "forward")).select(
            "doc_id"
        )
        # localCheckpoint truncates the lineage: the anti-join must be
        # evaluated against the PRE-append forward snapshot, not re-executed
        # lazily after the forward append below (which would see the new
        # docs and drop them from the postings delta).
        docs = docs.join(existing, "doc_id", "left_anti").localCheckpoint(eager=True)
        d_fwd, d_post = build_delta_postings(
            spark, docs, vocab, meta["n_docs"], meta["avgdl"], cfg, batch_id
        )
        d_fwd.write.mode("append").parquet(os.path.join(index_path, "forward"))
        d_post.write.mode("append").parquet(os.path.join(index_path, "postings"))

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(index_path, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
