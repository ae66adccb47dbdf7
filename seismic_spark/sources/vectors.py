"""Readers for the reference engine's own input formats (SURVEY.md §2.1).

S1 — JSONL sparse vectors (inverted_index_wrapper.rs:554-571, json_utils.rs:
10-61): one JSON object per line, ``{"id": <str|int>, "vector": {token:
f32, ...}, "content": <str, optional>}``.  Parsed JVM-side with
``from_json`` (no Python in the parse path); the untagged str|int id union
is handled by a string-schema parse with an integer-schema fallback,
mirroring json_utils.rs:10-15's serde(untagged).

S2 — tar.gz JSONL (inverted_index_wrapper.rs:573-596): a gzipped tar whose
FIRST member is the JSONL file (the reference reads only
``archive.entries().next()``).  The gunzip+untar step is a per-file Arrow
batch transform (tarfile has no JVM codec); the extracted lines then share
S1's JVM ``from_json`` path.

S3 — binary "inner format" (scripts/convert_json_to_inner_format.py:10-27,
read via build_inverted_index.rs:187): ``u32le n_vectors``, then per vector
``u32le len, len×u32le component ids, len×f32le values``.  Encode and
decode are numpy-vectorized (one fancy-index gather/scatter per file; the
only per-record Python is the O(n) offset walk forced by the
variable-length layout).  A writer is provided for interop — build on
Spark, export shards the reference binary can consume.

Output schemas:
    S1/S2 -> (doc_id STRING, terms ARRAY<STRING>, weights ARRAY<FLOAT>,
              content STRING)   — terms sorted by token (deterministic;
              numeric component-id sort happens at resolution, P3/P4)
    S3   -> (doc_id BIGINT, terms ARRAY<INT>, weights ARRAY<FLOAT>)
             — doc ids are the reference's sequential file order: files
             sorted by path, ids offset by cumulative per-file counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VJSON_SCHEMA = (
    "doc_id STRING, terms ARRAY<STRING>, weights ARRAY<FLOAT>, content STRING"
)
BIN_SCHEMA = "doc_id BIGINT, terms ARRAY<INT>, weights ARRAY<FLOAT>"


# ----------------------------------------------------------- S1: JSONL -----


def _parse_vector_lines(lines: DataFrame) -> DataFrame:
    """value STRING -> VJSON_SCHEMA, entirely JVM-side.

    Two ``from_json`` passes implement the untagged str|int id
    (json_utils.rs:10-15): Spark's JSON parser nulls a numeric id under a
    STRING schema, so the integer-schema parse backfills via coalesce.
    """
    s_str = "id STRING, vector MAP<STRING, FLOAT>, content STRING"
    s_int = "id BIGINT, vector MAP<STRING, FLOAT>, content STRING"
    j = lines.select(
        F.from_json("value", s_str).alias("a"),
        F.from_json("value", s_int).alias("b"),
    ).select(
        F.coalesce(
            F.col("a.id"), F.col("b.id").cast("string")
        ).alias("doc_id"),
        F.coalesce(F.col("a.vector"), F.col("b.vector")).alias("vector"),
        F.coalesce(F.col("a.content"), F.col("b.content")).alias("content"),
    )
    # map -> parallel arrays sorted by token string (deterministic order)
    ent = F.array_sort(F.map_entries("vector"))
    return j.filter(F.col("doc_id").isNotNull()).select(
        "doc_id",
        F.transform(ent, lambda e: e["key"]).alias("terms"),
        F.transform(ent, lambda e: e["value"]).alias("weights"),
        "content",
    )


def read_jsonl_vectors(spark: SparkSession, path: str) -> DataFrame:
    """S1: JSONL sparse-vector scan (plain or .gz — Spark's native codecs)."""
    return _parse_vector_lines(spark.read.text(path))


# ---------------------------------------------------------- S2: tar.gz -----


def read_tar_jsonl(
    spark: SparkSession, path: str, first_member_only: bool = True
) -> DataFrame:
    """S2: gunzip+untar, then the S1 parse path.

    ``first_member_only=True`` matches the reference exactly (it reads only
    ``entries().next()``, inverted_index_wrapper.rs:585); False concatenates
    every regular member (a superset users ask for).  One tar = one Arrow
    row; parallelism comes from many archives, as with the reference's
    one-archive-per-shard layout.
    """

    def untar(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip
        import io
        import tarfile

        for pdf in it:
            for blob in pdf["content"]:
                lines: list[str] = []
                with tarfile.open(
                    fileobj=io.BytesIO(gzip.decompress(bytes(blob))), mode="r"
                ) as tar:
                    for member in tar:
                        if not member.isreg():
                            continue
                        f = tar.extractfile(member)
                        if f is None:
                            continue
                        lines.extend(
                            ln
                            for ln in f.read().decode("utf-8").splitlines()
                            if ln.strip()
                        )
                        if first_member_only:
                            break
                yield pd.DataFrame({"value": lines})

    blobs = spark.read.format("binaryFile").load(path).select("content")
    return _parse_vector_lines(blobs.mapInPandas(untar, "value STRING"))


# ----------------------------------------------------- S3: inner format ----


def _flat_ranges(lens: np.ndarray) -> np.ndarray:
    """[0..l0-1, 0..l1-1, ...] without a Python loop."""
    total = int(lens.sum())
    starts = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def encode_seismic_bin(
    terms_list: list[np.ndarray], weights_list: list[np.ndarray]
) -> bytes:
    """Vectorized encoder for one shard of the inner format."""
    n = len(terms_list)
    lens = np.fromiter((len(t) for t in terms_list), dtype=np.int64, count=n)
    out = np.zeros(1 + int((1 + 2 * lens).sum()), dtype="<u4")
    out[0] = n
    if n:
        rec_starts = 1 + np.cumsum(1 + 2 * lens) - (1 + 2 * lens)
        out[rec_starts] = lens
        ids_all = (
            np.concatenate([np.asarray(t, dtype=np.int64) for t in terms_list])
            if lens.sum()
            else np.empty(0, np.int64)
        )
        dst = np.repeat(rec_starts + 1, lens) + _flat_ranges(lens)
        out[dst] = ids_all.astype("<u4")
        vals_all = (
            np.concatenate([np.asarray(w, dtype=np.float32) for w in weights_list])
            if lens.sum()
            else np.empty(0, np.float32)
        )
        out.view("<f4")[dst + np.repeat(lens, lens)] = vals_all
    return out.tobytes()


def decode_seismic_bin(buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lens, ids_flat, vals_flat) from one shard.  The offset walk is the
    only sequential step (record i+1's position depends on len_i); gathers
    are single fancy-index ops."""
    u = np.frombuffer(buf, dtype="<u4")
    n = int(u[0]) if u.size else 0
    lens = np.empty(n, dtype=np.int64)
    offs = np.empty(n, dtype=np.int64)
    off = 1
    for i in range(n):
        offs[i] = off
        lens[i] = int(u[off])
        off += 1 + 2 * int(u[off])
    src = np.repeat(offs + 1, lens) + _flat_ranges(lens)
    ids = u[src].astype(np.int64)
    vals = u.view("<f4")[src + np.repeat(lens, lens)].astype(np.float32)
    return lens, ids, vals


def read_seismic_bin(
    spark: SparkSession, path: str, high_ids: str = "error"
) -> DataFrame:
    """S3 scan -> BIN_SCHEMA with the reference's sequential doc ids.

    ONE decode pass (persisted), then per-file counts (a tiny agg) become
    broadcast offsets: files ordered by path, doc_id = file_base + local
    index — identical ids to the reference reading the same shards
    concatenated in path order.

    ``high_ids`` — the LV (u32 component-id) story (pylib/mod.rs:1159-1166,
    index_traits.rs:14): the on-disk format allows full u32 component ids
    but this engine stores term ids as int32 throughout.

    - "error" (default): refuse files with ids >= 2^31 rather than wrap
      negative silently;
    - "bigint": emit ``terms ARRAY<BIGINT>`` carrying the raw u32 ids —
      pipe through :func:`compact_term_ids` to remap into the int32 space
      (weights preserved, array order preserved) before index build.
    """
    if high_ids not in ("error", "bigint"):
        raise ValueError(f"unknown high_ids {high_ids!r}")
    terms_t = "ARRAY<BIGINT>" if high_ids == "bigint" else "ARRAY<INT>"
    raw_schema = (
        f"path STRING, local_i BIGINT, terms {terms_t}, weights ARRAY<FLOAT>"
    )
    id_dtype = np.int64 if high_ids == "bigint" else np.int32

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for p, blob in zip(pdf["path"], pdf["content"]):
                lens, ids, vals = decode_seismic_bin(bytes(blob))
                if (
                    high_ids == "error"
                    and ids.size
                    and int(ids.max()) >= 2**31
                ):
                    raise ValueError(
                        f"{p}: component id {int(ids.max())} >= 2^31 — the "
                        "inner format allows full u32 ids but this engine "
                        "stores term ids as int32; read with "
                        "high_ids='bigint' and remap via compact_term_ids, "
                        "or remap the component space below 2^31 upstream"
                    )
                ends = np.cumsum(lens)
                starts = ends - lens
                yield pd.DataFrame(
                    {
                        "path": p,
                        "local_i": np.arange(len(lens), dtype=np.int64),
                        "terms": [
                            ids[s:e].astype(id_dtype) for s, e in zip(starts, ends)
                        ],
                        "weights": [vals[s:e] for s, e in zip(starts, ends)],
                    }
                )

    rows = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, raw_schema)
        .persist()
    )
    counts = rows.groupBy("path").agg(F.count("*").alias("n")).collect()
    base, offsets = 0, {}
    for r in sorted(counts, key=lambda r: r["path"]):
        offsets[r["path"]] = base
        base += r["n"]
    off_df = spark.createDataFrame(
        [(p, b) for p, b in offsets.items()], "path STRING, base BIGINT"
    )
    out = (
        rows.join(F.broadcast(off_df), "path")
        .select(
            (F.col("base") + F.col("local_i")).alias("doc_id"),
            "terms",
            "weights",
        )
    )
    return out


def compact_term_ids(vectors: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Remap a high (u32 / BIGINT) component-id space into dense int32 ids.

    The LV-variant bridge (pylib/mod.rs:1159-1166): a corpus exported from
    the reference's u32 build can carry component ids >= 2^31, which this
    engine's int32 term ids can't store.  The remap assigns dense ids
    0..n_distinct-1 in ascending old-id order (vocab.assign_ordered_ids), so
    the map is MONOTONE — per-vector component sort order is preserved and
    relative weight/component pairing is untouched.

    ``vectors``: (doc_id, terms ARRAY<BIGINT or INT>, weights ARRAY<FLOAT>
    [, content]).  Returns ``(remapped_vectors, id_map)`` where
    ``remapped_vectors`` has ``terms ARRAY<INT>`` (other columns unchanged)
    and ``id_map`` is (old_id BIGINT, term_id INT) — persist it to remap
    query component ids the same way.

    Distributed: explode → join on old id (shuffle; the map can be
    vocabulary-sized, never broadcast-assumed) → re-assemble sorted arrays.
    Only (doc_id, old_id, weight) rows travel through the explode/agg
    shuffles — wide ride-along columns (content blobs) would otherwise be
    duplicated once PER TERM by the explode, so they are joined back on
    doc_id after re-assembly instead.
    """
    from seismic_spark import vocab as _voc

    distinct_ids = (
        vectors.select(F.explode("terms").alias("old_id"))
        .select(F.col("old_id").cast("bigint").alias("old_id"))
        .distinct()
    )
    id_map = _voc.assign_ordered_ids(
        distinct_ids, "old_id", id_col="term_id", id_type="int"
    ).persist()
    extra = [c for c in vectors.columns if c not in ("doc_id", "terms", "weights")]
    exploded = vectors.select(
        "doc_id",
        F.explode(F.arrays_zip("terms", "weights")).alias("z"),
    ).select(
        "doc_id",
        F.col("z.terms").cast("bigint").alias("old_id"),
        F.col("z.weights").alias("weight"),
    )
    assembled = (
        exploded.join(id_map, "old_id")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("term_id", "weight"))
            ).alias("_z")
        )
        .select(
            "doc_id",
            F.col("_z.term_id").alias("terms"),
            F.col("_z.weight").cast("array<float>").alias("weights"),
        )
    )
    # left join from the full doc set: a doc with an EMPTY vector survives
    # compaction with empty arrays instead of silently disappearing
    remapped = (
        vectors.select("doc_id", *extra)
        .join(assembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "terms", F.expr("CAST(array() AS ARRAY<INT>)")
            ).alias("terms"),
            F.coalesce(
                "weights", F.expr("CAST(array() AS ARRAY<FLOAT>)")
            ).alias("weights"),
            *extra,
        )
    )
    return remapped, id_map


def write_seismic_bin(forward: DataFrame, path: str, shards: int = 1) -> None:
    """Interop export: forward-style (doc_id, terms, weights) -> inner-format
    shard files under ``path`` (part-00000.bin, ...).  Shards are doc_id
    range partitions, so path-ordered concatenation preserves doc order and
    the reference's reader sees ids 0..n-1 in our doc_id order.

    Driver writes only file HANDLES; bytes are encoded executor-side per
    shard and streamed back via toLocalIterator on a one-row-per-shard frame
    — bounded by the largest shard, not the dataset (raise ``shards``).
    """
    import os

    os.makedirs(path, exist_ok=True)

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("doc_id")
            blob = encode_seismic_bin(
                [np.asarray(t) for t in pdf["terms"]],
                [np.asarray(w) for w in pdf["weights"]],
            )
            yield pd.DataFrame(
                {"shard_min": [int(pdf["doc_id"].iloc[0])], "blob": [blob]}
            )

    packed = (
        forward.select("doc_id", "terms", "weights")
        .repartitionByRange(shards, "doc_id")
        .sortWithinPartitions("doc_id")
        .mapInPandas(pack, "shard_min BIGINT, blob BINARY")
    )
    rows = sorted(packed.toLocalIterator(), key=lambda r: r["shard_min"])
    for i, r in enumerate(rows):
        with open(os.path.join(path, f"part-{i:05d}.bin"), "wb") as f:
            f.write(bytes(r["blob"]))
