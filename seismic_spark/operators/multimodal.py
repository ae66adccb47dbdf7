"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container, so
the *decode* is a deterministic fake behind a clearly-marked seam
(:func:`fake_decode_image`) — but the Spark-side plumbing is real and tested:
binary columns flow through `mapInPandas` in Arrow batches, output schema is
typed, and the batch shape (one decode call per batch, vectorized metadata)
is what a real libjpeg/ffmpeg-backed UDF would use.

The swap point is real, not asserted: `decode_binary_column(decoder=...)`
takes any `bytes -> (w, h, mean)` callable, and an import-guarded Pillow
decoder (`pil_decode_image`) is available for explicit opt-in where PIL is
installed (tests exercise both the injected-decoder seam and, where PIL
exists, the real path).  The DEFAULT is always the deterministic fake: the
DuckDB oracle contract pins the fake's arithmetic, and auto-selecting by
driver-side importability would silently change results per-environment
(and crash on non-image payloads / driver-has-PIL-executors-don't skew).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, width INT, height INT, mean_byte DOUBLE"
)


def fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder.

    Real implementation would be:
        raise NotImplementedError("install pillow; decode payload here")
    The fake derives (width, height, mean_byte) purely from the bytes so
    tests and oracles are stable.
    """
    n = len(payload)
    width = 16 + (n % 624)
    height = 16 + ((n * 7919) % 464)
    mean = float(np.frombuffer(payload, dtype=np.uint8).mean()) if n else 0.0
    return width, height, mean


def pil_decode_image(payload: bytes) -> tuple[int, int, float]:
    """Real decoder for the same seam, import-guarded: (width, height,
    mean grayscale byte) via Pillow.  Raises ImportError where PIL is not
    installed (this container) — callers pick it up via
    :func:`real_decoder_available` and fall back to the fake."""
    import io

    from PIL import Image  # noqa: import-guarded seam

    with Image.open(io.BytesIO(payload)) as im:
        gray = np.asarray(im.convert("L"), dtype=np.float64)
        return int(im.width), int(im.height), float(gray.mean())


def real_decoder_available() -> bool:
    """True when the import-guarded PIL decode path can run here."""
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def decode_binary_column(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
) -> DataFrame:
    """Decode a binary column to typed metadata in Arrow batches.

    The per-batch loop is over *rows of one Arrow batch* (the decode itself
    is inherently per-payload); everything around it is vectorized.

    ``decoder``: any ``bytes -> (width, height, mean_byte)`` callable —
    this IS the swap point.  Default: the deterministic
    :func:`fake_decode_image`, ALWAYS — pass ``decoder=pil_decode_image``
    explicitly to opt into the real path.  (Auto-selecting by driver-side
    PIL importability would make the pinned oracle contract
    environment-dependent, crash on non-image payloads, and probe the
    driver for a capability the executors must have.)  The callable is
    serialized into the UDF closure, so it must be importable/picklable on
    executors.
    """
    if decoder is None:
        decoder = fake_decode_image

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            payloads = pdf[payload_col]
            meta = [decoder(bytes(p)) for p in payloads]
            w, h, m = zip(*meta) if meta else ((), (), ())
            # half-away-from-zero rounding (np.round is banker's; SQL isn't)
            mean4 = np.floor(np.asarray(m, dtype=np.float64) * 1e4 + 0.5) / 1e4
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": payloads.map(len).to_numpy(dtype=np.int64),
                    "width": np.asarray(w, dtype=np.int32),
                    "height": np.asarray(h, dtype=np.int32),
                    "mean_byte": mean4,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_SCHEMA)


FEATURES_SCHEMA = "doc_id BIGINT, bin INT, frac DOUBLE"


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bins: int = 16,
) -> DataFrame:
    """Byte-histogram feature extraction: (doc_id, bin, frac) rows.

    The stand-in for a real feature extractor (CLIP/ResNet embedding): a
    ``n_bins``-bucket histogram of the payload bytes, normalized to
    fractions (4dp, half-away-from-zero like the SQL oracle).  The batch is
    processed with ONE bincount over the concatenated buffer — no per-byte
    Python — which is exactly the shape a real Arrow-batched extractor has
    (stack payloads, one vectorized model call per batch).

    Rows (not an array column) so the DuckDB oracle compares scalars.
    Swap the histogram for a model forward pass and only the body changes.
    """
    if n_bins & (n_bins - 1) or not 0 < n_bins <= 256:
        raise ValueError(f"n_bins must be a power of two in (0, 256], got {n_bins}")
    shift = 8 - int(np.log2(n_bins))  # byte >> shift ∈ [0, n_bins)

    def feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            bufs = [np.frombuffer(bytes(p), dtype=np.uint8) for p in pdf[payload_col]]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            row = np.repeat(np.arange(len(bufs), dtype=np.int64), lens)
            allb = (
                np.concatenate(bufs) if lens.sum() else np.empty(0, np.uint8)
            )
            hist = np.bincount(
                row * n_bins + (allb >> shift), minlength=len(bufs) * n_bins
            ).reshape(len(bufs), n_bins)
            denom = np.maximum(lens, 1).astype(np.float64)[:, None]
            frac = np.floor(hist / denom * 1e4 + 0.5) / 1e4
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf[id_col].to_numpy(), n_bins),
                    "bin": np.tile(np.arange(n_bins, dtype=np.int32), len(bufs)),
                    "frac": frac.ravel(),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(feats, FEATURES_SCHEMA)


def resize_plan(
    df: DataFrame, max_w: int = 224, max_h: int = 224, id_col: str = "doc_id"
) -> DataFrame:
    """Aspect-preserving resize targets from decoded dimensions — pure JVM.

    Takes the output of :func:`decode_binary_column` and computes
    (out_w, out_h, scale): scale = min(1, max_w/width, max_h/height), output
    dims floored, never upscaled.  Deliberately NOT a UDF: the arithmetic is
    whole-stage-codegen expressions; only the pixel resample itself (which
    needs the decoded image, stubbed in this container) would live in the
    Arrow batch next to :func:`fake_decode_image`.
    """
    from pyspark.sql import functions as F

    scale = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(max_w)) / F.col("width"),
            F.lit(float(max_h)) / F.col("height"),
        ),
        6,
    )
    return df.select(
        id_col,
        "width",
        "height",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("out_w"),
        F.floor(F.col("height") * scale).cast("int").alias("out_h"),
    )


FRAMES_SCHEMA = (
    "doc_id BIGINT, frame_idx INT, n_frames INT, frame_bytes BIGINT, "
    "frame_md5 STRING"
)


def sample_frames(
    df: DataFrame,
    stride: int = 7,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling: every ``stride``-th frame of each payload.

    Deterministic fake in place of an ffmpeg demuxer: the payload "contains"
    ``1 + n_bytes % 120`` frames of ``max(1, n_bytes // n_frames)`` bytes
    each; sampled frames are idx 0, stride, 2·stride, …  Each output row
    carries the frame's byte length and md5 — the real plumbing (explode
    factor rows out of Arrow batches, binary slicing per frame) is what an
    actual frame sampler needs; only the slice→decode step is fake.

    Frame counts, indices, offsets, and lengths are computed array-wise for
    the whole Arrow batch; the only per-frame Python is the md5 of each
    slice, which is inherently per-item (a real decoder call sits there).
    """
    import hashlib

    def frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            bufs = [bytes(p) for p in pdf[payload_col]]
            nb = np.fromiter((len(b) for b in bufs), np.int64, count=len(bufs))
            n_frames = 1 + nb % 120
            fsize = np.maximum(1, nb // n_frames)
            n_samp = (n_frames + stride - 1) // stride
            total = int(n_samp.sum())
            row = np.repeat(np.arange(len(bufs), dtype=np.int64), n_samp)
            grp_starts = np.cumsum(n_samp) - n_samp
            pos = np.arange(total, dtype=np.int64) - np.repeat(grp_starts, n_samp)
            frame_idx = pos * stride
            off = frame_idx * fsize[row]
            ln = np.clip(nb[row] - off, 0, fsize[row])
            digests = [
                hashlib.md5(bufs[r][o : o + l]).hexdigest()
                for r, o, l in zip(row.tolist(), off.tolist(), ln.tolist())
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy()[row],
                    "frame_idx": frame_idx.astype(np.int32),
                    "n_frames": n_frames[row].astype(np.int32),
                    "frame_bytes": ln,
                    "frame_md5": digests,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(frames, FRAMES_SCHEMA)
