"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container, so
the *decode* is a deterministic fake behind a clearly-marked seam
(:func:`fake_decode_image`) — but the Spark-side plumbing is real and tested:
binary columns flow through `mapInPandas` in Arrow batches, output schema is
typed, and the batch shape (one decode call per batch, vectorized metadata)
is what a real libjpeg/ffmpeg-backed UDF would use.

Swap `fake_decode_image` for a real decoder (PIL/torchvision) and nothing
else changes.
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


def decode_binary_column(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode a binary column to typed metadata in Arrow batches.

    The per-batch loop is over *rows of one Arrow batch* (the decode itself
    is inherently per-payload); everything around it is vectorized.
    """

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            payloads = pdf[payload_col]
            meta = [fake_decode_image(bytes(p)) for p in payloads]
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
