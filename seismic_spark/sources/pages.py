"""Deterministic synthetic Common-Crawl-style `pages` table (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Generation is **distributed and batch-boundary independent**: every row is a
pure function of (seed, row id) via splitmix64 mixing — the same row id
yields identical bytes regardless of partitioning, executor count, or
retries.  `spark.range(n)` → `mapInPandas`, so an arbitrarily large synthetic
corpus generates in parallel without driver materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Uniform(0,1) per id for a named stream; pure function of inputs."""
    h = _splitmix64(
        np.asarray(ids, dtype=np.uint64)
        ^ _splitmix64(np.full(len(ids), (seed << 8) | stream, dtype=np.uint64))
    )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _zipf_cdf(vocab_size: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def _inv_norm(u: np.ndarray) -> np.ndarray:
    """Acklam's rational approximation of the standard normal quantile
    (scipy-free, deterministic)."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    u = np.clip(u, 1e-12, 1 - 1e-12)
    out = np.empty_like(u)
    lo, hi = 0.02425, 1 - 0.02425
    m = u < lo
    q = np.sqrt(-2 * np.log(u[m]))
    out[m] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    m2 = u > hi
    q = np.sqrt(-2 * np.log(1 - u[m2]))
    out[m2] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    mid = ~(m | m2)
    q = u[mid] - 0.5
    r = q * q
    out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
    return out


def synth_pages(
    spark: SparkSession,
    n: int,
    vocab_size: int = 5000,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic pages table with Zipfian bag-of-words text."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, parts)
    cdf = _zipf_cdf(vocab_size)
    vocab = np.array([f"term_{j}" for j in range(vocab_size)])

    def gen_rows(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            if ids.size == 0:
                continue
            lens = np.clip(
                np.exp(4.5 + 0.6 * _inv_norm(_u01(ids, 1, seed))).astype(np.int64),
                5,
                2000,
            )
            pos = np.concatenate([np.arange(l, dtype=np.uint64) for l in lens])
            doc_rep = np.repeat(ids.astype(np.uint64), lens)
            u_tok = (
                _splitmix64(
                    doc_rep * np.uint64(1_000_003)
                    + pos
                    + np.uint64(seed) * np.uint64(0x9E37)
                )
                >> np.uint64(11)
            ).astype(np.float64) / float(1 << 53)
            tok_ids = np.searchsorted(cdf, u_tok, side="left")
            words = vocab[tok_ids]
            ends = np.cumsum(lens)
            starts = ends - lens
            texts = [" ".join(words[s:e]) for s, e in zip(starts, ends)]
            u_lang = _u01(ids, 2, seed)
            langs = np.where(u_lang < 0.95, "en", np.where(u_lang < 0.975, "de", "fr"))
            urls = [f"https://example{int(i) % 97}.test/p/{int(i)}" for i in ids]
            ts = pd.to_datetime((ids * 137).astype("int64"), unit="s", origin="2024-01-01")
            html = [f"<html><body>{t}</body></html>".encode() for t in texts]
            yield pd.DataFrame(
                {"url": urls, "warc_ts": ts, "html": html, "text": texts, "lang": langs}
            )

    return base.mapInPandas(gen_rows, PAGES_SCHEMA)


def synth_queries(
    vocab_size: int = 5000, n_queries: int = 100, seed: int = 42
) -> list[tuple[str, list[str], list[float]]]:
    """Deterministic query set shaped like the reference's queries.jsonl
    (FIXTURES.md §3): Zipfian term draws, 3-12 terms, plus edge cases."""
    cdf = _zipf_cdf(vocab_size)
    out: list[tuple[str, list[str], list[float]]] = []
    for q in range(n_queries):
        qid = np.uint64(q)
        n_terms = 3 + int(_u01(np.array([qid]), 3, seed)[0] * 10)
        draws = _u01(np.arange(q * 1000, q * 1000 + n_terms, dtype=np.uint64), 4, seed)
        tids = sorted({int(np.searchsorted(cdf, u)) for u in draws})
        terms = [f"term_{t}" for t in tids]
        ws = [float(1.0 + 3.0 * w) for w in _u01(
            np.arange(q * 2000, q * 2000 + len(tids), dtype=np.uint64), 5, seed
        )]
        out.append((f"q{q}", terms, ws))
    # edge cases (FIXTURES.md §3)
    out.append(("q_empty", [], []))
    out.append(("q_unknown", ["zzz_not_in_vocab", "qqq_nope"], [1.0, 2.0]))
    out.append(("q_single", ["term_1"], [1.0]))
    out.append(("q_head", ["term_0", "term_1", "term_2"], [3.0, 2.0, 1.0]))
    return out
