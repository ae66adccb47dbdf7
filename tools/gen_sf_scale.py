"""Scale the sf0.1 testdata ~Nx for a larger-scale bench smoke test.

Tiles documents.parquet and embeddings.parquet with deterministic
perturbations (each copy gets a unique token / a small deterministic
embedding offset) so the gates and plans face a bigger corpus while the
data shape stays testdata-like.  NOT the driver's generator — a stand-in
for de-risking scale behavior only.

Usage: python tools/gen_sf_scale.py [--factor 10] [--out /dev/shm/sf_scaled]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/dev/shm/sf_scaled")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    docs = pq.read_table(os.path.join(args.src, "documents.parquet"))
    n = docs.num_rows
    parts = []
    for k in range(args.factor):
        d = docs.to_pydict()
        doc_id = [int(x) + k * 10_000_000 for x in d["doc_id"]]
        if k == 0:
            text = d["text"]
        else:
            text = [f"{t} uniq{k}tok{i % 97}" for i, t in enumerate(d["text"])]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id, pa.int64()),
                    "text": pa.array(text, pa.string()),
                    "lang": d["lang"],
                    "source": d["source"],
                    "n_chars": d["n_chars"],
                }
            )
        )
    big = pa.concat_tables(parts)
    pq.write_table(big, os.path.join(args.out, "documents.parquet"),
                   row_group_size=8192)
    print("documents:", big.num_rows)

    emb = pq.read_table(os.path.join(args.src, "embeddings.parquet"))
    eparts = []
    rng = np.random.default_rng(7)
    base = np.asarray(
        [list(v) for v in emb.column("embedding").to_pylist()], dtype=np.float32
    )
    vid = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    lab = np.asarray(emb.column("label").to_pylist(), dtype=np.int32)
    for k in range(args.factor):
        vecs = base + (0.001 * k) * rng.standard_normal(base.shape).astype(
            np.float32
        )
        eparts.append(
            pa.table(
                {
                    "vec_id": pa.array(vid + k * 10_000_000, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, row)) for row in vecs],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array(lab, pa.int32()),
                }
            )
        )
    bige = pa.concat_tables(eparts)
    pq.write_table(bige, os.path.join(args.out, "embeddings.parquet"),
                   row_group_size=8192)
    print("embeddings:", bige.num_rows)


if __name__ == "__main__":
    main()
