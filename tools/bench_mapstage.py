"""Compute-stage scaling: the posting-builder mapInPandas stage in isolation.

Separates the engine's own scalability from the sandbox's shared-resource
ceilings: this stage is map-only (no shuffle — input pre-partitioned on
storage), so it isolates Arrow + numpy + Python-worker compute.  Measured
result (BENCH/BASELINE.md): 4→16 cores efficiency ≈ 0.95–1.07.

Usage (builder input must exist — see --prepare):
    python tools/bench_mapstage.py --prepare   # one-time, ~5 min
    python tools/bench_mapstage.py             # ABAB timing at 4 vs 16
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INPUT = "/dev/shm/builder-input"

TIME_CODE = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
from seismic_spark.session import get_spark
from seismic_spark import postings as pst
from seismic_spark.postings import IndexConfig
cores = int(sys.argv[1])
spark = get_spark("mapstage-%%d" %% cores, cores=cores, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
parted = spark.read.parquet(%(input)r)
cfg = IndexConfig(n_postings=1000, summary_energy=0.5)
t0 = time.time()
n = parted.mapInPandas(pst.make_stream_builder(cfg), pst.POSTINGS_SCHEMA).count()
print("RESULT " + json.dumps({"cores": cores, "sec": round(time.time()-t0,2), "rows": n}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--docs", type=int, default=1000000)
    ap.add_argument("--vocab", type=int, default=100000)
    args = ap.parse_args()
    if args.prepare:
        prep = r"""
import sys; sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from seismic_spark.session import get_spark
from seismic_spark import textprep, vocab as voc, forward as fwd, postings as pst
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages
spark = get_spark("prep", cores=16, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
pages = synth_pages(spark, %(docs)d, vocab_size=%(vocab)d, seed=42, partitions=64)
docs = pages.select("url","text").withColumn("doc_id", F.abs(F.xxhash64("url")))
toks = textprep.tokenize(docs).persist()
n, avgdl = textprep.corpus_stats(toks)
vocab = voc.build_vocab(toks).persist()
dtw = textprep.bm25_weights(textprep.term_frequencies(toks), vocab, n, avgdl).persist()
forward = fwd.build_forward(dtw)
cfg = IndexConfig(n_postings=1000, summary_energy=0.5)
pruned = pst.prune(dtw, vocab.count(), cfg)
ent = pruned.withColumn("block", pst.block_of_rank_col(F.col("rank"), cfg)).withColumn("salt", (F.col("block")/cfg.blocks_per_row).cast("int"))
joined = ent.join(forward, "doc_id").select("term_id","salt","block","rank","doc_id","weight","terms","weights")
joined.repartition(32, F.col("term_id"), F.col("salt")).sortWithinPartitions(
    "term_id","salt","rank").write.mode("overwrite").parquet(%(input)r)
spark.stop()
""" % {"repo": REPO, "docs": args.docs, "vocab": args.vocab, "input": INPUT}
        subprocess.run([sys.executable, "-c", prep], check=True,
                       env={**os.environ, "PYTHONPATH": REPO})
        return

    if not os.path.exists(os.path.join(INPUT, "_SUCCESS")):
        sys.exit(f"builder input missing at {INPUT} — run with --prepare first")
    code = TIME_CODE % {"repo": REPO, "input": INPUT}
    results = []
    for cores in (4, 16, 4, 16):
        out = subprocess.run([sys.executable, "-c", code, str(cores)],
                             capture_output=True, text=True,
                             env={**os.environ, "PYTHONPATH": REPO}, timeout=1200)
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[7:]))
                print(line)
    import statistics
    t4 = statistics.median([r["sec"] for r in results if r["cores"] == 4])
    t16 = statistics.median([r["sec"] for r in results if r["cores"] == 16])
    print(json.dumps({"eff_4_to_16": round(t4 / t16 / 4, 3)}))


if __name__ == "__main__":
    main()
