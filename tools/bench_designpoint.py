"""Per-stage profile of the DESIGN-POINT search (batch 10 000, in-plan).

The r4 batch-size sweep measured the asymptote (~327 QPS at batch 10 000 on
16 cores / 1M docs) and the r4 per-stage profile decomposed the BATCH-10
floor; this tool decomposes the asymptote itself, so the next optimization
targets the measured majority cost instead of a guess.  It rebuilds the
in-plan chain stage by stage from the engine's own functions (identical
code objects — no reimplementation drift) on the persisted ubs frame, so
cumulative counts attribute wall time to:

  scan      ubs = block-UB scan of matched postings (persist + count)
  theta     θ0 k-th-lb aggregate (+ phase-1 exact tightening when two_phase)
  survive   θ-filter over the cached ubs
  decode    gap decode → distinct candidates (reports the candidate count)
  rescore   candidates ⋈ forward ⋈ queries → vectorized CSR dot
  topk      per-query top-k window
  total     one untouched idx.batch_search() for the end-to-end reference

Stage times are cumulative-chain diffs off the shared persisted ubs (the
scan runs once); rescore/topk re-run the survivor filter + decode lazily,
so their diffs slightly OVERSTATE those stages — fine for attribution.

Usage: python tools/bench_designpoint.py [--batch 10000] [--reps 2]
       [--ckpt /dev/shm/scaling-ckpt-16] [--out /tmp/designpoint.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import DAEMON_ENV, MASTER, ensure_cluster  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession, functions as F
from seismic_spark.checkpoint import CheckpointedBuild
from seismic_spark.postings import IndexConfig
from seismic_spark.sources.pages import synth_pages
from seismic_spark import search as srch
from bench import bench_queries

spark = (SparkSession.builder.appName("designpoint")
    .master("@MASTER@")
    .config("spark.cores.max", "16")
    .config("spark.executor.cores", "2")
    .config("spark.executor.memory", "4g")
    .config("spark.executorEnv.PYTHONPATH", "@REPO@")
    .config("spark.locality.wait", "1s")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

n_docs, vocab_size, batch, reps = @NDOCS@, @VOCAB@, @BATCH@, @REPS@
input_path = "/dev/shm/scaling-input-%d-%d" % (n_docs, vocab_size)
docs = spark.read.parquet(input_path)
idx = CheckpointedBuild(spark, "@CKPT@", resume=True, lineage_detail="light").build(
    docs, IndexConfig(n_postings=1000, pruning="fixed",
                      summary_energy=0.5, quant_ceil=True))

terms = [r["term"] for r in
         idx.vocab.filter(F.col("df") > 5).select("term").collect()]
qs_text = bench_queries(terms, n=batch)
queries = srch.resolve_queries(spark, qs_text, idx.vocab)

# warmup: full engine call, also the Python-worker/broadcast warmup
idx.batch_search(qs_text, k=10, query_cut=10, heap_factor=0.8).count()

k, query_cut, heap_factor, two_phase = 10, 10, 0.8, True
postings, forward = idx._postings_for(queries), idx.forward

profiles = []
for rep in range(reps):
    prof = {}
    qdf, small = srch._as_queries_df(spark, queries)
    qdf = qdf.filter(F.size("q_terms") > 0)
    all_ids = sorted({int(t) for ts, _ in queries.values() for t in ts})
    psc = postings
    if all_ids and len(all_ids) <= srch._SCAN_PRUNE_MAX_IDS:
        psc = postings.filter(F.col("term_id").isin(all_ids))
    cterms = srch.cut_terms(qdf, query_cut)
    matched = (psc.join(F.broadcast(cterms), "term_id")
                  .join(F.broadcast(qdf), "query_id"))
    ubs = srch._block_ubs(matched).persist()

    t0 = time.time(); prof["ubs_rows"] = ubs.count()
    prof["scan_sec"] = round(time.time() - t0, 2)

    survivors = srch._theta_survivors(
        ubs, forward, qdf, k, heap_factor, two_phase, True)
    t0 = time.time(); prof["survivor_rows"] = survivors.count()
    prof["theta_survive_sec"] = round(time.time() - t0, 2)

    cands = srch._decode_docs(survivors)
    t0 = time.time(); prof["cand_rows"] = cands.count()
    prof["decode_cum_sec"] = round(time.time() - t0, 2)

    scored = srch.exact_score(cands, forward, qdf, broadcast_queries=True)
    t0 = time.time(); prof["scored_rows"] = scored.count()
    prof["rescore_cum_sec"] = round(time.time() - t0, 2)

    top = srch.topk(scored, k)
    t0 = time.time(); prof["topk_rows"] = top.count()
    prof["topk_cum_sec"] = round(time.time() - t0, 2)

    ubs.unpersist()
    t0 = time.time()
    idx.batch_search(qs_text, k=k, query_cut=query_cut,
                     heap_factor=heap_factor).count()
    prof["total_sec"] = round(time.time() - t0, 2)
    profiles.append(prof)

spark.stop()
print("RESULT " + json.dumps({
    "batch": batch, "docs": n_docs, "profiles": profiles}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ckpt", default="/dev/shm/scaling-ckpt-16")
    ap.add_argument("--out", default="/tmp/designpoint.json")
    args = ap.parse_args()

    from canary import measure

    ensure_cluster(workers=8)
    child = (
        CHILD.replace("@REPO@", REPO)
        .replace("@MASTER@", MASTER)
        .replace("@NDOCS@", str(args.docs))
        .replace("@VOCAB@", str(args.vocab))
        .replace("@BATCH@", str(args.batch))
        .replace("@REPS@", str(args.reps))
        .replace("@CKPT@", args.ckpt)
    )
    pre = measure()
    env = dict(os.environ, PYTHONPATH=REPO, **DAEMON_ENV)
    proc = subprocess.run([sys.executable, "-c", child], capture_output=True,
                          text=True, timeout=7200, env=env)
    post = measure()
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith("RESULT ")), None)
    if line is None:
        sys.stderr.write(proc.stdout[-1500:] + "\n" + proc.stderr[-3000:])
        sys.exit(1)
    rec = json.loads(line[len("RESULT "):])
    rec["canary_pre_mbps"] = pre["first_touch_mbps"]
    rec["canary_post_mbps"] = post["first_touch_mbps"]
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
