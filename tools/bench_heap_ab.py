"""16-core heap-size ABAB at the search design point (batch 10 000, 1M docs).

Motivation: commit "Right-size executor heap for the search-only scaling
legs" dropped the search-scaling child from the build campaign's 7g to 4g
per executor on the fault-pressure theory (8 executors × heap is first-touch
traffic this host's hypervisor throttles).  But every historical CLEAN
16-core search number — 6.4 s/batch-1000 (round 2), 30.6 s/batch-10000
(round-4 sweep, 327 QPS) — was measured at 7g, and the first pause-probe
diagnostic at 4g read 120-255 s/batch-10000 in a half-clean window.  Heap
size and host weather are confounded; this ABAB separates them: alternate
7g/4g legs on the same fresh standalone cluster, interleaved in time, so
drift hits both sides equally.

Each leg is bench_search_scaling.run_level (pause-probe canary protocol
included), 16 cores only — this is a config experiment, not a scaling
sample; its output decides which heap the scaling campaign should use.

Usage: python tools/bench_heap_ab.py [--mems 7g,4g] [--rounds 2] [--reps 2]
       [--batch 10000] [--out /tmp/heap_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import ensure_cluster, stop_cluster  # noqa: E402
from bench_search_scaling import run_level  # noqa: E402
from canary import measure  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--ckpt", default="/dev/shm/scaling-ckpt-16")
    ap.add_argument("--mems", default="7g,4g")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--pause-sec", type=float, default=20.0)
    ap.add_argument("--healthy", type=float, default=1300.0)
    ap.add_argument("--wait-healthy", action="store_true",
                    help="block until two consecutive probes >= --healthy")
    ap.add_argument("--out", default="/tmp/heap_ab.json")
    args = ap.parse_args()

    if args.wait_healthy:
        while True:
            r = measure()
            print(json.dumps({"probe": r["first_touch_mbps"]}), flush=True)
            if r["first_touch_mbps"] >= args.healthy:
                time.sleep(20)
                if measure()["first_touch_mbps"] >= args.healthy:
                    break
            time.sleep(120)

    mems = args.mems.split(",")
    legs = []
    ensure_cluster(workers=8)
    try:
        for rnd in range(args.rounds):
            for mem in mems:
                leg_args = argparse.Namespace(
                    docs=args.docs, vocab=args.vocab, batch=args.batch,
                    reps=args.reps, ckpt=args.ckpt,
                    pause_sec=args.pause_sec, exec_mem=mem,
                )
                r = run_level(args.cores, leg_args)
                r["exec_mem"] = mem
                r["round"] = rnd
                legs.append(r)
                print(json.dumps({
                    "round": rnd, "mem": mem, "secs": r["secs"],
                    "sec_med": r["sec_med"],
                    "pause": r["canary_pause"],
                    "brackets": [r["canary_pre_mbps"],
                                 r["canary_post_mbps"]],
                }), flush=True)
    finally:
        stop_cluster()

    with open(args.out, "w") as f:
        json.dump({"ts": round(time.time(), 1), "cores": args.cores,
                   "docs": args.docs, "batch": args.batch,
                   "legs": legs}, f, indent=1)
    print(json.dumps({"out": args.out, "n_legs": len(legs)}), flush=True)


if __name__ == "__main__":
    main()
