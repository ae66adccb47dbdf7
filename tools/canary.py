"""Host-memory-health canary for benchmark gating.

This sandbox VM is subject to HOST-level page-supply throttling: when the
hypervisor is under memory pressure, FIRST-TOUCH of new guest pages drops
from multi-GB/s to ~0.1-0.7 GB/s while already-touched pages stream at full
speed (measured 2026-08-16: first-touch 131 MB/s vs retouch 11.6 GB/s,
minutes apart, guest otherwise idle — no steal, no swap, no KSM/compaction
activity).  Shuffle-heavy Spark stages allocate GBs of fresh tmpfs + Arrow
pages, so any throughput measured during a throttled window is garbage.

Protocol: record the canary BEFORE and AFTER every benchmark sample; accept
the sample only if both first-touch rates clear ``--min-mbps`` (default
1500).  ``--log`` appends one JSON line so long polls build a health trace.

Usage:
    python tools/canary.py                 # one measurement, JSON to stdout
    python tools/canary.py --log FILE      # also append to FILE
    python tools/canary.py --wait          # block until healthy, poll 60s
"""

from __future__ import annotations

import argparse
import json
import mmap
import time


def measure(size_mb: int = 256) -> dict:
    n = size_mb << 20
    m = mmap.mmap(-1, n)
    chunk = b"\xab" * (1 << 20)
    t0 = time.time()
    for _ in range(size_mb):
        m.write(chunk)
    first_touch = time.time() - t0
    m.seek(0)
    t0 = time.time()
    for _ in range(size_mb):
        m.write(chunk)
    retouch = time.time() - t0
    m.close()
    return {
        "ts": round(time.time(), 1),
        "first_touch_mbps": round(size_mb / first_touch, 0),
        "retouch_mbps": round(size_mb / retouch, 0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-mbps", type=float, default=1500.0)
    ap.add_argument("--log", default=None)
    ap.add_argument("--wait", action="store_true")
    ap.add_argument("--poll-sec", type=float, default=60.0)
    ap.add_argument("--timeout-sec", type=float, default=7200.0)
    args = ap.parse_args()
    deadline = time.time() + args.timeout_sec
    while True:
        r = measure()
        r["healthy"] = r["first_touch_mbps"] >= args.min_mbps
        print(json.dumps(r), flush=True)
        if args.log:
            with open(args.log, "a") as f:
                f.write(json.dumps(r) + "\n")
        if not args.wait or r["healthy"] or time.time() > deadline:
            break
        time.sleep(args.poll_sec)


if __name__ == "__main__":
    main()
