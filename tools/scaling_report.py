"""Analyze canary-gated scaling samples (tools/bench_scaling.py --collect).

Two views over the same records:

1. SAME-PAIR samples — both levels of one attempt clean (the classic A/B).
2. CERTIFIED CLEAN LEGS — every individual level run whose own canaries
   pass (brackets >= --valid, in-run min >= --inrun-floor), pooled across
   attempts.  The two levels of a "pair" never execute simultaneously, so a
   pair is just two sequential runs; any clean 4-core leg is comparable to
   any clean 16-core leg on the same input/config.  On a host whose
   page-supply throttling flips every few minutes (BENCH/BASELINE.md), this
   is how clean evidence accumulates: each attempt contributes whichever
   legs the hypervisor left alone.

Usage: python tools/scaling_report.py [--in /tmp/scaling_samples.jsonl]
"""

from __future__ import annotations

import argparse
import json


def leg_clean(leg: dict, healthy_min: float) -> bool:
    """A leg is CLEAN iff its in-run canary trace exists and never dips
    below ``healthy_min``.  The in-run trace samples the whole level every
    30 s, so it dominates the pre/post brackets (which measure single
    instants and flip on this host within seconds).  Observed bimodality at
    500k docs: clean legs' in-run minima were 1232/1323 MB/s even while
    building (self-contention barely registers when the host is healthy);
    throttled legs dipped to 23-480.  The default 800 sits in the gap with
    wide margin on both sides.  Legs without a trace (pre-watcher records)
    are never clean."""
    trace = leg.get("canary_in_run") or []
    return len(trace) >= 2 and min(trace) >= healthy_min


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", default="/tmp/scaling_samples.jsonl")
    ap.add_argument("--docs", type=int, default=500000,
                    help="only pool records of this corpus size")
    ap.add_argument("--healthy-min", type=float, default=800.0)
    ap.add_argument("--ceiling", type=float, default=0.69,
                    help="calibrated single-box 4->16 memory ceiling")
    ap.add_argument("--md", action="store_true",
                    help="emit the BENCH/BASELINE.md samples-table markdown "
                         "instead of JSON (every attempt, valid or rejected — "
                         "rejections document the gate doing its job)")
    ap.add_argument("--valid-gate", type=float, default=900.0,
                    help="bracket-canary floor used at collection time "
                         "(bench_scaling --valid)")
    ap.add_argument("--inrun-gate", type=float, default=60.0,
                    help="in-run canary floor used at collection time "
                         "(bench_scaling --inrun-floor)")
    args = ap.parse_args()

    if args.md:
        print("| # | order | build 4c | build 16c | eff raw | brackets (MB/s) "
              "| in-run min | verdict |")
        print("|---|---|---|---|---|---|---|---|")
        i = 0
        for line in open(args.inp):
            r = json.loads(line)
            if r.get("docs") != args.docs:
                continue
            i += 1
            if "error" in r and r["error"]:
                print(f"| {i} | {r['order']} | — | — | — | — | — | "
                      f"errored: {r['error'][:60]} |")
                continue
            p = r["pair"]
            # name the gate that actually failed (a rejection can come from
            # the bracket floor OR the in-run host-stall floor)
            if r.get("valid"):
                verdict = "**valid**"
            else:
                reasons = []
                if r.get("canaries") and min(r["canaries"]) < args.valid_gate:
                    reasons.append(
                        f"bracket {int(min(r['canaries']))} < "
                        f"{int(args.valid_gate)}"
                    )
                irm = r.get("in_run_min")
                if irm is not None and irm < args.inrun_gate:
                    reasons.append(
                        f"in-run min {int(irm)} < {int(args.inrun_gate)} "
                        "(host stall)"
                    )
                if not reasons:
                    # The collector rejected it, but no gate fails under the
                    # floors passed to --md: the sample predates a floor
                    # recalibration (collection-time floors were stricter).
                    irm_s = int(irm) if irm is not None else "?"
                    reasons = [
                        f"collection-time gate (in-run min {irm_s} under the "
                        "pre-recalibration floor; passes current floors)"
                    ]
                verdict = "rejected (" + "; ".join(reasons) + ")"
            brackets = "/".join(str(int(c)) for c in r["canaries"])
            print(
                f"| {i} | {'→'.join(str(o) for o in r['order'])}c "
                f"| {p['4']['build_sec']:.1f} s | {p['16']['build_sec']:.1f} s "
                f"| {r['eff_build']:.3f} | {brackets} "
                f"| {r.get('in_run_min', '—')} | {verdict} |"
            )
        return

    pairs, legs = [], {"4": [], "16": []}
    for line in open(args.inp):
        r = json.loads(line)
        if "pair" not in r:
            continue
        if r.get("docs", 500000) != args.docs:
            continue
        both = True
        for c in ("4", "16"):
            leg = r["pair"][c]
            if leg_clean(leg, args.healthy_min):
                legs[c].append(leg)
            else:
                both = False
        if both:
            pairs.append(r)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2] if s else None

    out = {"same_pair_samples": [], "clean_legs": {}}
    for r in pairs:
        out["same_pair_samples"].append(
            {
                "order": r["order"],
                "build_4": r["pair"]["4"]["build_sec"],
                "build_16": r["pair"]["16"]["build_sec"],
                "search_4": r["pair"]["4"]["search_sec"],
                "search_16": r["pair"]["16"]["search_sec"],
                "eff_build_raw": r["eff_build"],
                "eff_build_norm": round(r["eff_build"] / args.ceiling, 3),
                "eff_search_raw": r["eff_search"],
                "canaries": r["canaries"],
                "in_run_min": r.get("in_run_min"),
            }
        )
    for c in ("4", "16"):
        out["clean_legs"][c] = {
            "n": len(legs[c]),
            "build_secs": sorted(x["build_sec"] for x in legs[c]),
            "build_median": med([x["build_sec"] for x in legs[c]]),
            "search_secs": sorted(x["search_sec"] for x in legs[c]),
            "search_median": med([x["search_sec"] for x in legs[c]]),
        }
    b4, b16 = (
        out["clean_legs"]["4"]["build_median"],
        out["clean_legs"]["16"]["build_median"],
    )
    s4, s16 = (
        out["clean_legs"]["4"]["search_median"],
        out["clean_legs"]["16"]["search_median"],
    )
    if b4 and b16:
        raw = round(b4 / b16 / 4, 3)
        out["clean_leg_eff_build"] = {
            "raw": raw, "normalized": round(raw / args.ceiling, 3)
        }
    if s4 and s16:
        raw = round(s4 / s16 / 4, 3)
        out["clean_leg_eff_search"] = {
            "raw": raw, "normalized": round(raw / args.ceiling, 3)
        }

    # Min-over-attempts estimator: host throttling only ever ADDS wall time,
    # so min_N(T_level) approaches the clean time from above as attempts
    # accumulate — every attempt contributes, even pairs the canary gates
    # rejected.  The ratio of the two minima estimates clean N→4N
    # efficiency; it is an upper-bound-from-noise estimate (each min may
    # still carry residual throttle), so it complements — not replaces —
    # canary-valid pairs.
    all_legs = {"4": [], "16": []}
    for line in open(args.inp):
        r = json.loads(line)
        if "pair" not in r or r.get("docs", 500000) != args.docs:
            continue
        for c in ("4", "16"):
            all_legs[c].append(r["pair"][c])
    if all_legs["4"] and all_legs["16"]:
        b4m = min(x["build_sec"] for x in all_legs["4"])
        b16m = min(x["build_sec"] for x in all_legs["16"])
        s4m = min(x["search_sec"] for x in all_legs["4"])
        s16m = min(x["search_sec"] for x in all_legs["16"])
        raw_b = round(b4m / b16m / 4, 3)
        raw_s = round(s4m / s16m / 4, 3)
        out["min_estimator"] = {
            "attempts": len(all_legs["4"]),
            "build_min_4": b4m, "build_min_16": b16m,
            "search_min_4": s4m, "search_min_16": s16m,
            "eff_build": {"raw": raw_b,
                          "normalized": round(raw_b / args.ceiling, 3)},
            "eff_search": {"raw": raw_s,
                           "normalized": round(raw_s / args.ceiling, 3)},
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
