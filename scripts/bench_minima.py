#!/usr/bin/env python3
"""Aggregate per-round bench artifacts into the minima file and compare
against prior rounds' anchors.

Method (the adjudicated one, reused since r10): per artifact, normalize
each query's seconds by that artifact's min(canary_sec) — "canary units",
a host-normalized time — then take the min over artifacts per query.
Artifacts may carry any number of passes (Bench retries contaminated
passes since r13); `queries` is already the min over that artifact's
passes.

Usage:
  bench_minima.py build  <round>  <artifact.json>...   # writes docs/evidence/bench_<round>_minima.json
  bench_minima.py compare <round> <anchor-round>...    # per-query ratios vs each anchor's minima
"""
import json
import statistics
import sys

EV = "docs/evidence"


def load_minima(rnd):
    with open(f"{EV}/bench_{rnd}_minima.json") as f:
        return json.load(f)


def build(rnd, paths):
    per_q = {}
    per_q_sec = {}
    canaries = []
    for p in paths:
        with open(p) as f:
            a = json.load(f)
        cmin = min(a["canary_sec"])
        canaries.append(cmin)
        for q, sec in a["queries"].items():
            u = sec / cmin
            if q not in per_q or u < per_q[q]:
                per_q[q] = u
            if q not in per_q_sec or sec < per_q_sec[q]:
                per_q_sec[q] = sec
    out = {
        "artifacts": [p.split("/")[-1] for p in paths],
        "canary_min_sec": round(min(canaries), 3),
        "per_query_min_per_canary": {q: round(v, 3) for q, v in sorted(per_q.items())},
        "per_query_min_sec": {q: round(v, 3) for q, v in sorted(per_q_sec.items())},
    }
    dest = f"{EV}/bench_{rnd}_minima.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dest}: {len(paths)} artifacts, {len(per_q)} queries, "
          f"canary_min {out['canary_min_sec']}, sum {sum(per_q.values()):.1f} canary-units")


def compare(rnd, anchors):
    cur = load_minima(rnd)["per_query_min_per_canary"]
    for anchor in anchors:
        ref = load_minima(anchor)["per_query_min_per_canary"]
        common = sorted(set(cur) & set(ref))
        ratios = {q: cur[q] / ref[q] for q in common if ref[q] > 0}
        med = statistics.median(ratios.values())
        p90 = sorted(ratios.values())[int(0.9 * (len(ratios) - 1))]
        print(f"\n== {rnd} vs {anchor}: {len(common)} common queries, "
              f"median x{med:.2f}, p90 x{p90:.2f}, "
              f"sum {sum(cur[q] for q in common):.1f} vs {sum(ref[q] for q in common):.1f}")
        worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
        best = sorted(ratios.items(), key=lambda kv: kv[1])[:4]
        for q, r in worst:
            print(f"  {q:28s} x{r:5.2f}  ({ref[q]:7.2f} -> {cur[q]:7.2f} canary-units)")
        print("  ...")
        for q, r in best:
            print(f"  {q:28s} x{r:5.2f}  ({ref[q]:7.2f} -> {cur[q]:7.2f} canary-units)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    cmd, rnd = sys.argv[1], sys.argv[2]
    if cmd == "build":
        build(rnd, sys.argv[3:])
    elif cmd == "compare":
        compare(rnd, sys.argv[3:])
    else:
        sys.exit(__doc__)
