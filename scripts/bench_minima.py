#!/usr/bin/env python3
"""Aggregate per-round bench artifacts into the minima file and compare
against prior rounds' anchors.

Method (the adjudicated one, reused since r10): per artifact, normalize
each query's seconds by that artifact's min(canary_sec) — "canary units",
a host-normalized time — then take the min over artifacts per query.
Artifacts may carry any number of passes (Bench retries contaminated
passes since r13); `queries` is already the min over that artifact's
passes.

Window quality (r16): each artifact since r15 carries per-pass
`io_canary_sec` — a pinned ~70 MB parquet write+read+shuffle measured
OUTSIDE the query windows. The r15 whole-bench A/B campaign proved this
is the variable that tracks round totals (io 0.99-1.14 s windows
produced 196-211u; 1.18-1.28 s windows produced 220-251u on identical
code while the CPU canary sat flat), so `build` records the round's io
band and `compare` ANNOTATES — and with --strict REFUSES — cross-round
ratios whose io bands do not overlap: such a ratio measures the host
windows, not the code (the exact mistake BENCH_NOTES_r13/r14 recorded).

Usage:
  bench_minima.py build  <round>  <artifact.json>...   # writes docs/evidence/bench_<round>_minima.json
  bench_minima.py compare [--strict] <round> <anchor-round>...  # per-query ratios vs each anchor's minima
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
    io_readings = []
    for p in paths:
        with open(p) as f:
            a = json.load(f)
        cmin = min(a["canary_sec"])
        canaries.append(cmin)
        io_readings.extend(a.get("io_canary_sec", []))
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
    if io_readings:
        out["io_canary_band"] = {
            "min": round(min(io_readings), 3),
            "median": round(statistics.median(io_readings), 3),
            "max": round(max(io_readings), 3),
            "passes": len(io_readings),
        }
    dest = f"{EV}/bench_{rnd}_minima.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dest}: {len(paths)} artifacts, {len(per_q)} queries, "
          f"canary_min {out['canary_min_sec']}, sum {sum(per_q.values()):.1f} canary-units"
          + (f", io band [{out['io_canary_band']['min']}, {out['io_canary_band']['max']}]s"
             if io_readings else ", io band unavailable"))


def io_band_verdict(cur_m, ref_m):
    """(ok, message): do the two rounds' io-canary bands overlap?
    Missing bands (pre-r15 artifacts) are reported, never refused — the
    caller cannot conjure readings that were never taken."""
    cb, rb = cur_m.get("io_canary_band"), ref_m.get("io_canary_band")
    if cb is None or rb is None:
        which = "both" if cb is None and rb is None else ("current" if cb is None else "anchor")
        return True, f"io band unavailable for {which} round (pre-r15 artifacts); ratios carry unquantified window risk"
    if cb["min"] > rb["max"] or cb["max"] < rb["min"]:
        return False, (f"IO BANDS DISJOINT: current [{cb['min']}, {cb['max']}]s vs "
                       f"anchor [{rb['min']}, {rb['max']}]s — these ratios measure the "
                       f"host windows, not the code (see docs/BENCH_NOTES_r15.md Part 2); "
                       f"re-run one side or use scripts/bench_ab for a same-window A/B")
    return True, (f"io bands overlap: current [{cb['min']}, {cb['max']}]s "
                  f"(median {cb['median']}), anchor [{rb['min']}, {rb['max']}]s "
                  f"(median {rb['median']})")


def compare(rnd, anchors, strict=False):
    cur_m = load_minima(rnd)
    cur = cur_m["per_query_min_per_canary"]
    refused = False
    for anchor in anchors:
        ref_m = load_minima(anchor)
        ref = ref_m["per_query_min_per_canary"]
        ok, io_note = io_band_verdict(cur_m, ref_m)
        common = sorted(set(cur) & set(ref))
        ratios = {q: cur[q] / ref[q] for q in common if ref[q] > 0}
        med = statistics.median(ratios.values())
        p90 = sorted(ratios.values())[int(0.9 * (len(ratios) - 1))]
        print(f"\n== {rnd} vs {anchor}: {len(common)} common queries, "
              f"median x{med:.2f}, p90 x{p90:.2f}, "
              f"sum {sum(cur[q] for q in common):.1f} vs {sum(ref[q] for q in common):.1f}")
        print(f"   [window quality] {io_note}")
        if not ok:
            refused = True
            if strict:
                print("   --strict: refusing to print per-query ratios for this pair")
                continue
        worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
        best = sorted(ratios.items(), key=lambda kv: kv[1])[:4]
        for q, r in worst:
            print(f"  {q:28s} x{r:5.2f}  ({ref[q]:7.2f} -> {cur[q]:7.2f} canary-units)")
        print("  ...")
        for q, r in best:
            print(f"  {q:28s} x{r:5.2f}  ({ref[q]:7.2f} -> {cur[q]:7.2f} canary-units)")
    if refused and strict:
        sys.exit(2)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    if len(argv) < 2:
        sys.exit(__doc__)
    cmd, rnd = argv[0], argv[1]
    if cmd == "build":
        build(rnd, argv[2:])
    elif cmd == "compare":
        compare(rnd, argv[2:], strict=strict)
    else:
        sys.exit(__doc__)
