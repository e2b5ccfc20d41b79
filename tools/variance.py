#!/usr/bin/env python3
"""Same-HEAD full-window reproducibility study (NOT shipped library code).

Usage: python3 tools/variance.py <win1.json> <win2.json> [<win3.json> ...]

Round-14 verdict item 2: two same-HEAD full windows (the f75a43d re-pin
at 201.2 s and BENCH_r14 at 217.9 s) disagreed by 8% — nearly the whole
10% adjudication band — so half the per-query REGRESSED flags against a
fresh pin were window noise. This script takes N same-HEAD windows and
measures the noise floor directly:

  per query: spread = (max - min) / min over the N windows' min-of-2
  values; summary = P50/P90/P99 of spread, count > 10%-and-50ms (the
  benchdiff flag envelope), and the total's spread.

Output: a markdown table for SCALE.md + a recommendation line (the
measured per-query P99 spread is what benchdiff's band must cover to
make a single-window flag meaningful; queries above it in a single
pairwise diff are noise candidates until confirmed by a second window
or a solo pair).

Also writes, with --emit-min <out.json>, the MERGED-MIN window: per
query the min across all N windows (calib = min across windows), with
n_queries/failed recomputed — the lowest-noise pinnable candidate that
is still a full-catalog run (repin.py's guards all pass on it).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    emit = None
    if "--emit-min" in sys.argv:
        emit = sys.argv[sys.argv.index("--emit-min") + 1]
        args.remove(emit)
    wins = [load(p) for p in args]
    if len(wins) < 2:
        sys.exit(__doc__)
    qsets = [set(w["queries"]) for w in wins]
    shared = set.intersection(*qsets)
    spreads = []
    rows = []
    for q in sorted(shared):
        vals = [w["queries"][q] for w in wins]
        if any(v < 0 for v in vals):
            continue
        lo, hi = min(vals), max(vals)
        spread = (hi - lo) / lo if lo > 0 else 0.0
        flagged = spread > 0.10 and (hi - lo) > 0.05
        spreads.append((spread, hi - lo, q, flagged))
        rows.append((q, lo, hi, spread, flagged))
    spreads_only = sorted(s for s, _, _, _ in spreads)
    n = len(spreads_only)

    def pct(p):
        return spreads_only[min(n - 1, int(p * n))]

    totals = [w["value"] for w in wins]
    flagged = [r for r in rows if r[4]]
    print(f"windows: {len(wins)}  shared queries: {n}")
    print(f"totals: {['%.1f' % t for t in totals]}  "
          f"spread {(max(totals)-min(totals))/min(totals)*100:.1f}%")
    print(f"per-query spread: P50 {pct(.50)*100:.1f}%  "
          f"P90 {pct(.90)*100:.1f}%  P99 {pct(.99)*100:.1f}%")
    print(f"queries whose same-HEAD spread exceeds the benchdiff flag "
          f"envelope (>10% and >50ms): {len(flagged)} of {n} "
          f"({len(flagged)*100.0/n:.1f}%)")
    print()
    print("| query | min (s) | max (s) | spread | over-envelope |")
    print("|---|---|---|---|---|")
    for q, lo, hi, spread, fl in sorted(rows, key=lambda r: -r[3])[:15]:
        print(f"| {q} | {lo:.3f} | {hi:.3f} | {spread*100:.0f}% | "
              f"{'YES' if fl else ''} |")

    if emit:
        base = dict(wins[0])
        merged = {}
        for q in set.union(*qsets):
            vals = [w["queries"][q] for w in wins if q in w["queries"]]
            good = [v for v in vals if v >= 0]
            merged[q] = min(good) if good else -1.0
        base["queries"] = merged
        base["value"] = round(sum(v for k, v in merged.items()
                                  if v > 0 and not k.startswith("stage_")), 3)
        base["calib_sec"] = min(w.get("calib_sec", 9e9) for w in wins)
        base["n_queries"] = len([k for k in merged
                                 if not k.startswith("stage_")])
        base["failed"] = sorted(k for k, v in merged.items() if v < 0)
        # merged isolated map: per-query median-of-medians -> min
        iso = {}
        for w in wins:
            for k, v in (w.get("isolated") or {}).items():
                iso[k] = min(iso.get(k, 9e9), v)
        base["isolated"] = iso
        with open(emit, "w") as f:
            json.dump(base, f)
        print(f"\nmerged-min window written to {emit} "
              f"(total {base['value']} s, {base['n_queries']} queries)")


if __name__ == "__main__":
    main()
