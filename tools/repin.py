#!/usr/bin/env python3
"""Guarded bench-baseline re-pin (NOT shipped library code).

Usage: python3 tools/repin.py <candidate_bench_out.json> [pin_copy.json]

Round 12 shipped a 6-entry SPARK_GRAFT_ONLY isolation output as
tools/bench_baseline.json (commit 30efa02 claimed a "313-query re-pin"):
benchdiff against the canonical pin became impossible (313 unadjudicable)
and Bench.scala's run-time isolation trigger — which reads the pin to
decide which regressed-looking entries to re-time alone — was silently
disabled for ~307 of 313 queries. This script is the guard the round-12
verdict prescribed: every re-pin goes through it, and it REFUSES:

  1. a candidate whose declared n_queries disagrees with its own
     queries map (a truncated/hand-edited file);
  2. a candidate with a non-empty failed list (a broken run is not a
     baseline);
  3. a candidate whose non-stage query count is BELOW the current pin's
     (the catalog only ever grows; an isolation run / subset run can
     never become the pin).

On success it writes tools/bench_baseline.json and, if given, a durable
tools/bench_rN_pin.json copy, then prints the pinned totals.
"""
import json
import os
import sys

BASELINE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def nonstage(queries):
    return [k for k in queries if not k.startswith("stage_")]


def main():
    if len(sys.argv) not in (2, 3):
        sys.exit(__doc__)
    cand_path = sys.argv[1]
    with open(cand_path) as f:
        cand = json.load(f)
    qs = cand.get("queries", {})
    declared = cand.get("n_queries")
    actual = len(nonstage(qs))
    if declared != actual:
        sys.exit(f"REFUSED: candidate declares n_queries={declared} but its "
                 f"queries map holds {actual} non-stage entries — truncated "
                 "or hand-edited file")
    if cand.get("failed"):
        sys.exit(f"REFUSED: candidate has failed queries {cand['failed']} — "
                 "a broken run cannot be the baseline")
    if os.path.exists(BASELINE):
        with open(BASELINE) as f:
            old = json.load(f)
        old_n = len(nonstage(old.get("queries", {})))
        if actual < old_n:
            sys.exit(f"REFUSED: candidate covers {actual} queries but the "
                     f"current pin covers {old_n} — the catalog only grows; "
                     "this looks like an isolation/subset run "
                     "(the exact round-12 corruption this guard exists for)")
    with open(BASELINE, "w") as f:
        json.dump(cand, f)
        f.write("\n")
    copies = [BASELINE]
    if len(sys.argv) == 3:
        with open(sys.argv[2], "w") as f:
            json.dump(cand, f)
            f.write("\n")
        copies.append(sys.argv[2])
    print(f"pinned: total={cand.get('value')}s n_queries={actual} "
          f"calib={cand.get('calib_sec')}@{cand.get('calib_threads')}t "
          f"-> {', '.join(copies)}")


if __name__ == "__main__":
    main()
