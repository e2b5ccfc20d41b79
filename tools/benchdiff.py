#!/usr/bin/env python3
"""Mechanical cross-round bench adjudication (NOT shipped library code).

Usage: python3 tools/benchdiff.py <old_bench_out.json> <new_bench_out.json>

Implements the SCALE.md Round-8 reproducibility study's decision rule so
cross-round perf calls are a computation, not a judgement:

1. RAW comparison (r16: probe normalization dropped). calib_sec prints
   as a diagnostic only; the platform signal is the shared-query raw
   ratio — the suite measuring itself — because every probe studied
   (pure-ALU: 39% same-HEAD spread r15; shuffle+scan candidate: 45%
   quiet-window spread, worse mix-tracking, r16 CalibStudy) is noisier
   than the suite's own 6-8% envelope. A probe that noisy can only
   inject phantom adjudications, as the r10/r15 decoupling incidents
   showed.

2. Adjudicate per category and for the total with the 10%-or-50ms rule;
   per QUERY the band is 25%-or-50ms: the round-15 same-HEAD
   reproducibility study (SCALE.md "Round 15 - full-window variance")
   measured per-query spread between same-HEAD full windows at
   P50 9.2% / P90 26.3% - a 10% per-query band flags ~27% of the
   catalog on pure window noise (the round-14 "51 REGRESSED vs a
   same-HEAD re-pin" incident). 25% = the measured P90; anything past
   it is still isolation-adjudicated before the gate fails. Totals and
   categories aggregate the noise away (same-HEAD total spread 8.3%),
   so they keep the tighter 10% band. A query failed (-1) or absent on
   either side is 'unadjudicable' (with the reason).

3. SUSPECT band (r16, closing the r15 advisory): a per-query move in
   (10%, 25%] is inside the same-HEAD noise envelope, so one window
   can't adjudicate it - but silently printing 'stable' would let a
   genuine 10-25% single-query regression ride for free. Those movers
   are now labeled 'suspect' (never gate-fatal on their own) and get a
   confirmation path: --confirm <second_window.json> re-tests each
   suspect against an INDEPENDENT same-HEAD window of the new binary.
   Reproducing past 10% in the same direction in both windows has
   ~(per-window false-positive)^2 odds of being noise -> upgraded to
   REGRESSED (gate-fatal); not reproducing -> 'suspect-unconfirmed
   (window noise)'. A new-side solo median (isolated{}) that clears
   the 10% band also clears the suspect. Without --confirm, suspects
   are summarized so the round close can decide to spin the second
   window.

Exit code 1 iff any query or category regressed — usable as a gate.

--gate (third arg): the round-close mode. ADDITIONALLY exits non-zero
when the two files' catalogs differ (any unadjudicable entry) — the
machine check for "the pin covers the whole catalog" that round 12
lacked: SCALE.md claimed "zero unadjudicable entries" while the
committed pin held 6 queries, and nothing ever executed that claim.
The close commit must embed this mode's rc=0 line.
"""
import json
import sys


THRESH_REL = 0.10        # totals + categories
QUERY_REL = 0.25         # per query: the measured same-HEAD P90 spread
THRESH_ABS = 0.05  # seconds


def load(path):
    with open(path) as f:
        return json.load(f)


def verdict(old, new_norm, rel=THRESH_REL):
    d = new_norm - old
    if abs(d) > THRESH_ABS and abs(d) > rel * old:
        return "REGRESSED" if d > 0 else "improved"
    return "stable"


def query_verdict(old, new_norm):
    """Per-query three-band rule: >25% = REGRESSED/improved, (10%,25%] =
    suspect (needs a second window or solo pair), else stable. The 50ms
    absolute floor applies to both bands."""
    v = verdict(old, new_norm, QUERY_REL)
    if v != "stable":
        return v
    d = new_norm - old
    if abs(d) > THRESH_ABS and abs(d) > THRESH_REL * old:
        return "suspect(+%.0f%%)" % (100 * d / old) if d > 0 \
            else "suspect(%.0f%%)" % (100 * d / old)
    return "stable"


def main():
    gate = "--gate" in sys.argv[3:]
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    confirm = None
    if "--confirm" in sys.argv[3:]:
        ci = sys.argv.index("--confirm")
        if ci + 1 >= len(sys.argv):
            sys.exit("--confirm needs a second-window json path")
        confirm = load(sys.argv[ci + 1])
    # r16 (verdict item 4): PROBE NORMALIZATION DROPPED. History: the
    # pure-ALU probe normalization gained a decoupling guard (r10) that
    # fell back to raw whenever the probe disagreed with the suite's own
    # shared-query ratio by >10-15%; the r15 three-window study measured
    # the probe at 39% same-HEAD spread vs the suite's 7.4%, and the r16
    # CalibStudy measured a candidate shuffle+scan replacement at 45%
    # quiet-window spread with WORSE mix-tracking (73% vs ALU's 40%),
    # while a fixed suite-query mix spread only 6%. No probe tracks the
    # suite better than the suite: the shared-query raw ratio below is
    # the ONLY platform diagnostic, and every comparison is RAW. calib
    # values still print for the record (kind/threads mark the protocol).
    norm = 1.0
    calib_a, calib_b = a.get("calib_sec"), b.get("calib_sec")
    thr_a, thr_b = a.get("calib_threads", 8), b.get("calib_threads", 8)
    kind_a = a.get("calib_kind", "alu-v1")
    kind_b = b.get("calib_kind", "alu-v1")
    if calib_a and calib_b:
        print(f"calib (diagnostic only): old={calib_a:.3f}s@{thr_a}t "
              f"[{kind_a}] new={calib_b:.3f}s@{thr_b}t [{kind_b}]")
    qa0, qb0 = a.get("queries", {}), b.get("queries", {})
    sh = [k for k in qa0 if k in qb0 and qa0[k] >= 0 and qb0[k] >= 0]
    if sh:
        r_raw = sum(qb0[k] for k in sh) / sum(qa0[k] for k in sh)
        print(f"platform signal: shared-query raw ratio {r_raw:.3f} "
              f"over {len(sh)} queries (the suite measuring itself; "
              "comparisons below are RAW)")

    qa, qb = a.get("queries", {}), b.get("queries", {})
    # Bench's self-clearing evidence: post-suite solo re-times (3-sample
    # medians) of entries that ran >1.8x baseline inside the suite. A
    # REGRESSED flag whose isolated time clears the threshold is a
    # suite-interaction phantom (GC/cleaner/JIT collision in the shared
    # JVM), not a code regression -> downgraded, and not gate-fatal.
    iso = b.get("isolated", {})
    # Like-for-like isolation pairing (r14, the q224 adjudication): some
    # sub-second queries have a SOLO floor ~2x their in-suite time (q224:
    # in-suite min-of-2 is ~0.25s across four r11-r13 windows with no
    # trend, while fresh-JVM and end-of-window solo medians read
    # 0.39-0.59s -- co-residency warmth the solo context never reaches).
    # For those, isolated-vs-PINNED-in-suite can never clear. When the
    # OLD file also carries an isolated median for the query (standing
    # watchlist entries do), compare the two isolated medians -- equal
    # protocols -- and clear if THAT comparison is not a regression.
    iso_old = a.get("isolated", {})
    rows, unadj = [], []
    for k in sorted(set(qa) | set(qb)):
        if k not in qa or k not in qb:
            unadj.append((k, "only in " + ("new" if k not in qa else "old")))
            continue
        if qa[k] < 0 or qb[k] < 0:
            unadj.append((k, "failed in " + ("old" if qa[k] < 0 else "new")))
            continue
        nn = qb[k] * norm
        v = query_verdict(qa[k], nn)
        if v == "REGRESSED" and k in iso and iso[k] >= 0:
            iso_n = iso[k] * norm
            if verdict(qa[k], iso_n, QUERY_REL) != "REGRESSED":
                v = f"cleared-by-isolation ({iso_n:.3f}s solo)"
            elif k in iso_old and iso_old[k] >= 0 and \
                    verdict(iso_old[k], iso_n, QUERY_REL) != "REGRESSED":
                v = (f"cleared-by-isolation-pair (solo {iso_old[k]:.3f}s "
                     f"-> {iso_n:.3f}s; solo floor above in-suite pin)")
        elif v.startswith("suspect"):
            # (10%,25%] mover: one window can't call it. Clear via a
            # new-side solo median inside the 10% band, else ask the
            # independent confirmation window; reproducing >10% same
            # direction in BOTH windows upgrades to a real call.
            if k in iso and iso[k] >= 0 and \
                    verdict(qa[k], iso[k] * norm) == "stable":
                v = f"suspect-cleared-by-solo ({iso[k] * norm:.3f}s solo)"
            elif confirm is not None:
                cq = confirm.get("queries", {})
                if k in cq and cq[k] >= 0:
                    nc = cq[k] * norm
                    vc = verdict(qa[k], nc)  # tight 10% band
                    same_dir = (nn - qa[k] > 0) == (nc - qa[k] > 0)
                    if vc != "stable" and same_dir:
                        v = ("REGRESSED (2-window confirmed: "
                             f"{nn:.3f}s + {nc:.3f}s)") if nn > qa[k] \
                            else ("improved (2-window confirmed: "
                                  f"{nn:.3f}s + {nc:.3f}s)")
                    else:
                        v = (f"suspect-unconfirmed (window noise: "
                             f"confirm window read {nc:.3f}s)")
                else:
                    v = "suspect-unconfirmed (absent in confirm window)"
        rows.append((k, qa[k], qb[k], nn, v))

    print(f"\nper-category (normalized, {THRESH_REL:.0%}-or-"
          f"{THRESH_ABS * 1000:.0f}ms rule; per-query band "
          f"{QUERY_REL:.0%} per the r15 variance study):")
    ca, cb = a.get("categories", {}), b.get("categories", {})
    for c in sorted(set(ca) | set(cb)):
        if c in ca and c in cb:
            nn = cb[c] * norm
            print(f"  {c:<12} {ca[c]:8.3f}s -> {nn:8.3f}s  "
                  f"({nn - ca[c]:+7.3f}s)  {verdict(ca[c], nn)}")
        else:
            print(f"  {c:<12} only in one file")

    moved = [r for r in rows if r[4] != "stable"]
    n_susp = sum(1 for r in rows if r[4].startswith("suspect("))
    print(f"\nper-query: {len(rows)} adjudicated, "
          f"{sum(1 for r in rows if r[4] == 'stable')} stable, "
          f"{sum(1 for r in rows if r[4].startswith('improved'))} improved, "
          f"{sum(1 for r in rows if r[4].startswith('REGRESSED'))} "
          f"regressed, "
          f"{sum(1 for r in rows if r[4].startswith('cleared'))} "
          f"cleared-by-isolation, "
          f"{sum(1 for r in rows if r[4].startswith('suspect'))} suspect "
          f"({n_susp} unresolved), {len(unadj)} unadjudicable")
    if n_susp and confirm is None:
        print(f"  NOTE: {n_susp} suspect (10-25%) movers lack a "
              "confirmation source - run a second same-HEAD window and "
              "pass it via --confirm, or add the queries to the solo "
              "watchlist, before treating this diff as final")
    for k, old, raw, nn, v in sorted(moved, key=lambda r: r[1] - r[3]):
        print(f"  {v:<9} {k:<28} {old:7.3f}s -> {nn:7.3f}s normalized "
              f"(raw {raw:.3f}s)")
    for k, why in unadj:
        print(f"  unadjudicable {k}: {why}")

    ta, tb = a.get("value"), b.get("value")
    if ta is not None and tb is not None:
        print(f"\ntotal: {ta:.3f}s -> {tb * norm:.3f}s normalized "
              f"(raw {tb:.3f}s)  {verdict(ta, tb * norm)}")
    if gate and unadj:
        print(f"GATE: FAIL — {len(unadj)} unadjudicable entries "
              "(catalogs differ: the pin does not cover the current "
              "catalog, or a query failed)")
        sys.exit(2)
    if gate:
        print(f"GATE: catalogs match ({len(rows)} entries adjudicated, "
              "0 unadjudicable)")
    sys.exit(1 if any(r[4].startswith("REGRESSED") for r in moved) else 0)


if __name__ == "__main__":
    main()
