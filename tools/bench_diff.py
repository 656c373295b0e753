#!/usr/bin/env python3
"""Flag per-query bench regressions against the last committed round
snapshot, so a laggard is caught in the local verify loop instead of by
the judge's sweep.

Usage: python3 tools/bench_diff.py [current] [baseline]
  current  : a Bench JSON file (default: target/bench.json)
  baseline : a BENCH_r*.json round snapshot (default: the newest
             BENCH_r*.json in the repo root by round number)

A query is flagged when current >= 1.5 x baseline AND the delta exceeds
0.3 s — the established floor-aware bar: sub-0.3 s swings on this box
are stage-floor/scheduling noise, and ratios alone would flag every
0.05 s -> 0.12 s jitter. Exits 1 when anything is flagged.

Caveats: compare medians of CLEAN runs (no concurrent sbt test; the box
shows +-0.5 s noise on 2 s queries under load), and only at matching
scale factors — the tool warns and exits 0 when the sf differs, since
cross-sf ratios are meaningless.
"""
import glob
import json
import os
import re
import sys

RATIO_BAR = 1.5
DELTA_BAR = 0.3


def load(path):
    """Return (queries: {name: sec}, sf: str|float|None, calib: float|None)."""
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and "medians" in d:
        # a graft.TimeMany steady-state snapshot used as `current`
        return d["medians"], d.get("sf"), d.get("calib_sec")
    if isinstance(d, dict) and "parsed" in d:
        # BENCH_r*.json driver snapshot: the parsed header may lack the
        # per-query dict; recover it from the raw tail fragment (a
        # truncated leading pair fails the ^"q pattern and is skipped)
        parsed = d.get("parsed") or {}
        qs = parsed.get("queries") or {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"(q\d+[a-z0-9_]*)":([0-9.eE+]+)',
                                 d.get("tail", ""))
        }
        return qs, parsed.get("sf"), parsed.get("calib_sec")
    return d.get("queries", {}), d.get("sf"), d.get("calib_sec")


def newest_snapshot():
    snaps = glob.glob("BENCH_r*.json")
    if not snaps:
        return None
    def round_no(p):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        return int(m.group(1)) if m else -1
    return max(snaps, key=round_no)


def timeone_overlay(sf):
    """(medians, calib) from the newest TIMEONE_r*.json at a matching sf.

    graft.TimeMany writes clean 3-pass steady-state medians; the in-bench
    per-query numbers in the 400+-query JVM read 2-4x above steady state,
    so where a query appears in both, the TIMEONE median is the better
    baseline."""
    snaps = glob.glob("TIMEONE_r*.json")
    if not snaps:
        return {}, None
    def round_no(p):
        m = re.search(r"TIMEONE_r(\d+)\.json", p)
        return int(m.group(1)) if m else -1
    with open(max(snaps, key=round_no)) as f:
        d = json.load(f)
    if d.get("sf") != sf:
        return {}, None
    return d.get("medians", {}), d.get("calib_sec")


def main():
    current = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    baseline = sys.argv[2] if len(sys.argv) > 2 else newest_snapshot()
    if baseline is None or not os.path.exists(current):
        print(f"bench_diff: missing {'baseline' if baseline is None else current}"
              " — nothing to compare")
        return 0
    cur, cur_sf, cur_cal = load(current)
    base, base_sf, base_cal = load(baseline)
    if cur_sf != base_sf:
        print(f"bench_diff: sf mismatch (current {cur_sf} vs baseline "
              f"{base_sf}) — cross-sf ratios are meaningless, skipping")
        return 0
    # host-speed normalization: when both runs carry the calib anchor,
    # scale the baseline into the current box's speed — rounds land on
    # boxes 2-3x apart and raw cross-round ratios flag phantom
    # regressions otherwise
    host = (cur_cal / base_cal) if cur_cal and base_cal else 1.0
    # steady-state overlay: ONLY when the current file is itself a
    # TimeMany snapshot — in-bench numbers read 2-4x above steady state
    # (JIT/codegen churn), so a steady baseline under an in-bench
    # current flags everything; like must compare with like
    cur_is_steady = False
    with open(current) as f:
        cur_is_steady = "medians" in json.load(f)
    t1, t1_cal = timeone_overlay(cur_sf) if cur_is_steady else ({}, None)
    t1_host = (cur_cal / t1_cal) if cur_cal and t1_cal else 1.0
    if cur_is_steady:
        # a steady-state current compares ONLY against steady TIMEONE
        # baselines: in-bench baselines read 2-4x above steady state, so
        # diffing a steady median against them structurally masks
        # regressions in the uncovered queries — report those as not
        # comparable instead of silently passing them
        shared = sorted(set(cur) & set(t1))
        uncovered = sorted(set(cur) - set(t1))
        if uncovered:
            print(f"bench_diff: {len(uncovered)} steady-state queries have"
                  f" no TIMEONE baseline — not comparable (in-bench"
                  f" baselines read 2-4x high): {', '.join(uncovered[:10])}"
                  + (" ..." if len(uncovered) > 10 else ""))
    else:
        shared = sorted(set(cur) & set(base))
    flagged = []
    n_overlay = 0
    for q in shared:
        if q in t1:
            b = t1[q] * t1_host
            n_overlay += 1
        else:
            b = base[q] * host
        c = cur[q]
        if c >= RATIO_BAR * b and c - b > DELTA_BAR:
            flagged.append((q, b, c))
    print(f"bench_diff: {len(shared)} shared queries vs {baseline}"
          f" (bar: >= {RATIO_BAR}x AND > {DELTA_BAR}s slower"
          + (f"; host-normalized x{host:.2f}" if host != 1.0 else "")
          + (f"; {n_overlay} baselines from TIMEONE" if n_overlay else "")
          + ")")
    for q, b, c in sorted(flagged, key=lambda t: t[1] - t[2]):
        print(f"  REGRESSED {q}: {b:.2f}s -> {c:.2f}s ({c / b:.1f}x)")
    if not flagged:
        print("  no regressions")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
