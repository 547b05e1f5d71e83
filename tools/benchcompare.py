#!/usr/bin/env python3
"""Grade a bench artifact against the frozen BASELINE.md floors.

Usage: python3 tools/benchcompare.py <BENCH_rNN.json | bench_stdout.json>

Regression rule (the r10/r11 triage thresholds, now mechanical):
  time > 1.5x floor AND time - floor > 0.4s.
New queries (no floor yet) are listed separately — stamp them into the
baseline with tools/benchbaseline.py once a clean run exists.
Exit code: 0 clean, 1 regressions found, 2 usage/parse error.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_floors():
    floors, notes = {}, {}
    path = os.path.join(ROOT, "BASELINE.md")
    for line in open(path):
        m = re.match(r"\|\s*(\S+)\s*\|\s*([0-9.]+)\s*\|\s*([^|]+)\|", line)
        if m and m.group(1) != "query":
            floors[m.group(1)] = float(m.group(2))
            src = m.group(3).strip()
            if src.startswith("pinned:"):
                notes[m.group(1)] = src[len("pinned:"):].strip()
    return floors, notes


def main(path):
    d = json.load(open(path))
    qs = d.get("queries") or (d.get("parsed") or {}).get("queries")
    if isinstance(qs, str):
        # r13: the driver stamps parsed.queries as a POINTER to the
        # detail artifact ({"runs": {long_name: [pass1, pass2, ...]}});
        # grade best-of-passes under the short (pre-underscore) key the
        # baseline uses. Accept a JSON-encoded object too.
        detail = os.path.join(ROOT, qs)
        if os.path.exists(detail):
            runs = json.load(open(detail)).get("runs") or {}
            qs = {name.split("_")[0]: min(ts) for name, ts in runs.items()
                  if isinstance(ts, list) and ts}
        else:
            try:
                qs = json.loads(qs)
            except ValueError:
                qs = None
    if not qs:
        print(f"ERROR: no queries in {path} (parsed=null?)")
        return 2
    floors, notes = load_floors()
    # HOST CALIBRATION (r12): floors were posted by the cleanest machine
    # in history; the current box may be uniformly slower (measured
    # 1.6-1.7x in round 12 — t9/t16 solo on an idle box sat at exactly
    # that multiple of their floors with unchanged code). The median
    # per-query ratio estimates that host factor robustly (a real
    # regression moves a few queries, not the median), and a regression
    # is then a query beating the CALIBRATED floor by the r10/r11
    # thresholds: t > 1.5 * (median_ratio * floor) AND the absolute
    # excess > 0.4s.
    ratios = sorted(t / floors[q] for q, t in qs.items()
                    if isinstance(t, (int, float)) and floors.get(q))
    host = ratios[len(ratios) // 2] if ratios else 1.0
    host = max(host, 1.0)  # a faster box never EXCUSES a slow query
    regressions, new, improved = [], [], []
    for q, t in sorted(qs.items()):
        if not isinstance(t, (int, float)):
            continue
        f = floors.get(q)
        if f is None:
            new.append((q, t))
        elif t > 1.5 * host * f and t - host * f > 0.4:
            regressions.append((q, t, f))
        elif t < f:
            improved.append((q, t, f))
    total = sum(t for t in qs.values() if isinstance(t, (int, float)))
    ftotal = sum(floors.get(q, 0.0) for q in qs)
    print(f"host factor (median t/floor): {host:.2f}x")
    print(f"total {total:.2f}s vs sum-of-floors {ftotal:.2f}s "
          f"({total / ftotal:.2f}x)" if ftotal else f"total {total:.2f}s")
    for q, t, f in regressions:
        print(f"REGRESSION {q}: {t:.2f}s vs calibrated floor "
              f"{host * f:.2f}s ({t / (host * f):.1f}x)")
    # adjudicated floors carry their root cause into every grading run
    for q in sorted(notes):
        if q in qs:
            print(f"note {q}: floor {floors[q]:.2f}s pinned — {notes[q]}")
    for q, t in new:
        print(f"NEW {q}: {t:.2f}s (no floor — stamp after a clean run)")
    if improved:
        print(f"{len(improved)} queries beat their floor (re-stamp: "
              "tools/benchbaseline.py <this file>)")
    if not regressions:
        print("== no regressions vs baseline ==")
    return 1 if regressions else 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
