#!/usr/bin/env python3
"""Freeze the per-query bench baseline (r11 verdict item 4).

The "within 2x of BASELINE" bar never had a pinned denominator, so every
round re-litigated machine contention (r9's false regressions, r10's s5,
r11's q24/t20). This stamps BASELINE.md with the MIN-OF-HISTORY per query
across every parsed driver artifact (BENCH_r*.json) plus any extra clean
local runs passed as arguments — the cleanest number each query has ever
posted, which is the honest floor a regression must be measured against
(a min is contention-immune: load only ever inflates times).

Usage:
  python3 tools/benchbaseline.py [extra_bench.json ...] > /dev/null
Rewrites BASELINE.md in place. Extra files are raw Bench stdout JSON
({"metric":..., "queries": {...}}) from clean-machine runs.
"""
import json
import glob
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds():
    out = []
    for f in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        d = json.load(open(f))
        p = d.get("parsed")
        if p and p.get("queries"):
            out.append((os.path.basename(f).replace("BENCH_", "").replace(".json", ""),
                        p["queries"]))
    return out


def main(extra):
    rounds = load_rounds()
    for f in extra:
        d = json.load(open(f))
        qs = d.get("queries") or (d.get("parsed") or {}).get("queries")
        if qs:
            rounds.append((os.path.basename(f), qs))
    best = {}
    for tag, qs in rounds:
        for q, t in qs.items():
            # r06's artifact carries a few NEGATIVE per-query values (a
            # driver-side parse defect that round) — a floor must be a
            # real elapsed time, so non-positive entries are discarded
            if not isinstance(t, (int, float)) or t <= 0:
                continue
            if q not in best or t < best[q][0]:
                best[q] = (float(t), tag)
    lines = [
        "# BASELINE — frozen per-query bench floor (sf0.1, local[32])",
        "",
        "Min-of-history per query across every parsed driver bench artifact",
        "(BENCH_r03..latest) plus stamped clean local runs. A min is",
        "contention-immune: machine load only ever inflates a time, so the",
        "floor is the cleanest number the query has actually posted.",
        "Grade a new round with `python3 tools/benchcompare.py BENCH_rNN.json`:",
        "a regression is >1.5x over floor AND >0.4s absolute (the r10/r11",
        "triage thresholds); anything else is contention noise by the",
        "interleaved-pass protocol's own history.",
        "",
        f"Queries: {len(best)}. Sources: " +
        ", ".join(sorted(set(tag for _, tag in best.values()))) + ".",
        "",
        "| query | floor_sec | source |",
        "|---|---|---|",
    ]
    for q in sorted(best):
        t, tag = best[q]
        lines.append(f"| {q} | {t:.3f} | {tag} |")
    total = sum(t for t, _ in best.values())
    lines.append("")
    lines.append(f"Sum of floors: {total:.2f} s (an idealized no-contention "
                 "total — real interleaved-pass totals sit above it).")
    lines.append("")
    lines.append("## Root-cause notes (r13, verdict item 1)")
    lines.append("")
    lines.append("The four in-query TRAINING entries (s4/s6/s8 k-means+PQ,")
    lines.append("t17 BPE merges) are round-structured: ~10 sequential")
    lines.append("driver-synchronized stages whose cost at sf0.1 is stage")
    lines.append("LATENCY, not data. Measured r13 on an idle box (SoloTime,")
    lines.append("bench spelling, 8-10 warm runs): s8 asymptote 2.86s vs")
    lines.append("floor 2.1, s4 2.1 vs 1.4, s6 2.0 vs 1.5, t17 2.4 vs 1.4 —")
    lines.append("the floors are lucky full-bench-warm minima, real but not")
    lines.append("repeatable solo. Two hypotheses were MEASURED AND")
    lines.append("EXCLUDED for s8: the corpus-aware 0.15-n refine pool")
    lines.append("(pinned back to fixed 200: 3.2-4.1s, identical) and the")
    lines.append("recompute shape (VectorSumCount single-aggregate: -0.1s at")
    lines.append("this SF; its win is shuffle VOLUME at scale). Driver-bench")
    lines.append("excursions above ~3s on these four are load on the")
    lines.append("sequential-round critical path — the class median")
    lines.append("host-factor calibration cannot see. The production answer")
    lines.append("stays s9 (read path, 0.5s floor, zero training rounds).")
    lines.append("")
    lines.append("d3 (r13 mid-round): the floor (2.66, r04) predates the")
    lines.append("auto-selection stats pass the spelling gained in r12 and")
    lines.append("the eager cache-release materialization from the r12")
    lines.append("advice; two mechanical costs of that change (orderBy's")
    lines.append("range-sampling re-execution, localCheckpoint's non-AQE")
    lines.append(".rdd plan losing the broadcast) were measured and fixed")
    lines.append("r13 (persist+count, checkpoint-from-cache, sort last —")
    lines.append("4.9s back to ~3.3s clean). The remaining delta vs 2.66 is")
    lines.append("the stats pass: a feature, not a regression.")
    lines.append("")
    lines.append("x3 (r13): the 0.20s floor is a bench_r12_clean artifact —")
    lines.append("every DRIVER bench in history posted 1.0-1.7s and r13's")
    lines.append("idle-box solo sits at 0.6-0.9s with unchanged code; treat")
    lines.append("excursions to ~0.7s as floor-artifact noise, not drift.")
    lines.append("")
    out = "\n".join(lines) + "\n"
    open(os.path.join(ROOT, "BASELINE.md"), "w").write(out)
    print(f"BASELINE.md: {len(best)} queries, sum of floors {total:.2f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
