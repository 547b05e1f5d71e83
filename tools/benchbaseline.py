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

# Adjudicated floors (r13 verdict item 2, stamped r14): for these entries
# the raw min-of-history is a NON-REPEATABLE artifact (a lucky
# full-bench-warm minimum or a single clean-run fluke), root-caused in
# the notes section below. The pinned value replaces the historical min
# so benchcompare grades against a floor the query can actually repost
# on an idle box; benchcompare attaches the reason to its output.
PINNED = {
    # r16 optimization round: the s4/s6/s8/t17 pins (in-query training /
    # BPE rounds as the r13 solo asymptote) are REMOVED — the training
    # loops were restructured (map-side NearestCentroidId assignment,
    # one job per Lloyd round; t17's auto-selected local merge loop), so
    # the old asymptotes no longer bind and the new minima are
    # repostable (measured on a 1.33x-host box: s8 2.44, s4 1.00,
    # s6 1.87, t17 0.20 — min-of-3 full-bench passes).
    "s6": (1.4, "r16 map-side-encode asymptote: min-of-3 full-bench "
                "passes posts 1.87s on a 1.33x-host box (~1.4 "
                "normalized); the raw 0.99 min-of-history is the same "
                "pre-r13 full-bench-warm fluke the old 2.0 pin "
                "adjudicated, not repostable even after the r16 rewrite"),
    "d4": (1.2, "every driver bench r11-r13 posted ~1.2s; the 0.8 floor "
                "was a single bench_r12_clean artifact"),
    "x3": (0.6, "driver benches post 1.0-1.7s, r13 idle solo 0.6-0.9s; "
                "the 0.2 floor was a bench_r12_clean artifact"),
}


def decode_queries(qs):
    # r13+: the driver stamps parsed.queries as a POINTER to the detail
    # artifact ({"runs": {long_name: [pass1, ...]}}); fold to
    # best-of-passes under the short (pre-underscore) baseline key.
    # Accept a JSON-encoded object string too.
    if isinstance(qs, str):
        detail = os.path.join(ROOT, qs)
        if os.path.exists(detail):
            runs = json.load(open(detail)).get("runs") or {}
            return {name.split("_")[0]: min(ts) for name, ts in runs.items()
                    if isinstance(ts, list) and ts} or None
        try:
            qs = json.loads(qs)
        except ValueError:
            return None
    return qs if isinstance(qs, dict) else None


def load_rounds():
    out = []
    for f in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        d = json.load(open(f))
        qs = (d.get("parsed") or {}).get("queries")
        # POINTER-typed queries ("BENCH_DETAIL.json") must NOT resolve
        # here: the pointed-at file is whatever the LATEST bench wrote,
        # not that round's numbers — resolving it would stamp today's
        # times under a historical tag (observed r15: "q65 source r13").
        # Pointer rounds contribute via their stamped tools/bench_rNN_*
        # extras instead.
        if isinstance(qs, str):
            continue
        qs = decode_queries(qs)
        if qs:
            out.append((os.path.basename(f).replace("BENCH_", "").replace(".json", ""),
                        qs))
    return out


def main(extra):
    rounds = load_rounds()
    for f in extra:
        d = json.load(open(f))
        raw = d.get("queries") or (d.get("parsed") or {}).get("queries")
        # POINTER-typed extras are the same stale-provenance hazard as
        # pointer-typed driver rounds (observed r16b: four r15_run files
        # resolved to TODAY'S BENCH_DETAIL and stamped current times
        # under an r15 tag) — a stamped extra must carry its own numbers.
        if isinstance(raw, str) and os.path.exists(os.path.join(ROOT, raw)):
            print(f"SKIP pointer-typed extra {f}: materialize the detail "
                  f"into the file before stamping", file=sys.stderr)
            continue
        qs = decode_queries(raw)
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
    for q, (v, why) in PINNED.items():
        if q in best:
            best[q] = (v, f"pinned: {why}")
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
        ", ".join(sorted(set(tag for _, tag in best.values()
                             if not tag.startswith("pinned:")))) +
        f"; {sum(1 for _, t in best.values() if t.startswith('pinned:'))}"
        " adjudicated pins (see source column).",
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
    lines.append("## Root-cause notes (r13 measurements; adjudicated r14)")
    lines.append("")
    lines.append("As of r14 the six adjudicated entries (s4/s6/s8/t17/d4/x3)")
    lines.append("carry PINNED floors in the table above — the measured solo")
    lines.append("asymptotes / repeatable driver-bench numbers below — so")
    lines.append("benchcompare grades them mechanically, no manual triage.")
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
