#!/usr/bin/env python3
"""Mechanical SURVEY.md §2 stamp counts (r12 verdict item 7: hand counts
drifted twice; stamps must be generated).

Usage: python3 tools/stampcounts.py [SURVEY.md] [sbt_test_log]
Prints per-family row/[x]/[~] counts and the totals line to paste into
the closing stamp. If a saved `sbt test` log is passed, also prints the
SUITE line parsed from that run's own "Tests: succeeded N" summaries
(r13 verdict item 8: a stamp's suite count must come from the run it
cites, never a hand count).
"""
import re
import sys
from collections import OrderedDict

path = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"
rows = OrderedDict()
in_s2 = False
for line in open(path, encoding="utf-8"):
    if line.startswith("## "):
        in_s2 = line.startswith("## §2")
        continue
    if not in_s2:
        continue
    m = re.match(r"\|\s*([A-Z])(\d+[a-z]?)\s*\|", line)
    if not m:
        continue
    fam, rid = m.group(1), m.group(2)
    status = "done" if "[x]" in line else ("partial" if "[~]" in line else "planned")
    key = (fam, rid)
    if key in rows:
        print(f"DUPLICATE row id {fam}{rid}", file=sys.stderr)
    rows[key] = status

fams = OrderedDict()
for (fam, _), st in rows.items():
    fams.setdefault(fam, {"rows": 0, "done": 0, "partial": 0, "planned": 0})
    fams[fam]["rows"] += 1
    fams[fam][st] += 1

total = sum(f["rows"] for f in fams.values())
done = sum(f["done"] for f in fams.values())
partial = sum(f["partial"] for f in fams.values())
for fam, c in fams.items():
    print(f"{fam}: {c['done']}/{c['rows']} done"
          + (f", {c['partial']} partial" if c["partial"] else "")
          + (f", {c['planned']} planned" if c["planned"] else ""))
print(f"TOTAL: {done}/{total} done, {partial} partial, "
      f"{total - done - partial} planned")

if len(sys.argv) > 2:
    # suite count from the cited sbt test log: sum every per-suite
    # "Tests: succeeded N, failed M, ..." line
    succ = fail = 0
    for line in open(sys.argv[2], encoding="utf-8", errors="replace"):
        m = re.search(r"Tests: succeeded (\d+), failed (\d+)", line)
        if m:
            succ += int(m.group(1))
            fail += int(m.group(2))
    print(f"SUITE (from {sys.argv[2]}): {succ}/{succ + fail} green"
          + ("" if fail == 0 else f" — {fail} FAILED"))
