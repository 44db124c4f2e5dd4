#!/usr/bin/env python3
"""Per-entry Verify wall-time budget gate (VERDICT r9 #7).

Compares a Verify run's $outdir/timings.json against the recorded
sf0.1 budgets (tools/budgets_sf01.json — refresh with
--record after an intentional perf change) and fails when any entry
exceeds 2x its budget AND 1.0 s absolute (sub-second entries jitter
with JIT/GC; a regression that matters at 100 TB shows up above the
floor). New entries without a recorded budget are reported, not
failed — record them at the next refresh.

Usage:
  tools/check_budgets.py <outdir>            # gate
  tools/check_budgets.py <outdir> --record   # overwrite budgets
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BUDGETS = os.path.join(HERE, "budgets_sf01.json")

if len(sys.argv) < 2:
    print(__doc__)
    sys.exit(2)
outdir = sys.argv[1]
timings = json.load(open(os.path.join(outdir, "timings.json")))

if "--record" in sys.argv[2:]:
    with open(BUDGETS, "w") as f:
        json.dump(timings, f, indent=1, sort_keys=True)
    print(f"recorded {len(timings)} budgets -> {BUDGETS}")
    sys.exit(0)

if not os.path.exists(BUDGETS):
    print(f"NOTE no budgets recorded yet ({BUDGETS}) — run with --record")
    sys.exit(0)
budgets = json.load(open(BUDGETS))
fails, unbudgeted = [], []
for name, sec in sorted(timings.items()):
    b = budgets.get(name)
    if b is None:
        unbudgeted.append(name)
        continue
    if sec > 2 * b and sec > 1.0:
        fails.append((name, sec, b))
        print(f"FAIL {name}: {sec:.2f} s > 2x budget {b:.2f} s")
for name in unbudgeted:
    print(f"NOTE {name}: no recorded budget ({timings[name]:.2f} s) — "
          "refresh with --record")
missing = sorted(set(budgets) - set(timings))
if missing:
    print(f"NOTE budgets without timings (filtered run?): {missing}")
print(f"{len(timings) - len(fails)}/{len(timings)} entries within budget")
sys.exit(1 if fails else 0)
