#!/usr/bin/env python3
"""Per-entry Verify wall-time budget gate (VERDICT r9 #7).

Compares a Verify run's $outdir/timings.json against the recorded
sf0.1 budgets (tools/budgets_sf01.json) and fails when any entry
exceeds 2x its budget AND 1.0 s absolute (sub-second entries jitter
with JIT/GC; a regression that matters at 100 TB shows up above the
floor). New entries without a recorded budget are reported, not
failed — record them at the next refresh.

Recording policy (ADVICE r11): --record MERGES with the existing
budgets, keeping the MINIMUM of old and new per entry — a single
noisy run can therefore only tighten the gate, never loosen it (the
r11 wholesale overwrite loosened 43 budgets >15% from one run).
Names absent from the old file record at 1.3x their first observed
wall (ADVICE r12: a noisy-LOW first run would otherwise pin a
too-tight budget permanently); later quiet runs tighten it.
Entries an intentional change made slower must be loosened
explicitly: --loosen name1,name2 takes the current run's value for
those names even when higher. Entries in the recorded file but absent
from this run (filtered runs) keep their old budgets.

Usage:
  tools/check_budgets.py <outdir>                         # gate
  tools/check_budgets.py <outdir> --record                # tighten-only refresh
  tools/check_budgets.py <outdir> --record --loosen a,b   # + explicit loosens
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

if "--loosen" in sys.argv[2:] and "--record" not in sys.argv[2:]:
    print("--loosen only applies with --record (the gate itself never "
          "loosens); re-run with --record --loosen <names>")
    sys.exit(2)

if "--record" in sys.argv[2:]:
    loosen = set()
    argv = sys.argv[2:]
    if "--loosen" in argv:
        i = argv.index("--loosen")
        if i + 1 >= len(argv):
            print("--loosen requires a comma-separated name list")
            sys.exit(2)
        loosen = {n.strip() for n in argv[i + 1].split(",") if n.strip()}
    old = json.load(open(BUDGETS)) if os.path.exists(BUDGETS) else {}
    merged = dict(old)
    tightened, loosened, added = [], [], []
    for name, sec in timings.items():
        if name not in old:
            # first-run headroom (ADVICE r12): under the tighten-only
            # merge a noisy-LOW first run would otherwise pin a
            # too-tight budget forever (recovery needs manual
            # --loosen); later quiet runs tighten it back down.
            merged[name] = round(sec * 1.3, 6)
            added.append(name)
        elif name in loosen:
            if sec > old[name]:
                loosened.append((name, old[name], sec))
            merged[name] = sec
        elif sec < old[name]:
            merged[name] = sec
            tightened.append(name)
        # else: keep the old (tighter) budget
    unknown = loosen - set(timings)
    if unknown:
        print(f"WARN --loosen names not in this run: {sorted(unknown)}")
    with open(BUDGETS, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    for name, a, b in loosened:
        print(f"LOOSENED {name}: {a:.2f} -> {b:.2f} s (explicit)")
    print(f"recorded {len(merged)} budgets -> {BUDGETS} "
          f"({len(tightened)} tightened, {len(loosened)} loosened, "
          f"{len(added)} new, "
          f"{len(merged) - len(tightened) - len(loosened) - len(added)} kept)")
    sys.exit(0)

if not os.path.exists(BUDGETS):
    print(f"NOTE no budgets recorded yet ({BUDGETS}) — run with --record")
    sys.exit(0)
budgets = json.load(open(BUDGETS))

# Run-local ambient annotation (round 14): Verify writes probes.json
# (CPU + disk probe samples before the loop, every 20 entries, and at
# the end). Each FAIL is annotated with the max bracketing-CPU-probe
# ratio vs ref — a flag whose local ambient is ~1x is a real
# regression signal; one inside a measured 2-3x burst window is the
# ambient class the r14 full run produced (10 flags, all tracking the
# probe, none the entry). Annotation only: the gate still fails, the
# adjudication evidence just lives IN the artifact now.
def local_ambient(idx):
    """(cpu_factor, disk_factor) from the samples bracketing entry idx,
    or None when probes.json is absent/unusable."""
    if not probe_samples:
        return None
    lo = max((s for s in probe_samples if s["after"] <= idx),
             key=lambda s: s["after"], default=probe_samples[0])
    hi = min((s for s in probe_samples if s["after"] > idx),
             key=lambda s: s["after"], default=probe_samples[-1])
    return (max(lo["cpu"], hi["cpu"]) / probe_ref,
            max(lo["disk"], hi["disk"]) / disk_ref)

probe_samples, probe_ref, disk_ref = [], 0.55, 0.05
ppath = os.path.join(outdir, "probes.json")
if os.path.exists(ppath):
    try:
        pj = json.load(open(ppath))
        probe_samples = pj.get("samples", [])
        probe_ref = pj.get("probe_ref", probe_ref)
        disk_ref = pj.get("disk_ref", disk_ref)
    except (ValueError, KeyError) as e:
        print(f"WARN unreadable probes.json ({e}) — flags unannotated")
if probe_samples:
    cpus = [s["cpu"] for s in probe_samples]
    print(f"probes: cpu {min(cpus):.2f}-{max(cpus):.2f} s "
          f"({min(cpus)/probe_ref:.1f}-{max(cpus)/probe_ref:.1f}x ref), "
          f"{len(probe_samples)} samples")

order = {name: i for i, name in enumerate(timings)}  # catalog run order
fails, unbudgeted = [], []
for name, sec in sorted(timings.items()):
    b = budgets.get(name)
    if b is None:
        unbudgeted.append(name)
        continue
    if sec > 2 * b and sec > 1.0:
        fails.append((name, sec, b))
        amb = local_ambient(order[name])
        note = (f" (local ambient: cpu {amb[0]:.1f}x, disk {amb[1]:.1f}x)"
                if amb else "")
        print(f"FAIL {name}: {sec:.2f} s > 2x budget {b:.2f} s{note}")
for name in unbudgeted:
    print(f"NOTE {name}: no recorded budget ({timings[name]:.2f} s) — "
          "refresh with --record")
missing = sorted(set(budgets) - set(timings))
if missing:
    print(f"NOTE budgets without timings (filtered run?): {missing}")
print(f"{len(timings) - len(fails)}/{len(timings)} entries within budget")
sys.exit(1 if fails else 0)
