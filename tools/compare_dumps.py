#!/usr/bin/env python
"""Partition-independence audit: compare two Verify output dirs (e.g.
32-core vs 7-core runs) query by query — sorted rows, exact values.
Any diff means some operator's output depends on partitioning or
evaluation order, which would also break run-to-run reproducibility on
a real cluster."""
import sys, math, os, json
import duckdb

args = [x for x in sys.argv[1:]
        if not x.startswith("--expect") and x != "--allow-no-manifest"]
a = args[0] if len(args) > 0 else "/tmp/vout_full"
b = args[1] if len(args) > 1 else "/tmp/vout_cpus7"
# --expect=N: minimum catalog size this audit must cover — guards
# against accidentally auditing a SPARK_GRAFT_ONLY-filtered dump
# (whose oracle_sql.json is filtered too) and reading it as a pass
expect = 0
for x in sys.argv[1:]:
    if x.startswith("--expect="):
        expect = int(x.split("=", 1)[1])

con = duckdb.connect()
# Expected set = the FULL catalog, read from the oracle_sql.json the
# Verify run dumps (every catalog entry has an oracle twin), not just
# whatever directories happen to exist — a filtered run or an entry
# that failed to dump must FAIL the audit, not silently shrink it
# (VERDICT r12 #6: a late-round entry shipped with only a manual spot
# check because the audit enumerated the dump dir).
dumped = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
oracle = os.path.join(a, "oracle_sql.json")
expected = set(json.load(open(oracle))) if os.path.exists(oracle) else set()
if not expected:
    # A missing manifest is the exact silent-shrink failure mode this
    # audit exists to prevent (VERDICT r12 #6 / ADVICE r13): without it
    # the audit enumerates whatever directories happen to exist and a
    # filtered dump reads as a pass. Hard-fail unless explicitly opted
    # out (e.g. auditing a hand-built dir with no Verify manifest).
    if "--allow-no-manifest" not in sys.argv[1:]:
        print(f"FAIL {oracle} missing/empty — cannot establish the "
              "expected catalog set; pass --allow-no-manifest to audit "
              "dumped dirs only")
        sys.exit(1)
    print(f"WARN {oracle} missing/empty — auditing dumped dirs only "
          "(--allow-no-manifest)")
names = sorted(dumped | expected)
fails = []
for name in names:
    if name not in dumped:
        print(f"FAIL {name}: in the catalog but missing in {a}")
        fails.append(name); continue
    if not os.path.isdir(os.path.join(b, name)):
        print(f"FAIL {name}: missing in {b}"); fails.append(name); continue
    try:
        ra = con.sql(f"SELECT * FROM '{a}/{name}/*.parquet'")
        cols = ", ".join(sorted(ra.columns))
        xa = con.sql(f"SELECT {cols} FROM ra ORDER BY ALL").fetchall()
        rb = con.sql(f"SELECT * FROM '{b}/{name}/*.parquet'")
        xb = con.sql(f"SELECT {cols} FROM rb ORDER BY ALL").fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    if len(xa) != len(xb):
        print(f"FAIL {name}: rows {len(xa)} vs {len(xb)}")
        fails.append(name); continue
    bad = None
    for i, (p, q) in enumerate(zip(xa, xb)):
        for j, (x, y) in enumerate(zip(p, q)):
            same = (x == y) or (isinstance(x, float) and isinstance(y, float)
                                and math.isnan(x) and math.isnan(y))
            if not same:
                bad = (i, j, x, y); break
        if bad: break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: {bad[2]!r} vs {bad[3]!r}")
        fails.append(name)
    else:
        print(f"PASS {name}: {len(xa)} rows identical")
print(f"\n{len(names)-len(fails)}/{len(names)} queries partition-independent")
if expect and len(names) < expect:
    print(f"FAIL audited only {len(names)} entries but --expect={expect} "
          "(filtered dump?)")
    sys.exit(1)
sys.exit(1 if fails else 0)
