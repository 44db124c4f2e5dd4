#!/usr/bin/env python
"""Partition-independence audit: compare two Verify output dirs (e.g.
32-core vs 7-core runs) query by query — sorted rows, exact values.
Any diff means some operator's output depends on partitioning or
evaluation order, which would also break run-to-run reproducibility on
a real cluster."""
import sys, math, os
import duckdb

a = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout_full"
b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout_cpus7"

con = duckdb.connect()
names = sorted(d for d in os.listdir(a)
               if os.path.isdir(os.path.join(a, d)))
fails = []
for name in names:
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
sys.exit(1 if fails else 0)
