#!/usr/bin/env python
"""Local replica of the driver's t2 gate: run each oracle_sql.json entry
in DuckDB over the same parquet tables and compare to the Verify output
(sort columns by name, sort rows, exact value compare)."""
import sys, json, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        spark = con.sql(
            f"SELECT {', '.join(spark_cols)} FROM spark_rel ORDER BY ALL").fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}"); fails.append(name); continue
    try:
        duck_rel = con.sql(sql)
        duck_cols = sorted(duck_rel.columns)
        duck = con.sql(
            f"SELECT {', '.join(duck_cols)} FROM duck_rel ORDER BY ALL").fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails.append(name); continue
    if spark_cols != duck_cols:
        print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}"); fails.append(name); continue
    # the driver's hash is type-sensitive (e.g. HUGEINT vs BIGINT fails it
    # even when values match) -> compare declared types per sorted column.
    # Positional over the sorted (name, type) pairs — a dict keyed by name
    # would collapse duplicate column names and mask a mismatch there.
    spark_pairs = sorted(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
    duck_pairs = sorted(zip(duck_rel.columns, [str(t) for t in duck_rel.types]))
    tbad = [(sc, st, dt) for (sc, st), (dc, dt) in zip(spark_pairs, duck_pairs)
            if st != dt]
    if tbad:
        print(f"FAIL {name}: column types differ: {tbad}"); fails.append(name); continue
    if len(spark) != len(duck):
        print(f"FAIL {name}: rows {len(spark)} vs {len(duck)}"); fails.append(name); continue
    bad = None
    for i, (a, b) in enumerate(zip(spark, duck)):
        for j, (x, y) in enumerate(zip(a, b)):
            same = (x == y) or (isinstance(x, float) and isinstance(y, float)
                                and (math.isnan(x) and math.isnan(y)))
            if not same:
                bad = (i, spark_cols[j], x, y); break
        if bad: break
    if bad:
        print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
        fails.append(name)
    else:
        print(f"PASS {name}: {len(spark)} rows")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries pass")
sys.exit(1 if fails else 0)
