#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark's result), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares as (column-name-sorted, row-sorted) value multisets — a strict
superset of whatever normalization the driver applies.
"""
import sys, json, glob, math, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

fails = []
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT"))
        print(f"FAIL {name}: no spark output")
        continue
    got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
    got_cols = [d[0] for d in got.description]
    got_rows = got.fetchall()
    try:
        exp = con.execute(sql)
        exp_cols = [d[0] for d in exp.description]
        exp_rows = exp.fetchall()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        print(f"FAIL {name}: oracle sql error: {e}")
        continue
    if sorted(got_cols) != sorted(exp_cols):
        fails.append((name, f"schema: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"))
        print(f"FAIL {name}: schema mismatch\n  spark : {sorted(got_cols)}\n  oracle: {sorted(exp_cols)}")
        continue
    g, e = canon(got_cols, got_rows), canon(exp_cols, exp_rows)
    if len(g) != len(e):
        fails.append((name, f"rows: spark={len(g)} oracle={len(e)}"))
        print(f"FAIL {name}: row count spark={len(g)} oracle={len(e)}")
    elif g != e:
        diff = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
        fails.append((name, "values"))
        print(f"FAIL {name}: value mismatch at sorted-row {diff}\n  spark : {g[diff]}\n  oracle: {e[diff]}")
    else:
        print(f"ok   {name} ({len(g)} rows)")

nosql = [os.path.basename(d) for d in glob.glob(f"{out_dir}/q_*")
         if os.path.basename(d) not in oracle]
# mirror the driver's weaker rows-only check: output must be non-empty
for name in sorted(nosql):
    try:
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
    except Exception as e:
        n = -1
    if n <= 0:
        fails.append((name, f"rows-only output empty ({n})"))
        print(f"FAIL {name}: rows-only output empty ({n})")
print(f"\n{len(oracle) - len([f for f in fails if f[0] in oracle])}/{len(oracle)} "
      f"oracle-checked OK; rows-only (no oracle): {sorted(nosql)}")
sys.exit(1 if fails else 0)
