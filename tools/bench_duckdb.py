#!/usr/bin/env python3
"""DuckDB proxy-baseline timings for the oracle query set.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [skip,list]

Times each oracle SQL over <sfDir>'s parquet tables with `SET threads
TO 1` (the single-node single-thread proxy BASELINE.md documents):
one warm-up execution, then the timed second run. A watchdog thread
interrupts any query running past --timeout (default 120 s) and
records it as timed out — the CC trio's recursive-CTE fixpoints are
known >900 s at sf0.1 and are normally passed in the skip list
instead of burning the budget.

Prints one JSON object: {"sf": dir, "timings": {q: sec | -1}, ...}.
"""
import sys, json, os, glob, threading, time
import duckdb

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
timeout = float(os.environ.get("DUCKDB_BENCH_TIMEOUT", "120"))

con = duckdb.connect()
con.execute("SET threads TO 1")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))
timings, skipped, timedout = {}, [], []
for name, sql in sorted(oracle.items()):
    if name in skip:
        skipped.append(name)
        continue
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout):
            con.interrupt()

    ok = True
    for attempt in range(2):  # warm-up, then the timed run
        w = threading.Thread(target=watchdog, daemon=True)
        done.clear()
        w.start()
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
            sec = time.monotonic() - t0
        except duckdb.InterruptException:
            timings[name] = -1.0
            timedout.append(name)
            ok = False
        except Exception as e:
            print(f"ERR {name}: {e}", file=sys.stderr)
            timings[name] = -2.0
            ok = False
        finally:
            done.set()
            w.join()
        if not ok:
            break
        timings[name] = round(sec, 3)
    if ok:
        print(f"ok   {name}: {timings[name]:.3f} s", file=sys.stderr)

total = sum(v for v in timings.values() if v >= 0)
print(json.dumps({"sf": sf_dir, "threads": 1, "timeout_sec": timeout,
                  "total_sec": round(total, 2), "timings": timings,
                  "skipped": skipped, "timed_out": timedout}))
