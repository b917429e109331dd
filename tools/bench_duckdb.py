#!/usr/bin/env python3
"""DuckDB proxy-baseline timings for the oracle query set.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> \
         [skip,list] [state.json]

Times each oracle SQL over <sfDir>'s parquet tables with `SET threads
TO 1` (the single-node single-thread proxy BASELINE.md documents):
one warm-up execution, then the timed second run. A watchdog thread
interrupts any query running past --timeout (default 120 s) and
records it as timed out — the CC trio's recursive-CTE fixpoints are
known >900 s at sf0.1 and are normally passed in the skip list
instead of burning the budget.

With a state.json path, each query's timing is flushed to it as soon
as it finishes and already-recorded queries are skipped on restart —
so a long sf1 sweep survives being run in bounded chunks. Without
one, state is in-memory only (the original one-shot mode).

Prints one JSON object: {"sf": dir, "timings": {q: sec | -1}, ...}.
"""
import sys, json, os, threading, time
import duckdb

sf_dir = sys.argv[1]
oracle_path = sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 and sys.argv[3] else set()
state_path = sys.argv[4] if len(sys.argv) > 4 else None
timeout = float(os.environ.get("DUCKDB_BENCH_TIMEOUT", "120"))

state = {"sf": sf_dir, "threads": 1, "timeout_sec": timeout,
         "timings": {}, "skipped": sorted(skip), "timed_out": []}
if state_path and os.path.exists(state_path):
    prior = json.load(open(state_path))
    if prior.get("sf") not in (None, sf_dir):
        sys.exit(f"state {state_path} is for sf={prior.get('sf')}, "
                 f"refusing to mix with {sf_dir}")
    # merge: keep prior successful/timed-out timings, but let the
    # CURRENT invocation's skip list, timeout and sf stand in the
    # record, and retry transient errors (-2.0) instead of skipping
    # them forever. Timed-out entries (-1.0) are also retried when the
    # current timeout EXCEEDS the one they were recorded under —
    # otherwise rerunning with a higher DUCKDB_BENCH_TIMEOUT could
    # never rescue them.
    prior_timeout = float(prior.get("timeout_sec", timeout))
    retry_timeouts = timeout > prior_timeout
    state["timings"] = {k: v for k, v in prior.get("timings", {}).items()
                        if v != -2.0 and not (v == -1.0 and retry_timeouts)}
    state["timed_out"] = [q for q in prior.get("timed_out", [])
                          if q in state["timings"]]

con = duckdb.connect()
con.execute("SET threads TO 1")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))


def flush():
    state["total_sec"] = round(
        sum(v for v in state["timings"].values() if v >= 0), 2)
    if state_path:
        tmp = state_path + ".tmp"
        json.dump(state, open(tmp, "w"), indent=1, sort_keys=True)
        os.replace(tmp, state_path)


for name, sql in sorted(oracle.items()):
    if name in skip or name in state["timings"]:
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
            state["timings"][name] = -1.0
            state["timed_out"].append(name)
            ok = False
        except Exception as e:
            print(f"ERR {name}: {e}", file=sys.stderr)
            state["timings"][name] = -2.0
            ok = False
        finally:
            done.set()
            w.join()
        if not ok:
            break
        state["timings"][name] = round(sec, 3)
    flush()
    if ok:
        print(f"ok   {name}: {state['timings'][name]:.3f} s",
              file=sys.stderr, flush=True)

flush()
print(json.dumps(state))
