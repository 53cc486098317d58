#!/usr/bin/env python3
"""Time the DuckDB oracle queries (the single-node comparison set).

Usage: python tools/oracle_bench.py <sfDir> <verifyOutDir> [--timeout SEC]

Runs each SQL in <verifyOutDir>/oracle_sql.json against the sf tables,
1 warmup + 3 timed runs (single run for queries whose warmup exceeds 5 s
— the recursive-CTE closures run minutes), reports per-query median
seconds and the total — the apples-to-apples single-node number the
bench JSON is compared with.

--timeout SEC interrupts any single query after SEC seconds of wall
time (duckdb.interrupt) and records it as -2.0: the structural-outlier
escape hatch (the q149-class oracles brute-force pair sets the
distributed plan answers via bucketed candidate joins — a 2026-08-14
attempt burned 68+ min of CPU on one query). Timed-out queries are
excluded from the total and listed separately. Dev-only tool; not part
of the library.
"""
import sys, os, json, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def timed_run(con, sql, timeout):
    """One execution under an interrupt timer. Returns (seconds, timed_out)."""
    timer = None
    if timeout > 0:
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        return time.time() - t0, False
    except duckdb.InterruptException:
        return time.time() - t0, True
    finally:
        if timer is not None:
            timer.cancel()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = 0.0
    if "--timeout" in sys.argv:
        timeout = float(sys.argv[sys.argv.index("--timeout") + 1])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            warm, out = timed_run(con, sql, timeout)
            if out:
                results[name] = -2.0
                print(f"TIMEOUT {name} after {warm:.0f}s", file=sys.stderr)
            elif warm > 5.0:
                results[name] = warm
            else:
                runs = []
                for _ in range(3):
                    r, out = timed_run(con, sql, timeout)
                    if out:
                        break
                    runs.append(r)
                results[name] = sorted(runs)[len(runs) // 2] if runs else -2.0
        except Exception as e:
            results[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
        print(f"... {name}: {results[name]:.3f}", file=sys.stderr)
    total = sum(v for v in results.values() if v >= 0)
    print(json.dumps({"metric": "oracle_total", "value": round(total, 4),
                      "unit": "sec", "queries":
                      {k: round(v, 4) for k, v in results.items()},
                      "timed_out": sorted(k for k, v in results.items()
                                          if v == -2.0),
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
