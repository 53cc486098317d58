#!/usr/bin/env python3
"""Time the DuckDB oracle queries (the single-node comparison set).

Usage: python tools/oracle_bench.py <sfDir> <verifyOutDir>

Runs each SQL in <verifyOutDir>/oracle_sql.json against the sf tables,
1 warmup + 3 timed runs (single run for queries whose warmup exceeds 5 s
— the recursive-CTE closures run minutes), reports per-query median
seconds and the total — the apples-to-apples single-node number the
bench JSON is compared with. Dev-only tool; not part of the library.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
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
            t0 = time.time()
            con.execute(sql).fetchall()  # warmup (doubles as the slow-path run)
            warm = time.time() - t0
            if warm > 5.0:
                results[name] = warm
            else:
                runs = []
                for _ in range(3):
                    t0 = time.time()
                    con.execute(sql).fetchall()
                    runs.append(time.time() - t0)
                results[name] = sorted(runs)[1]
        except Exception as e:
            results[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
    total = sum(v for v in results.values() if v >= 0)
    print(json.dumps({"metric": "oracle_total", "value": round(total, 4),
                      "unit": "sec", "queries":
                      {k: round(v, 4) for k, v in results.items()},
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
