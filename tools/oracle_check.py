#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle gate.

Usage: python tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sf tables,
sorts columns by name + rows by all columns, and compares exactly (with a
tiny float tolerance reported separately so we can spot risky queries).
Dev-only tool; not part of the shipped library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if list(got.columns) != list(want.columns):
            ok = False
            msgs.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af = a.astype(float).to_numpy()
                    bf = b.astype(float).to_numpy()
                    exact = np.array_equal(af, bf, equal_nan=True)
                    close = np.allclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
                    if not close:
                        ok = False
                        i = int(np.argmax(~np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)))
                        msgs.append(f"col {c} differs at row {i}: {af[i]} vs {bf[i]}")
                    elif not exact:
                        msgs.append(f"col {c}: float-close but NOT bit-exact (risky)")
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        neq = a.astype(str) != b.astype(str)
                        i = int(np.argmax(neq.to_numpy()))
                        ok = False
                        msgs.append(f"col {c} differs at row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        status = "PASS" if ok else "FAIL"
        n_pass += ok
        n_fail += (not ok)
        extra = ("  [" + "; ".join(msgs) + "]") if msgs else ""
        print(f"{status} {name} ({len(got)} rows){extra}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
