#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against views named after
the <sfDir> parquet tables, then compares: columns sorted by name, rows
sorted, values compared cell-by-cell.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns differ: spark={list(g.columns)} oracle={list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: row counts differ: spark={len(g)} oracle={len(w)}")
            failures += 1
            continue
        mismatch = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if a != b and not (a is None and b is None) and str(a) != str(b):
                    # NaN-safe
                    if a != a and b != b:
                        continue
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
