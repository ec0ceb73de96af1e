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


def canon(tbl):
    """Arrow table → (sorted column names, row-sorted list of tuples).
    Null is None on both engines through Arrow (pandas would smear NaN)."""
    cols = sorted(tbl.column_names)
    rows = list(zip(*[tbl.column(c).to_pylist() for c in cols]))
    key = lambda r: tuple((v is None, str(v)) for v in r)
    return cols, sorted(rows, key=key)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        (gc, gr), (wc, wr) = canon(got), canon(want)
        if gc != wc:
            print(f"FAIL {name}: columns differ: spark={gc} oracle={wc}")
            failures += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: row counts differ: spark={len(gr)} oracle={len(wr)}")
            failures += 1
            continue
        mismatch = None
        for i, (ra, rb) in enumerate(zip(gr, wr)):
            for c, a, b in zip(gc, ra, rb):
                if a is None and b is None:
                    continue
                if a != b and str(a) != str(b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(gr)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
