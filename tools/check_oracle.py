#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet tables,
sorts columns by name and rows by value, and reports exact/approx
mismatches per query. Dev tooling only — not part of the library.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            s_cols = tbl.column_names
            s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, list(s_cols))
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if not all(cell_eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracle queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
