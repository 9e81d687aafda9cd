#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet tables,
and compares them two ways:

1. semantic  — fetchall/pylist cells, float-aware equality (catches real
   value divergence);
2. driver    — the gate's own shape: both sides through pandas
   (DuckDB .df() turns DECIMAL/HUGEINT into float64!), columns sorted by
   name, rows sorted, every cell str()-ed.  '52037' vs '52037.0' or
   '1.80' vs '1.8' is a FAIL here even though the values are equal.

It also audits output schemas for latent formatting bombs: any decimal
column in a Spark result, or a dtype mismatch between the two pandas
frames, fails even if today's strings happen to agree.  Output columns
must be pandas-stable: string / int64 / float64 / bool / datetime only.

Dev tooling only — not part of the library.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def pandas_strs(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(x) for x in r) for r in df.itertuples(index=False))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        errs = []
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
            d_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        # schema audit: decimals never survive the driver's pandas round-trip
        for f in tbl.schema:
            if "decimal" in str(f.type):
                errs.append(f"spark output column {f.name} is {f.type} — "
                            "decimal outputs are banned (cast to double)")

        # 1. semantic compare
        s_cols = tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
        sc, sr = canon(s_rows, list(s_cols))
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            errs.append(f"columns spark={sc} duck={dc}")
        elif len(sr) != len(dr):
            errs.append(f"rows spark={len(sr)} duck={len(dr)}")
        else:
            for i, (a, b) in enumerate(zip(sr, dr)):
                if not all(cell_eq(x, y) for x, y in zip(a, b)):
                    errs.append(f"semantic row {i}: spark={a} duck={b}")
                    break

        # 2. driver-style pandas/str compare + dtype audit
        if not errs:
            s_df = tbl.to_pandas()
            # compare dtype KIND only: int32-vs-int64 and datetime64[ns]-vs-
            # [us] str() the same, but int-vs-float ('5' vs '5.0') and
            # object-vs-float (Decimal trailing zeros) are gate failures
            sd = {c: s_df[c].dtype.kind for c in sorted(s_df.columns)}
            dd = {c: d_df[c].dtype.kind for c in sorted(d_df.columns)}
            if sd != dd:
                errs.append(f"dtype-kind mismatch spark={sd} duck={dd}")
            sh, dh = pandas_strs(s_df), pandas_strs(d_df)
            for i, (a, b) in enumerate(zip(sh, dh)):
                if a != b:
                    errs.append(f"driver-str row {i}: spark={a} duck={b}")
                    break

        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracle queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
