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

Cost guardrail (the q103/q140/q151/q163 incident class): every oracle query
runs under a wall-clock budget (--timeout, default 120s) and the DuckDB
connection gets a temp-disk + memory ceiling, so a multiply-referenced CTE
that would fill the temp disk during an sf1 sweep dies with a named
TIMEOUT/RESOURCE line instead of hanging the sweep.  The summary names every
budget-killed query so the fix (usually `AS MATERIALIZED`) happens during
development, not after a blown sweep.

Lane-guarded queries (the exact-int64 families: q145/q151/q157 via
Gram.covExactSafe, q195/q196/q197 via exactDistSafe, q198's checked norm
bound — see graft.functions.IntegerBounds for the full table): the DuckDB
twins always compute the exact-BIGINT lane, so ORACLE COMPARABILITY IS
DEFINED ONLY BELOW EACH GUARD'S BOUND.  Past it, Spark swaps to its
double/msd lane (exact keys NULL) while DuckDB's ANSI arithmetic errors —
the engines diverge BY DESIGN and a compare would be meaningless.  Every
driver fixture SF sits orders of magnitude below every bound (asserted by
the in-repo boundary specs), so this exclusion is a statement of contract,
not a skipped check.

Dev tooling only — not part of the library.
"""
import argparse
import json
import math
import sys
import threading
import time

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Resource ceilings for the oracle connection.  The driver's gate box has
# 128 GiB RAM; a healthy oracle query at sf1 needs far less than these, so
# hitting either ceiling is a query-shape bug (usually a re-executed CTE),
# never legitimate load.
TEMP_DISK_BUDGET = "24GB"
MEMORY_BUDGET = "32GB"


class QueryTimeout(Exception):
    pass


def connect(sf_dir):
    con = duckdb.connect()
    try:
        con.execute(f"SET max_temp_directory_size='{TEMP_DISK_BUDGET}'")
        con.execute(f"SET memory_limit='{MEMORY_BUDGET}'")
    except duckdb.Error as e:
        print(f"WARN: resource ceilings unsupported by this duckdb: {e}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _one_budgeted(con, fn, timeout_s):
    """Run fn() (one DuckDB execution) under its own wall-clock budget.

    A watchdog thread calls con.interrupt() at the deadline; the interrupted
    execute raises duckdb.InterruptException in the caller's thread.  The
    connection stays usable after an interrupt (DuckDB guarantees this), so
    the sweep continues with the next query.
    """
    fired = threading.Event()

    def watchdog():
        if not fired.wait(timeout_s):
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return fn()
    except duckdb.InterruptException:
        raise QueryTimeout(f"exceeded {timeout_s}s wall-clock budget")
    finally:
        fired.set()
        t.join()


def run_budgeted(con, sql, timeout_s):
    """Execute sql (twice — once for native-typed rows, once for the pandas
    frame; the dual representation is what catches pandas type-mangling)
    with the wall-clock budget applied PER EXECUTION.  One shared budget
    silently halved every oracle's allowance: a ~63s-per-run query (q163 at
    sf1) would pass the documented 120s budget yet die at 2x63s — the
    budget exists to catch runaway re-executed CTEs, which blow up a
    SINGLE execution, not to tax the checker's own double fetch.
    """
    t0 = time.monotonic()

    def first():
        res = con.execute(sql)
        cols = [c[0] for c in res.description]
        return cols, res.fetchall()

    cols, rows = _one_budgeted(con, first, timeout_s)
    df = _one_budgeted(con, lambda: con.execute(sql).df(), timeout_s)
    return cols, rows, df, time.monotonic() - t0


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


def main(sf_dir, out_dir, timeout_s=120.0):
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    budget_kills = []
    for name, sql in sorted(oracle.items()):
        errs = []
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            d_cols, d_rows, d_df, elapsed = run_budgeted(con, sql, timeout_s)
            # elapsed spans BOTH executions; the budget applies to each.
            # Warn when either execution averaged past half its budget.
            if elapsed > timeout_s:
                print(f"SLOW {name}: {elapsed:.1f}s across 2 runs "
                      f"(budget {timeout_s:.0f}s per run) — "
                      "candidate for AS MATERIALIZED / restructure")
        except QueryTimeout as e:
            print(f"TIMEOUT {name}: {e} — likely a re-executed multi-referenced "
                  "CTE; pin it AS MATERIALIZED")
            budget_kills.append((name, "TIMEOUT"))
            n_fail += 1
            continue
        except duckdb.OutOfMemoryException as e:
            print(f"RESOURCE {name}: memory budget {MEMORY_BUDGET} breached: {e}")
            budget_kills.append((name, "MEMORY"))
            n_fail += 1
            continue
        except duckdb.Error as e:
            msg = str(e)
            if "temp_directory" in msg or "temporary directory" in msg.lower():
                print(f"RESOURCE {name}: temp-disk budget {TEMP_DISK_BUDGET} "
                      f"breached: {msg}")
                budget_kills.append((name, "TEMP_DISK"))
            else:
                print(f"FAIL {name}: duckdb error: {msg}")
            n_fail += 1
            continue
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
    if budget_kills:
        print("BUDGET-KILLED (fix before the next sweep): "
              + ", ".join(f"{n}[{kind}]" for n, kind in budget_kills))
    return 1 if n_fail else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=float, default=120.0,
                    help="per-query wall-clock budget in seconds")
    a = ap.parse_args()
    sys.exit(main(a.sf_dir, a.out_dir, a.timeout))
