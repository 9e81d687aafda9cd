#!/usr/bin/env python3
"""Run-to-run determinism pre-flight.

Usage: python3 tools/check_determinism.py <verifyOutDirA> <verifyOutDirB>

Compares two independent `graft.Verify` dumps of the same scale factor
cell-by-cell through the same pandas/str lens the correctness gate
uses. Any diff means some query's output depends on execution order
(e.g. an avg(double) whose partial-aggregate merge order varies between
runs) — the failure mode that can pass a local gate run and fail the
driver's. Dev tooling only — not part of the library.
"""
import os
import sys

import pandas as pd


def canon(d):
    df = pd.read_parquet(d)
    df = df[sorted(df.columns)]
    return sorted(tuple(str(x) for x in r) for r in df.itertuples(index=False))


def main(a_dir, b_dir):
    bad = total = 0
    for name in sorted(os.listdir(a_dir)):
        if not os.path.isdir(os.path.join(a_dir, name)):
            continue
        total += 1
        a, b = canon(os.path.join(a_dir, name)), canon(os.path.join(b_dir, name))
        if a != b:
            bad += 1
            first = next((x, y) for x, y in zip(a, b) if x != y) if len(a) == len(b) \
                else (f"{len(a)} rows", f"{len(b)} rows")
            print(f"NONDETERMINISTIC {name}: {first[0]} != {first[1]}")
    print(f"{total} queries compared, {bad} nondeterministic")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
