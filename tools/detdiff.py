#!/usr/bin/env python3
"""Determinism gate: value-diff two graft.Verify output dirs (e.g. runs
at SPARK_GRAFT_CPUS=4 vs 32). Catches partition-order-dependent results
that a lucky single oracle compare can mask.

Usage: python3 tools/detdiff.py <outDirA> <outDirB>
"""
import os
import sys

import duckdb


def rows(con, path):
    cur = con.execute(f"SELECT * FROM '{path}/*.parquet'")
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(repr(r[i]) for i in order) for r in cur.fetchall())
    return [cols[i] for i in order], data


def main():
    a, b = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a)
                   if os.path.isdir(os.path.join(a, d)))
    missing = [d for d in names if not os.path.isdir(os.path.join(b, d))]
    n_ok = 0
    fails = []
    for name in names:
        if name in missing:
            fails.append((name, "missing in B"))
            continue
        try:
            ca, ra = rows(con, os.path.join(a, name))
            cb, rb = rows(con, os.path.join(b, name))
        except Exception as e:
            fails.append((name, f"read error: {str(e).splitlines()[0]}"))
            continue
        if ca != cb:
            fails.append((name, f"columns {ca} != {cb}"))
        elif ra != rb:
            d = [(x, y) for x, y in zip(ra, rb) if x != y][:2]
            fails.append((name, f"{len(ra)} vs {len(rb)} rows; "
                                f"first diffs {d}"))
        else:
            n_ok += 1
    for name, why in fails:
        print(f"DIFF {name}: {why}")
    print(f"== {n_ok} identical / {len(fails)} differ / {len(names)} ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
