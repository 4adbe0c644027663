#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against views named
after the parquet tables in <sfDir>, sorts columns by name and rows by
value, and reports exact row/schema/value comparison per query.
"""
import sys, json, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            # The driver's comparator hashes a pandas frame and crashes on
            # array/struct/map cells (pandas sort_values: unhashable
            # ndarray) — reject nested output types up front so a query
            # can't pass locally and die in the driver (round-2 lesson:
            # a2_grouped_collect / emb_normalize).
            desc = con.execute(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetchall()
            nested = [(c, t) for c, t, *_ in desc
                      if "[]" in t or "STRUCT" in t or "MAP" in t]
            if nested:
                print(f"FAIL {name}: nested output columns {nested} "
                      "(driver comparator cannot hash these)")
                n_fail += 1
                continue
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(sql)
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        gc, gr = norm_rows(g_cols, g_rows)
        ec, er = norm_rows(e_cols, e_rows)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
            n_fail += 1
        elif gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
