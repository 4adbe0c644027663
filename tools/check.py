#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [--fast] <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against views named
after the parquet tables in <sfDir>, sorts columns by name and rows by
value, and reports exact row/schema/value comparison per query.

--fast (r15 VERDICT item 7: the full-registry sf0.1 gate spent ~35 min
fetching multi-million-row results into Python tuples): the row compare
runs INSIDE DuckDB as a symmetric EXCEPT ALL (multiset difference both
ways must be empty) plus a rowcount check, never materializing rows in
Python. Same column-name normalization; multiset semantics, so
duplicate-multiplicity differences are still caught. Two deliberate
relaxations vs the default path, which is why the driver-scale sf0.01
gate keeps the strict repr compare: SQL equality coerces comparable
numeric types (1 == 1.0), and float equality is value-based rather than
repr-based. NaN joins as equal to NaN in DuckDB set operations, so
NaN-bearing rows compare the same way the repr path treats them.
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


def fast_compare(con, got_glob, sql):
    """In-DuckDB multiset compare; returns None on match, reason on diff."""
    g_desc = con.execute(
        f"DESCRIBE SELECT * FROM '{got_glob}'").fetchall()
    e_desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    g_cols = sorted(r[0] for r in g_desc)
    e_cols = sorted(r[0] for r in e_desc)
    if g_cols != e_cols:
        return f"columns {g_cols} != {e_cols}"
    cols = ", ".join(f'"{c}"' for c in g_cols)
    got_q = f"SELECT {cols} FROM '{got_glob}'"
    exp_q = f"SELECT {cols} FROM ({sql})"
    n_got = con.execute(f"SELECT count(*) FROM ({got_q})").fetchone()[0]
    n_exp = con.execute(f"SELECT count(*) FROM ({exp_q})").fetchone()[0]
    if n_got != n_exp:
        return f"rowcount {n_got} != {n_exp}"
    n_diff = con.execute(
        f"SELECT count(*) FROM (({got_q} EXCEPT ALL {exp_q}) "
        f"UNION ALL ({exp_q} EXCEPT ALL {got_q}))").fetchone()[0]
    if n_diff:
        return f"values differ; {n_diff} rows in symmetric difference"
    return None


def main():
    args = [a for a in sys.argv[1:] if a != "--fast"]
    fast = "--fast" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if fast:
            try:
                reason = fast_compare(con, f"{out_dir}/{name}/*.parquet",
                                      sql)
                n_rows = con.execute(
                    "SELECT count(*) FROM "
                    f"'{out_dir}/{name}/*.parquet'").fetchone()[0]
            except Exception as e:
                reason = f"exec error {str(e).splitlines()[0][:200]}"
                n_rows = -1
            if reason is None:
                print(f"PASS {name} ({n_rows} rows)")
                n_pass += 1
            else:
                print(f"FAIL {name}: {reason}")
                n_fail += 1
            continue
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
