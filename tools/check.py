#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [--fast] [--jobs N] <sfDir> <verifyOutDir>

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
--jobs N (fast mode only) compares N queries in parallel worker
processes — the residual gate cost is DuckDB EXECUTING the heavy
oracle plans (deliberately naive joins at sf0.1), which parallelism
overlaps; each worker caps its DuckDB threads so N workers do not
oversubscribe the host.
"""
import os, sys, json, math

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
    """In-DuckDB multiset compare; returns None on match, reason on diff.

    The oracle SQL is materialized ONCE into a temp table — count and
    both EXCEPT directions then read the materialization, not re-run
    the (sometimes deliberately naive, e.g. all-shared-token join)
    oracle plan."""
    con.execute(
        "CREATE OR REPLACE TEMP TABLE __got AS "
        f"SELECT * FROM '{got_glob}'")
    con.execute(f"CREATE OR REPLACE TEMP TABLE __exp AS ({sql})")
    g_desc = con.execute("DESCRIBE __got").fetchall()
    e_desc = con.execute("DESCRIBE __exp").fetchall()
    g_cols = sorted(r[0] for r in g_desc)
    e_cols = sorted(r[0] for r in e_desc)
    if g_cols != e_cols:
        return f"columns {g_cols} != {e_cols}"
    cols = ", ".join(f'"{c}"' for c in g_cols)
    got_q = f"SELECT {cols} FROM __got"
    exp_q = f"SELECT {cols} FROM __exp"
    n_got = con.execute("SELECT count(*) FROM __got").fetchone()[0]
    n_exp = con.execute("SELECT count(*) FROM __exp").fetchone()[0]
    if n_got != n_exp:
        return f"rowcount {n_got} != {n_exp}"
    n_diff = con.execute(
        f"SELECT count(*) FROM (({got_q} EXCEPT ALL {exp_q}) "
        f"UNION ALL ({exp_q} EXCEPT ALL {got_q}))").fetchone()[0]
    if n_diff:
        return f"values differ; {n_diff} rows in symmetric difference"
    return None


_W = {}


def _table_src(sf_dir, t):
    # a driver table is one file; a ScaleData-generated table is a
    # directory of part files (Spark layout) — glob it for DuckDB
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _worker_init(sf_dir, threads):
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{_table_src(sf_dir, t)}'")
    _W["con"] = con


def _fast_one(task):
    import time
    name, sql, out_dir = task
    con = _W["con"]
    t0 = time.time()
    try:
        reason = fast_compare(con, f"{out_dir}/{name}/*.parquet", sql)
        n_rows = con.execute("SELECT count(*) FROM __got").fetchone()[0]
    except Exception as e:
        # An oracle that exceeds the worker's DuckDB memory_limit or
        # temp-spill cap (one sf1 naive-join oracle spilled >60 GB and
        # took the whole host's disk down) is the same sandbox-capacity
        # class as a timeout (see --timeout): the SPARK result exists;
        # the NAIVE ORACLE doesn't fit. Record it as an honest
        # rows-only result, not a correctness failure.
        if any(w in str(e).lower()
               for w in ("memory", "temp", "no space left")):
            reason = "ORACLE_OOM " + str(e).splitlines()[0][:150]
            n_rows = _got_rows(out_dir, name)
        else:
            reason = f"exec error {str(e).splitlines()[0][:200]}"
            n_rows = -1
    return (name, reason, n_rows, time.time() - t0)


def _got_rows(out_dir, name):
    try:
        return duckdb.sql(
            f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
        ).fetchone()[0]
    except Exception:
        return -1


def _proc_main(task, sf_dir, threads, mem_gb, q):
    _worker_init(sf_dir, threads)
    _W["con"].execute(f"SET memory_limit='{mem_gb}GB'")
    # Per-task temp dir: a worker the parent kills mid-spill can't
    # clean up after itself — the parent removes this dir instead (a
    # killed 6-worker sf1 run once left 67 GB of orphaned spill).
    # DuckDB only mkdirs the leaf, so create the parent chain here.
    os.makedirs(f".tmp/gate-{os.getpid()}", exist_ok=True)
    _W["con"].execute(f"SET temp_directory='.tmp/gate-{os.getpid()}'")
    _W["con"].execute("SET max_temp_directory_size='40GiB'")
    q.put(_fast_one(task))


def _run_with_timeout(tasks, sf_dir, out_dir, jobs, threads, timeout):
    """--timeout S (r19 VERDICT item 1, the sf1 notch): some oracle SQL
    is DELIBERATELY naive (all-shared-token joins) and stops fitting the
    sandbox at 10x sf0.1. Each compare runs in its own worker PROCESS
    under a hard deadline — the parent kills an over-deadline worker and
    records an honest rows-only result (the judge-prescribed split:
    strict oracle where DuckDB fits, row-count gate where it doesn't).
    A killed process is the only reliable cancel: DuckDB's in-process
    interrupt() wedged its multi-threaded scheduler on exactly the
    plans this path exists for. Workers also get a memory_limit so six
    naive joins can't OOM the host (an over-limit oracle is recorded
    rows-only, same class)."""
    import time
    import multiprocessing as mp
    ctx = mp.get_context("fork")
    mem_gb = max(4, int(0.7 * 128 / max(jobs, 1)))
    pending = list(tasks)
    running = []  # (proc, queue, task, deadline)
    results = []
    while pending or running:
        while pending and len(running) < jobs:
            t = pending.pop(0)
            q = ctx.SimpleQueue()
            p = ctx.Process(target=_proc_main,
                            args=(t, sf_dir, threads, mem_gb, q))
            p.start()
            running.append((p, q, t, time.time() + timeout))
        time.sleep(0.2)
        import shutil
        still = []
        for p, q, t, dl in running:
            if not p.is_alive():
                p.join()
                if q.empty():
                    results.append(
                        (t[0], "exec error worker died", -1, 0.0))
                else:
                    results.append(q.get())
                shutil.rmtree(f".tmp/gate-{p.pid}", ignore_errors=True)
            elif time.time() > dl:
                p.kill()
                p.join()
                results.append((t[0], f"ORACLE_TIMEOUT after {timeout}s",
                                _got_rows(out_dir, t[0]), timeout))
                shutil.rmtree(f".tmp/gate-{p.pid}", ignore_errors=True)
            else:
                still.append((p, q, t, dl))
        running = still
    return results


def main():
    argv = sys.argv[1:]
    fast = "--fast" in argv
    jobs = 1
    if "--jobs" in argv:
        jobs = int(argv[argv.index("--jobs") + 1])
        del argv[argv.index("--jobs"):argv.index("--jobs") + 2]
    timeout = 0.0
    if "--timeout" in argv:
        timeout = float(argv[argv.index("--timeout") + 1])
        del argv[argv.index("--timeout"):argv.index("--timeout") + 2]
    args = [a for a in argv if a != "--fast"]
    sf_dir, out_dir = args[0], args[1]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_timeout = 0
    if fast:
        tasks = [(name, sql, out_dir)
                 for name, sql in sorted(oracle.items())]
        threads = max(2, (os.cpu_count() or 8) // max(jobs, 1))
        if timeout:
            results = _run_with_timeout(
                tasks, sf_dir, out_dir, max(jobs, 1), threads, timeout)
        elif jobs > 1:
            import multiprocessing as mp
            # chunksize=1: tasks are wildly uneven (a naive-join oracle
            # can cost minutes while most are ms) — static chunking
            # strands the heavy ones behind a long serial tail.
            with mp.get_context("fork").Pool(
                    jobs, _worker_init, (sf_dir, threads)) as pool:
                results = pool.map(_fast_one, tasks, chunksize=1)
        else:
            _worker_init(sf_dir, threads)
            results = [_fast_one(t) for t in tasks]
        for name, reason, n_rows, secs in results:
            if reason is None:
                print(f"PASS {name} ({n_rows} rows) [{secs:.1f}s]")
                n_pass += 1
            elif reason.startswith("ORACLE_") and n_rows > 0:
                # oracle too heavy for the sandbox at this sf (timeout
                # or worker memory_limit); the Spark result exists and
                # is non-empty — a rows-only record, reported
                # distinctly, never as a strict PASS
                print(f"TIMEOUT {name} ({n_rows} rows) [{secs:.1f}s]")
                n_timeout += 1
            else:
                print(f"FAIL {name}: {reason}")
                n_fail += 1
        print(f"== {n_pass} pass / {n_timeout} rows-only-timeout / "
              f"{n_fail} fail / {len(oracle)} total ==")
        sys.exit(1 if n_fail else 0)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{_table_src(sf_dir, t)}'")
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
