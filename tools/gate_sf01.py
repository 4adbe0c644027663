#!/usr/bin/env python3
"""sf0.1 oracle gate for the cap/horizon/threshold-sensitive queries
(r14 VERDICT item 6): bugs in salt caps, horizon windows, and keep-best
tiebreaks are invisible at sf0.01 where every bucket sits under its cap.

Runs tools/check.py against an sf0.1 Verify dump and wraps the result
into a CORRECTNESS-style JSON artifact.

Usage: python3 tools/gate_sf01.py <sfDir> <verifyOutDir> <artifactPath> [sf]
"""
import json
import os
import re
import subprocess
import sys


def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    sf = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
    # --fast (r15 VERDICT item 7): the in-DuckDB EXCEPT ALL compare keeps
    # this full-registry gate minutes-scale at sf0.1 instead of ~35 min
    # of Python tuple compares; the driver's sf0.01 gate stays strict.
    # Optional 5th arg: per-oracle DuckDB timeout in seconds (sf1 runs —
    # naive oracle plans that stop fitting the sandbox fall back to an
    # honest rows-only record; see check.py --timeout).
    timeout = sys.argv[5] if len(sys.argv) > 5 else None
    cmd = [sys.executable, "tools/check.py", "--fast", "--jobs", os.environ.get("GATE_JOBS", "6")]
    if timeout:
        cmd += ["--timeout", timeout]
    proc = subprocess.run(cmd + [sf_dir, out_dir],
                          capture_output=True, text=True)
    with open(artifact + ".log", "w") as f:
        f.write(proc.stdout)
        if proc.stderr:
            f.write("\n--- stderr ---\n" + proc.stderr)
    queries = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"pass": True,
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"TIMEOUT (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"pass": True, "rows_only": True,
                                   "rows": int(m.group(2))}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            queries[m.group(1)] = {"pass": False,
                                   "reason": m.group(2)[:300]}
    n_pass = sum(1 for q in queries.values()
                 if q["pass"] and not q.get("rows_only"))
    n_rows_only = sum(1 for q in queries.values() if q.get("rows_only"))
    doc = {
        "sf": sf,
        "gate": "heavy-subset oracle (cap/horizon/threshold families)",
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_fail": len(queries) - n_pass - n_rows_only,
        "n_total": len(queries),
        "queries": queries,
    }
    with open(artifact, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
    print(f"wrote {artifact}: {n_pass} strict + {n_rows_only} rows-only "
          f"/ {len(queries)} pass")
    sys.exit(0 if n_pass + n_rows_only == len(queries) and queries else 1)


if __name__ == "__main__":
    main()
