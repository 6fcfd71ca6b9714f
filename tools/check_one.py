#!/usr/bin/env python3
"""Per-oracle wrapper around tools/check.py semantics with a wall-clock
budget per query, for oracle-cost-bound cases (the DuckDB restatements of
banded/bucketed pipelines can be super-linear in DuckDB even when the
Spark plan is linear — at scaled SFs the ORACLE, not the engine, becomes
the bottleneck). Usage:

    python3 tools/check_one.py <sfdir> <outdir> <seconds> name [name...]

Prints PASS/FAIL/TIMEOUT per name; exit 1 iff any FAIL (timeouts are
reported but not failures — they are a statement about the oracle).
"""
import sys, os, json, subprocess, tempfile

sfdir, outdir, budget = sys.argv[1], sys.argv[2], int(sys.argv[3])
names = sys.argv[4:]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in names:
    if name not in oracle:
        print(f"SKIP {name}: no oracle entry"); continue
    with tempfile.TemporaryDirectory() as td:
        os.symlink(os.path.abspath(f"{outdir}/{name}"), f"{td}/{name}")
        json.dump({name: oracle[name]}, open(f"{td}/oracle_sql.json", "w"))
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "check.py"),
                 sfdir, td],
                capture_output=True, text=True, timeout=budget)
            out = r.stdout.strip().splitlines()
            line = next((l for l in out if l.startswith(("PASS", "FAIL"))), "FAIL ?")
            print(line)
            if line.startswith("FAIL"):
                fails += 1
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (> {budget}s oracle budget)")
sys.exit(1 if fails else 0)
