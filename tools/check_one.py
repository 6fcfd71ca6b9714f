#!/usr/bin/env python3
"""Per-oracle wrapper around tools/check.py semantics with a wall-clock
budget per query, for oracle-cost-bound cases (the DuckDB restatements of
banded/bucketed pipelines can be super-linear in DuckDB even when the
Spark plan is linear — at scaled SFs the ORACLE, not the engine, becomes
the bottleneck). Usage:

    python3 tools/check_one.py [--oracles=scale] <sfdir> <outdir> <seconds> name [name...]

Prints PASS/FAIL/TIMEOUT per name; exit 1 iff any FAIL (timeouts are
reported but not failures — they are a statement about the oracle).

--oracles=scale overlays scale_oracle_sql.json (the value-identical,
scale-affordable restatements of the quadratic-by-design oracles) on top
of oracle_sql.json — the sf1+ attestation mode.

--json=PATH additionally writes a {name: {status, seconds, oracle}} map
(oracle = "gate" or "scale" per query) — the CORRECTNESS_sf1 artifact.

With no names listed, every oracle entry is checked.
"""
import sys, os, json, subprocess, tempfile, time

args = sys.argv[1:]
use_scale = "--oracles=scale" in args
json_out = next((a.split("=", 1)[1] for a in args if a.startswith("--json=")), None)
args = [a for a in args if not a.startswith("--")]
sfdir, outdir, budget = args[0], args[1], int(args[2])
names = args[3:]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
source = {k: "gate" for k in oracle}
if use_scale:
    scale = json.load(open(f"{outdir}/scale_oracle_sql.json"))
    oracle.update(scale)
    source.update({k: "scale" for k in scale})
if not names:
    names = sorted(oracle)
fails = 0
report = {}
for name in names:
    if name not in oracle:
        print(f"SKIP {name}: no oracle entry"); continue
    t0 = time.time()
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
            print(line, flush=True)
            status = line.split()[0]
            if status == "FAIL":
                fails += 1
        except subprocess.TimeoutExpired:
            status = "TIMEOUT"
            print(f"TIMEOUT {name} (> {budget}s oracle budget)", flush=True)
    report[name] = {"status": status, "seconds": round(time.time() - t0, 1),
                    "oracle": source[name]}
if json_out:
    counts = {}
    for v in report.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    json.dump({"sfdir": sfdir, "budget_sec": budget, "summary": counts,
               "queries": report}, open(json_out, "w"), indent=1, sort_keys=True)
sys.exit(1 if fails else 0)
