#!/bin/bash
# Round-15 attestation (attest_r14 protocol + this round's deltas):
#   a) EXPLAINS.md refresh at sf0.001 (plans changed: pHash fingerprint
#      stage went native — PhashSimhash replaces the gram explode +
#      61-column aggregate; +2 new graph-search audit rows)
#   b) full Verify + DuckDB check at sf0.01 (the driver-gate rehearsal,
#      262 oracle-gated queries after r15's +2)
#   c) full Verify at sf1 + check_one --oracles=scale --json
#      (CORRECTNESS_sf1 registry-complete: 262 rows incl.
#       knn_graph_search_lift / knn_graph_param_sweep)
#   d) full single-rep 32-core bench at sf1 -> BENCH_sf1.json
#      (NOTE r15: mm_phash_neardup's sf1 base drops with the native
#       fingerprint kernel)
#   e) sf10 rows are run SEPARATELY by tools/r15bench (one op per
#      invocation at sf1 AND sf10 — the isolated-vs-isolated protocol
#      VERDICT r14 task 4 asked for); the merge applies their isolated
#      sf1 denominators via --sf1-isolated
#   f) full 3-rep 32-core bench at sf0.1 (the driver-comparable layout)
# Sequential on purpose: concurrent sbt batch runs race on target/ AND
# contaminate each other's walls.
set -uo pipefail
cd /root/repo
LOG=/tmp/attest_r15
mkdir -p $LOG

echo "=== [a] ExplainDump sf0.001 ==="
sbt -batch "runMain graft.tools.ExplainDump /root/testdata/sf0.001 EXPLAINS.md" \
  > $LOG/explains.log 2>&1
tail -2 $LOG/explains.log

echo "=== [b] full Verify sf0.01 + check ==="
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_full" \
  > $LOG/verify001.log 2>&1
grep '\[verify\]' $LOG/verify001.log || echo "(no per-query failures)"
python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_full \
  > $LOG/check001.log 2>&1
tail -3 $LOG/check001.log

echo "=== [c] full Verify sf1 + check_one scale oracles ==="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.Verify testdata-sf1 /tmp/verify_sf1" \
  > $LOG/verify_sf1.log 2>&1
grep '\[verify\]' $LOG/verify_sf1.log || echo "(no per-query failures)"
python3 tools/check_one.py --oracles=scale --json=$LOG/corr_sf1.json \
  testdata-sf1 /tmp/verify_sf1 300 > $LOG/check_sf1.log 2>&1
grep -c PASS $LOG/check_sf1.log; grep -E "FAIL|TIMEOUT" $LOG/check_sf1.log || echo "(no FAIL/TIMEOUT)"
cp $LOG/corr_sf1.json CORRECTNESS_sf1.json

echo "=== [d] BENCH sf1 single-rep 32-core ==="
SPARK_GRAFT_SF_DIR=testdata-sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG sbt -batch "runMain graft.Bench" \
  > $LOG/bench_sf1.log 2>&1
cp $LOG/bench.json BENCH_sf1.json
ls -la BENCH_sf1.json

echo "=== [e] BENCH_sf10.json merge from the isolated runs ==="
# prune each single-op run to ITS op: the store prewarm (store_build /
# changelog_cache_build) runs in every invocation and would otherwise be
# merged 9x / marked isolated with a prewarm wall
python3 - <<'PY'
import json, glob, os
for sf in ("sf1", "sf10"):
    merged = {}
    for p in glob.glob(f"/tmp/r15bench/{sf}/*/bench_filtered.json"):
        op = os.path.basename(os.path.dirname(p))
        q = json.load(open(p))["queries"]
        if op in q:
            merged[op] = q[op]
    json.dump({"queries": merged},
              open(f"/tmp/r15bench/iso_{sf}.json", "w"))
    print(f"iso_{sf}.json: {sorted(merged)}")
PY
python3 tools/mk_bench_sf10.py --sf1-isolated=/tmp/r15bench/iso_sf1.json \
  /tmp/r15bench/iso_sf10.json

echo "=== [f] full BENCH sf0.1, 3-rep (driver-comparable layout) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_OUT=$LOG/sf01 sbt -batch "runMain graft.Bench" \
  > $LOG/bench_sf01.log 2>&1
echo "=== attest_r15 done; final line = full sf0.1 bench.json ==="
cat $LOG/sf01/bench.json
