#!/bin/bash
# Round-12 attestation (attest_r11 protocol + this round's deltas):
#   a) EXPLAINS.md refresh at sf0.001
#   b) full Verify + DuckDB check at sf0.01 (the driver-gate rehearsal)
#   c) full Verify at sf1 + check_one --oracles=scale --json (CORRECTNESS_sf1)
#   d) full single-rep 32-core bench at sf1 -> BENCH_sf1.json
#      (NOTE r12: the cdc family now reads the materialized changelog cache
#       in Bench — generation cost appears once as changelog_cache_build)
#   e) final line: cat bench.json (a tail capture of THIS script always
#      ends on the parseable full line)
# Sequential on purpose: concurrent sbt batch runs race on target/.
set -uo pipefail
cd /root/repo
LOG=/tmp/attest_r12
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
SPARK_GRAFT_CPUS=32 sbt -batch \
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
echo "=== attest_r12 done; final line = authoritative sf1 bench.json ==="
cat $LOG/bench.json
