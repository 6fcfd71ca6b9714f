#!/bin/bash
# Round-14 attestation (attest_r13 protocol + this round's deltas):
#   a) EXPLAINS.md refresh at sf0.001 (plans changed: pagerank build,
#      ANN-dedup probe width, PQ encode refactor, 3 new ops)
#   b) full Verify + DuckDB check at sf0.01 (the driver-gate rehearsal,
#      257 oracle-gated queries after r14's +3)
#   c) full Verify at sf1 + check_one --oracles=scale --json
#      (CORRECTNESS_sf1 — the r13 verdict asked for the REGISTRY-COMPLETE
#       sf1 attestation: r13's file covered 250 of 254; this run covers
#       all 257 including cdc_store_cdf / daily_revenue_stl / knn_opq /
#       knn_opq_recall and the r14 ops)
#   d) full single-rep 32-core bench at sf1 -> BENCH_sf1.json
#      (NOTE r14: part_pagerank's sf1 base drops with the rebuilt
#       adjacency build; dedup_embedding_ann* roughly double by design —
#       the probe default moved 8->16 off the measured sweep)
#   e) sf10 rows that changed this round: graph pair (rebuilt build),
#      ANN-dedup pair (new probe width), the three new ops
#   f) BENCH_sf10.json merge (notes carry the ISOLATED 48g attributions)
#   g) full 3-rep 32-core bench at sf0.1 (the driver-comparable layout)
# Sequential on purpose: concurrent sbt batch runs race on target/ AND
# contaminate each other's walls (r13 lesson: they do NOT hard-lock).
set -uo pipefail
cd /root/repo
LOG=/tmp/attest_r14
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

echo "=== [e] sf10: this round's changed/new op rows ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_INIT_PARTS=256 SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG/r14ops \
  sbt -batch "runMain graft.Bench part_pagerank,part_communities,dedup_embedding_ann,dedup_embedding_ann_recall,embed_alignment,dedup_minhash_calibration,embed_pq_distortion" \
  > $LOG/bench_r14ops.log 2>&1
grep -h '"schema":"full"' $LOG/r14ops/bench_filtered.json

echo "=== [f] BENCH_sf10.json merge ==="
python3 tools/mk_bench_sf10.py $LOG/r14ops/bench_filtered.json

echo "=== [g] full BENCH sf0.1, 3-rep (driver-comparable layout) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_OUT=$LOG/sf01 sbt -batch "runMain graft.Bench" \
  > $LOG/bench_sf01.log 2>&1
echo "=== attest_r14 done; final line = full sf0.1 bench.json ==="
cat $LOG/sf01/bench.json
