#!/bin/bash
# Round-13 sf10 smoke: re-measure the floors BENCH_sf10.json documents
# (ppjoin/cosim/phash — fix or re-attest), plus any family round 13
# changes. mk_bench_sf10.py MERGES into the existing artifact and bakes
# `floor` fields for any ratio still > 8x per 10x.
#
# Protocol lessons (r12): measure walls ISOLATED (suite context inflates
# late queries ~2x); sf1 comparison bases must use the SAME REPS/layout;
# testdata-sf1 / testdata-sf10 are gitignored and may need regeneration.
set -uo pipefail
cd /root/repo
LOG=/tmp/sf10_r13
mkdir -p $LOG

for sf in 1 10; do
  if [ ! -d testdata-sf$sf ]; then
    echo "=== ScaleUp sf0.1 x$((sf*10)) -> testdata-sf$sf ==="
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 sbt -batch \
      "runMain graft.tools.ScaleUp /root/testdata/sf0.1 testdata-sf$sf $((sf*10))" \
      > $LOG/scaleup_sf$sf.log 2>&1
    tail -2 $LOG/scaleup_sf$sf.log
  fi
done
du -sh testdata-sf1 testdata-sf10

echo "=== Bench: the documented floors, isolated ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_INIT_PARTS=256 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG/floors sbt -batch \
  "runMain graft.Bench dedup_jaccard_ppjoin,part_cosim,mm_phash_neardup" \
  > $LOG/bench_floors.log 2>&1
tail -1 $LOG/bench_floors.log

echo "=== BENCH_sf10.json (merge) ==="
python3 tools/mk_bench_sf10.py $LOG/floors/bench_filtered.json
echo "=== sf10_smoke_r13 done ==="
