#!/bin/bash
# Round-12 sf10 smoke (VERDICT r11 tasks 1/3/4): extend BENCH_sf10.json to
# the suite's top sf1 walls that had never been scale-measured, plus the
# families this round changed (sq8 native integer dot; cdc materialized
# changelog; pq/ivfpq recall audits; recallOf materialization).
# mk_bench_sf10.py MERGES into the existing artifact (r12 fix), so the 21
# r11 rows survive and changed ops are overwritten by this run.
set -uo pipefail
cd /root/repo
LOG=/tmp/sf10_r12
mkdir -p $LOG

if [ ! -d testdata-sf10 ]; then
  echo "=== ScaleUp sf0.1 x100 -> testdata-sf10 ==="
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.tools.ScaleUp /root/testdata/sf0.1 testdata-sf10 100" \
    > $LOG/scaleup.log 2>&1
  tail -3 $LOG/scaleup.log
fi
du -sh testdata-sf10

echo "=== Bench A: never-scale-measured sf1 walls ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG/a sbt -batch \
  "runMain graft.Bench knn_graph,mm_phash_neardup,dedup_jaccard_ppjoin,part_pagerank,part_communities,part_kcore,supplier_set_cover,q9_nation_profit,part_cosim,dedup_recall_eval" \
  > $LOG/bench_a.log 2>&1
tail -1 $LOG/bench_a.log

echo "=== Bench B: round-12-changed families ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG/b sbt -batch \
  "runMain graft.Bench knn_sq8_rerank,knn_sq8_recall,knn_pq_recall,knn_ivfpq_recall,cdc_parse_envelope,cdc_snapshot_latest,cdc_snapshot_delta,cdc_scd2_dim_join,cdc_consistency_check,dedup_embedding_ann_recall,dedup_ann_probe_sweep" \
  > $LOG/bench_b.log 2>&1
tail -1 $LOG/bench_b.log

echo "=== BENCH_sf10.json (merge) ==="
python3 tools/mk_bench_sf10.py $LOG/a/bench_filtered.json $LOG/b/bench_filtered.json
echo "=== sf10_smoke_r12 done ==="
