#!/bin/bash
# Round-10 sf10 smoke (VERDICT r9 task 4): the round-8/9/10 operator
# families at 100× the gate SF — timings only (oracle costs are
# super-linear in DuckDB; correctness is attested at sf1 by
# CORRECTNESS_sf1.json). dedup_ann_probe_sweep and
# dedup_embedding_ann_recall embed the EXACT quadratic kernel
# (audit-by-contract) — they run LAST so an interrupt still leaves the
# linear-family numbers on record.
set -uo pipefail
cd /root/repo
LOG=/tmp/sf10_r10
mkdir -p $LOG

if [ ! -d testdata-sf10 ]; then
  echo "=== ScaleUp sf0.1 x100 -> testdata-sf10 ==="
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.tools.ScaleUp /root/testdata/sf0.1 testdata-sf10 100" \
    > $LOG/scaleup.log 2>&1
  tail -3 $LOG/scaleup.log
fi
du -sh testdata-sf10

echo "=== StoreSmoke (bloom/stats index at sf10, 64-file hash layout) ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.tools.StoreSmoke 64" > $LOG/store.log 2>&1
grep "store-smoke" $LOG/store.log

echo "=== Bench (linear families) ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG sbt -batch \
  "runMain graft.Bench knn_hamming,knn_hamming_rerank,knn_hamming_recall,knn_sq8_rerank,knn_sq8_recall,knn_ivf_probe_sweep,dedup_embedding_ann,daily_revenue_theilsen,daily_revenue_acf,daily_revenue_dow_index,orders_fulfillment_latency,cdc_snapshot_delta,orders_cohort_repeat,embed_silhouette,embed_label_knn_eval,embed_dim_variance,mm_payload_entropy,mm_size_percentiles" \
  > $LOG/bench_linear.log 2>&1
grep metric $LOG/bench_linear.log | tail -1

echo "=== Bench (exact-kernel audits — quadratic by contract) ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG sbt -batch \
  "runMain graft.Bench dedup_embedding_ann_recall,dedup_ann_probe_sweep" \
  > $LOG/bench_quad.log 2>&1
grep metric $LOG/bench_quad.log | tail -1
echo "=== sf10_smoke_r10 done ==="
