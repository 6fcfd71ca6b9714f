#!/bin/bash
# Round-11 sf10 smoke (VERDICT r10 tasks 1/2/4/6): the round-8..11 operator
# families at 100× the gate SF, emitted as the machine-checkable
# BENCH_sf10.json artifact (tools/mk_bench_sf10.py) instead of prose.
# Timings only — oracle costs are super-linear in DuckDB; correctness is
# attested at sf1 by CORRECTNESS_sf1.json. The former quadratic-by-contract
# audits (dedup_ann_probe_sweep, dedup_embedding_ann_recall) now run in
# sample-truth mode above TruthSampleIds, so they ride in the MAIN batch.
set -uo pipefail
cd /root/repo
LOG=/tmp/sf10_r11
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

echo "=== Bench (smoke families, incl. sample-truth audits) ==="
SPARK_GRAFT_SF_DIR=testdata-sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_OUT=$LOG sbt -batch \
  "runMain graft.Bench knn_hamming,knn_hamming_rerank,knn_hamming_recall,knn_sq8_rerank,knn_sq8_recall,knn_ivf_probe_sweep,dedup_embedding_ann,daily_revenue_theilsen,daily_revenue_acf,daily_revenue_dow_index,orders_fulfillment_latency,cdc_snapshot_delta,orders_cohort_repeat,embed_silhouette,embed_label_knn_eval,embed_dim_variance,mm_payload_entropy,mm_size_percentiles,dedup_embedding_ann_recall,dedup_ann_probe_sweep" \
  > $LOG/bench_smoke.log 2>&1
tail -2 $LOG/bench_smoke.log

echo "=== BENCH_sf10.json ==="
python3 tools/mk_bench_sf10.py $LOG/bench_filtered.json
echo "=== sf10_smoke_r11 done ==="
