#!/usr/bin/env bash
# Round-14 evidence campaign, stage 3 (serial): everything stage 2 still
# owes at the post-doc_dedup_lines head — operator-isolated banding decade
# (BandProbe), mm true-pair denominators in Spark (MmPairCount), CDC plan
# diffs, the sf10u dedup legs, the new line-dedup decade, and the closing
# full-suite benches (run LAST so they time the final head).
set -uo pipefail
cd "$(dirname "$0")/.."

run_bench() { # tag sfdir mem queries...
  local tag="$1" dir="$2" mem="$3"; shift 3
  echo "== benchone $tag: $*"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_DRIVER_MEM="$mem" \
    sbt -batch "runMain graft.BenchOne $*" > "/tmp/r14_bench_$tag.log" 2>&1
  grep -a '\[benchone\]' "/tmp/r14_bench_$tag.log"
}

echo "== bandprobe 1M"
SPARK_GRAFT_N=1000000 SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.BandProbe" \
  > /tmp/r14_bandprobe_1m.log 2>&1
grep -a bandprobe /tmp/r14_bandprobe_1m.log
echo "== bandprobe 10M"
SPARK_GRAFT_N=10000000 SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.BandProbe" \
  > /tmp/r14_bandprobe_10m.log 2>&1
grep -a bandprobe /tmp/r14_bandprobe_10m.log

echo "== mmpaircount sf1"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.MmPairCount" \
  > /tmp/r14_mmpc_sf1.log 2>&1
grep -a mmpaircount /tmp/r14_mmpc_sf1.log
echo "== mmpaircount sf10"
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.MmPairCount" \
  > /tmp/r14_mmpc_sf10.log 2>&1
grep -a mmpaircount /tmp/r14_mmpc_sf10.log

echo "== cdc plan shapes"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch \
  "runMain graft.Explain cdc_latest_state cdc_scd2 cdc_merge_apply join_interval" \
  > /tmp/r14_plan_sf01.log 2>&1
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_DRIVER_MEM=24g sbt -batch \
  "runMain graft.Explain cdc_latest_state cdc_scd2 cdc_merge_apply join_interval" \
  > /tmp/r14_plan_sf10.log 2>&1
grep -a -A10000 '====' /tmp/r14_plan_sf01.log | tools/normalize_plan.sh > /tmp/r14_plan_sf01.norm
grep -a -A10000 '====' /tmp/r14_plan_sf10.log | tools/normalize_plan.sh > /tmp/r14_plan_sf10.norm
diff /tmp/r14_plan_sf01.norm /tmp/r14_plan_sf10.norm > /tmp/r14_plan.diff
echo "plan diff lines: $(wc -l < /tmp/r14_plan.diff)"

echo "== pairprobe sf10u (cheap)"
SPARK_GRAFT_SF_DIR=/tmp/sf10u SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.PairProbe cheap" > /tmp/r14_probe_sf10u.log 2>&1
grep -a pairprobe /tmp/r14_probe_sf10u.log

echo "== vec_near_dup sf10u (2 runs + rows)"
SPARK_GRAFT_SF_DIR=/tmp/sf10u SPARK_DRIVER_MEM=48g SPARK_GRAFT_RUNS=2 SPARK_GRAFT_ROWS=1 \
  sbt -batch "runMain graft.BenchOne vec_near_dup vec_near_dup_lsh" > /tmp/r14_bench_dd_sf10u_vec.log 2>&1
grep -a benchone /tmp/r14_bench_dd_sf10u_vec.log

echo "== doc_dedup_contain sf10u (1 run + rows)"
SPARK_GRAFT_SF_DIR=/tmp/sf10u SPARK_DRIVER_MEM=48g SPARK_GRAFT_RUNS=1 SPARK_GRAFT_ROWS=1 \
  sbt -batch "runMain graft.BenchOne doc_dedup_contain" > /tmp/r14_bench_dd_sf10u_contain.log 2>&1
grep -a benchone /tmp/r14_bench_dd_sf10u_contain.log

# the new line-dedup operator's own decade (perturbed corpora: replicas
# are content-distinct, so only TRUE boilerplate — the fixture's clone
# groups within replica 0 — crosses the df threshold)
run_bench lines_sf01  /root/testdata/sf0.1 8g  doc_dedup_lines
run_bench lines_sf1u  /tmp/sf1u            16g doc_dedup_lines
run_bench lines_sf10u /tmp/sf10u           48g doc_dedup_lines

echo "== bench sf0.1 (headline, final head)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/r14_bench_sf01_full.log 2>&1
grep -a '"metric"' /tmp/r14_bench_sf01_full.log | tail -1 > /tmp/r14_BENCH_sf01.json
cat /tmp/r14_BENCH_sf01.json

echo "== bench sf1 (full suite, final head)"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.Bench" \
  > /tmp/r14_bench_sf1_full.log 2>&1
grep -a '"metric"' /tmp/r14_bench_sf1_full.log | tail -1 > /tmp/r14_BENCH_sf1.json
head -c 400 /tmp/r14_BENCH_sf1.json

echo "CAMPAIGN3 DONE"
