#!/usr/bin/env bash
# Round-15 evidence campaign (serial, run on a quiet box AFTER the
# headline bench): the two r14 operators that still owe a measured
# decade (verdict-r14 #5) — doc_dedup_simhash64_pairs and
# vec_near_dup_lsh — on the perturbed corpora with pair-count
# denominators (the r14 template), plus the sf1 full-suite bench at the
# final head. Fixtures: /tmp/sf1 (10x verbatim), /tmp/sf1u and
# /tmp/sf10u (10x/100x perturbdocs) from tools/make_sf1.py.
set -uo pipefail
cd "$(dirname "$0")/.."

run_bench() { # tag sfdir mem queries...
  local tag="$1" dir="$2" mem="$3"; shift 3
  echo "== benchone $tag: $*"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_DRIVER_MEM="$mem" \
    SPARK_GRAFT_RUNS="${RUNS:-3}" SPARK_GRAFT_ROWS=1 \
    sbt -batch "runMain graft.BenchOne $*" > "/tmp/r15_bench_$tag.log" 2>&1
  grep -a '\[benchone\]' "/tmp/r15_bench_$tag.log"
}

probe() { # tag sfdir mem args...
  local tag="$1" dir="$2" mem="$3"; shift 3
  echo "== pairprobe $tag: $*"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_DRIVER_MEM="$mem" \
    sbt -batch "runMain graft.PairProbe $*" > "/tmp/r15_probe_$tag.log" 2>&1
  grep -a '\[pairprobe\]' "/tmp/r15_probe_$tag.log"
}

# --- denominators: 64-bit band rows + SRP candidate volume ---
probe sf01  /root/testdata/sf0.1 8g  cheap
probe sf1u  /tmp/sf1u            24g cheap
probe sf10u /tmp/sf10u           48g cheap

# --- timed legs (warm min of 3 at the two small scales; 2 at sf10u) ---
run_bench s64_sf01  /root/testdata/sf0.1 8g  doc_dedup_simhash64_pairs
run_bench s64_sf1u  /tmp/sf1u            24g doc_dedup_simhash64_pairs
RUNS=2 run_bench s64_sf10u /tmp/sf10u    48g doc_dedup_simhash64_pairs

run_bench lsh_sf01  /root/testdata/sf0.1 8g  vec_near_dup_lsh
run_bench lsh_sf1u  /tmp/sf1u            24g vec_near_dup_lsh
RUNS=2 run_bench lsh_sf10u /tmp/sf10u    48g vec_near_dup_lsh

# --- sf1 full-suite bench at the final head (the r14 protocol leg) ---
echo "== bench sf1 (full suite)"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.Bench" \
  > /tmp/r15_bench_sf1_full.log 2>&1
grep -a '"metric"' /tmp/r15_bench_sf1_full.log | tail -1 > /tmp/r15_BENCH_sf1.json
head -c 400 /tmp/r15_BENCH_sf1.json; echo

echo "CAMPAIGN DONE"
