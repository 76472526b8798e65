#!/usr/bin/env bash
# Round-14 evidence campaign, stage 1 (serial — timings must not contend):
#   verify sf0.001, mm banded-pairs decade (verbatim replicas, r13
#   comparability), join_interval sweep-line decade, CDC-family decade,
#   PairProbe at sf0.1 + sf1u, dedup-pair timings at sf0.1 + sf1u.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== verify sf0.001"
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vout_r14_001" \
  > /tmp/r14_verify0001.log 2>&1
python3 tools/xcheck.py /root/testdata/sf0.001 /tmp/vout_r14_001 \
  > /tmp/r14_xcheck0001.log 2>&1
tail -1 /tmp/r14_xcheck0001.log

run_bench() { # name sfdir mem queries...
  local tag="$1" dir="$2" mem="$3"; shift 3
  echo "== benchone $tag: $*"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_DRIVER_MEM="$mem" \
    sbt -batch "runMain graft.BenchOne $*" > "/tmp/r14_bench_$tag.log" 2>&1
  grep -a '\[benchone\]' "/tmp/r14_bench_$tag.log"
}

# mm banded pairs — the headline probe: r13 measured 15.4 s (sf1) ->
# 316.7 s (sf10) = 20.6x/decade on the SATURATING one-shared-chunk scheme;
# the >=2-shared-chunks rewrite should be ~linear.
run_bench mm_sf01  /root/testdata/sf0.1 8g  mm_phash_pairs mm_audio_fp_pairs mm_video_fp_pairs
run_bench mm_sf1   /tmp/sf1             16g mm_phash_pairs mm_audio_fp_pairs mm_video_fp_pairs
run_bench mm_sf10  /tmp/sf10            48g mm_phash_pairs mm_audio_fp_pairs mm_video_fp_pairs

# join_interval sweep-line decade (old banded-join form: 63.5 s at sf1,
# 51x/decade); pairs query carries the ov>=60 dial
run_bench ji_sf01  /root/testdata/sf0.1 8g  join_interval join_interval_pairs
run_bench ji_sf1   /tmp/sf1             16g join_interval join_interval_pairs
run_bench ji_sf10  /tmp/sf10            48g join_interval

# CDC family decade (verdict #5): the reference's core semantics
run_bench cdc_sf01 /root/testdata/sf0.1 8g  cdc_latest_state cdc_scd2 cdc_merge_apply
run_bench cdc_sf1  /tmp/sf1             16g cdc_latest_state cdc_scd2 cdc_merge_apply
run_bench cdc_sf10 /tmp/sf10            48g cdc_latest_state cdc_scd2 cdc_merge_apply

# pair-count-normalized adjudication inputs (perturbed corpus)
echo "== pairprobe sf0.1"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=8g \
  sbt -batch "runMain graft.PairProbe" > /tmp/r14_probe_sf01.log 2>&1
grep -a '\[pairprobe\]' /tmp/r14_probe_sf01.log
echo "== pairprobe sf1u"
SPARK_GRAFT_SF_DIR=/tmp/sf1u SPARK_DRIVER_MEM=16g \
  sbt -batch "runMain graft.PairProbe" > /tmp/r14_probe_sf1u.log 2>&1
grep -a '\[pairprobe\]' /tmp/r14_probe_sf1u.log

# dedup-pair wall clocks at the two safe scales
run_bench dd_sf01 /root/testdata/sf0.1 8g  doc_dedup_contain doc_dedup_simhash_pairs vec_near_dup
run_bench dd_sf1u /tmp/sf1u            16g doc_dedup_contain doc_dedup_simhash_pairs vec_near_dup

echo "CAMPAIGN1 DONE"
