#!/usr/bin/env bash
# Round-16 close protocol (serial, quiet box — run AFTER the sf10u
# interval-emission leg has finished; nothing else may share the box
# with the two timed bench legs). Produces every record the round-close
# discipline requires (BASELINE.md "Round-16 bench protocol"):
#
#   1. sf0.1 headline bench from a class snapshot via plain java
#      (sbt stays free; BENCH_local.json lands in CWD = repo root),
#      immediately copied to BENCH_full_r16.json — the full per-query
#      map the drift-normalized gate adjudicates from, captured BEFORE
#      any later leg can overwrite it (the 27da866 trap).
#   2. The gate read: bench_compare vs the r13 tail and the r15 full
#      map (canary drift + residual + raw/normalized 2x reads).
#   3. sf1 full-suite bench (saved aside, NOT left as BENCH_local.json).
#   4. Full test suite twice (the round-close green datum, recorded
#      from sbt output).
#
# Verify 3-scale certs run separately via the sbt shell (not timed).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== snapshot classes"
sbt -batch compile >/tmp/r16_compile.log 2>&1 || { tail -5 /tmp/r16_compile.log; exit 1; }
rm -rf /tmp/r16_classes && cp -r target/scala-2.13/classes /tmp/r16_classes

echo "== sf0.1 headline bench (plain java, exclusive)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  java -cp "/tmp/r16_classes:/opt/spark/jars/*" -Xmx16g graft.Bench \
  >/tmp/r16_bench_sf01.log 2>/tmp/r16_bench_sf01_err.log
cp BENCH_local.json BENCH_full_r16.json
python3 - <<'PY'
import json
d = json.load(open('BENCH_full_r16.json'))
c = d['canary']
print(f"headline: {d['value']:.1f}s / {d['n_queries']} queries, "
      f"canary {c['start_sec']:.3f}->{c['end_sec']:.3f} "
      f"(ratio {c['end_sec']/c['start_sec']:.2f})")
PY

echo "== gate read vs ancestry"
python3 tools/bench_compare.py BENCH_r13.json BENCH_full_r16.json | tail -8
python3 tools/bench_compare.py BENCH_full_r15.json BENCH_full_r16.json | tail -8

echo "== sf1 full-suite bench"
SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  java -cp "/tmp/r16_classes:/opt/spark/jars/*" -Xmx48g \
  -Dspark.executor.heartbeatInterval=60s -Dspark.network.timeout=600s \
  graft.Bench >/tmp/r16_bench_sf1.log 2>/tmp/r16_bench_sf1_err.log
cp BENCH_local.json /tmp/r16_BENCH_sf1_full.json
grep -ao '"metric".*' /tmp/r16_BENCH_sf1_full.json | head -c 200; echo

echo "== restore headline as BENCH_local.json (the sf1 leg overwrote it)"
cp BENCH_full_r16.json BENCH_local.json

echo "== full suite x2"
for i in 1 2; do
  sbt -batch test >"/tmp/r16_suite_$i.log" 2>&1
  grep -a "Tests: succeeded\|All tests passed\|TESTS FAILED" "/tmp/r16_suite_$i.log" | tail -2
done

echo "CAMPAIGN DONE"
