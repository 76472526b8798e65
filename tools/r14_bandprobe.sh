#!/usr/bin/env bash
# Round-14: the operator-isolated banding decade, parameterized by the
# hamming bound so each leg respects the operator's own counted capacity
# guard (h=6 ⇒ 2^16 pair keys ⇒ ~1.05M-hash capacity; h=3 ⇒ 2^24 ⇒ ~268M):
#   h=6 decade at 80k → 800k, h=3 decade at 1M → 10M.
# (The guard FIRING at 1M/h=6 — measured in /tmp/r14_bandprobe_1m.log —
# is itself the r13 saturation story: the operator now refuses the regime
# it used to go quadratic in.)
set -uo pipefail
cd "$(dirname "$0")/.."

run_probe() { # n h mem
  echo "== bandprobe n=$1 h=$2"
  SPARK_GRAFT_N="$1" SPARK_GRAFT_H="$2" SPARK_DRIVER_MEM="$3" \
    sbt -batch "runMain graft.BandProbe" > "/tmp/r14_bandprobe_n$1_h$2.log" 2>&1
  grep -a bandprobe "/tmp/r14_bandprobe_n$1_h$2.log"
}

run_probe 80000    6 16g
run_probe 800000   6 16g
run_probe 1000000  3 16g
run_probe 10000000 3 48g

echo "BANDPROBE DONE"
