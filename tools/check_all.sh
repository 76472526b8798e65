#!/usr/bin/env bash
# Dev-only full validation: clean build, tests, oracle cross-check at two
# scales, flagship smoke, bench. Mirrors the driver's round gates.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch clean test

sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_ca"
python3 tools/xcheck.py /root/testdata/sf0.01 /tmp/vout_ca

sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vout_ca001"
python3 tools/xcheck.py /root/testdata/sf0.001 /tmp/vout_ca001

sbt -batch "runMain graft.Demo" | grep -a "rows=799"
sbt -batch "runMain graft.Bench" | grep -a '"metric"'
echo "ALL CHECKS PASSED"
