#!/bin/bash
# Full local gate: compile, tests, oracle verify at two scale factors,
# bench. Mirrors what the driver runs per-round.
set -e
cd "$(dirname "$0")/.."
echo "== compile + test =="
sbt -batch test
echo "== smoke (t1) =="
sbt -batch "runMain graft.Smoke" | grep '\[smoke\]'
echo "== verify sf0.001 =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/ci_v001" >/dev/null 2>&1 || true
python3 tools/check.py /root/testdata/sf0.001 /tmp/ci_v001 | tail -1
echo "== verify sf0.01 (driver gate) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/ci_v01" >/dev/null 2>&1 || true
python3 tools/check.py /root/testdata/sf0.01 /tmp/ci_v01 | tail -1
echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" | grep '{"metric"'
