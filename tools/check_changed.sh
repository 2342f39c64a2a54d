#!/bin/bash
# Fresh-oracle gate for CHANGED queries (verdict r7 ask #2): diff the
# query sources since <since-ref> (default: last commit touching
# src/main), extract the query names whose definitions moved, and run
# Verify + tools/check.py on exactly that subset at sf0.01.
#
# Usage: tools/check_changed.sh [since-ref]   (default HEAD~1)
set -e
cd "$(dirname "$0")/.."
python3 tools/check.py --selftest >/dev/null
REF="${1:-HEAD~1}"
names=$(python3 tools/changed_queries.py "$REF")
if [ -z "$names" ]; then
  echo "no changed query definitions since $REF"
  exit 0
fi
echo "changed queries since $REF:" $names
# A stale /tmp/check_changed from a previous invocation would let
# check.py hash-match OLD artifacts after a failed build — wipe it and
# surface sbt/Verify failures instead of discarding them (review
# finding r8).
rm -rf /tmp/check_changed
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/check_changed $names" \
  > /tmp/check_changed_sbt.log 2>&1 || {
    echo "Verify run FAILED — tail of /tmp/check_changed_sbt.log:"
    tail -20 /tmp/check_changed_sbt.log
    exit 1
  }
[ -f /tmp/check_changed/oracle_sql.json ] || {
  echo "Verify produced no oracle_sql.json — gate cannot run"; exit 1; }
# engine-level names with no oracle entry (helper tables, *_raw builds)
# would make check.py's strict unknown-name gate exit 2 — drop them
names=$(python3 - "$names" <<'EOF'
import json, sys
oracle = set(json.load(open("/tmp/check_changed/oracle_sql.json")))
print(" ".join(n for n in sys.argv[1].split() if n in oracle))
EOF
)
python3 tools/check.py /root/testdata/sf0.01 /tmp/check_changed $names
