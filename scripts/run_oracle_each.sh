#!/bin/bash
# Run check_oracle_timed.py ONE QUERY PER SUBPROCESS (a DuckDB OOM or
# wedged allocator then costs that query, never the loop) and merge each
# result into the master timings JSON immediately.
# Usage: run_oracle_each.sh <sfDir> <outDir> <timingsJson> <timeoutSec> q1,q2,...
set -u
SF=$1; OUT=$2; TJ=$3; TMO=$4; QS=$5; shift 5 || true
EXTRA=("$@")
for q in ${QS//,/ }; do
  NEW=$(mktemp)
  python3 scripts/check_oracle_timed.py "$SF" "$OUT" --only "$q" \
    --timeout "$TMO" --out "$NEW" "${EXTRA[@]}"
  RC=$?
  python3 - "$TJ" "$NEW" "$q" "$RC" <<'EOF'
import json, sys
tj, new, q, rc = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
try: old = json.load(open(tj))
except Exception: old = {}
try: d = json.load(open(new))
except Exception: d = {}
if q not in d:
    d[q] = {"status": "fail", "reason": f"checker subprocess died rc={rc}"}
old.update(d)
json.dump(old, open(tj, "w"), indent=1, sort_keys=True)
EOF
  rm -f "$NEW"
done
python3 -c "
import json,sys
d=json.load(open('$TJ'))
from collections import Counter
print('merged:', Counter(v['status'] for v in d.values()))"
