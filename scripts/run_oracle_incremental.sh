#!/bin/bash
# Check every query already dumped by a still-running Verify sweep that has
# not yet been checked (tracked via the merged timing JSON). Usage:
#   run_oracle_incremental.sh <sfDir> <verifyOutDir> <timingsJson> [timeoutSec]
set -u
SF=$1; OUT=$2; TJ=$3; TMO=${4:-1800}
DONE=$(python3 -c "
import json,sys,os
try: d=json.load(open('$TJ'))
except Exception: d={}
print(','.join(sorted(d)))")
AVAIL=$(python3 -c "
import os, json
done=set('$DONE'.split(',')) if '$DONE' else set()
# Only queries with an oracle: q36/q108/q109 are rows-only by design.
oracle=set(json.load(open(os.path.join('$OUT','oracle_sql.json'))))
qs=[d for d in os.listdir('$OUT')
    if os.path.isdir(os.path.join('$OUT',d)) and d not in done and d in oracle]
print(','.join(sorted(qs)))")
if [ -z "$AVAIL" ]; then echo "nothing new to check"; exit 0; fi
echo "checking: $AVAIL"
NEW=$(mktemp)
python3 scripts/check_oracle_timed.py "$SF" "$OUT" --only "$AVAIL" \
  --timeout "$TMO" --out "$NEW"
python3 -c "
import json
try: old=json.load(open('$TJ'))
except Exception: old={}
old.update(json.load(open('$NEW')))
json.dump(old, open('$TJ','w'), indent=1, sort_keys=True)
print('total checked:', len(old))"
rm -f "$NEW"
