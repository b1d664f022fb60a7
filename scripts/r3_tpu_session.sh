#!/bin/bash
# Round-3 TPU measurement session: run every pending experiment in one
# tunnel window, most valuable first (the tunnel can die at any time).
# Usage: bash scripts/r3_tpu_session.sh [outdir]
set -u
OUT=${1:-/tmp/r3tpu}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a "$OUT/session.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -1 "$OUT/$name.log")" | tee -a "$OUT/session.log"
}

# 1. headline driver bench (lookup all axes + streaming high/low hit)
run bench 3000 python bench.py
# 2. streaming chunk sweep (packed + all-valid uploads, pipelining test)
run stream3 1500 python scripts/exp_r3_stream3.py
# 3. stream kernel + e2e decomposition
run stream2 1200 python scripts/exp_r3_stream2.py
# 4. lookup B/m sweep (pair-sweep commit validation, 8M lanes)
run lookup3 1500 python scripts/exp_r3_lookup3.py
# 5. stream kernel stage budget
run stages 1200 python scripts/profile_stream_stages.py
# 5b. tie fold vs cond retry A/B + 8M lanes
run lookup4 1500 python scripts/exp_r3_lookup4.py
# 5c. pair-window width sweep
run lookup5 1500 python scripts/exp_r3_lookup5.py
# 6. re-run bench for the record after everything is warm/compiled
run bench2 900 python bench.py
# 7. 200M-kmer single-chip scale point (index prebuilt host-side; skipped
# when the build task has not finished)
if [ -f /tmp/scale/idx200m/meta.json ]; then
  run scale200m 3000 python scripts/exp_scale_device.py /tmp/scale/idx200m
fi
echo "ALL DONE $(date +%T)" | tee -a "$OUT/session.log"
