#!/bin/bash
# Round-5 TPU measurement session — run on the tunneled chip with an IDLE
# host (concurrent host load distorts scalar-fetch timing by ±10 ns/kmer).
# Every step appends json lines to $LOG. MANDATORY pass/fail artifacts:
#   * step 1 (bench.py) asserts ALL 8M random positives found in both modes
#     at k31 — the linear minimizer-select chain canary (the k63-class
#     miscompile cannot silently regress k31 without failing the bench);
#   * step 5 re-asserts the same with the tournament tree FORCED, pinning
#     chain == tree on the chip this session.
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r5_session.jsonl}
echo "== r5 TPU session -> $LOG"

# steps are independent measurements: a timeout/failure in one must not
# abort the rest — record the exit code and continue
run() {
  echo "== $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  echo "== exit=${PIPESTATUS[0]}" | tee -a "$LOG"
}

# 1. driver bench (headline + nested 200M scale rows + low-hit kernel row);
#    the scale rows upload ~7 GB over the ~28 MB/s tunnel — budget for it
run timeout 4500 python bench.py

# 2. row-format A/B at 200M canonical (the human-config >=10x push):
#    v1 (22-word rows, the .arrs default), v2 (20), no-c1 (12), v2+no-c1 (11)
IDX=/tmp/scale/idx200m_canon
for variant in v2 noc1 v2noc1; do
  [ -d "$IDX.arrs.$variant" ] || echo "missing $IDX.arrs.$variant (build with scripts/cache_device_arrays.py)"
done
run env SSHASH_PAIR_DIV=64 timeout 1200 python scripts/exp_scale_device.py $IDX lookup
run env SSHASH_ROW_V2=1 SSHASH_ARRS_DIR=$IDX.arrs.v2 timeout 1200 python scripts/exp_scale_device.py $IDX lookup
run env SSHASH_NO_C1=1 SSHASH_ARRS_DIR=$IDX.arrs.noc1 timeout 1200 python scripts/exp_scale_device.py $IDX lookup
run env SSHASH_ROW_V2=1 SSHASH_NO_C1=1 SSHASH_ARRS_DIR=$IDX.arrs.v2noc1 timeout 1200 python scripts/exp_scale_device.py $IDX lookup

# 3. regular mode at 200M (dual-strand probe vs round-4 windowed fallback)
run timeout 1200 python scripts/exp_scale_device.py /tmp/scale/idx200m lookup
run env SSHASH_REG_DUAL_OFF=1 timeout 1200 python scripts/exp_scale_device.py /tmp/scale/idx200m lookup

# 4. streaming: stage profile + upload-pipeline A/B + 200M kernel-only
run timeout 2400 python scripts/profile_stream_stages.py
run timeout 1800 python scripts/exp_scale_device.py /tmp/scale/idx200m streaming
run env SSHASH_STREAM_PIPELINE=0 timeout 1800 python scripts/exp_scale_device.py /tmp/scale/idx200m streaming

# 5. tournament tree vs linear chain at k31 (toolchain-proofing cost row);
#    the assert inside bench.py re-runs under the forced tree
run env SSHASH_TREE_MIN=1 timeout 4500 python bench.py

echo "== session done; fold results into BENCH_NOTES.md"
