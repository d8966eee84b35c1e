#!/bin/bash
# Sequential battery for perf_train_medium.py — one TPU process at a time
# (two TPU processes serialize on the lease; see CLAUDE.md).  Each case gets
# its own timeout; a timeout or OOM in one case does not stop the rest.
# Launch detached:  setsid bash scripts/run_perf_medium_all.sh &
# Poll:             tail /tmp/perf_medium_*.log
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
CASES=("$@")
if [ ${#CASES[@]} -eq 0 ]; then
  CASES=(oom_fp32 bf16_b4 bf16_b8 bf16_b8_remat bf16_b8_ga2
         bf16_s1500_b1_remat bf16_s1500_b2_remat bf16_s1500_b2_ga2)
fi
for case in "${CASES[@]}"; do
  log=/tmp/perf_medium_${case}.log
  echo "=== $case -> $log ==="
  timeout 3400 python scripts/perf_train_medium.py "$case" > "$log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$log"
  if [ $rc -ne 0 ]; then echo "case $case exited rc=$rc"; fi
  sleep 20   # let a killed claim settle before the next case
done
echo "battery done" > /tmp/perf_medium_all.done
