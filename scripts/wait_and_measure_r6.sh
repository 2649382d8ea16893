#!/bin/bash
# Round-6 clean-window watcher (VERDICT r5 item 3): poll until the VM is
# healthy (alloc probe > 1000 MiB/s, CPU probe > 7.5 M iters/s, loadavg
# < 4 — two consecutive clean reads), then run the pending round-6
# measurements:
#   1. bench.py, 3 reps             -> BENCH/bench_r6_clean.json
#   2. scaling dedup workload 8v32  -> BENCH/scaling_r6_dedup_8v32.json
#   3. build/query scaling 16v32    -> BENCH/scaling_r6_16v32.json
# Each step re-probes first and skips back to waiting if the window
# degraded. Log: $LOG (default /tmp/wait_and_measure_r6.log).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${LOG:-/tmp/wait_and_measure_r6.log}"
cd "$REPO"

probe() {
  python3 - <<'EOF'
import time, os
import numpy as np
t0=time.time(); x=0
while time.time()-t0<1.0: x+=1
cpu=x/1e6
t0=time.time(); np.ones(256*131072, dtype=np.int64)
alloc=256/(time.time()-t0)
load=os.getloadavg()[0]
ok = alloc>1000 and cpu>7.5 and load<4
print(f"cpu={cpu:.2f} alloc={alloc:.0f} load={load:.1f} ok={ok}")
exit(0 if ok else 1)
EOF
}

wait_clean() {
  local streak=0
  while true; do
    if out=$(probe); then
      streak=$((streak+1))
      echo "$(date +%T) CLEAN($streak) $out" >> "$LOG"
      [ "$streak" -ge 2 ] && return 0
    else
      streak=0
      echo "$(date +%T) dirty $out" >> "$LOG"
    fi
    sleep 60
  done
}

echo "=== wait_and_measure_r6 start $(date) ===" >> "$LOG"

if [ ! -f BENCH/bench_r6_clean.json ]; then
  wait_clean
  echo "$(date +%T) running bench (3 reps)" >> "$LOG"
  SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=48g python bench.py \
    > /tmp/bench_r6_stdout.json 2>> "$LOG" \
    && cp /tmp/bench_r6_stdout.json BENCH/bench_r6_clean.json \
    && echo "$(date +%T) bench done" >> "$LOG"
fi

if [ ! -f BENCH/scaling_r6_dedup_8v32.json ]; then
  wait_clean
  echo "$(date +%T) running dedup scaling 8v32" >> "$LOG"
  SPARK_DRIVER_MEM=48g python scripts/scaling_bench.py \
    --workloads dedup --low 8 --high 32 --reps 2 --docs 360000 \
    > BENCH/scaling_r6_dedup_8v32.json 2>> "$LOG" \
    && echo "$(date +%T) dedup scaling done" >> "$LOG"
fi

if [ ! -f BENCH/scaling_r6_16v32.json ]; then
  wait_clean
  echo "$(date +%T) running build/query scaling 16v32" >> "$LOG"
  SPARK_DRIVER_MEM=48g python scripts/scaling_bench.py \
    --workloads build,query --low 16 --high 32 --reps 2 \
    > BENCH/scaling_r6_16v32.json 2>> "$LOG" \
    && echo "$(date +%T) 16v32 scaling done" >> "$LOG"
fi

echo "=== wait_and_measure_r6 complete $(date) ===" >> "$LOG"
