#!/bin/bash
# Poll until the VM is healthy (page-backing alloc probe > 1000 MiB/s,
# CPU probe > 7.5 M iters/s, loadavg < 4 — two consecutive clean
# reads), then run the round-4 pending measurements:
#   1. bench.py, 3 reps             -> BENCH/bench_r4h_local.json
#   2. scaling dedup workload 8v32  -> BENCH/scaling_r4e_dedup_8v32.json
#   3. engine_cmp sql-vs-arrow 60k  -> BENCH/engine_cmp_r4.json
# Each step re-probes first and skips back to waiting if the window
# degraded. Log: $LOG (default /tmp/wait_and_measure_s6.log).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${LOG:-/tmp/wait_and_measure_s6.log}"
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

echo "=== wait_and_measure start $(date) ===" >> "$LOG"

if [ ! -f BENCH/bench_r4h_local.json ]; then
  wait_clean
  echo "$(date +%T) running bench (3 reps)" >> "$LOG"
  SPARK_GRAFT_REPS=3 SPARK_DRIVER_MEM=48g python bench.py \
    > /tmp/bench_r4h_stdout.json 2>> "$LOG" \
    && cp /tmp/bench_r4h_stdout.json BENCH/bench_r4h_local.json \
    && echo "$(date +%T) bench done" >> "$LOG"
fi

if [ ! -f BENCH/scaling_r4e_dedup_8v32.json ]; then
  wait_clean
  echo "$(date +%T) running dedup scaling 8v32" >> "$LOG"
  SPARK_DRIVER_MEM=48g python scripts/scaling_bench.py \
    --workloads dedup --low 8 --high 32 --reps 2 --docs 360000 \
    > BENCH/scaling_r4e_dedup_8v32.json 2>> "$LOG" \
    && echo "$(date +%T) dedup scaling done" >> "$LOG"
fi

if [ ! -f BENCH/engine_cmp_r4.json ] && [ ! -f BENCH/engine_cmp_r5.json ]; then
  wait_clean
  echo "$(date +%T) running engine_cmp" >> "$LOG"
  SPARK_DRIVER_MEM=48g python scripts/engine_cmp.py --reps 3 \
    >> "$LOG" 2>&1 \
    && echo "$(date +%T) engine_cmp done" >> "$LOG"
fi

# second clean-window 16->32 build/query rep (VERDICT r4 item 5:
# r4c showed build 0.77 / query 0.75 of ceiling once; one more rep
# at ceiling >= 0.85 makes it evidence instead of anecdote)
if [ ! -f BENCH/scaling_r5a_16v32.json ]; then
  wait_clean
  echo "$(date +%T) running build/query scaling 16v32" >> "$LOG"
  SPARK_DRIVER_MEM=48g python scripts/scaling_bench.py \
    --workloads build,query --low 16 --high 32 --reps 2 \
    > BENCH/scaling_r5a_16v32.json 2>> "$LOG" \
    && echo "$(date +%T) 16v32 scaling done" >> "$LOG"
fi

echo "=== wait_and_measure complete $(date) ===" >> "$LOG"
