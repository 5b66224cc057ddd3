#!/bin/bash
# Phase 2 of the round-2 hardware session: wait for the running
# n216 sample pipeline (run_n216_pipeline.sh) to release the chip,
# run the cell-engine A/B benches that failed on the sys.path bug,
# then extend the N=216 sample run for more deltaG statistics.
#
# Usage: scripts/run_phase2.sh <pipeline_pid> [extra_sample_seconds]
set -u
cd "$(dirname "$0")/.."
PID="${1:?pipeline pid}"
EXTRA="${2:-21600}"
echo "=== phase2 start $(date); waiting on pid $PID"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "=== pipeline exited $(date)"
sleep 30

run_bench () {
  echo "--- $*  $(date +%H:%M:%S)"
  env "$@" timeout 2700 python scripts/bench_largen.py 2>&1 | grep -v WARNING
}

run_bench LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=off
run_bench LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=on
run_bench LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=apply
run_bench LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=256 LN_CYCLES=5 LN_PALLAS=off
run_bench LN_NX=24 LN_NY=14 LN_M=18 LN_WALKERS=64 LN_CYCLES=3 LN_PALLAS=off
run_bench LN_NX=24 LN_NY=14 LN_M=18 LN_WALKERS=64 LN_CYCLES=3 LN_PALLAS=on
run_bench LN_NX=24 LN_NY=14 LN_M=18 LN_WALKERS=64 LN_CYCLES=3 LN_PALLAS=apply LN_DISJOINT=1
echo "=== benches done $(date)"

# Extend the sample run from its checkpoint for more statistics.
# The watchdog bounds total wall time; run.py's qtime bounds the
# run itself (clean stop + checkpoint before the budget).
WL_QTIME="$EXTRA" python scripts/watchdog.py --workdir runs/n216_sample \
    --cmd "python run.py" --watch mc.log \
    --stale 900 --grace 1800 --max-restarts 6 --budget $((EXTRA + 1200))
echo "=== phase2 done $(date)"
