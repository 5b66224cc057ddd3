#!/bin/bash
# Phase 2 of the round-2 hardware session: wait for the running
# n216 sample pipeline (run_n216_pipeline.sh) to release the chip,
# run the cell-engine A/B benches that failed on the sys.path bug,
# then extend the N=216 sample run for more deltaG statistics up to
# a wall-clock DEADLINE (epoch seconds) after which the chip must be
# idle again (the round driver runs bench.py on it).
#
# Usage: scripts/run_phase2.sh <pipeline_pid> <deadline_epoch>
set -u
cd "$(dirname "$0")/.."
PID="${1:?pipeline pid}"
DEADLINE="${2:?deadline epoch seconds}"
echo "=== phase2 start $(date); waiting on pid $PID; deadline $(date -d @"$DEADLINE")"
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

# Wang-Landau weight-generation parity vs the packaged converged
# curve (VALIDATION.md d): 150k cycles from zero weights, the
# documented configuration.  Artifact harvested from the printed
# run_dir into runs/wl_validation/ afterwards.
echo "=== validate_wl $(date)"
timeout 3600 python scripts/validate_wl.py 150000 4096 \
    2>&1 | grep -v WARNING | tee /tmp/logs/wl_validation.out
echo "=== validate_wl done $(date)"

# Extend the sample run from its checkpoint for more statistics,
# but only with whatever wall clock remains before the deadline
# (minus margin for the final bench.py verification below).
# run.py's qtime bounds the run itself (clean stop + checkpoint
# timer_closetime=420s before the budget); the watchdog is the
# hard backstop.
NOW=$(date +%s)
EXTRA=$(( DEADLINE - NOW - 2100 ))
if [ "$EXTRA" -gt 1200 ]; then
  echo "=== sample extension: ${EXTRA}s $(date)"
  WL_QTIME="$EXTRA" python scripts/watchdog.py --workdir runs/n216_sample \
      --cmd "python run.py" --watch mc.log \
      --stale 900 --grace 600 --max-restarts 6 --budget $((EXTRA + 600))
else
  echo "=== no time for sample extension (EXTRA=${EXTRA}s)"
fi

# Leave proof the chip is claimable and the driver's bench goes green.
echo "=== final bench.py verification $(date)"
BENCH_CLAIM_WAIT=900 BENCH_CYCLES=50 timeout 2400 python bench.py
echo "=== phase2 done $(date)"
