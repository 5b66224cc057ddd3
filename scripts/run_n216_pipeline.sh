#!/bin/bash
# N=216 production pipeline on the (shared, sometimes-wedged) remote
# TPU: wait for a device claim, record the cell-engine benches, then
# run the deltaG sample phase under the watchdog supervisor.
#
# Usage:  scripts/run_n216_pipeline.sh [sample_budget_seconds]
#
# Prereq: runs/n216_wl_r2/eta_weights.dat (converged WL weights) and
# runs/n216_sample/ (driver + ice.input), both in-repo.
set -u
cd "$(dirname "$0")/.."
BUDGET="${1:-12600}"
echo "=== pipeline start $(date)"

ok=0
for i in $(seq 1 90); do
  echo "--- claim attempt $i $(date +%H:%M:%S)"
  timeout 150 python -c "
import jax,time,os,signal
t=time.time()
try:
    d = jax.devices()
except Exception as e:
    print('CLAIM FAIL:', type(e).__name__, str(e)[:120], flush=True)
    os.kill(os.getpid(), signal.SIGKILL)   # tokio threads hang exit
print('DEVICE OK', d, f'{time.time()-t:.0f}s', flush=True)
os._exit(0)" && { ok=1; break; }
  sleep 120
done
[ $ok = 1 ] || { echo "=== GIVE UP (no device) $(date)"; exit 1; }
echo "=== device acquired $(date)"

echo "--- headline bench (bench.py; hedge against a re-wedged lease at round end)"
BENCH_CLAIM_WAIT=900 timeout 1800 python bench.py \
    2> >(grep -v WARNING >&2) | tee /tmp/bench_r2_manual.json
echo "--- headline bench, W=8192 (walker-scaling data point)"
BENCH_CLAIM_WAIT=600 BENCH_WALKERS=8192 BENCH_NWATER=216 \
    timeout 1800 python bench.py 2> >(grep -v WARNING >&2) \
    | tee /tmp/bench_r2_w8192.json
echo "--- cell-engine bench N=8064 W=128 (XLA path)"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=off \
    timeout 1800 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "--- cell-engine bench N=8064 W=128 (Pallas sub-step kernel)"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=on \
    timeout 1800 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "--- cell-engine bench N=8064 W=128 (Pallas + in-place apply)"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=apply \
    timeout 1800 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "--- cell-engine bench N=8064 W=256 (XLA path, W-scaling continuity)"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=256 LN_CYCLES=5 LN_PALLAS=off \
    timeout 1800 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "--- cell-engine bench N=24192 W=64 (XLA path, continuity)"
LN_NX=24 LN_NY=14 LN_M=18 LN_WALKERS=64 LN_CYCLES=3 LN_PALLAS=off \
    timeout 2400 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "--- cell-engine bench N=24192 W=64 (Pallas sub-step kernel)"
LN_NX=24 LN_NY=14 LN_M=18 LN_WALKERS=64 LN_CYCLES=3 LN_PALLAS=on \
    timeout 2400 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "--- cell-engine bench N=24192 W=64 (disjoint grid + in-place apply)"
LN_NX=24 LN_NY=14 LN_M=18 LN_WALKERS=64 LN_CYCLES=3 LN_PALLAS=apply \
    LN_DISJOINT=1 \
    timeout 2400 python scripts/bench_largen.py 2>&1 | grep -v WARNING
echo "=== bench done $(date)"

python scripts/retarget_weights.py \
    runs/n216_wl_r2/eta_weights.dat runs/n216_sample/eta_weights.dat \
    || { echo "=== ABORT: weight retargeting failed"; exit 1; }
python scripts/watchdog.py --workdir runs/n216_sample \
    --cmd "python run.py" --watch mc.log \
    --stale 900 --grace 1800 --max-restarts 10 --budget "$BUDGET"
echo "=== pipeline done $(date)"
