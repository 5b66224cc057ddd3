#!/bin/bash
# Round-3 TPU bench session: runs after the dd production run frees
# the chip.  Headline bench, multi-trial adaptation sweep, spatial
# overhead row, and cell-engine regression rows.
set -u
cd "$(dirname "$0")/.."
echo "=== phase3 start $(date)"

ok=0
for i in $(seq 1 40); do
  echo "--- claim attempt $i $(date +%H:%M:%S)"
  timeout 150 python -c "
import jax,os,signal
try:
    d = jax.devices()
except Exception as e:
    print('CLAIM FAIL:', type(e).__name__, str(e)[:120], flush=True)
    os.kill(os.getpid(), signal.SIGKILL)
print('DEVICE OK', d, flush=True)
os._exit(0)" && { ok=1; break; }
  sleep 60
done
[ $ok = 1 ] || { echo "=== GIVE UP (no device) $(date)"; exit 1; }

echo "--- headline bench (W=4096)"
BENCH_CLAIM_WAIT=900 timeout 1800 python bench.py \
    2> >(grep -v WARNING >&2) | tee /tmp/bench_r3_w4096.json
echo "--- headline bench W=8192 N=216"
BENCH_CLAIM_WAIT=600 BENCH_WALKERS=8192 BENCH_NWATER=216 \
    timeout 1800 python bench.py 2> >(grep -v WARNING >&2) \
    | tee /tmp/bench_r3_w8192.json

echo "--- multi-trial adaptation sweep (N=8064, adapt + accepted-moves/s)"
timeout 3000 python scripts/bench_multitrial_adapt.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_mt.log

echo "--- spatial D=1 overhead row (apply kernels)"
SP_PALLAS=apply timeout 1800 python scripts/bench_spatial.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_sp_apply.log
echo "--- spatial D=1 overhead row (XLA path)"
SP_PALLAS=off timeout 1800 python scripts/bench_spatial.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_sp_off.log

echo "--- cell engine N=8064 regression rows (T=1 chain kernel now auto)"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=apply \
    LN_DISJOINT=1 timeout 1800 python scripts/bench_largen.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_cell_apply.log
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=apply \
    LN_DISJOINT=1 LN_TRIALS=4 timeout 1800 python scripts/bench_largen.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_cell_t4.log
echo "=== phase3 done $(date)"
