#!/bin/bash
# Phase 3b: the cell-engine parts of the round-3 bench session (the
# (14,8,18) default grid shape is already disjoint-stencil capable -
# no prefer_disjoint).
set -u
cd "$(dirname "$0")/.."
echo "=== phase3b start $(date)"
echo "--- multi-trial adaptation sweep"
timeout 3600 python scripts/bench_multitrial_adapt.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_mt.log
echo "--- spatial overhead row (apply kernels)"
SP_PALLAS=apply timeout 1800 python scripts/bench_spatial.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_sp_apply.log
echo "--- spatial overhead row (XLA path)"
SP_PALLAS=off timeout 1800 python scripts/bench_spatial.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_sp_off.log
echo "--- cell engine N=8064 regression row (apply; T=1 chain kernel auto)"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=apply \
    timeout 1800 python scripts/bench_largen.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_cell_apply.log
echo "--- cell engine N=8064 T=4 row"
LN_NX=14 LN_NY=8 LN_M=18 LN_WALKERS=128 LN_CYCLES=5 LN_PALLAS=apply \
    LN_TRIALS=4 timeout 1800 python scripts/bench_largen.py \
    2>&1 | grep -v WARNING | tee /tmp/bench_r3_cell_t4.log
echo "=== phase3b done $(date)"
