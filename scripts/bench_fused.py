"""Quick fused-vs-scan TPU micro-benchmark (dev tool, not the headline
bench).  Usage: python scripts/bench_fused.py [walkers] [cycles] [mode]
mode in {on,off,both}."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import __graft_entry__ as g
from mc_water_ls_mw_tpu.mcmc.engine import Engine
from mc_water_ls_mw_tpu.models.sw import MW


def run(fused, walkers, cycles):
    prm, eng, state = g._setup(n_walkers=walkers, dtype="float32")
    prm = dataclasses.replace(prm, fused=fused)
    eng = Engine(prm, MW, eng.grid, eng.aux)
    t0 = time.time()
    s, _ = eng.run_cycles(state, cycles)
    jax.block_until_ready(s)
    np.asarray(s.mu[:1])  # force real sync through the tunnel
    compile_s = time.time() - t0
    t0 = time.time()
    s, _ = eng.run_cycles(s, cycles)
    jax.block_until_ready(s)
    np.asarray(s.mu[:1])
    dt = time.time() - t0
    rate = walkers * prm.nwater * cycles / dt
    print(f"fused={fused}: {rate/1e6:.2f} M moves/s "
          f"({dt:.3f}s for {cycles} cycles; compile {compile_s:.1f}s)",
          flush=True)
    return s


if __name__ == "__main__":
    walkers = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    if mode in ("on", "both"):
        run("on", walkers, cycles)
    if mode in ("off", "both"):
        run("off", walkers, cycles)
