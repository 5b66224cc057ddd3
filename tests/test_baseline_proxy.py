"""The C++ baseline proxy (scripts/baseline_proxy.cpp) must compute
the same physics per move as the framework: its init energies are the
fp64 oracle values of VALIDATION.md (a).  This is what qualifies its
measured moves/s as a baseline anchor (BASELINE.md, measured proxy).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists("/root/reference/examples/ice1_sample"),
    reason="packaged reference cells not mounted",
)
def test_proxy_matches_oracle_energies(tmp_path):
    res = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "scripts", "run_baseline_proxy.py"),
         "20", "5"],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    # stderr carries the per-lattice init-energy lines
    lines = [l for l in res.stderr.splitlines()
             if l.startswith("# lattice")]
    assert len(lines) == 4, res.stderr[-2000:]
    # packaged N=48 cells: Ih then Ic (VALIDATION.md a)
    assert "-25.556682" in lines[0]
    assert "-25.586981" in lines[1]
    # built N=216 pair: ideal-lattice cohesive energy per molecule
    assert "-0.536761" in lines[2]
    assert "-0.536761" in lines[3]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["n48"]["N"] == 48 and out["n216"]["N"] == 216
    assert out["n48"]["moves_per_s"] > 0
