"""Command-line interface: ``mw-water-ls <input file>``.

Mirrors the reference executable's usage (io.f90:108-120) while adding
TPU-native flags (walker count, platform, dtype, cycle override).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="mw-water-ls",
        description=(
            "Lattice-switching Monte Carlo for mW water - "
            "TPU-native JAX framework"
        ),
    )
    ap.add_argument("input", help="namelist input file (e.g. ice.input)")
    ap.add_argument("--walkers", type=int, default=None,
                    help="vmapped walker-ensemble size")
    ap.add_argument("--max-cycles", type=int, default=None,
                    help="override max_mc_cycles")
    ap.add_argument("--dtype", choices=["float32", "float64"], default=None)
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (e.g. cpu)")
    ap.add_argument("--x64", action="store_true",
                    help="enable fp64 (parity mode)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler device trace of one "
                         "steady-state cycle block to this directory")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64 or args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    overrides = {}
    if args.walkers is not None:
        overrides["n_walkers"] = args.walkers
    if args.dtype is not None:
        overrides["dtype"] = args.dtype
    if args.seed is not None:
        overrides["seed"] = args.seed

    from .app import run_input_file

    run_input_file(
        args.input, overrides=overrides, max_cycles=args.max_cycles,
        profile_dir=args.profile_dir,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
