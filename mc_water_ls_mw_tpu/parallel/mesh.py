"""Device-mesh sharding of the walker ensemble.

The reference scales out with MPI ranks (comms_mpi.f90); the TPU
rebuild scales by sharding the trailing walker axis of the state
pytree over a 1-D ``jax.sharding.Mesh``.  Every cross-walker reduction in the
engine (delta-sync segment sums) then lowers to an ICI collective via
GSPMD - no explicit communication code.  A 1-device mesh degenerates
to the serial case, playing the role of comms_serial.f90.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("walkers",))


def shard_state(state, mesh: Mesh, n_walkers: int):
    """Place the state pytree: leaves whose LAST axis is the walker
    axis are sharded over the mesh, everything else replicated.

    (Exception: the per-walker RNG keys are [W, 2] - walker-first
    because jax.random requires trailing key components - and shard on
    axis 0.)

    dd-mode note: walkers are assigned to mu-windows round-robin
    (state.window_id = arange(W) % nwin), so each device holds an
    equal slice of every window and the per-window segment sums ride
    the same all-reduce as the mw merge.
    """
    replicated = NamedSharding(mesh, P())

    def place(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim < 1:
            return jax.device_put(leaf, replicated)
        if leaf.ndim >= 1 and leaf.shape[-1] == n_walkers:
            spec = P(*((None,) * (leaf.ndim - 1) + ("walkers",)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        if leaf.ndim == 2 and leaf.shape[0] == n_walkers:
            return jax.device_put(
                leaf, NamedSharding(mesh, P("walkers", None))
            )
        return jax.device_put(leaf, replicated)

    return jax.tree.map(place, state)
