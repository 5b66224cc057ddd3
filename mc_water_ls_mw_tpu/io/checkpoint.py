"""Dual-slot checkpointing of the full sampler state.

Rebuild of the reference's alternating unformatted checkpoint files
(mc_checkpoint_write/load, mc_moves.F90:324-501): two slots are
written alternately so one valid checkpoint always survives a crash
mid-write; the loader probes both and restores the newer readable one.
Here a slot is a single .npz of the whole state pytree (positions of
both replicas, references, cells, WL weights/histograms/f, active
lattice, cycle, step sizes AND the RNG keys - strictly more complete
than the reference, which cannot restore its RNG stream).
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

from ..mcmc.state import SamplerState
from ..ops.neighbours import NeighbourList

_BASENAME = "checkpoint000"


def _slot_path(directory, slot):
    return os.path.join(directory, f"{_BASENAME}.npz.{slot}")


def checkpoint_paths(directory="."):
    return [_slot_path(directory, s) for s in (1, 2)]


def restart_available(directory=".") -> bool:
    """Restart auto-detection (main.f90:65-68)."""
    return any(os.path.exists(p) for p in checkpoint_paths(directory))


def state_fingerprint(state) -> str:
    """Layout fingerprint of a state pytree: engine kind + every
    field's (name, shape, dtype).  Shapes pin nbins / n_walkers /
    nwater / num_lattices implicitly; the kind separates the dense
    SamplerState from the large-N CellState slab layout.  A restore
    is positional by leaf index, so any layout drift MUST be refused
    rather than mis-loaded."""
    def meta(x):
        # metadata only - no np.asarray: that would pull the whole
        # array to host, doubling every checkpoint's device traffic
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return [list(x.shape), str(x.dtype)]
        return [list(np.shape(x)), str(np.asarray(x).dtype)]

    fields = [
        [name] + [[meta(leaf) for leaf in jax.tree.leaves(field)]]
        for name, field in zip(type(state)._fields, state)
    ]
    import json

    return json.dumps(
        {"kind": type(state).__name__, "fields": fields}
    )


class CheckpointWriter:
    """Alternating-slot writer (mc_checkpoint_write:336-350)."""

    def __init__(self, directory="."):
        self.directory = directory
        self.slot = 1

    def write(self, state: SamplerState):
        leaves, treedef = jax.tree.flatten(state)
        arrays = {f"leaf{i}": np.asarray(x) for i, x in enumerate(leaves)}
        arrays["__fingerprint__"] = np.frombuffer(
            state_fingerprint(state).encode(), dtype=np.uint8
        )
        path = _slot_path(self.directory, self.slot)
        # atomic within the slot: write then rename
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
        self.slot = 2 if self.slot == 1 else 1
        return path


def load_checkpoint(template: SamplerState, directory="."):
    """Probe both slots, restore the newer readable one
    (mc_checkpoint_load:417-448).  Returns (state, cycle) or None.

    A slot whose stored fingerprint disagrees with the template's
    (different nbins / n_walkers / nwater / engine kind / dtype) is an
    incompatible run configuration: refused with a clear error instead
    of a cryptic positional mis-load."""
    leaves_t, treedef = jax.tree.flatten(template)
    want_fp = state_fingerprint(template)
    # legacy (round-2 early) fingerprint format: per-field
    # [name, np.shape(field), asarray(field).dtype] - computed lazily
    # only if a stored fingerprint fails the current format, so old
    # checkpoints stay restorable without paying its host transfers
    # on the hot write path
    legacy_fp = None

    def want_legacy():
        nonlocal legacy_fp
        if legacy_fp is None:
            import json

            fields = [
                [name, list(np.shape(f)), str(np.asarray(f).dtype)]
                for name, f in zip(type(template)._fields, template)
            ]
            legacy_fp = json.dumps(
                {"kind": type(template).__name__, "fields": fields}
            )
        return legacy_fp

    candidates = []
    mismatches = []
    for path in checkpoint_paths(directory):
        if not os.path.exists(path):
            continue
        try:
            with np.load(path) as data:
                if "__fingerprint__" in data:
                    got_fp = bytes(
                        data["__fingerprint__"].tobytes()
                    ).decode()
                    if got_fp != want_fp and got_fp != want_legacy():
                        mismatches.append((path, got_fp))
                        continue
                leaves = [data[f"leaf{i}"] for i in range(len(leaves_t))]
            state = jax.tree.unflatten(treedef, [
                np.asarray(l) for l in leaves
            ])
            candidates.append((int(state.cycle), path, state))
        except Exception:
            continue
    if not candidates:
        if mismatches:
            path, got_fp = mismatches[-1]
            raise RuntimeError(
                f"checkpoint {path} was written by an incompatible "
                f"run configuration and cannot be restored.\n"
                f"  expected: {want_fp}\n  found:    {got_fp}\n"
                "Remove the checkpoint files to start fresh, or "
                "restore the original nbins/n_walkers/nwater/engine "
                "settings."
            )
        return None
    candidates.sort(key=lambda c: c[0])
    cycle, path, state = candidates[-1]
    # re-device the arrays with the template's dtypes/sharding
    state = jax.tree.map(
        lambda tpl, arr: jax.numpy.asarray(arr, dtype=tpl.dtype),
        template, state,
    )
    return state, cycle, path
