"""Stillinger-Weber potential parameterisations (mW monatomic water).

The model registry of the framework.  The reference supports a single
Hamiltonian, model_type='mW' (reference: molint.F90:63-74,
data_structures.f90:100-135); parameters are frozen here as a
hashable dataclass so they trace as jit-static constants, mirroring
the reference's decision to store them as compile-time ``parameter``s
"for optimisation" (molint.F90:62).

The SW energy is

  E = sum_pairs  A*eps*(B*(sigma/r)^p - (sigma/r)^q) * exp(sigma/(r - a*sigma))
    + sum_triplets lam*eps*(cos(theta_jik) - cos0)^2
        * exp(gamma*sigma/(r_ij - a*sigma)) * exp(gamma*sigma/(r_ik - a*sigma))

with the mW parameterisation p=4, q=0 (reference: molint.F90:456-487).
"""

from __future__ import annotations

import dataclasses

from ..constants import ANG_TO_BOHR


@dataclasses.dataclass(frozen=True)
class SWParams:
    """Stillinger-Weber parameters in atomic units.

    Mirrors the compile-time constants of the reference
    (molint.F90:64-74).  ``p``/``q`` are fixed to the mW values (4, 0):
    the reference hard-codes (sigma^2/r^2)^2 in its energy loops.
    """

    name: str
    sigma: float      # length scale (Bohr)
    epsilon: float    # energy scale (Hartree)
    lam: float        # three-body strength (dimensionless)
    bigA: float       # pair prefactor
    bigB: float       # pair (sigma/r)^4 coefficient
    gamma: float      # three-body decay
    a: float          # cutoff in units of sigma
    cos0: float       # cos(theta_0); deliberately != -1/3 exactly
    p: int = 4
    q: int = 0

    @property
    def rc(self) -> float:
        """Interaction cutoff a*sigma (Bohr) (molint.F90:255)."""
        return self.a * self.sigma

    @property
    def rc2(self) -> float:
        return self.rc * self.rc

    @property
    def rskin(self) -> float:
        """Verlet-list radius: cutoff * 1.18 (molint.F90:516)."""
        return self.rc * 1.18


# mW water: Molinero & Moore (2009) parameterisation, stored exactly as
# the reference does (molint.F90:64-74).
MW = SWParams(
    name="mW",
    sigma=2.3925 * ANG_TO_BOHR,
    epsilon=6.189 / 627.509469,
    lam=23.15,
    bigA=7.049556277,
    bigB=0.6022245584,
    gamma=1.2,
    a=1.8,
    cos0=-0.33331324756,
)

# Original silicon parameterisation (Stillinger & Weber, PRB 31,
# 5262 (1985)) - the parent of mW, same functional form with epsilon =
# 50 kcal/mol, sigma = 2.0951 A, lambda = 21.  Unlike mW, cos0 here IS
# exactly -1/3, so the three-body sum vanishes identically on the
# ideal diamond lattice and the cohesive energy is exactly -2*epsilon
# per atom at the pair-minimum bond length (2.35167 A) - an analytic
# oracle for every energy kernel (tests/test_models.py).
SI = SWParams(
    name="Si",
    sigma=2.0951 * ANG_TO_BOHR,
    epsilon=50.0 / 627.509469,
    lam=21.0,
    bigA=7.049556277,
    bigB=0.6022245584,
    gamma=1.2,
    a=1.8,
    cos0=-1.0 / 3.0,
)


# Model registry; the reference supports only 'mW'
# (data_structures.f90:100-135, init.f90:100-114) - 'Si' is a
# framework extension exercising the generic SW family.
MODELS = {"mW": MW, "Si": SI}


def get_model(name: str) -> SWParams:
    try:
        return MODELS[name.strip()]
    except KeyError:
        raise ValueError(
            f"Unknown model_type {name!r}; supported: {sorted(MODELS)}"
        ) from None
