"""Run configuration - the framework's equivalent of userparams.f90.

All user-settable knobs with the reference's defaults
(reference: userparams.f90:13-80), plus TPU-specific extensions
(walker-ensemble size, compute dtype, move scheduling).  The dataclass
is frozen/hashable so it can be closed over as a jit-static constant.

Unit conventions are internal atomic units, exactly as the reference
converts on input (io.f90:162-244): pressure atm -> a.u.,
lengths Angstrom -> Bohr.
"""

from __future__ import annotations

import dataclasses

from ..constants import ANG_TO_BOHR, AUP_TO_ATM, KB


@dataclasses.dataclass(frozen=True)
class RunParams:
    """User parameters (defaults mirror userparams.f90)."""

    # model / configuration
    model_type: str = "mW"
    nwater: int = 768
    num_lattices: int = 2
    method: str = "xmol"

    # thermal (internal units)
    pressure: float = 1.0 / AUP_TO_ATM          # a.u.p.
    temperature: float = 240.0                  # Kelvin

    # Monte-Carlo
    mc_ensemble: str = "npt"
    mc_max_trans: float = 0.6                   # Bohr
    mc_target_ratio: float = 0.50
    mc_dv_max: float = 0.1                      # Bohr
    #: NPT volume wall: fractional half-width around each replica's
    #: REFERENCE lattice volume (0 = off).  Excludes the evaporation
    #: branch that otherwise fills central mu-windows with gas
    #: states at large N (engine._volume round-5 note).
    mc_vol_wall: float = 0.0
    #: Cell-engine displacement wall (Bohr; 0 = off): every molecule
    #: stays within this radius of its lattice-1 reference site
    #: (minimum image).  The standard LS-MC coherence regularizer —
    #: at large N the barrier windows otherwise fill with lockstep-
    #: disordered states (both replicas hot, mu still ~0; measured
    #: round 5 at N=8064, DESIGN.md §5d).  The dense table path's
    #: trans_wall is the same constraint (there for table capture).
    cell_trans_wall: float = 0.0

    wl_factor: float = 0.05
    wl_schedule: int = 0
    wl_minhist: int = 20
    wl_flattol: float = 0.05
    wl_useinvt: bool = False
    wl_swetnam: bool = False
    wl_alpha: float = 1.0
    eta_interp: bool = True
    samplerun: bool = False
    leshift: bool = False

    nbins: int = 201
    mu_min: float = -8000.0
    mu_max: float = 8000.0

    allow_switch: bool = True
    allow_vol: bool = True
    allow_trans: bool = True

    mc_trans_prob: float = 0.5
    mc_vol_prob: float = 0.01
    mc_switch_prob: float = 0.0
    mc_always_switch: bool = True

    input_ref_enthalpy: tuple = (0.0, 0.0)

    # book-keeping intervals
    list_update_int: int = 50
    traj_output_int: int = 5_000_000
    file_output_int: int = 5
    latt_sync_int: int = 10_000
    mpi_sync_int: int = 250
    chkpt_dump_int: int = 1000
    monitor_int: int = 1000
    flat_chk_int: int = 10_000
    invt_dump_int: int = 500_000
    eq_adjust_mc: bool = False
    deltaG_int: int = 100_000
    max_mc_cycles: int = 1000
    eq_mc_cycles: int = 25_000

    # parallelisation (reference: 'mw' walkers or 'dd' mu-windows,
    # userparams.f90:75-76)
    parallel_strategy: str = "mw"
    window_overlap: int = 2

    # timer (reference: timer.f90 via bookkeeping namelist)
    timer_qtime: float = 172800.0
    timer_closetime: float = 3600.0

    seedname: str = "mc"
    ls: int = 1                                  # 1-based initial lattice

    # ---- TPU-native extensions (no reference counterpart) ----
    n_walkers: int = 32          # vmapped ensemble size (SURVEY.md §7)
    n_windows: int = 8           # dd-mode mu-window count (ref: MPI size)
    dd_seeding: bool = True      # dd equilibration semantics: True =
                                 # window seeding (pre-window walkers
                                 # sample the wall-less GLOBAL weight
                                 # curve and in_window is non-sticky
                                 # during eq); False = reference
                                 # semantics (unbiased pre-window
                                 # sampling, reach-once sticky flag,
                                 # warm-start weights masked to each
                                 # window - mc_init:808-814,
                                 # mc_cycle:181-210, eta_weight:913).
                                 # A/B-validated: test_window_seeding_ab
    neighbour_capacity: int = 40 # padded list capacity (ref maxneigh=50)
    dtype: str = "float32"       # compute dtype ('float64' = parity mode)
    fused: str = "auto"          # whole-cycle Pallas kernel: on/off/auto
                                 # (auto = on for TPU, off for CPU)
    cell_pallas: str = "auto"    # cell-engine fused sub-step energy
                                 # kernel (ops/cell_pallas.py):
                                 # on/off/auto/apply (auto = on for
                                 # TPU when the coverage table is
                                 # unpadded; 'apply' additionally
                                 # moves the post-accept moment
                                 # update in-kernel, aliased in-place
                                 # slab writes)
    # static reference-lattice neighbour tables + shared molecule
    # schedule + displacement wall (the candidate-reduction fast path;
    # see ops/nbrtable.py).  'auto' = on when the geometry allows
    # (MIC-unique box, N >= 96); 'off' = exact reference move
    # semantics (per-walker molecule draw, no wall)
    nbr_table: str = "auto"
    trans_wall: float = 1.5      # displacement-from-reference hard
                                 # wall in Bohr (table mode only)
    dense_trials: int = 1        # anchored-window multi-trial on the
                                 # DENSE fused table path: T trials of
                                 # one mover share a single gather/
                                 # store of its ~28 candidate rows -
                                 # the 88% per-move fetch/store budget
                                 # of DESIGN.md 5d amortised T-fold.
                                 # Same proposal law + extended-space
                                 # proof as cell_trials
                                 # (cellengine._substep_multi); >1
                                 # requires table mode + the fused
                                 # kernel + two lattices
    seed: int = 0                # RNG seed
    therm_walkers: int = 1       # walkers sampled into therm output
    minu: bool = False           # reference's #ifdef MINU variant
    tile: tuple = (1, 1, 1)      # supercell replication of the input cells

    # ---- large-N cell engine (mcmc/cellengine.py) ----
    largen: str = "auto"         # parallel cell-sweep engine: on/off/auto
                                 # (auto = on when the box supports a
                                 # valid cell grid and N >= threshold)
    largen_threshold: int = 4000
    cell_cap: int = 0            # slab slots per cell (0 = auto-size)
    cell_trials: int = 1         # trials per scheduled mover per
                                 # sub-step (anchored-window
                                 # multi-trial: T trials share one
                                 # coverage-stencil fetch; >1 changes
                                 # the proposal law, not the
                                 # stationary distribution - see
                                 # CellEngine._substep_multi)
    cell_chain: str = "auto"     # fused acceptance-chain + per-move
                                 # WL kernel for the multi-trial
                                 # sub-step (mcmc/chain_pallas.py):
                                 # on/off/auto (auto = on whenever
                                 # the point-energies kernel is on)
    relabel: bool = False        # Hungarian relabeling of lattice 2 to
                                 # minimise correspondence mismatch
    stack: tuple = (0, 0, 0)     # (nx, ny, bilayers): build the Ih/Ic
                                 # stacking pair instead of reading xmol

    @property
    def beta(self) -> float:
        return 1.0 / (KB * self.temperature)

    def normalised_probs(self):
        """Cumulative move-type probabilities (mc_cycle, mc_moves.F90:153-176)."""
        trans = self.mc_trans_prob
        vol = self.mc_vol_prob
        switch = self.mc_switch_prob
        if self.mc_always_switch:
            switch = 0.0
        if not self.allow_switch:
            switch = 0.0
        if self.mc_ensemble == "nvt":
            vol = 0.0
        if not self.allow_vol:
            vol = 0.0
        if not self.allow_trans:
            trans = 0.0
        total = trans + vol + switch
        if total <= 0:
            raise ValueError("no move types enabled")
        trans_p = trans / total
        vol_p = vol / total + trans_p
        sw_p = switch / total + vol_p
        if sw_p < 0.999:
            raise ValueError("cumulative move type probability error")
        return trans_p, vol_p, sw_p

    def with_reference_input_overrides(self):
        """Pre-namelist defaults applied by the reference reader
        (io.f90:171-172): switch prob 0.1, vol prob 1/nwater."""
        return dataclasses.replace(
            self,
            mc_switch_prob=0.1,
            mc_vol_prob=1.0 / self.nwater,
        )


def convert_input_units(p: RunParams) -> RunParams:
    """Convert user-facing units to internal a.u. (io.f90:162-244)."""
    return dataclasses.replace(
        p,
        pressure=p.pressure / AUP_TO_ATM,
        mc_max_trans=p.mc_max_trans * ANG_TO_BOHR,
        mc_dv_max=p.mc_dv_max * ANG_TO_BOHR,
    )
