"""RMM fast-path engine for the product driver.

Adapts RMMSimulation (ops/rmm.py: dense cell-layout primary state,
verlet-skin rebin cadence, cwn3l Pallas kernels, Kahan integration) to
the engine surface MDSimulation and its plugins use, so
``python -m ls1_mardyn_tpu argon.xml`` runs single-component 1CLJ
scenes at benchmark speed instead of routing them through
PallasLJPath's every-step global-sort rebinning.

The reference measures its headline number on the real driver loop
(/root/reference/src/MarDyn.cpp:262-266), whose container update has
its own cadence logic (src/Simulation.cpp:1265-1299 skipParticleUpdate)
-- this adapter is that cadence logic for the TPU design.

Contract notes:
  - ``mol`` / ``forces`` are PROPERTIES: reading gathers the dense
    planes back to flat MoleculeState/Forces arrays (cached per step);
    writing re-initializes the dense state from the assigned arrays
    (exact, but costs a full rebin + force evaluation -- plugins that
    mutate state every step should keep the general engine, see
    MDSimulation._RMM_SAFE_PLUGINS).
  - ``advance(need_macro)``: one leapfrog step.  With
    need_macro=False the kernel skips the Upot/virial reduction passes
    (~20%); the returned GlobalValues then carries kinetic-only data
    and ``macro_fresh`` is False -- the driver only requests macro on
    steps whose value someone reads (print/watchdog/plugin cadence).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.ops.cells import CellGridSpec, wrap_positions
from ls1_mardyn_tpu.ops.rmm import RMMSimulation
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState
from ls1_mardyn_tpu.utils.logger import global_log


def pick_rmm_grid(r, box, rc, cap=32, headroom=2, skin_min=0.29):
    """Coarsest overflow-safe anisotropic grid for the dense RMM
    layout: kernel work is n_cells * cap^2 regardless of occupancy, so
    the coarsest grid whose measured per-cell occupancy (plus drift
    headroom) fits `cap` wins.  Mirrors bench.py's selection so the CLI
    and the benchmark run the same geometry.  Returns (dims, cap)."""
    box = np.asarray(box, float)
    r = np.asarray(r, float) % box

    def occ_max(dims):
        dims_a = np.asarray(dims)
        edge = box / dims_a
        c = np.clip((r / edge).astype(np.int64), 0, dims_a - 1)
        idx = (c[:, 0] * dims_a[1] + c[:, 1]) * dims_a[2] + c[:, 2]
        return int(np.bincount(idx, minlength=int(np.prod(dims_a))).max())

    # per-axis candidate counts: multiples of 4 (x for the 128-lane
    # rows, y for the rebin kernel's row chunking), edge >= rc+skin_min
    def cands_axis(L):
        hi = int(np.floor(L / (rc + skin_min)))
        return [c for c in range(4, hi + 1, 4)]

    cx, cy, cz = (cands_axis(L) for L in box)
    if not (cx and cy and cz):
        # box too small for a >=4-cell grid with a usable verlet skin:
        # the dense RMM layout has no advantage here
        return None, cap
    best = None
    for nx in cx:
        for ny in cy:
            for nz in cz:
                if max(ny, nz) - min(ny, nz) > 8 or abs(ny - nx) > 8 \
                        or abs(nz - nx) > 8:
                    continue
                cells = nx * ny * nz
                if best is not None and cells >= best[0]:
                    continue
                if len(r) > cells * (cap - headroom):
                    continue
                if occ_max((nx, ny, nz)) <= cap - headroom:
                    best = (cells, (nx, ny, nz))
    if best is not None:
        return best[1], cap
    # nothing fits at this cap: finest admissible grid, escalate cap
    dims = tuple(
        max(4, int(np.floor(L / (rc + skin_min))) // 4 * 4) for L in box
    )
    need = occ_max(dims) + headroom
    cap2 = cap
    while cap2 < need:
        cap2 *= 2
    return dims, cap2


class RMMEngine:
    """SingleChipSimulation-compatible facade over RMMSimulation."""

    def __init__(
        self,
        mol: MoleculeState,
        pp,
        table,
        box,
        config,  # SimConfig
        spec: CellGridSpec,
        rebin_every: int = 8,
        interpret: bool = False,
    ):
        self.pp = pp
        # cell_cap reflects the RMM grid's actual capacity so the
        # driver's overflow re-spec doubles from the right base
        self.config = dataclasses.replace(config, cell_cap=spec.cap)
        self.box = tuple(float(b) for b in np.asarray(box))
        self.spec = spec
        self.volume = float(np.prod(self.box))
        self._mol0 = mol
        self._table = table
        self._interpret = interpret
        self._rebin_every = rebin_every
        self.sim = RMMSimulation(
            table, pp, box, spec, dt=config.dt,
            target_temperature=config.target_temperature,
            thermostat=config.thermostat,
            tx=max(1, 128 // spec.cap) if not interpret else
            next(t for t in (4, 2, 1) if spec.dims[0] % t == 0),
            rebin_every=rebin_every,
            sample_every=1,  # cadence is driven by advance(need_macro)
            interpret=interpret,
            upot_corr=config.upot_corr,
            virial_corr=config.virial_corr,
        )
        self._step_count = 0
        self._cache_step = -1
        self._mol_cache: Optional[MoleculeState] = None
        self._forces_cache: Optional[Forces] = None
        self.macro: Optional[Macroscopic] = None
        self.macro_fresh = False
        self.last_globals = None

    @property
    def started(self) -> bool:
        return self.sim.state is not None and self.macro is not None

    # -- engine surface -----------------------------------------------------
    def prepare_start(self):
        if self.sim.state is None:
            self.sim.init_from_molecules(self._mol0)
            self._mol0 = None  # free the flat copy
        self.macro = Macroscopic(
            upot6lj=self.sim.state.u6,
            upot_xpoles=jnp.zeros(()) + self.config.upot_corr,
            virial=self.sim.state.vir + self.config.virial_corr,
            my_rf=jnp.zeros(()),
        )
        self.macro_fresh = True
        self._invalidate()

    def advance(self, need_macro: bool = True):
        """One step; returns (GlobalValues, overflow device scalar)."""
        sim = self.sim
        overflow = jnp.zeros((), bool)
        if sim._k and (sim._k % sim.rebin_every == 0):
            shift_fn = (
                sim._rebin_shift_pl_jit if sim.rebin_pl
                else sim._rebin_shift_jit
            )
            st2, ovf = shift_fn(sim.state)
            if bool(ovf):
                # nearest-neighbor rebin failed (cell full or skin
                # violated): general global-sort rebin; ITS overflow is
                # real (capacity exceeded) and reported to the driver's
                # re-spec watchdog
                st2, ovf = sim._rebin_jit(sim.state)
                overflow = ovf
            sim.state = st2
        step_fn = sim._step_jit if need_macro else sim._step_fast_jit
        sim.state, gv = step_fn(sim.state)
        sim._k += 1
        self._step_count += 1
        if need_macro:
            self.macro = Macroscopic(
                upot6lj=sim.state.u6,
                upot_xpoles=jnp.zeros(()) + self.config.upot_corr,
                virial=sim.state.vir + self.config.virial_corr,
                my_rf=jnp.zeros(()),
            )
        self.macro_fresh = bool(need_macro)
        self.last_globals = gv
        self._invalidate()
        return gv, overflow

    def retarget(self, t: float):
        """Thermostat retarget mid-run (SteereoControl set_t): the
        target is closed over by the jitted steps, so rebuild them."""
        import functools

        sim = self.sim
        sim.target_temperature = float(t)
        sim.thermostat = True
        sim._step_jit = jax.jit(functools.partial(sim._step, compute_macro=True))
        sim._step_fast_jit = jax.jit(
            functools.partial(sim._step, compute_macro=False)
        )
        self.config = dataclasses.replace(
            self.config, target_temperature=float(t), thermostat=True
        )

    # -- flat-state round-trip ----------------------------------------------
    def _invalidate(self):
        self._cache_step = -1
        self._mol_cache = None
        self._forces_cache = None

    def _gather(self):
        """Dense planes -> flat MoleculeState + Forces (slot order),
        cached per step.  Rare path: plugin reads at write cadence."""
        sim = self.sim
        p = np.asarray(sim.state.planes)
        f = np.asarray(sim.state.forces)
        nz, ny, C, W = p.shape
        flat = p.transpose(0, 1, 3, 2).reshape(-1, C)
        ff = f.transpose(0, 1, 3, 2).reshape(-1, 3)
        valid = flat[:, 3] > 0.5
        cells = np.asarray(sim._slot_cells())
        cl = np.asarray(self.spec.cell_len, np.float64)
        r_abs = cells.astype(np.float64) * cl + flat[:, 0:3].astype(np.float64)
        r = r_abs[valid]
        n = len(r)
        dtype = sim.state.planes.dtype
        mol = MoleculeState.from_numpy(
            r=np.asarray(wrap_positions(jnp.asarray(r), self.box)),
            v=flat[valid, 4:7],
            mid=flat[valid, 7].astype(np.int64).astype(np.int32),
            dtype=dtype,
        )
        F = jnp.asarray(ff[valid], dtype)
        forces = Forces(
            F=F,
            M=jnp.zeros_like(F),
            Vi=jnp.zeros((n, 3), dtype),
        )
        self._mol_cache = mol
        self._forces_cache = forces
        self._cache_step = self._step_count

    @property
    def mol(self) -> MoleculeState:
        if self.sim.state is None:
            return self._mol0
        if self._cache_step != self._step_count or self._mol_cache is None:
            self._gather()
        return self._mol_cache

    @mol.setter
    def mol(self, new_mol: Optional[MoleculeState]):
        """Plugin state mutation (e.g. checkpoint restore): exact but
        expensive -- re-bins and re-evaluates forces."""
        if new_mol is None:
            raise ValueError("RMMEngine.mol cannot be None")
        if self.sim.state is None:
            self._mol0 = new_mol
            return
        global_log.info(
            "RMMEngine: flat-state write-back (re-bin + force re-eval)"
        )
        self.sim.init_from_molecules(new_mol)
        self.sim._k = 0
        self._invalidate()

    @property
    def forces(self) -> Optional[Forces]:
        if self.sim.state is None:
            return None
        if self._cache_step != self._step_count or self._forces_cache is None:
            self._gather()
        return self._forces_cache

    @forces.setter
    def forces(self, value):
        # plugins assign None to request a fresh prepare_start; the RMM
        # state always carries forces, so only the macro freshness
        # resets
        if value is None:
            self.macro_fresh = False
            return
        raise ValueError("RMMEngine.forces is derived state")
