"""Simulation driver: one jitted timestep + host-side orchestration.

The L6 equivalent of the reference's Simulation class
(/root/reference/src/Simulation.{h,cpp}).  The whole inner loop
(Simulation::simulate, Simulation.cpp:979-1177) collapses into ONE
jitted function `step`:

  upd_preF -> rebin (container update) -> cell-pair forces (+LRC)
  -> upd_postF (kinetic sums) -> global values (T, p, betas)
  -> velocity-scaling thermostat

Host code only triggers steps, reads back scalars at an interval, and
runs plugins/IO -- there is no per-molecule host loop anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.ops.cellforce import compute_forces_cells
from ls1_mardyn_tpu.ops.cells import (
    CellGridSpec,
    bin_particles,
    neighbor_table,
    wrap_positions,
)
from ls1_mardyn_tpu.ops.globals import GlobalValues, calculate_global_values
from ls1_mardyn_tpu.ops.integrator import upd_post_force, upd_pre_force
from ls1_mardyn_tpu.ops.thermostat import (
    apply_temperature_control,
    apply_velocity_scaling,
    apply_velocity_scaling_componentwise,
    thermostat_kinetic_sums,
)
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static per-run configuration (hashable, closed over by jit)."""

    dt: float
    target_temperature: float = 0.0
    thermostat: bool = True  # False => NVE
    cell_cap: int = 64
    cells_in_cutoff: int = 1
    cell_chunk: int = 0
    upot_corr: float = 0.0  # long-range correction (ops/lrc.py)
    virial_corr: float = 0.0
    # component-wise thermostats (Domain.h:424-431): component ->
    # thermostat id, and per-thermostat target temperatures; None =>
    # one global thermostat
    component_thermostat: Optional[Tuple[int, ...]] = None
    thermostat_temps: Optional[Tuple[float, ...]] = None
    # "Undirected" thermostats (ASCIIReader.cpp:125-129 'Undirected'/'U'
    # header token; Domain.h:441-444): per-thermostat flag -- subtract
    # the thermostat's mean (directed) velocity before kinetic sampling
    # and scale only the thermal component, so flows are not
    # thermostatted as heat.  Aligned with thermostat_temps; a 1-tuple
    # applies to the single global thermostat.
    undirected_thermostats: Optional[Tuple[bool, ...]] = None
    # region thermostats (src/thermostats/TemperatureControl.{h,cpp})
    temp_control_regions: Tuple = ()
    # Ewald real-space screening for the built-in cell path
    screen_alpha: float = 0.0
    # non-uniform z rows (ALL tensor-mesh analogue; ops/cells.py):
    # tuple of nz+1 edges, or None for a uniform grid
    z_edges: Optional[Tuple[float, ...]] = None
    # compile the pair step, the k-space extra force, and the
    # integrator tail as three chained programs instead of one fused
    # step: a Pallas multi-site kernel + a large SPME mesh in one XLA
    # program exceeds the remote compile helper at production sizes
    # (dispatches chain asynchronously, so the split costs no sync)
    split_kspace: bool = False


class SingleChipSimulation:
    """Single-device simulation (the DomainDecompBase 'alibi
    decomposition' analogue, Simulation.cpp:1354-1356); the multi-chip
    driver lives in ls1_mardyn_tpu/parallel/."""

    def __init__(
        self,
        mol: MoleculeState,
        pp: PairParams,
        box,
        config: SimConfig,
        force_fn: Optional[Callable] = None,
        extra_force_fn: Optional[Callable] = None,
    ):
        self.pp = pp
        self.config = config
        self.box = tuple(float(b) for b in np.asarray(box))
        cutoff = float(np.sqrt(np.asarray(pp.rc2)))
        self.spec = CellGridSpec.create(
            self.box, cutoff / config.cells_in_cutoff, cap=config.cell_cap
        )
        if config.z_edges:
            self.spec = dataclasses.replace(
                self.spec,
                dims=(
                    self.spec.dims[0],
                    self.spec.dims[1],
                    len(config.z_edges) - 1,
                ),
                z_edges=tuple(config.z_edges),
            )
        nbr_ids, nbr_shift = neighbor_table(self.spec)
        self._nbr_ids = jnp.asarray(nbr_ids)
        self._nbr_shift = jnp.asarray(nbr_shift, mol.r.dtype)
        self.volume = float(np.prod(self.box))
        self._force_fn = force_fn or self._cell_forces
        # additional long-range force contribution, e.g. Ewald k-space:
        # fn(mol, pp) -> (u_extra, F_extra [N,3], M_extra [N,3])
        self._extra_force_fn = extra_force_fn
        self.mol = mol
        self.forces: Optional[Forces] = None
        self.macro: Optional[Macroscopic] = None
        self._step_count = 0
        # NOTE: no donate_argnums -- buffer donation through the axon
        # remote-TPU backend triggers pathological copies (measured 4x
        # step time); state is small relative to HBM anyway.
        self._step_jit = jax.jit(self._step)
        self._init_jit = jax.jit(self._init_forces)
        # split mode: the pair step, the k-space extra force, and the
        # integrator tail compile as three chained (async-dispatched)
        # programs; selected by the driver when one fused program would
        # exceed the compile helper (Pallas kernel + big SPME mesh)
        self._split = bool(getattr(config, "split_kspace", False)) and (
            extra_force_fn is not None
        )
        if self._split:
            self._step_pre_jit = jax.jit(self._step_pre)
            self._extra_jit = jax.jit(
                lambda m: self._extra_force_fn(m, self.pp)
            )
            self._step_post_jit = jax.jit(self._step_post)
            self._init_pre_jit = jax.jit(self._init_pre)
            self._init_post_jit = jax.jit(self._init_post)

    # -- jitted bodies ----------------------------------------------------
    def _cell_forces(self, mol: MoleculeState):
        bins = bin_particles(mol.r, mol.valid, self.spec)
        forces, macro = compute_forces_cells(
            mol,
            self.pp,
            self.spec,
            bins,
            self._nbr_ids,
            self._nbr_shift,
            cell_chunk=self.config.cell_chunk,
            screen_alpha=self.config.screen_alpha,
        )
        return forces, macro, bins.overflow

    def _init_pre(self, mol: MoleculeState):
        mol = dataclasses.replace(mol, r=wrap_positions(mol.r, self.box))
        forces, macro, overflow = self._force_fn(mol)
        return mol, forces, macro, overflow

    def _init_forces(self, mol: MoleculeState):
        mol, forces, macro, overflow = self._init_pre(mol)
        extra = (
            self._extra_force_fn(mol, self.pp)
            if self._extra_force_fn is not None else None
        )
        return self._init_post(mol, forces, macro, extra, overflow)

    def _init_post(self, mol, forces, macro, extra, overflow):
        if extra is not None:
            u_x, F_x, M_x = extra
            forces = Forces(F=forces.F + F_x, M=forces.M + M_x, Vi=forces.Vi)
            macro = Macroscopic(
                upot6lj=macro.upot6lj,
                upot_xpoles=macro.upot_xpoles + u_x,
                virial=macro.virial,
                my_rf=macro.my_rf,
            )
        # fold the long-range correction exactly like _step does, so
        # prepare_start's macro matches the in-loop values
        # (Simulation.cpp folds _UpotCorr in prepare_start too,
        # Domain.cpp:179-182)
        cfg = self.config
        macro = Macroscopic(
            upot6lj=macro.upot6lj,
            upot_xpoles=macro.upot_xpoles + cfg.upot_corr,
            virial=macro.virial + cfg.virial_corr,
            my_rf=macro.my_rf,
        )
        return mol, forces, macro, overflow

    def _step_pre(self, mol: MoleculeState, forces: Forces):
        """Half-kick + drift + wrap + pair-force traversal (the part
        of the step before the long-range extra force).  Factored out
        so split mode can compile it separately -- a Pallas multi-site
        kernel plus a large SPME mesh in ONE XLA program exceeds the
        remote compile helper's limits at production sizes."""
        cfg = self.config
        # 1. first half-kick + drift (Leapfrog transition 3->1->2)
        mol = upd_pre_force(mol, forces, self.pp, cfg.dt)
        # 2. periodic wraparound (DomainDecompBase::handleDomainLeaving...)
        mol = dataclasses.replace(mol, r=wrap_positions(mol.r, self.box))
        # 3+4. container update + force traversal
        forces, macro, overflow = self._force_fn(mol)
        return mol, forces, macro, overflow

    def _step(
        self, mol: MoleculeState, forces: Forces, step: jnp.ndarray
    ) -> Tuple[MoleculeState, Forces, Macroscopic, GlobalValues, jnp.ndarray]:
        mol, forces, macro, overflow = self._step_pre(mol, forces)
        extra = (
            self._extra_force_fn(mol, self.pp)
            if self._extra_force_fn is not None else None
        )
        return self._step_post(mol, forces, macro, extra, step, overflow)

    def _step_post(self, mol, forces, macro, extra, step, overflow):
        cfg = self.config
        if extra is not None:
            # long-range electrostatics (reciprocal space); the role of
            # FastMultipoleMethod::computeElectrostatics
            # (Simulation.cpp:1070-1073)
            u_x, F_x, M_x = extra
            forces = Forces(F=forces.F + F_x, M=forces.M + M_x, Vi=forces.Vi)
            macro = Macroscopic(
                upot6lj=macro.upot6lj,
                upot_xpoles=macro.upot_xpoles + u_x,
                virial=macro.virial,
                my_rf=macro.my_rf,
            )
        # long-range correction (Simulation.cpp:1048-1049 + Domain's
        # _UpotCorr/_VirialCorr fold, Domain.cpp:179-182)
        macro = Macroscopic(
            upot6lj=macro.upot6lj,
            upot_xpoles=macro.upot_xpoles + cfg.upot_corr,
            virial=macro.virial + cfg.virial_corr,
            my_rf=macro.my_rf,
        )
        # 5. second half-kick + kinetic sums (Leapfrog transition 2->3)
        mol, mv2, iw2 = upd_post_force(mol, forces, self.pp, cfg.dt)
        # 6. global values (Domain::calculateGlobalValues)
        summv2 = jnp.sum(mv2)
        sum_iw2 = jnp.sum(iw2)
        nmol = mol.num_valid()
        rdof = jnp.sum(
            jnp.where(mol.valid, self.pp.rot_dof[mol.cid], 0).astype(jnp.int32)
        )
        gv = calculate_global_values(
            macro,
            summv2,
            sum_iw2,
            nmol,
            rdof,
            self.volume,
            cfg.target_temperature,
            nve=not cfg.thermostat,
        )
        # 7. thermostat (Simulation.cpp:1108-1140)
        if cfg.thermostat and cfg.component_thermostat is not None:
            tmap = jnp.asarray(cfg.component_thermostat, jnp.int32)
            n_th = len(cfg.thermostat_temps)
            s2, siw2, nt, rd = thermostat_kinetic_sums(
                mol, self.pp, mv2, iw2, tmap, n_th
            )
            vbar = None
            if cfg.undirected_thermostats and any(
                cfg.undirected_thermostats
            ):
                from ls1_mardyn_tpu.ops.thermostat import (
                    directed_kinetic_correction,
                    thermostat_directed_velocity,
                )

                und = jnp.asarray(cfg.undirected_thermostats, bool)
                vbar = thermostat_directed_velocity(mol, tmap, n_th, und)
                s2 = s2 + directed_kinetic_correction(
                    mol, self.pp, vbar, tmap, n_th
                )
            Ti = jnp.asarray(cfg.thermostat_temps, mol.r.dtype)
            bt = jnp.where(
                (Ti > 0) & (s2 > 0),
                jnp.power(3.0 * nt * Ti / jnp.maximum(s2, 1e-30), 0.4),
                1.0,
            )
            br = jnp.where(
                (Ti > 0) & (siw2 > 0),
                jnp.power(rd * Ti / jnp.maximum(siw2, 1e-30), 0.4),
                1.0,
            )
            if vbar is not None:
                from ls1_mardyn_tpu.ops.thermostat import (
                    apply_velocity_scaling_componentwise_directed,
                )

                mol = apply_velocity_scaling_componentwise_directed(
                    mol, tmap, bt, br, vbar
                )
            else:
                mol = apply_velocity_scaling_componentwise(mol, tmap, bt, br)
        elif cfg.thermostat and cfg.target_temperature > 0:
            if cfg.undirected_thermostats and cfg.undirected_thermostats[0]:
                # undirected GLOBAL thermostat: thermal sampling AND
                # thermal-only scaling (the reference samples thermal
                # kinetic energy, Domain.cpp:462-470, but leaves global
                # scaling directed -- 'Undirected global thermostat not
                # implemented!', Simulation.cpp:1131; here both halves
                # are consistent)
                from ls1_mardyn_tpu.ops.thermostat import (
                    apply_velocity_scaling_componentwise_directed,
                    directed_kinetic_correction,
                    thermostat_directed_velocity,
                )

                und = jnp.ones((1,), bool)
                vbar = thermostat_directed_velocity(mol, None, 1, und)
                s2c = summv2 + directed_kinetic_correction(
                    mol, self.pp, vbar, None, 1
                )[0]
                gv = calculate_global_values(
                    macro, s2c, sum_iw2, nmol, rdof, self.volume,
                    cfg.target_temperature, nve=not cfg.thermostat,
                )
                mol = apply_velocity_scaling_componentwise_directed(
                    mol, jnp.zeros((self.pp.mass.shape[0],), jnp.int32),
                    gv.beta_trans[None], gv.beta_rot[None], vbar,
                )
            else:
                mol = apply_velocity_scaling(mol, gv.beta_trans, gv.beta_rot)
        if cfg.temp_control_regions:
            mol = apply_temperature_control(
                mol, self.pp, cfg.temp_control_regions, step
            )
        return mol, forces, macro, gv, overflow

    # -- host API ---------------------------------------------------------
    def prepare_start(self):
        """Initial force evaluation (Simulation::prepare_start,
        Simulation.cpp:764-918)."""
        if self._split:
            mol2, fpair, macro_p, ovf = self._init_pre_jit(self.mol)
            extra = self._extra_jit(mol2)
            self.mol, self.forces, self.macro, _overflow = \
                self._init_post_jit(mol2, fpair, macro_p, extra, ovf)
        else:
            self.mol, self.forces, self.macro, _overflow = self._init_jit(
                self.mol
            )

    @property
    def started(self) -> bool:
        return self.forces is not None

    # macro (Upot/virial) is computed unconditionally by the general
    # step; the flag exists for engine-surface parity with RMMEngine
    macro_fresh = True

    def advance(self, need_macro: bool = True):
        """One leapfrog step; returns (GlobalValues, overflow device
        scalar).  The engine-protocol entry the driver loop calls --
        RMMEngine implements the same signature (need_macro gates its
        Upot/virial kernel passes; ignored here)."""
        self._step_count += 1
        step_arr = jnp.asarray(self._step_count, jnp.int32)
        if self._split:
            mol2, fpair, macro_p, ovf = self._step_pre_jit(
                self.mol, self.forces
            )
            extra = self._extra_jit(mol2)
            (self.mol, self.forces, self.macro, gv,
             overflow) = self._step_post_jit(
                mol2, fpair, macro_p, extra, step_arr, ovf
            )
        else:
            self.mol, self.forces, self.macro, gv, overflow = \
                self._step_jit(self.mol, self.forces, step_arr)
        return gv, overflow

    def run(self, steps: int, callback=None, check_overflow_every: int = 0):
        """Advance `steps` timesteps. The device round-trips only when a
        callback or overflow check forces a readback."""
        if self.forces is None:
            self.prepare_start()
        gv = None
        for k in range(steps):
            self._step_count += 1
            self.mol, self.forces, self.macro, gv, overflow = self._step_jit(
                self.mol, self.forces, jnp.asarray(self._step_count, jnp.int32)
            )
            if check_overflow_every and (k % check_overflow_every == 0):
                if bool(overflow):
                    raise RuntimeError(
                        "cell capacity exceeded; increase SimConfig.cell_cap"
                    )
            if callback is not None:
                callback(k, self.mol, gv)
        return gv
