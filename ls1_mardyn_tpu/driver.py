"""Top-level MD driver: XML config -> scene -> jitted step loop ->
plugins/observables/checkpoints.

The L6/L7 equivalent of the reference's Simulation class + main loop
(/root/reference/src/Simulation.{h,cpp}: initConfigXML :675-750,
prepare_start :764-918, simulate :920-1202) re-structured for a jitted
engine: the device executes whole steps; the host orchestrates plugins,
logging, checkpoint triggers, and timers.
"""

from __future__ import annotations

import math
import time as _time
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData, read_inp, write_inp
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.io.xml_config import XMLConfig, read_xml_config
from ls1_mardyn_tpu.models.components import ComponentTable
from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.lrc import HomogeneousLRC, NoLRC
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
from ls1_mardyn_tpu.plugins.base import PluginFactory
from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation
from ls1_mardyn_tpu.state import MoleculeState
from ls1_mardyn_tpu.utils.logger import global_log
from ls1_mardyn_tpu.utils.timers import TimerProfiler


class _TraceCapture:
    """jax.profiler trace over a step window (the TaskTimingProfiler /
    PAPI role, /root/reference/src/Simulation.cpp:1249-1254 and
    src/utils/Timer.h:14-23): per-phase device timelines instead of
    per-thread task CSVs.  View with tensorboard --logdir or
    ui.perfetto.dev.  No-op when dir is None."""

    def __init__(self, trace_dir, window, total_steps):
        self.dir = trace_dir
        a, b = window
        # clamp into the run (short runs still produce a trace)
        if total_steps < b:
            b = total_steps
            a = max(1, b - 5)
        self.start_at, self.stop_at = a, b
        self.active = False

    def tick(self, k, sync):
        if not self.dir:
            return
        import jax

        if k == self.start_at and not self.active:
            sync()  # drain queued work so the trace starts clean
            jax.profiler.start_trace(self.dir)
            self.active = True
        elif k >= self.stop_at and self.active:
            sync()  # capture through the last traced step
            jax.profiler.stop_trace()
            self.active = False
            global_log.info("wrote jax profiler trace to %s", self.dir)

    def finish(self, sync):
        if self.active:
            import jax

            sync()
            jax.profiler.stop_trace()
            self.active = False
            global_log.info("wrote jax profiler trace to %s", self.dir)


class MDSimulation:
    """User-facing simulation: build from an XML config (reference
    schema) or assemble programmatically."""

    def __init__(
        self,
        config: XMLConfig,
        dtype=jnp.float32,
        # auto | pallas | cells | scene | rmm | ms_packed | ms_dense
        force_mode: str = "auto",
        # "scene": construction-only base (tables/solvers/readers; the
        # force path is the internal cells fallback and never runs) --
        # what ParallelMDSimulation builds its own engines from
        cell_cap: int = 0,
        phase_space_data: Optional[PhaseSpaceData] = None,
        allow_axis_swap: bool = True,
    ):
        self.config = config
        self.dtype = dtype
        self._force_mode = force_mode
        self.timers = TimerProfiler()
        for t in (
            "SIMULATION_LOOP",
            "SIMULATION_DECOMPOSITION",
            "SIMULATION_COMPUTATION",
            "SIMULATION_FORCE_CALCULATION",
            "SIMULATION_IO",
        ):
            self.timers.register(t)

        data = (
            phase_space_data
            if phase_space_data is not None
            else self._load_phasespace(config)
        )
        # vacuum-dominated scenes with the inhomogeneity along x or y
        # (e.g. ExplodingLiquid: a thin y-slab in a 4.5x elongated box):
        # the adaptive non-uniform rows only exist along z, so swap the
        # emptiest axis onto z in the ENGINE frame.  Only orientation-
        # free scenes (all sites at the molecular origin, no dipoles/
        # quadrupoles) are swap-safe, and plugins/checkpoints see the
        # original frame (accessors swap back).
        self._axis_swap = (
            self._detect_swap_axis(data, config) if allow_axis_swap else None
        )
        if self._axis_swap is not None:
            perm = self._swap_perm()
            data.r = data.r[:, perm]
            data.v = data.v[:, perm]
            data.L = data.L[:, perm]
            data.box = np.asarray(data.box, float)[perm]
            global_log.info(
                "engine frame: axis %d swapped onto z (vacuum-dominated "
                "scene; adaptive rows + slab machinery are z-native)",
                self._axis_swap,
            )
        self.phase_space = data
        self.table = ComponentTable(
            data.components,
            mixing_xi=data.mixing_xi,
            mixing_eta=data.mixing_eta,
            eps_rf=config.eps_rf if config.eps_rf else data.eps_rf,
            cutoff=config.cutoff,
            lj_cutoff=config.lj_cutoff,
        )
        self.pp = PairParams.from_table(self.table, dtype=dtype)
        # the PAIR path's table/params; FMM-mode electrostatics strip
        # the charges here (the FMM owns all Coulomb work) while
        # self.pp stays complete for integration, probes and the FMM
        self._table_pair = self.table
        self._pp_pair = self.pp
        self.box = np.asarray(data.box, float)
        self.volume = float(np.prod(self.box))
        self.lj_cutoff = config.lj_cutoff
        n = len(data.mid)
        # muVT needs free slots for insertions (the reserve-slot design,
        # SURVEY.md section 7: insertion = activating a masked slot)
        capacity = None
        if config.ensemble_type == "muVT":
            capacity = n + max(64, n // 8)
        self.mol = MoleculeState.from_numpy(
            r=data.r, v=data.v, q=data.q, L=data.L,
            cid=data.cid, mid=data.mid.astype(np.int32),
            capacity=capacity,
            dtype=dtype,
        )

        # long-range correction (Simulation.cpp:514-552 longrange switch)
        ncomp = np.bincount(data.cid, minlength=self.table.K)
        self.planar_lrc = None
        if config.longrange.lower() in ("homogeneous", ""):
            self.lrc = HomogeneousLRC(self.table, ncomp, self.volume)
        elif config.longrange.lower() == "planar":
            # Janecek slab correction applied as per-step forces/energy
            # (Planar.{h,cpp}); scalar corr terms stay zero
            from ls1_mardyn_tpu.ops.lrc_planar import PlanarLRC

            nslabs = int(float(config.longrange_params.get("slabs", 100)))
            self.planar_lrc = PlanarLRC(
                self.table, self.box, nslabs=nslabs, axis=1
            )
            self.lrc = NoLRC()
        else:
            self.lrc = NoLRC()

        # container sizing: measure the actual max cell occupancy of the
        # initial state (mean-density heuristics underestimate clustered
        # scenes) and leave drift headroom
        self._z_edges = None
        self._cap_forced = bool(cell_cap)
        if not cell_cap:
            dims = np.maximum(
                1, np.floor(self.box * config.cells_in_cutoff /
                            config.lj_cutoff).astype(int)
            )
            cl = self.box / dims
            c3 = np.clip((data.r / cl).astype(int), 0, dims - 1)
            lin = (c3[:, 2] * dims[1] + c3[:, 1]) * dims[0] + c3[:, 0]
            max_occ = int(np.bincount(lin).max()) if n else 8
            # inhomogeneous scenes (vapor-dominated: evaporation,
            # droplets, two-phase slabs): non-uniform z rows (the ALL
            # tensor-mesh analogue, ops/cells.adaptive_z_edges)
            # collapse sparse regions into few wide rows -- fewer cells
            # at unchanged capacity is a direct compute cut (the dense
            # design's cost is cells x cap^2)
            mean_occ = n / max(float(np.prod(dims)), 1.0) if n else 1.0
            if n and dims[2] >= 4 and max_occ > 3.0 * max(mean_occ, 1.0):
                from ls1_mardyn_tpu.ops.cells import adaptive_z_edges

                min_h = max(config.cutoff, config.lj_cutoff)
                edges = adaptive_z_edges(
                    data.r, self.box, (dims[0], dims[1]), min_h,
                    occ_limit=max_occ,
                )
                if edges and (len(edges) - 1) <= 0.75 * dims[2]:
                    cz = np.clip(
                        np.searchsorted(
                            np.asarray(edges)[1:-1], data.r[:, 2],
                            side="right",
                        ),
                        0, len(edges) - 2,
                    )
                    lin2 = (cz * dims[1] + c3[:, 1]) * dims[0] + c3[:, 0]
                    occ2 = int(np.bincount(lin2).max())

                    def _cap(occ):
                        return max(
                            32,
                            int(2 ** math.ceil(
                                math.log2(max(1.5 * occ, 8))
                            )),
                        )

                    # adopt when the POWER-OF-2 CAPACITY doesn't grow
                    # (forced min-height rows can beat the uniform max
                    # occupancy by lattice-plane aliasing without
                    # changing the capacity class)
                    if _cap(occ2) <= _cap(max_occ):
                        self._z_edges = edges
                        global_log.info(
                            "adaptive z rows: %d non-uniform rows "
                            "replace %d uniform (max cell occupancy "
                            "%d vs %d, cap %d)",
                            len(edges) - 1, int(dims[2]), occ2, max_occ,
                            _cap(occ2),
                        )
                        max_occ = max(max_occ, occ2)
            cell_cap = max(
                32, int(2 ** math.ceil(math.log2(max(1.5 * max_occ, 8))))
            )
        thermo = config.ensemble_type.upper() == "NVT" and (
            config.temperature > 0 or bool(data.thermostat_temps)
        )
        # component-wise thermostats from the .inp header
        # (ASCIIReader.cpp ComponentThermostat/ThermostatTemperature tokens)
        comp_therm = None
        therm_temps = None
        undirected = None
        if data.component_thermostats and data.thermostat_temps:
            K = len(data.components)
            tids = sorted(set(data.component_thermostats.values()))
            remap = {t: i for i, t in enumerate(tids)}
            comp_therm = tuple(
                remap.get(data.component_thermostats.get(c, tids[0]), 0)
                for c in range(K)
            )
            therm_temps = tuple(
                data.thermostat_temps.get(t, config.temperature) for t in tids
            )
            # Undirected flags follow the same id remap
            # (ASCIIReader.cpp:125-129 'Undirected'/'U')
            if getattr(data, "undirected_thermostats", None):
                undirected = tuple(
                    t in data.undirected_thermostats for t in tids
                )
        elif getattr(data, "undirected_thermostats", None):
            # global thermostat flagged Undirected
            undirected = (True,)
        # TemperatureControl regions (region coords follow the engine
        # frame when an axis swap is active); they REPLACE the global
        # velocity-scaling thermostat (Simulation.cpp:1137-1140)
        tc_regions = ()
        if config.temp_control:
            from ls1_mardyn_tpu.ops.thermostat import (
                TemperatureControlRegion,
            )

            perm = (
                self._swap_perm() if self._axis_swap is not None
                else [0, 1, 2]
            )

            def _resolve(coords):
                # the literal 'box' anchors a coordinate at the domain
                # edge (TemperatureControl.cpp:105) -- resolvable only
                # here, where the box is known
                return np.asarray(
                    [
                        self.box[i] if c == "box" else float(c)
                        for i, c in enumerate(coords)
                    ]
                )

            tc_regions = tuple(
                TemperatureControlRegion(
                    lower=tuple(_resolve(d["lower"])[perm]),
                    upper=tuple(_resolve(d["upper"])[perm]),
                    target_temperature=float(d["target_temperature"]),
                    frequency=int(d["frequency"]),
                    exponent=float(d["exponent"]),
                    component=int(d["component"]),
                    nslabs=int(d.get("nslabs", 1)),
                    directions=tuple(d.get("directions", (0, 1, 2))),
                    ramp_start_t=float(d.get("ramp_start_t", 0.0)),
                    ramp_end_t=float(d.get("ramp_end_t", 0.0)),
                    ramp_update_start=int(d.get("ramp_update_start", 0)),
                    ramp_update_stop=int(d.get("ramp_update_stop", 0)),
                    ramp_update_freq=int(d.get("ramp_update_freq", 1)),
                    start=int(d.get("start", 0)),
                    stop=int(d.get("stop", 2**31 - 1)),
                )
                for d in config.temp_control
            )
            thermo = False
        sim_cfg = SimConfig(
            dt=config.timestep,
            target_temperature=config.temperature or data.temperature,
            thermostat=thermo,
            cell_cap=cell_cap,
            cells_in_cutoff=config.cells_in_cutoff,
            upot_corr=self.lrc.upot_corr,
            virial_corr=self.lrc.virial_corr,
            component_thermostat=comp_therm,
            thermostat_temps=therm_temps,
            undirected_thermostats=undirected,
            z_edges=tuple(self._z_edges) if self._z_edges else None,
            temp_control_regions=tc_regions,
        )
        import dataclasses as _dc

        # long-range electrostatics (Ewald/PME; the bhfmm capability slot)
        self.ewald = None
        screen_alpha = 0.0
        if config.electrostatic_solver == "Ewald" and self.table.has_electrostatics():
            from ls1_mardyn_tpu.ops.ewald import EwaldParams, EwaldSolver

            # self-tune alpha/kmax from the system's charge content via
            # the Kolafa-Perram RMS force-error estimates
            q2_sum = sum(
                int(ncomp[k]) * sum(s.q ** 2 for s in c.charges)
                for k, c in enumerate(self.table.components)
            )
            n_q = sum(
                int(ncomp[k]) * len(c.charges)
                for k, c in enumerate(self.table.components)
            )
            eparams = EwaldParams.tune(
                self.box, config.cutoff, q2_sum, n_q,
                accuracy=config.ewald_accuracy,
            )
            method = getattr(config, "ewald_method", "auto")
            if method == "fmm":
                # the ACTUAL solid-harmonics FMM (ops/fmm.py): it owns
                # ALL Coulomb work (near P2P + far expansions) while
                # the pair path runs LJ only -- exactly the reference's
                # FMM mode, which swaps in VectorizedLJP2PCellProcessor
                # (Simulation.cpp:781-797).  Charge-only scenes.
                import copy

                from ls1_mardyn_tpu.models.components import (
                    ComponentTable as _CT,
                )
                from ls1_mardyn_tpu.models.interaction import (
                    PairParams as _PP,
                )
                from ls1_mardyn_tpu.ops.fmm import FMMElectrostatics

                if force_mode == "cells":
                    # "scene" (the parallel driver's construction-only
                    # base, whose force path never executes) is exempt
                    raise ValueError(
                        "ewald_method='fmm' needs the pallas/oracle "
                        "force path (force_mode auto); the internal "
                        "cells path would double-count in-cutoff "
                        "Coulomb"
                    )
                if getattr(config, "fmm_adaptive", False):
                    # the reference's <adaptiveContainer> is a
                    # sequential beta that warns it "certainly
                    # delivers WRONG results" and proceeds
                    # (FastMultipoleMethod.cpp:41-43).  The rebuilt
                    # adaptive container (ops/fmm_adaptive.py,
                    # threshold-split octree + dual tree traversal) is
                    # validated but free-space-scoped; the periodic
                    # driver scene stays on the uniform periodic FMM,
                    # which is correct rather than warned-wrong.
                    global_log.warning(
                        "FastMultipoleMethod: <adaptiveContainer> is "
                        "IGNORED for this run (threshold=%d): the "
                        "rebuilt adaptive solver (ops/fmm_adaptive."
                        "AdaptiveFMMSolver) is free-space only, and "
                        "driver scenes are periodic -- the uniform "
                        "periodic octree runs instead.  Open-boundary "
                        "charge systems can call AdaptiveFMMSolver "
                        "directly.",
                        getattr(config, "fmm_threshold", 32),
                    )
                self.ewald = FMMElectrostatics(
                    self.box, self.table, self.pp, n_hint=n,
                    dtype=dtype,
                    order=getattr(config, "fmm_order", 8),
                )
                comps_lj = copy.deepcopy(self.table.components)
                for c_ in comps_lj:
                    c_.charges = []
                self._table_pair = _CT(
                    comps_lj, cutoff=config.cutoff,
                    lj_cutoff=config.lj_cutoff,
                )
                self._pp_pair = _PP.from_table(
                    self._table_pair, dtype=dtype
                )
                global_log.info(
                    "electrostatics: solid-harmonics FMM depth=%d "
                    "order=%d cap=%d (pair path runs LJ only)",
                    self.ewald.depth, self.ewald.solver.order,
                    self.ewald.solver.cap,
                )
            elif method == "auto":
                # direct k-space costs O(N_sites * K) matmul work; the
                # SPME mesh costs O(N_sites * p^3 + G^3 log G).  Pick
                # the mesh once the matmuls dominate (the analogue of
                # the reference enabling ENABLE_FMM_FFT at scale).
                # Threshold calibrated by ELECTRO_AB.json (v5e,
                # interleaved): direct = 78 ms at N*K = 4.4e8 vs
                # blocked-SPME 34 ms at the same N -- the crossover
                # sits at N*K ~ 2e8, and by N_sites = 1e5 the mesh is
                # 27x faster (5.6 s vs 0.21 s).
                K = 4.0 / 3.0 * np.pi * eparams.kmax ** 3
                nsites = int(self.mol.capacity) * int(
                    np.asarray(self.pp.charge_q).shape[1]
                )
                method = "pme" if nsites * K > 2e8 else "direct"
            if method == "fmm":
                pass  # solver built above; no erfc screening
            elif method == "pme":
                from ls1_mardyn_tpu.ops.pme import PMEParams, PMESolver

                pparams = PMEParams.tune(
                    self.box, config.cutoff, q2_sum, n_q,
                    accuracy=config.ewald_accuracy,
                )
                self.ewald = PMESolver(self.box, pparams, dtype=dtype)
                screen_alpha = pparams.alpha
                global_log.info(
                    "electrostatics: SPME alpha=%.4f grid=%s order=%d",
                    pparams.alpha, pparams.grid, pparams.order,
                )
            else:
                self.ewald = EwaldSolver(self.box, eparams, dtype=dtype)
                screen_alpha = eparams.alpha
                global_log.info(
                    "electrostatics: Ewald alpha=%.4f kmax=%d (%d k-vectors)",
                    eparams.alpha, eparams.kmax, self.ewald.kvec.shape[0],
                )
        self._screen_alpha = screen_alpha
        if screen_alpha:
            sim_cfg = _dc.replace(sim_cfg, screen_alpha=screen_alpha)

        force_fn = None
        if force_mode in ("auto", "pallas", "ms_packed", "ms_dense"):
            import jax

            spec = CellGridSpec.create(
                tuple(self.box), config.lj_cutoff / config.cells_in_cutoff,
                cap=cell_cap,
            )
            if self._z_edges:
                spec = _dc.replace(
                    spec,
                    dims=(spec.dims[0], spec.dims[1],
                          len(self._z_edges) - 1),
                    z_edges=tuple(self._z_edges),
                )
            interpret = jax.default_backend() != "tpu"
            if not interpret:
                # compiled kernels need tx*cap % 128 == 0 with tx | nx:
                # round cap up to a multiple of 128/tx for the largest
                # usable tile width (small grids pay cap=128)
                nx = spec.dims[0]
                t = next(t for t in (4, 2, 1) if nx % t == 0)
                unit = 128 // t
                cap_aligned = ((spec.cap + unit - 1) // unit) * unit
                if cap_aligned != spec.cap:
                    spec = _dc.replace(spec, cap=cap_aligned)
            # per-molecule-virial consumers (GammaWriter, DirectedPM):
            # the 1CLJ row kernel returns Vi=0, so such scenes run the
            # multi-site kernel (NL=1), which carries exact per-axis Vi
            _vi_plugins = {"GammaWriter", "DirectedPM"}
            need_vi = any(
                s.name in _vi_plugins
                for s in list(config.output_plugins) + list(config.plugins)
            )
            is_1clj = (
                self.table.K == 1
                and len(self.table.components[0].ljcenters) == 1
                and not self.table.has_electrostatics()
                # cell-local 1CLJ path needs a uniform grid; non-uniform
                # z rows run the absolute-coordinate multi-site kernel
                and not self._z_edges
                and not need_vi
            )
            # cost-based path choice (the TraversalTuner role,
            # src/particleContainer/TraversalTuner.h:135): tiny dense
            # scenes with huge cutoffs (e.g. CO2: 3x3x3 cells at cap
            # 256) make the dense cell kernel evaluate far more
            # candidate lanes than the N^2 sweep touches pairs
            nx_, ny_, nz_ = spec.dims
            tx_ = next(t for t in (4, 2, 1) if nx_ % t == 0)
            kernel_pairs = (
                nz_ * ny_ * nx_ * spec.cap * 9 * (tx_ + 2) * spec.cap
            )
            rc_any = max(config.cutoff, config.lj_cutoff)
            n2_pairs = n * n * (27 if rc_any > min(self.box) / 2 else 1)
            if n and n <= 16384 and n2_pairs * 2 < kernel_pairs:
                global_log.info(
                    "force path: N^2 beats the cell kernel here "
                    "(%.2g vs %.2g candidate pairs)",
                    n2_pairs, kernel_pairs,
                )
            else:
                try:
                    if is_1clj:
                        force_fn = PallasLJPath(
                            self.table, spec, interpret=interpret
                        )
                        global_log.info(
                            "force path: Pallas 1CLJ kernel (RMM class), "
                            "grid %s",
                            spec.dims,
                        )
                    else:
                        from ls1_mardyn_tpu.ops.pallas_ms_packed import (
                            PallasMultiSitePackedPath,
                            pick_ms_grid_packed,
                        )
                        from ls1_mardyn_tpu.ops.pallas_ms_path import (
                            PallasMultiSitePath,
                            pick_ms_grid,
                        )

                        ms_tx = 0
                        use_packed = force_mode == "ms_packed"
                        if (not interpret and not self._z_edges and n
                                and not self._cap_forced):
                            # cost-based grid/cap/tx for the dense
                            # kernel: pair lanes = cells*cap^2*9*(tx+2)
                            # under the tx*cap%128==0 alignment -- odd
                            # floor() grids force cap to a 128 multiple
                            # (up to 4x waste); a slightly coarser even
                            # x axis with tx=2/4 often wins
                            pick = pick_ms_grid(
                                data.r, self.box,
                                config.lj_cutoff / config.cells_in_cutoff,
                            )
                            dense_lanes = None
                            if pick is not None:
                                dims_p, cap_p, ms_tx = pick
                                dense_lanes = (
                                    float(np.prod(dims_p)) * cap_p * cap_p
                                    * 9 * (ms_tx + 2)
                                )
                            # occupancy-packed variant (cap off the lane
                            # geometry): pick it when its measured-
                            # occupancy lane estimate beats the dense
                            # chooser's (CO2 N=1M: 1.83x measured,
                            # tools/ab_mspack.py 2026-08-21)
                            if force_mode != "ms_dense":
                                ppick = pick_ms_grid_packed(
                                    data.r, self.box,
                                    config.lj_cutoff
                                    / config.cells_in_cutoff,
                                )
                                if ppick is not None and (
                                        dense_lanes is None
                                        or ppick[2] < dense_lanes
                                        or use_packed):
                                    use_packed = True
                                    spec = _dc.replace(
                                        spec, dims=ppick[0],
                                        cap=ppick[1])
                            if not use_packed and pick is not None:
                                spec = _dc.replace(
                                    spec, dims=dims_p, cap=cap_p)
                        if use_packed:
                            force_fn = PallasMultiSitePackedPath(
                                self._table_pair, spec,
                                interpret=interpret,
                                screen_alpha=screen_alpha,
                            )
                        else:
                            force_fn = PallasMultiSitePath(
                                self._table_pair, spec, tx=ms_tx,
                                interpret=interpret,
                                screen_alpha=screen_alpha,
                            )
                        global_log.info(
                            "force path: Pallas multi-site kernel "
                            "(%s), grid %s, cap %d, tx %d, %d planes",
                            "occupancy-packed" if use_packed
                            else "dense",
                            spec.dims, spec.cap, force_fn.tx,
                            force_fn.meta.P,
                        )
                except AssertionError:
                    force_fn = None
        if force_fn is None and n <= 16384:
            # small-N fallback: chunked N^2 oracle (the LegacyCellProcessor
            # role).  Small scenes with huge cutoffs (e.g. the CO2/EOX
            # examples: 3^3 cells at cap 256) blow the cell-pair paths'
            # cap^2 memory; the minimum-image N^2 sweep is both exact and
            # cheap at this size.
            from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit

            # the chunked sweep requires chunk | capacity
            chunk = 0
            if n > 1024:
                chunk = next(
                    (c for c in (256, 128, 64, 32, 16, 8, 4, 3, 2)
                     if n % c == 0), 0
                )
            images = (
                27
                if max(config.cutoff, config.lj_cutoff) > min(self.box) / 2
                else 1
            )
            pp_ref = self._pp_pair
            box_ref = self.box

            def force_fn(mol, _chunk=chunk, _images=images,
                         _sa=screen_alpha):
                # erfc-screened real space when an Ewald/PME solver
                # supplies the k-space part
                f, m = compute_forces_n2_jit(
                    mol, pp_ref, box_ref, chunk=_chunk, images=_images,
                    screen_alpha=_sa,
                )
                import jax.numpy as _jnp

                return f, m, _jnp.zeros((), bool)

            global_log.info(
                "force path: N^2 oracle sweep (N=%d, images=%d)", n, images
            )
        elif force_fn is None:
            global_log.info("force path: general multi-site cell traversal")

        # plugins are constructed BEFORE the engine so force-field
        # plugins (WallPotential, Mirror force-constant mode) can plant
        # their siteWiseForces contribution into the jitted step
        # (PluginBase.h:88-130; init(sim) still runs after the engine
        # exists, at the end of __init__)
        self._plugins = []
        for spec_ in list(config.output_plugins) + list(config.plugins):
            try:
                self._plugins.append(
                    PluginFactory.create(spec_.name, spec_.params)
                )
            except KeyError:
                global_log.warning("ignoring unknown plugin %r", spec_.name)

        extra = None
        extras = []
        for p_ in self._plugins:
            fn_ = p_.site_wise_forces_fn(self.table, self.box)
            if fn_ is not None:
                extras.append(fn_)
        if self.ewald is not None:
            solver = self.ewald
            extras.append(lambda mol, pp: solver(mol, pp))
        if self.planar_lrc is not None:
            planar = self.planar_lrc

            def _planar_extra(mol, pp):
                F, M, u, _vir = planar.forces_torques(mol)
                return u, F, M

            extras.append(_planar_extra)
        if extras:

            def extra(mol, pp, _fns=tuple(extras)):
                u = 0.0
                F = M = None
                for fn in _fns:
                    ui, Fi, Mi = fn(mol, pp)
                    u = u + ui
                    F = Fi if F is None else F + Fi
                    M = Mi if M is None else M + Mi
                return u, F, M

        # -- RMM fast path (the VCP1CLJRMM + LeapfrogRMM pipeline,
        # /root/reference/src/Simulation.cpp:819-854): single-component
        # 1CLJ scenes with only observer plugins run on the dense
        # cell-layout engine (verlet-skin rebin cadence, cwn3l Pallas
        # kernels) so the CLI hits benchmark speed -- PallasLJPath
        # re-bins the whole system with a global sort EVERY step.
        self.engine = None
        rmm_scene = (
            self.table.K == 1
            and len(self.table.components[0].ljcenters) == 1
            and not self.table.has_electrostatics()
            and not self._z_edges
        )
        rmm_ok = (
            rmm_scene
            # auto upgrades exactly the scenes the kernel path would
            # have taken (the N^2-oracle scenes are too small for the
            # dense layout to pay off); force_mode="rmm" forces it
            and (
                force_mode == "rmm"
                or (force_mode == "auto" and isinstance(force_fn, PallasLJPath))
            )
            and extra is None
            and config.ensemble_type != "muVT"
            and sim_cfg.component_thermostat is None
            and not sim_cfg.undirected_thermostats
            and not sim_cfg.temp_control_regions
            and n > 0
            and all(
                type(p).__name__ in self._RMM_SAFE_PLUGINS
                or getattr(p, "name", "") in self._RMM_SAFE_PLUGINS
                for p in self._plugins
            )
        )
        if rmm_ok:
            import jax as _jax

            from ls1_mardyn_tpu.rmm_engine import RMMEngine, pick_rmm_grid

            interpret = _jax.default_backend() != "tpu"
            rc = config.lj_cutoff
            dims_r, cap_r = pick_rmm_grid(data.r, self.box, rc, cap=32)
            if dims_r is None:
                rmm_ok = False
        if rmm_ok:
            spec_r = CellGridSpec(
                dims=dims_r, box=tuple(float(b) for b in self.box),
                cap=cap_r,
            )
            skin = float(min(spec_r.cell_len)) - rc
            # drift bound per step: ~4 thermal sigmas of the fastest
            # component (measured from the start velocities, floored by
            # the configured target temperature)
            v = np.asarray(data.v, float)
            vq = float(np.quantile(np.linalg.norm(v, axis=1), 0.9999)) \
                if len(v) else 0.0
            drift = max(vq, 1e-9) * config.timestep
            rebin_every = int(max(1, min(16, skin / (2 * drift))))
            self.engine = RMMEngine(
                self.mol, self.pp, self.table, self.box, sim_cfg,
                spec_r, rebin_every=rebin_every, interpret=interpret,
            )
            global_log.info(
                "engine: RMM dense fast path, grid %s cap %d "
                "rebin_every %d", dims_r, cap_r, rebin_every,
            )
        if self.engine is None:
            # compile-size guard: a Pallas multi-site kernel plus a big
            # SPME/Ewald k-space program in ONE fused step exceeds the
            # remote compile helper at production sizes (measured: the
            # N=1e6 h2o step fails to compile fused; the same program
            # split compiles and chains async, costing no extra sync)
            split = False
            if extra is not None and force_fn is not None:
                from ls1_mardyn_tpu.ops.pallas_ms_path import (
                    PallasMultiSitePath as _MSP,
                )

                if isinstance(force_fn, _MSP) and not force_fn.interpret:
                    ncells_k = force_fn.spec.n_cells * force_fn.spec.cap
                    split = ncells_k >= 2**20
            if split:
                sim_cfg = _dc.replace(sim_cfg, split_kspace=True)
                global_log.info(
                    "step compiled SPLIT (pair / k-space / integrator "
                    "tail): fused program would exceed the compile "
                    "helper at this scale"
                )
            self.engine = SingleChipSimulation(
                self.mol, self.pp, self.box, sim_cfg, force_fn=force_fn,
                extra_force_fn=extra,
            )
        # muVT: grand-canonical moves in the afterForces slot
        self.gc = None
        if config.ensemble_type == "muVT":
            from ls1_mardyn_tpu.ensemble.grand_canonical import (
                GrandCanonicalEnsemble,
                _build_chemical_potentials,
            )

            cps = _build_chemical_potentials(
                config.chemical_potentials, np.asarray(self.box)
            )
            self.gc = GrandCanonicalEnsemble(
                cps, config.temperature, self.box
            )
        self.last_globals = None
        self.time = float(data.current_time)
        self.step = 0
        # heat-capacity sampling (Domain::record_cv, Domain.cpp:779-798),
        # gated on <equilibration><steps> (the reference's
        # _initStatistics, Simulation.cpp:196 + CanonicalEnsemble.cpp:
        # 211-215).  Per-step upot scalars stay on device; folds happen
        # at watchdog cadence.
        self._cv_su = 0.0
        self._cv_suu = 0.0
        self._cv_n = 0
        self._cv_win = []
        for p in self._plugins:
            p.init(self)

    # -- construction helpers ----------------------------------------------
    def _swap_perm(self):
        """Column permutation exchanging the swap axis with z."""
        perm = [0, 1, 2]
        perm[self._axis_swap], perm[2] = perm[2], perm[self._axis_swap]
        return perm

    # plugins known to be frame-agnostic (they read state via
    # molecules()/write_checkpoint, which un-swap); anything else
    # blocks the axis swap
    _SWAP_SAFE_PLUGINS = {
        "ResultWriter", "CheckpointWriter", "XyzWriter",
        "EnergyLogWriter", "MaxWriter", "SysMonOutput", "TimerWriter",
        "FlopRateWriter", "TestPlugin", "ExamplePlugin",
        "SteereoControl", "MaxCheck",
    }

    # plugins compatible with the RMM dense engine: observers that read
    # state via sim.molecules()/engine.mol at their own write cadence
    # (the property gathers the dense planes on demand) and mutate it
    # at most rarely (the mol setter re-bins).  Per-step mutators
    # (NEMD drivers) and per-molecule-virial consumers (GammaWriter)
    # keep the general engine.
    _RMM_SAFE_PLUGINS = {
        "ResultWriter", "CheckpointWriter", "XyzWriter",
        "EnergyLogWriter", "MaxWriter", "SysMonOutput", "TimerWriter",
        "TestPlugin", "ExamplePlugin", "SteereoControl",
        "MmpldWriter", "MmspdWriter", "MmspdBinWriter", "PovWriter",
        "VISWriter", "VTKMoleculeWriter", "InMemoryCheckpointing",
    }

    @classmethod
    def _detect_swap_axis(cls, data, config):
        """Pick x or y as the engine z axis when it is markedly emptier
        (row-occupancy-wise) than z itself -- the signal that the
        scene's inhomogeneity is normal to that axis."""
        n = len(data.mid)
        if n == 0 or config.longrange.lower() == "planar":
            return None
        # TemperatureControl regions slice slabs along y and thermostat
        # per-direction; an axis permutation would silently change both
        if config.temp_control:
            return None
        for spec_ in list(config.output_plugins) + list(config.plugins):
            if spec_.name not in cls._SWAP_SAFE_PLUGINS:
                return None
        for c in data.components:
            if c.dipoles or c.quadrupoles or c.is_stockmayer:
                return None
            for s in list(c.ljcenters) + list(c.charges):
                if np.any(np.abs(np.asarray(s.r)) > 1e-12):
                    return None
        box = np.asarray(data.box, float)
        rc = max(config.cutoff, config.lj_cutoff)
        if rc <= 0:
            return None
        empties = []
        for a in range(3):
            rows = max(4, int(box[a] / rc))
            hist = np.histogram(data.r[:, a], bins=rows,
                                range=(0, box[a]))[0]
            empties.append((hist == 0).mean())
        best = int(np.argmax(empties))
        if best != 2 and empties[best] > max(0.5, empties[2] + 0.25):
            return best
        return None

    @staticmethod
    def from_xml(path: str, **kw) -> "MDSimulation":
        return MDSimulation(read_xml_config(path), **kw)

    def _load_phasespace(self, cfg: XMLConfig) -> PhaseSpaceData:
        if cfg.phasespace_file:
            if cfg.phasespace_file_type.lower() == "binary":
                from ls1_mardyn_tpu.io.binary_io import read_binary_checkpoint

                data = read_binary_checkpoint(
                    cfg.phasespace_file,
                    cfg.phasespace_header,
                    components=cfg.components or None,
                    mixing_xi=cfg.mixing_xi,
                    mixing_eta=cfg.mixing_eta,
                    eps_rf=cfg.eps_rf,
                )
                if cfg.box is not None and (cfg.box > 0).all():
                    data.box = cfg.box
                return data
            if cfg.phasespace_file_type.upper() != "ASCII":
                raise NotImplementedError(
                    f"phasespacepoint type {cfg.phasespace_file_type}"
                )
            data = read_inp(cfg.phasespace_file)
            if cfg.components:
                # XML components override the file header's
                data.components = cfg.components
                data.mixing_xi = cfg.mixing_xi
                data.mixing_eta = cfg.mixing_eta
            if cfg.box is not None and (cfg.box > 0).all():
                data.box = cfg.box
            return data
        if cfg.generator is not None:
            p = cfg.generator.params
            comps = cfg.components or None
            name = cfg.generator.name
            if name == "CubicGridGenerator":
                rho = float(p.get("density", 0.5))
                n = int(float(p.get("numMolecules", 0)) or rho * np.prod(cfg.box))
                return cubic_grid(n, cfg.box, cfg.temperature, components=comps)
            if name in ("MkesferaGenerator", "mkesfera"):
                from ls1_mardyn_tpu.io.generators import mkesfera

                return mkesfera(
                    float(p.get("droplet", {}).get("radius", p.get("radius", 1.0))
                          if isinstance(p.get("droplet"), dict) else p.get("radius", 1.0)),
                    float(p.get("density-liquid", p.get("rho_liq", 0.7))),
                    float(p.get("density-vapor", p.get("rho_vap", 0.01))),
                    cfg.box, cfg.temperature, components=comps,
                )
            if name in ("MkTcTSGenerator", "mkTcTS"):
                from ls1_mardyn_tpu.io.generators import mktcts

                return mktcts(
                    float(p.get("density-liquid", p.get("rho_liq", 0.7))),
                    float(p.get("density-vapor", p.get("rho_vap", 0.01))),
                    cfg.box, cfg.temperature,
                    liq_fraction=float(p.get("liq_fraction", 0.5)),
                    components=comps,
                )
            if name == "PerCellGenerator":
                from ls1_mardyn_tpu.io.generators import per_cell

                return per_cell(
                    int(float(p.get("numMoleculesPerCell", 0))),
                    cfg.box,
                    max(cfg.cutoff, cfg.lj_cutoff),
                    float(p.get("initTemperature", cfg.temperature)),
                    components=comps,
                    generate_at_least_two=str(
                        p.get("generateAtLeastTwoParticles", "true")
                    ).lower() in ("1", "true", "yes"),
                )
            if name in ("MultiObjectGenerator", "ObjectGenerator"):
                from ls1_mardyn_tpu.io.generators import multi_object

                og = p.get("objectgenerator", [])
                return multi_object(
                    og, cfg.box, cfg.temperature, comps,
                    base_dir=cfg.config_dir,
                )
            raise NotImplementedError(f"generator {name}")
        raise ValueError("config has neither phasespacepoint file nor generator")

    # -- plugin-facing accessors (always the ORIGINAL frame) ---------------
    def molecules(self) -> MoleculeState:
        mol = self.engine.mol
        if self._axis_swap is not None:
            import dataclasses as _dc

            perm = jnp.asarray(self._swap_perm())
            mol = _dc.replace(
                mol, r=mol.r[:, perm], v=mol.v[:, perm], L=mol.L[:, perm]
            )
        return mol

    def forces_array(self):
        if self.engine.forces is None:
            return None
        F = self.engine.forces.F
        if self._axis_swap is not None:
            F = F[:, jnp.asarray(self._swap_perm())]
        return F

    def _export_phasespace(self) -> PhaseSpaceData:
        """Current device state -> PhaseSpaceData in the ORIGINAL frame
        (the in-memory snapshot used by checkpoints and the adaptive
        re-spec)."""
        mol = self.molecules()
        valid = np.asarray(mol.valid)
        box = self.box
        if self._axis_swap is not None:
            # a transposition is its own inverse
            box = np.asarray(box)[self._swap_perm()]
        return PhaseSpaceData(
            components=self.table.components,
            mixing_xi=self.table.mixing_xi,
            mixing_eta=self.table.mixing_eta,
            eps_rf=self.table.eps_rf,
            box=box,
            # the EFFECTIVE target (scenes whose target came from the
            # phase-space file have config.temperature == 0; exporting
            # the raw config value would silently de-thermostat the
            # rebuilt engine after a mid-run re-spec)
            temperature=(
                self.config.temperature
                or float(self.engine.config.target_temperature)
            ),
            current_time=self.time,
            mid=np.asarray(mol.mid)[valid].astype(np.int64),
            cid=np.asarray(mol.cid)[valid],
            r=np.asarray(mol.r)[valid],
            v=np.asarray(mol.v)[valid],
            q=np.asarray(mol.q)[valid],
            L=np.asarray(mol.L)[valid],
        )

    def _respec_cell_cap(self, new_cap: int):
        """Adaptive container re-specification: rebuild the cell grid
        and jitted engine with a larger capacity, carrying the current
        molecule state over, and resume (forces are recomputed exactly
        at the current positions, so the trajectory is unchanged).

        This is the TPU-native replacement for the reference's dynamic
        load-balancing machinery (KDDecomposition / ALL, SURVEY.md
        section 2.5): in a dense static-shape design, per-device
        compute is uniform in cell count, so there is nothing to
        re-partition -- the quantity that drifts with density is CELL
        OCCUPANCY, and rebalancing means re-sharding the grid between
        jitted segments (the MeasureLoad 'measured imbalance ->
        redistribute' loop, src/parallel/LoadCalc.h:227)."""
        import dataclasses as _dc

        global_log.warning(
            "cell capacity exceeded at step %d: re-spec cell_cap -> %d "
            "and resume",
            self.step, new_cap,
        )
        data = self._export_phasespace()
        cfg = _dc.replace(self.config, output_plugins=[], plugins=[])
        # re-MEASURE from the current state first (cell_cap=0): this
        # re-runs the axis-swap/adaptive-row detection too, which an
        # explicit cap would skip (a vacuum-dominated scene must not
        # fall back to the uniform full-grid memory footprint); only
        # force the doubled cap if measurement made no progress
        rebuilt = MDSimulation(
            cfg, dtype=self.dtype, force_mode=self._force_mode,
            cell_cap=0, phase_space_data=data,
        )
        if rebuilt.engine.config.cell_cap <= self.engine.config.cell_cap:
            rebuilt = MDSimulation(
                cfg, dtype=self.dtype, force_mode=self._force_mode,
                cell_cap=new_cap, phase_space_data=data,
            )
        # transplant the rebuilt engine (and its frame bookkeeping --
        # the accessors translate through self._axis_swap); clock,
        # plugins, ensembles and counters live on self and continue
        self.engine = rebuilt.engine
        self._axis_swap = rebuilt._axis_swap
        self._z_edges = rebuilt._z_edges
        self.box = rebuilt.box
        self.engine._step_count = self.step
        self.engine.prepare_start()

    def _fold_cv(self):
        if self._cv_win:
            u = np.asarray(jnp.stack(self._cv_win), np.float64)
            self._cv_win.clear()
            self._cv_su += float(u.sum())
            self._cv_suu += float((u * u).sum())
            self._cv_n += len(u)

    def cv(self) -> float:
        """Isochoric heat capacity from post-equilibration U statistics
        (Domain::cv, Domain.cpp:789-798)."""
        self._fold_cv()
        gv = self.last_globals
        if not self._cv_n or gv is None:
            return 0.0
        n = float(gv.n)
        t = float(gv.temperature)
        if n <= 0 or t <= 0:
            return 0.0
        ideal = 1.5 + 0.5 * float(gv.rot_dof) / n
        conf = (self._cv_suu - self._cv_su**2 / self._cv_n) / (
            self._cv_n * n * t * t
        )
        return ideal + conf

    def retarget_temperature(self, t: float):
        """Change the thermostat target mid-run (SteereoControl set_t);
        SimConfig is closed over by the jitted step, so re-jit."""
        import dataclasses as _dc

        import jax

        eng = self.engine
        if hasattr(eng, "retarget"):
            eng.retarget(float(t))
            return
        eng.config = _dc.replace(
            eng.config, target_temperature=float(t), thermostat=True
        )
        eng._step_jit = jax.jit(eng._step)

    def write_checkpoint(self, path: str, binary: bool = False):
        """Checkpoint compatible with the reference's formats: ASCII
        .inp, or the binary record format + XML header when binary=True
        (writes <path> and <path>.header.xml)."""
        data = self._export_phasespace()
        with self.timers["SIMULATION_IO"]:
            if binary:
                from ls1_mardyn_tpu.io.binary_io import write_binary_checkpoint

                write_binary_checkpoint(path, path + ".header.xml", data)
            else:
                write_inp(path, data)
        global_log.info("wrote checkpoint %s (N=%d)", path, len(data.mid))

    # -- main loop (Simulation::simulate, Simulation.cpp:920-1202) ----------
    def run(
        self,
        steps: Optional[int] = None,
        print_every: int = 100,
        final_checkpoint: Optional[str] = None,
        loop_abort_time: float = 0.0,
        timed_checkpoint: float = 0.0,
        profile_dir: Optional[str] = None,
        profile_steps: Tuple[int, int] = (10, 15),
    ):
        steps = steps if steps is not None else self.config.steps
        # published for plugins that extrapolate progress
        # (estimateRemainingTimeCommand reads getNumTimesteps())
        self.total_steps = steps
        eng = self.engine
        profiler = _TraceCapture(profile_dir, profile_steps, steps)
        # NB: getattr's default is evaluated EAGERLY -- writing
        # getattr(eng, "started", eng.forces is not None) here cost a
        # full dense-plane gather (engine.forces property, ~0.5 GB at
        # N=4.2M) on EVERY run() call (measured 2.4 s/step on 20-step
        # windows vs 59 ms for the bare engine loop, 2026-08-20)
        if hasattr(eng, "started"):
            started = eng.started
        else:
            started = eng.forces is not None
        if not started:
            with self.timers["SIMULATION_FORCE_CALCULATION"]:
                eng.prepare_start()
        t_start = _time.time()
        loop_timer = self.timers["SIMULATION_LOOP"]
        loop_timer.start()
        self.run_abort = False
        # overflow/NaN watchdog cadence: decoupled from print_every (a
        # readback syncs the device, so per-step checking would stall
        # the async pipeline; this bounds the undetected-overflow
        # window instead)
        check_every = min(print_every, 100) if print_every else 100
        # per-step overflow flags accumulate as device arrays (no
        # dispatch, no sync) and are read back in ONE stack at each
        # check -- a transient overflow between checks must not vanish
        # (it zeroes forces of the overflowed molecules for that step)
        ovf_window = []
        # macro (Upot/virial) cadence: the RMM engine skips the
        # energy/virial kernel passes (~20%) on steps nobody reads --
        # macro is needed on print/watchdog/last steps and whenever a
        # plugin's write cadence fires (the general engine computes it
        # unconditionally and ignores the hint)
        plugin_freqs = sorted(
            {max(1, int(getattr(p, "write_frequency", 1)))
             for p in self._plugins}
        )
        for k in range(1, steps + 1):
            self.step += 1
            for p in self._plugins:
                p.before_event_new_timestep(self, self.step)
                p.before_forces(self, self.step)
            need_macro = (
                k == steps
                or (print_every and self.step % print_every == 0)
                or self.step % check_every == 0
                or any(self.step % f == 0 for f in plugin_freqs)
            )
            gv, overflow = eng.advance(need_macro)
            ovf_window.append(overflow)
            self.last_globals = gv
            profiler.tick(k, lambda: float(gv.upot))
            self.time += self.config.timestep
            if self.step > self.config.equilibration_steps and eng.macro_fresh:
                self._cv_win.append(gv.upot)
            if self.gc is not None:
                eng.mol = self.gc.step(eng.mol, self.pp, self.step)
            for p in self._plugins:
                p.after_forces(self, self.step)
                p.end_step(self, self.step)
            if print_every and self.step % print_every == 0:
                # per-step summary line (Simulation.cpp:1231-1234)
                global_log.info(
                    "Simstep = %d\tT = %g\tU_pot = %g\tp = %g",
                    self.step,
                    float(gv.temperature),
                    float(gv.upot),
                    float(gv.pressure),
                )
            if self.step % check_every == 0 or k == steps:
                self._fold_cv()
                # NaN watchdog FIRST: re-spec'ing garbage state would
                # only rebuild and re-crash (Simulation.cpp:1236-1239)
                if not (
                    np.isfinite(float(gv.upot))
                    and np.isfinite(float(gv.temperature))
                ):
                    raise RuntimeError(
                        f"NaN/Inf detected at step {self.step} "
                        f"(T={float(gv.temperature)}, "
                        f"Upot={float(gv.upot)}); aborting"
                    )
                any_ovf = bool(np.any(np.asarray(jnp.stack(ovf_window))))
                ovf_window.clear()
                if any_ovf:
                    # adaptive re-spec instead of aborting (the dynamic
                    # load-balancing slot; see _respec_cell_cap)
                    cap = self.engine.config.cell_cap
                    if cap >= 2048:
                        raise RuntimeError(
                            "cell capacity exceeded at cap=%d; giving up"
                            % cap
                        )
                    self._respec_cell_cap(2 * cap)
                    eng = self.engine
            if timed_checkpoint and (_time.time() - t_start) > timed_checkpoint:
                # walltime-forced checkpoint (Simulation.cpp:1169-1175)
                self.write_checkpoint("timed.restart.dat")
                global_log.warning(
                    "walltime limit: wrote timed.restart.dat at step %d",
                    self.step,
                )
                break
            if loop_abort_time and (_time.time() - t_start) > loop_abort_time:
                global_log.warning("loop abort time reached at step %d", self.step)
                break
            if getattr(self, "run_abort", False):
                # requested by a plugin (e.g. SteereoControl `stop`)
                global_log.info("run aborted by plugin at step %d", self.step)
                break
        loop_timer.stop()
        profiler.finish(
            lambda: float(self.last_globals.upot)
            if self.last_globals is not None else None
        )
        for p in self._plugins:
            p.finish(self)
        if final_checkpoint:
            self.write_checkpoint(final_checkpoint)
        # speed report (MarDyn.cpp:262-270)
        el = max(loop_timer.elapsed, 1e-12)
        n = int(float(self.last_globals.n)) if self.last_globals else 0
        global_log.info(
            "Simulation loop took: %.3f s (%.3f steps/s)", el, steps / el
        )
        global_log.info(
            "Molecule-updates per second: %.3e", n * steps / el
        )
        global_log.info("\n%s", self.timers.report())
        return self.last_globals
