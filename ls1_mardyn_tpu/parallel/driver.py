"""Multi-chip simulation driver: the user-facing layer over
SlabSimulation / Mesh3DSimulation.

The role of the reference's `<parallelisation type="DomainDecomposition">`
wiring (/root/reference/src/Simulation.cpp:332-420 + MarDyn.cpp main):
take the same XML/scene inputs as the single-chip MDSimulation, split
the box over the available devices, and run the jitted shard_map step
loop with the plugin hooks operating on gathered state at their own
frequencies.

Feature parity with the single-chip driver (VERDICT r1 item 2):

  - plugins are decomposition-agnostic, exactly like the reference's
    PluginBase (src/plugins/PluginBase.h:63-146 receives the container
    + decomposition): `sim.engine` here is a facade whose `.mol` is the
    gathered global state and whose setter re-distributes before the
    next device step, so every `sim.engine.mol` call site (Mirror,
    WallPotential, FixRegion, DistControl, MettDeamon, ...) works
    unchanged under --parallel
  - muVT grand canonical via SlabGrandCanonical (sharded probe psum)
  - overflow -> adaptive re-spec (gather, rebuild with doubled caps,
    redistribute) instead of a hard abort; same NaN watchdog, timed
    checkpoint, and loop-abort semantics as MDSimulation.run
"""

from __future__ import annotations

import dataclasses as _dc
import time as _time
from typing import Optional

import numpy as np

from ls1_mardyn_tpu.utils.logger import global_log


def _factor3(n: int, dims):
    """Factor n devices into a (Px, Py, Pz) grid with Pd <= dims[d],
    preferring z-heavy (slab-like) splits, then y."""
    best = None
    for px in range(1, n + 1):
        if n % px:
            continue
        for py in range(1, n // px + 1):
            if (n // px) % py:
                continue
            pz = n // px // py
            if px > dims[0] or py > dims[1] or pz > dims[2]:
                continue
            key = (pz, py, px)
            if best is None or key > best[0]:
                best = (key, (px, py, pz))
    return best[1] if best else None




def _cap_factor() -> float:
    """Per-device molecule-capacity headroom factor (default 2x the
    start count).  LS1_PAR_CAP_FACTOR trims it for HBM-bound at-scale
    runs (the muVT N>=10M tier: 2x capacity costs ~2 GB of state +
    aux at N=10.5M; GC insertion overflow is still detected and
    re-spec'd)."""
    import os

    try:
        return max(1.05, float(os.environ.get("LS1_PAR_CAP_FACTOR", 2.0)))
    except ValueError:
        return 2.0


class _GatheredEngine:
    """`sim.engine`-compatible facade over the sharded state.

    Plugins written against SingleChipSimulation read/write
    `engine.mol`, `engine.forces`, `engine.spec`, `engine.config` and
    call `engine.prepare_start()`.  Here `.mol` gathers the sharded
    state to the host (cached per step); assigning `.mol` stores the
    modified global state, which the parent re-distributes before the
    next device step.  This mirrors the reference, where plugins
    iterate the local container + halo through the same interface under
    every decomposition (PluginBase.h:63-146)."""

    def __init__(self, parent: "ParallelMDSimulation"):
        object.__setattr__(self, "_parent", parent)

    # -- molecule state ----------------------------------------------------
    @property
    def mol(self):
        return self._parent._gathered_mol()

    @mol.setter
    def mol(self, new_mol):
        self._parent._set_global_mol(new_mol)

    # -- forces --------------------------------------------------------------
    @property
    def forces(self):
        return self._parent._gathered_forces()

    @forces.setter
    def forces(self, value):
        if value is not None:
            raise ValueError(
                "plugins may only invalidate engine.forces (set None)"
            )
        self._parent._FM = None

    def prepare_start(self):
        """Recompute forces at the current positions (plugins call this
        after teleporting/reinserting molecules)."""
        self._parent._FM = None

    # -- static descriptors ---------------------------------------------------
    @property
    def spec(self):
        return self._parent.global_spec

    @property
    def config(self):
        return self._parent.sim_config

    @property
    def volume(self):
        return self._parent.volume

    @property
    def macro(self):
        """Global Macroscopic of the last step (psum-replicated in the
        sharded step) -- single-chip parity for plugins that read
        engine.macro; None only before the first step."""
        return self._parent._macro


class ParallelMDSimulation:
    """XML scene -> slab/mesh3d-decomposed multi-chip run.

    Exposes the same plugin-facing surface as MDSimulation
    (engine facade, molecules(), box, config, pp, table, last_globals,
    time, timers)."""

    def __init__(self, config, n_devices: Optional[int] = None,
                 dtype=None, cell_cap: int = 0,
                 phase_space_data=None, ms_packed: bool = False):
        self._ms_packed = bool(ms_packed)
        import jax
        import jax.numpy as jnp

        from ls1_mardyn_tpu.driver import MDSimulation
        from ls1_mardyn_tpu.plugins.base import PluginFactory

        dtype = dtype or jnp.float32
        self._dtype = dtype
        if n_devices is None:
            n_devices = jax.device_count()
        self.n_devices = n_devices
        # ewald_method == "fmm" is supported on BOTH decompositions:
        # the sharded FMM runs the reference's duplicated-global-levels
        # scheme (one psum of leaf moments + replicated tree,
        # UniformPseudoParticleContainer.h:95-135); the 3-D mesh passes
        # its flat device rank so the collision-free leaf-table slots
        # and the near-field cell slices stay consistent.

        # reuse the single-chip scene construction (readers, tables,
        # thermostats, LRC) -- but not its engine, its plugins (we own
        # the plugin lifecycle) or its axis swap (the swap's adaptive-
        # row payoff is single-chip; un-swapping every gathered access
        # would tax all plugin traffic)
        cfg_base = _dc.replace(config, output_plugins=[], plugins=[])
        base = MDSimulation(cfg_base, dtype=dtype, force_mode="scene",
                            cell_cap=cell_cap, allow_axis_swap=False,
                            phase_space_data=phase_space_data)
        self.config = config
        self.table = base.table
        self.pp = base.pp
        self.box = base.box
        self.volume = base.volume
        self.time = float(
            phase_space_data.current_time if phase_space_data is not None
            else config.current_time
        )
        self.step = 0
        self.last_globals = None
        self.timers = base.timers
        self.engine = _GatheredEngine(self)
        self._macro = None
        self._mol_cache = None
        self._mol_dirty = False
        self.run_abort = False
        self.gc = None  # set after decomposition; _rebalance reads it
        # heat-capacity sampling (Domain::record_cv), gated on
        # <equilibration><steps>; see MDSimulation for the convention
        self._cv_su = 0.0
        self._cv_suu = 0.0
        self._cv_n = 0
        self._cv_win = []

        # plugins before the decomposition: force-field plugins plant
        # their siteWiseForces contribution into the sharded step
        self._plugins = []
        for spec_ in list(config.output_plugins) + list(config.plugins):
            try:
                self._plugins.append(
                    PluginFactory.create(spec_.name, spec_.params)
                )
            except KeyError:
                global_log.warning("ignoring unknown plugin %r", spec_.name)
        self._site_force_fns = tuple(
            fn for fn in (
                p.site_wise_forces_fn(self.table, self.box)
                for p in self._plugins
            ) if fn is not None
        )

        self._build_decomposition(base, cell_cap)

        for p in self._plugins:
            p.init(self)

        # muVT: grand-canonical moves against the sharded state
        # (GrandCanonicalEnsemble.cpp:92-137); the sharded probe is a
        # psum of per-device partial energies
        if config.ensemble_type == "muVT":
            from ls1_mardyn_tpu.ensemble.grand_canonical import (
                _build_chemical_potentials,
            )
            from ls1_mardyn_tpu.parallel.gcmc import (
                Mesh3DGrandCanonical,
                SlabGrandCanonical,
            )

            cps = _build_chemical_potentials(
                config.chemical_potentials, np.asarray(self.box)
            )
            klass = (
                SlabGrandCanonical if self.kind == "slab"
                else Mesh3DGrandCanonical
            )
            self.gc = klass(
                self.sim, cps, config.temperature or base.engine.config.target_temperature
            )
            if self.kind == "slab" and self.z_edges is not None:
                self.gc.owner_bounds = self.z_edges[:: self.sim.cfg.nz_local]

    # -- decomposition construction -----------------------------------------
    def _build_decomposition(self, base, cell_cap: int):
        import jax
        import numpy as np

        from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta
        from ls1_mardyn_tpu.parallel.decomposition import (
            SlabConfig,
            SlabSimulation,
        )

        config = self.config
        n_devices = self.n_devices
        mol = base.engine.mol
        n = int(np.asarray(mol.valid).sum())
        rc = config.lj_cutoff
        interpret = jax.default_backend() != "tpu"

        # cell grid: cells >= rc everywhere, nz divisible by n_devices
        dims = [max(1, int(np.floor(b / rc))) for b in self.box]
        nz = max(n_devices, (dims[2] // n_devices) * n_devices)
        nx, ny = dims[0], dims[1]
        cap = cell_cap or max(
            32, int(2 ** np.ceil(np.log2(max(rc**3 * n / self.volume * 3, 8))))
        )
        # coarsest admissible grid for big scenes: kernel work is
        # n_cells * cap * window regardless of occupancy, so the
        # FINEST grid (edge = rc) wastes slots whenever cells run far
        # below cap (the bench's _pick_grid3 logic, applied lightly:
        # the decomposition routing decision keeps using the finest
        # dims so the slab/mesh choice is unchanged)
        rv = np.asarray(mol.r)[np.asarray(mol.valid)]
        if n >= 500_000 and not cell_cap:
            rv0 = rv
            for occ_target in (19.0, 14.0, 10.0):
                e_t = (occ_target * self.volume / n) ** (1.0 / 3.0)
                if e_t <= rc:
                    break
                dc = [max(4, int(np.floor(b / e_t))) for b in self.box]
                dc[0] -= dc[0] % 4
                dcz = (dc[2] // n_devices) * n_devices
                if min(dc[0], dc[1], dcz) < 4:
                    continue
                if (n_devices > dims[2]) != (n_devices > dcz):
                    continue
                cx = np.clip((rv0[:, 0] / (self.box[0] / dc[0]))
                             .astype(int), 0, dc[0] - 1)
                cy = np.clip((rv0[:, 1] / (self.box[1] / dc[1]))
                             .astype(int), 0, dc[1] - 1)
                cz = np.clip((rv0[:, 2] / (self.box[2] / dcz))
                             .astype(int), 0, dcz - 1)
                occ = np.bincount(
                    (cz * dc[1] + cy) * dc[0] + cx,
                    minlength=dcz * dc[1] * dc[0],
                ).max()
                if occ <= 26:
                    global_log.info(
                        "grid: coarsened (%d,%d,%d)->(%d,%d,%d) "
                        "cap 32 (occ max %d)",
                        nx, ny, nz, dc[0], dc[1], dcz, occ,
                    )
                    nx, ny, nz = dc[0], dc[1], dcz
                    cap = 32
                    break
        # load-balance decision (KDDecomposition/ALL role): when the
        # initial uniform-slab imbalance is high, build ONE adaptive
        # row per device (nz = P) -- device boundaries then move freely
        # above the cutoff, which is the finest balancing granularity a
        # slab split admits (a device's minimum height is nz_local*rc)
        init_edges = None
        if n and n_devices <= dims[2]:
            from ls1_mardyn_tpu.parallel.decomposition import (
                balanced_z_edges,
            )

            cu = np.bincount(
                np.clip(
                    (rv[:, 2] / (self.box[2] / n_devices)).astype(int),
                    0, n_devices - 1,
                ),
                minlength=n_devices,
            )
            if cu.max() > 1.3 * cu.mean():
                nz = n_devices
                init_edges = balanced_z_edges(
                    rv[:, 2], nz, float(self.box[2]), rc
                )
                if not cell_cap:
                    # measure occupancy under the balanced rows
                    cx = np.clip((rv[:, 0] / (self.box[0] / nx)).astype(int),
                                 0, nx - 1)
                    cy = np.clip((rv[:, 1] / (self.box[1] / ny)).astype(int),
                                 0, ny - 1)
                    cz = np.clip(
                        np.searchsorted(init_edges[1:-1], rv[:, 2],
                                        side="right"),
                        0, nz - 1,
                    )
                    occ = np.bincount(
                        (cz * ny + cy) * nx + cx, minlength=nz * ny * nx
                    ).max()
                    cap = max(
                        32, int(2 ** np.ceil(np.log2(max(1.5 * occ, 8))))
                    )
                global_log.info(
                    "load balance: building %d adaptive z rows "
                    "(uniform imbalance %.2f), cap %d",
                    nz, cu.max() / max(cu.mean(), 1e-12), cap,
                )
        is_1clj = (
            self.table.K == 1
            and len(self.table.components[0].ljcenters) == 1
            and not self.table.has_electrostatics()
        )
        # per-molecule virial consumers (GammaWriter surface tension --
        # the reference's CI validation class, Jenkinsfile:368-376 --
        # DirectedPM): 1CLJ scenes must still produce exact Vi.  The
        # slab cw kernel grows opt-in Vi accumulators (+3 FMA/
        # pair-lane); paths without that option run the multi-site
        # kernel (NL=1), which always carries Vi.
        _vi_plugins = {"GammaWriter", "DirectedPM"}
        need_vi = any(
            type(p).__name__ in _vi_plugins
            or getattr(p, "name", "") in _vi_plugins
            for p in self._plugins
        )
        tx = next(t for t in (4, 2, 1) if nx % t == 0)
        if not interpret:
            u = 128 // tx
            cap = ((cap + u - 1) // u) * u
        # long-range electrostatics: reuse the single-chip driver's
        # solver selection (direct Ewald vs SPME mesh) and shard its
        # k-space (psum of structure factors / of the charge mesh)
        screen_alpha = float(getattr(base, "_screen_alpha", 0.0) or 0.0)
        ewald_kmax = 0
        ewald_alpha = 0.0
        pme_grid = ()
        pme_order = 4
        self._fmm = None
        if base.ewald is not None:
            from ls1_mardyn_tpu.ops.fmm import FMMElectrostatics

            if isinstance(base.ewald, FMMElectrostatics):
                # FMM owns ALL Coulomb work; the sharded pair kernel
                # runs LJ-only on the charge-stripped table
                # (Simulation.cpp:781-797 parity) with no erfc
                # screening
                self._fmm = base.ewald
                screen_alpha = 0.0
            elif hasattr(base.ewald.params, "grid"):
                ewald_alpha = float(base.ewald.params.alpha)
                pme_grid = tuple(base.ewald.params.grid)
                pme_order = int(base.ewald.params.order)
            else:
                ewald_alpha = float(base.ewald.params.alpha)
                ewald_kmax = int(base.ewald.params.kmax)
        common = dict(
            cap=cap,
            box=tuple(float(b) for b in self.box),
            n_local_cap=int(_cap_factor() * max(n, 1)) // n_devices
            + 256,
            migrate_cap=max(64, n // (8 * n_devices)),
            dt=config.timestep,
            target_temperature=float(base.engine.config.target_temperature),
            thermostat=bool(base.engine.config.thermostat),
            eps24=float(self.table.eps24[0, 0, 0, 0]) if is_1clj else 0.0,
            sig2=float(self.table.sig2[0, 0, 0, 0]) if is_1clj else 0.0,
            shift6=float(self.table.shift6[0, 0, 0, 0]) if is_1clj else 0.0,
            rc2=float(config.cutoff**2),
            interpret=interpret,
            upot_corr=float(getattr(base.lrc, "upot_corr", 0.0)),
            virial_corr=float(getattr(base.lrc, "virial_corr", 0.0)),
            ms_meta=None if is_1clj else _MSMeta(
                base._table_pair if self._fmm is not None else self.table
            ),
            rc2_lj=float(self.table.lj_cutoff**2),
            screen_alpha=screen_alpha,
            ewald_kmax=ewald_kmax,
            ewald_alpha=ewald_alpha,
            pme_grid=pme_grid,
            pme_order=pme_order,
        )
        if n_devices > dims[2]:
            # more chips than z cell rows: slab granularity exhausted
            # -> 3-D Cartesian mesh (DomainDecomposition MPIGridDims)
            from ls1_mardyn_tpu.parallel.mesh3d import (
                Mesh3DConfig,
                Mesh3DSimulation,
            )


            grid3 = _factor3(n_devices, dims)
            if grid3 is None:
                raise ValueError(
                    f"cannot factor {n_devices} devices onto cell grid "
                    f"{tuple(dims)}"
                )
            if is_1clj and need_vi:
                # mesh3d's 1CLJ row kernel has no Vi accumulators; the
                # multi-site kernel (NL=1) carries exact per-axis Vi
                common = dict(common, ms_meta=_MSMeta(self.table))
                global_log.info(
                    "per-molecule Vi consumers present: mesh3d 1CLJ "
                    "scene routed onto the multi-site kernel"
                )
            nd3 = [(dims[d] // grid3[d]) * grid3[d] for d in range(3)]
            nxl = nd3[0] // grid3[0]
            tx3 = next(t for t in (4, 2, 1) if nxl % t == 0)
            cap3 = cap
            if not interpret:
                u = 128 // tx3
                cap3 = ((cap + u - 1) // u) * u
            mcfg = Mesh3DConfig(
                grid=grid3,
                nxl=nxl,
                nyl=nd3[1] // grid3[1],
                nzl=nd3[2] // grid3[2],
                tx=tx3,
                temp_control_regions=tuple(
                    base.engine.config.temp_control_regions
                ),
                **{**common, "cap": cap3,
                   "n_local_cap": int(_cap_factor() * max(n, 1))
                   // n_devices + 256},
            )
            self.sim = Mesh3DSimulation(
                mcfg, self.pp, extra_force_fns=self._site_force_fns,
                fmm=self._fmm,
            )
            self.kind = "mesh3d"
            self.global_spec = _dc.replace(
                mcfg.local_spec,
                dims=(nd3[0], nd3[1], nd3[2]),
                box=tuple(float(b) for b in self.box),
            )
            global_log.info(
                "parallel: %d-device 3-D mesh decomposition %s, local "
                "cells (%d, %d, %d), %s kernel",
                n_devices, grid3, mcfg.nxl, mcfg.nyl, mcfg.nzl,
                "1CLJ" if is_1clj else "multi-site",
            )
        else:
            rc = float(config.cutoff)
            cw_ok = (
                is_1clj
                and not interpret
                and (4 * cap) % 128 == 0
                and (tx * cap) % 128 == 0
                and nx % tx == 0
                and nx >= 4
                and ny >= 3
                and min(self.box[0] / nx, self.box[1] / ny,
                        self.box[2] / nz) >= rc
            )
            compute_vi = False
            if is_1clj and need_vi:
                if cw_ok:
                    compute_vi = True
                    global_log.info(
                        "per-molecule Vi consumers present: cw kernel "
                        "Vi accumulators enabled (+3 FMA/pair-lane)"
                    )
                else:
                    # row-kernel fallback has no Vi accumulators
                    common = dict(common, ms_meta=_MSMeta(self.table))
                    global_log.info(
                        "per-molecule Vi consumers present: slab 1CLJ "
                        "scene routed onto the multi-site kernel"
                    )
            ms_packed = self._ms_packed
            if ms_packed and common.get("ms_meta") is None:
                global_log.warning(
                    "ms_packed requested but the scene runs the 1CLJ "
                    "kernel; flag ignored")
            slab_cfg = SlabConfig(
                n_devices=n_devices,
                nz_local=nz // n_devices,
                ny=ny,
                nx=nx,
                tx=tx,
                cw_eligible=cw_ok,
                compute_vi=compute_vi,
                ms_packed=bool(ms_packed
                               and common.get("ms_meta") is not None),
                temp_control_regions=tuple(
                    base.engine.config.temp_control_regions
                ),
                **common,
            )
            self.sim = SlabSimulation(
                slab_cfg, self.pp, extra_force_fns=self._site_force_fns,
                fmm=self._fmm,
            )
            self.kind = "slab"
            self.global_spec = _dc.replace(
                slab_cfg.local_spec,
                dims=(nx, ny, nz),
                box=tuple(float(b) for b in self.box),
            )
            global_log.info(
                "parallel: %d-device slab decomposition, grid "
                "(%d, %d, %d), %s kernel",
                n_devices, nx, ny, nz, "1CLJ" if is_1clj else "multi-site",
            )
        # non-uniform z row edges are a DYNAMIC step argument
        # (rebalanced from measured per-device counts, no recompile)
        self.z_edges = init_edges if self.kind == "slab" else None
        self._lb_threshold = 1.3
        self._lb_cooldown = 0
        if self.kind == "slab":
            self.mol_sharded = self.sim.distribute(
                mol, z_edges=self.z_edges
            )
        else:
            # mesh3d init-time tensor balancing (device-granular
            # KDDecomposition / ALL-TENSOR role; same 1.3x trigger as
            # the slab, applied per axis on the marginal distribution)
            mcfg = self.sim.cfg
            nl = (mcfg.nxl, mcfg.nyl, mcfg.nzl)
            hosts = ("xb_host", "yb_host", "zb_host")
            if n:
                from ls1_mardyn_tpu.parallel.decomposition import (
                    balanced_z_edges,
                )

                for d in range(3):
                    Pd = mcfg.grid[d]
                    min_h = nl[d] * rc
                    if Pd == 1 or Pd * min_h > self.box[d]:
                        continue
                    cu = np.bincount(
                        np.clip(
                            (rv[:, d] / (self.box[d] / Pd)).astype(int),
                            0, Pd - 1,
                        ),
                        minlength=Pd,
                    )
                    if cu.max() > 1.3 * cu.mean():
                        bd = balanced_z_edges(
                            rv[:, d], Pd, float(self.box[d]), min_h
                        )
                        setattr(self.sim, hosts[d], bd)
                        global_log.info(
                            "load balance: mesh3d balanced %s-layer "
                            "bounds at init (uniform imbalance %.2f)",
                            "xyz"[d],
                            cu.max() / max(cu.mean(), 1e-12),
                        )
            self.mol_sharded = self.sim.distribute(mol)
        self._FM = None

    # -- SimConfig facade ------------------------------------------------------
    @property
    def sim_config(self):
        from ls1_mardyn_tpu.simulation import SimConfig

        cfg = self.sim.cfg
        return SimConfig(
            dt=cfg.dt,
            target_temperature=cfg.target_temperature,
            thermostat=cfg.thermostat,
            cell_cap=cfg.cap,
            upot_corr=cfg.upot_corr,
            virial_corr=cfg.virial_corr,
            screen_alpha=cfg.screen_alpha,
        )

    def retarget_temperature(self, t: float):
        """Change the thermostat target mid-run (SteereoControl set_t):
        rebuild the sharded step with the new SlabConfig."""
        cfg = _dc.replace(
            self.sim.cfg, target_temperature=float(t), thermostat=True
        )
        self._rebuild_from_cfg(cfg)

    def _rebuild_from_cfg(self, cfg):
        from ls1_mardyn_tpu.parallel.decomposition import SlabSimulation
        from ls1_mardyn_tpu.parallel.mesh3d import Mesh3DSimulation

        klass = SlabSimulation if self.kind == "slab" else Mesh3DSimulation
        # pending plugin edits (dirty cache) are the current truth;
        # otherwise gather the device state
        g = (
            self._mol_cache
            if self._mol_dirty
            else self.sim.gather_global(self.mol_sharded)
        )
        kw0 = {"fmm": getattr(self, "_fmm", None)}
        self.sim = klass(
            cfg, self.pp, extra_force_fns=self._site_force_fns, **kw0
        )
        kw = {}
        if self.kind == "slab" and getattr(self, "z_edges", None) is not None:
            kw["z_edges"] = self.z_edges
        self.mol_sharded = self.sim.distribute(g, **kw)
        self._FM = None
        self._mol_cache = None
        self._mol_dirty = False
        if self.gc is not None:
            self.gc.sim = self.sim
            self.gc.rebind()

    # -- engine-facade state plumbing -------------------------------------------
    def _gathered_mol(self):
        if self._mol_cache is None:
            import jax
            import jax.numpy as jnp

            # jnp (host-committed) arrays, not np: plugins written for
            # the single-chip engine use functional .at[] updates
            g = self.sim.gather_global(self.mol_sharded)
            self._mol_cache = jax.tree.map(jnp.asarray, g)
        return self._mol_cache

    def _set_global_mol(self, new_mol):
        self._mol_cache = new_mol
        self._mol_dirty = True

    def _gathered_forces(self):
        if self._FM is None:
            return None
        from ls1_mardyn_tpu.state import Forces

        Vi = None
        if isinstance(self._FM, dict):
            F, M = self._FM["F"], self._FM["M"]
            Vi = self._FM.get("Vi")
        elif len(self._FM) == 3:
            F, M, Vi = self._FM
        else:
            F, M = self._FM
        F = np.asarray(F)
        M = np.asarray(M)
        has_vi = self.sim.cfg.ms_meta is not None or getattr(
            self.sim.cfg, "compute_vi", False
        )
        if Vi is None or not has_vi:
            # 1CLJ sharded kernels without the compute_vi opt-in track
            # only the scalar virial; warn loudly instead of letting
            # GammaWriter/pressure profiles silently compute from zeros
            # (src/io/GammaWriter.cpp reads per-molecule Vi).  Vi
            # consumers known at construction flip compute_vi (cw
            # kernel) or route onto the multi-site kernel, so this
            # fires only for out-of-registry plugins reading .Vi.
            if not getattr(self, "_warned_vi", False):
                self._warned_vi = True
                global_log.warning(
                    "per-molecule virials are zero under the 1CLJ "
                    "sharded kernels; GammaWriter/pressure-profile "
                    "plugins will be WRONG under --parallel for this "
                    "scene (multi-site scenes carry exact Vi)"
                )
            return Forces(F=F, M=M, Vi=np.zeros_like(F))
        return Forces(F=F, M=M, Vi=np.asarray(Vi))

    def _flush_mol(self):
        """Re-distribute a plugin-modified global state.  Forces ride
        the same permutation (single-chip parity: plugin edits between
        steps keep the previous forces for the next pre-force
        half-step; the slot layout changes under redistribution, so
        they must move with their molecules)."""
        if not self._mol_dirty:
            return
        kw = {}
        if self.kind == "slab" and self.z_edges is not None:
            kw["z_edges"] = self.z_edges
        if isinstance(self._FM, dict):
            a = self._FM
            keys = [k for k in ("F", "M", "Vi", "rcomp", "vcomp") if k in a]
            self.mol_sharded, ex = self.sim.distribute(
                self._mol_cache,
                extras=tuple(np.asarray(a[k]) for k in keys),
                **kw,
            )
            self._FM = dict(zip(keys, ex))
        elif self._FM is not None:
            self.mol_sharded, self._FM = self.sim.distribute(
                self._mol_cache,
                extras=tuple(np.asarray(x) for x in self._FM), **kw
            )
        else:
            self.mol_sharded = self.sim.distribute(self._mol_cache, **kw)
        self._mol_dirty = False
        self._mol_cache = None

    # plugin-facing surface --------------------------------------------
    def molecules(self):
        return self._gathered_mol()

    def forces_array(self):
        f = self._gathered_forces()
        return None if f is None else f.F

    def _export_phasespace(self):
        """Gathered device state -> PhaseSpaceData (the MDSimulation
        contract; used by plugins that serialize whole scenes, e.g.
        MPICheckpointWriter's reference-format .dat files)."""
        from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData

        mol = self._gathered_mol()
        valid = np.asarray(mol.valid)
        return PhaseSpaceData(
            components=self.table.components,
            mixing_xi=self.table.mixing_xi,
            mixing_eta=self.table.mixing_eta,
            eps_rf=self.table.eps_rf,
            box=np.asarray(self.box),
            temperature=self.config.temperature,
            current_time=self.time,
            mid=np.asarray(mol.mid)[valid].astype(np.int64),
            cid=np.asarray(mol.cid)[valid],
            r=np.asarray(mol.r)[valid],
            v=np.asarray(mol.v)[valid],
            q=np.asarray(mol.q)[valid],
            L=np.asarray(mol.L)[valid],
        )

    def write_checkpoint(self, path: str, binary: bool = False):
        self._flush_mol()
        self.sim.write_checkpoint(
            self.mol_sharded, path, self.table,
            current_time=self.time, binary=binary,
        )

    def snapshot(self):
        self._flush_mol()
        return self.sim.snapshot(self.mol_sharded, time=self.time)

    def restore(self, snap):
        # re-DISTRIBUTE (not just re-shard): the slab edges may have
        # been rebalanced since the snapshot, changing ownership
        from ls1_mardyn_tpu.state import MoleculeState

        m = snap["mol"]
        g = m if isinstance(m, MoleculeState) else MoleculeState(**m)
        kw = {}
        if self.kind == "slab" and self.z_edges is not None:
            kw["z_edges"] = self.z_edges
        self.mol_sharded = self.sim.distribute(g, **kw)
        self.time = snap.get("time", self.time)
        self._FM = None
        self._mol_cache = None
        self._mol_dirty = False

    # -- slab load balancing ------------------------------------------------
    def _rebalance(self):
        """Recompute non-uniform z row edges from the current molecule
        distribution (equal molecules per row, min height = cutoff) and
        redistribute.  The edges are a dynamic step argument, so this
        never recompiles (contrast: the reference rebuilds its KD tree
        and migrates, KDDecomposition.h:21-55).

        slab: per-ROW edges (nz_global rows, min height = cutoff).
        mesh3d: per-Z-LAYER device bounds (Pz layers; min height =
        nzl * cutoff so every cell row inside a layer keeps pitch >=
        rc and the +-1-row halo stays valid)."""
        import jax.numpy as jnp

        from ls1_mardyn_tpu.parallel.decomposition import balanced_z_edges

        cfg = self.sim.cfg
        self._flush_mol()
        g = self.sim.gather_global(self.mol_sharded)
        valid = np.asarray(g.valid)
        z = np.asarray(g.r)[valid, 2]
        rc = max(self.config.cutoff, self.config.lj_cutoff)
        if self.kind == "mesh3d":
            return self._rebalance_mesh3d(g, z, rc)
        nzg = cfg.n_devices * cfg.nz_local
        min_h = rc
        edges = balanced_z_edges(z, nzg, cfg.box[2], min_h)
        self.z_edges = edges
        if isinstance(self._FM, dict):
            a = self._FM
            keys = [k for k in ("F", "M", "Vi", "rcomp", "vcomp") if k in a]
            self.mol_sharded, ex = self.sim.distribute(
                g,
                extras=tuple(np.asarray(a[k]) for k in keys),
                z_edges=edges,
            )
            self._FM = dict(zip(keys, ex))
        elif self._FM is not None:
            self.mol_sharded, self._FM = self.sim.distribute(
                g, extras=tuple(np.asarray(x) for x in self._FM),
                z_edges=edges,
            )
        else:
            self.mol_sharded = self.sim.distribute(g, z_edges=edges)
        self._mol_cache = None
        bounds = edges[:: cfg.nz_local]
        if self.gc is not None:
            self.gc.owner_bounds = bounds
        counts = np.bincount(
            np.clip(np.searchsorted(bounds[1:-1], z, side="right"),
                    0, cfg.n_devices - 1),
            minlength=cfg.n_devices,
        )
        global_log.info(
            "load balance: non-uniform z rows adopted at step %d "
            "(per-device counts %s, imbalance %.3f)",
            self.step, counts.tolist(),
            counts.max() / max(counts.mean(), 1e-12),
        )

    def _rebalance_mesh3d(self, g, z, rc):
        """mesh3d tensor balancing: equal-count bounds at device
        granularity along EVERY axis with more than one device layer
        (the GeneralDomainDecomposition+ALL "TENSOR" method,
        src/parallel/ALLLoadBalancer.h -- each axis is balanced on the
        marginal distribution of its coordinate); every layer keeps
        extent >= n?l*rc so cell pitch stays >= rc and the +-1-row halo
        remains valid.  The bounds are dynamic step arguments and the
        host ownership tables (sim.{x,y,z}b_host), so distribute/GC
        routing follow automatically."""
        import jax.numpy as jnp

        from ls1_mardyn_tpu.parallel.decomposition import balanced_z_edges

        cfg = self.sim.cfg
        if cfg.n_devices == 1:
            return
        valid = np.asarray(g.valid)
        rr = np.asarray(g.r)[valid]
        nl = (cfg.nxl, cfg.nyl, cfg.nzl)
        hosts = ("xb_host", "yb_host", "zb_host")
        balanced_any = False
        for d in range(3):
            Pd = cfg.grid[d]
            if Pd == 1:
                continue
            min_h = nl[d] * rc
            if Pd * min_h > cfg.box[d]:
                global_log.warning(
                    "mesh3d load balance skipped on axis %d: %d layers"
                    " x n%sl=%d rows x rc=%.3g exceed the box extent "
                    "%.3g", d, Pd, "xyz"[d], nl[d], rc, cfg.box[d],
                )
                continue
            bd = balanced_z_edges(rr[:, d], Pd, cfg.box[d], min_h)
            setattr(self.sim, hosts[d], bd)
            balanced_any = True
        if not balanced_any:
            return
        if isinstance(self._FM, dict):
            a = self._FM
            keys = [k for k in ("F", "M", "Vi", "rcomp", "vcomp")
                    if k in a]
            self.mol_sharded, ex = self.sim.distribute(
                g, extras=tuple(np.asarray(a[k]) for k in keys)
            )
            self._FM = dict(zip(keys, ex))
        elif self._FM is not None:
            self.mol_sharded, self._FM = self.sim.distribute(
                g, extras=tuple(np.asarray(x) for x in self._FM)
            )
        else:
            self.mol_sharded = self.sim.distribute(g)
        self._mol_cache = None
        o = self.sim._owner3(rr)
        lin = (o[:, 0] * cfg.grid[1] + o[:, 1]) * cfg.grid[2] + o[:, 2]
        counts = np.bincount(lin, minlength=cfg.n_devices)
        global_log.info(
            "load balance: mesh3d tensor bounds adopted at step %d "
            "(per-device imbalance %.3f)",
            self.step,
            counts.max() / max(counts.mean(), 1e-12),
        )
        self._lb_cooldown = 10

    def _edges_arg(self):
        import jax.numpy as jnp

        if self.z_edges is None:
            return self.sim._edges_default
        return jnp.asarray(self.z_edges)

    # -- adaptive re-spec (parity with MDSimulation._respec_cell_cap) ---
    def _respec(self):
        """Cell/migration capacity exceeded: gather, rebuild the
        decomposition with doubled capacities, redistribute, resume."""
        cfg = self.sim.cfg
        if cfg.cap >= 2048:
            raise RuntimeError(
                "cell capacity exceeded at cap=%d; giving up" % cfg.cap
            )
        new = _dc.replace(
            cfg,
            cap=2 * cfg.cap,
            n_local_cap=2 * cfg.n_local_cap,
            migrate_cap=2 * cfg.migrate_cap,
        )
        global_log.warning(
            "capacity overflow at step %d: re-spec cap %d -> %d, "
            "n_local_cap -> %d, migrate_cap -> %d and resume",
            self.step, cfg.cap, new.cap, new.n_local_cap, new.migrate_cap,
        )
        self._rebuild_from_cfg(new)

    def _fold_cv(self):
        import jax.numpy as jnp

        if self._cv_win:
            u = np.asarray(jnp.stack(self._cv_win), np.float64)
            self._cv_win.clear()
            self._cv_su += float(u.sum())
            self._cv_suu += float((u * u).sum())
            self._cv_n += len(u)

    def cv(self) -> float:
        """Isochoric heat capacity (Domain::cv, Domain.cpp:789-798)."""
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

    def _recompute_forces(self):
        """Force/aux state at the current positions.  Slab: an aux dict
        (F, M, zeroed Kahan compensation); mesh3d: the (F, M) tuple."""
        if self.kind == "slab":
            FM = self.sim._force_sharded(
                self.mol_sharded, self._edges_arg()
            )[0]
            return self.sim.make_aux(FM)
        return self.sim._force_sharded(self.mol_sharded)[0]

    # main loop ----------------------------------------------------------
    def run(self, steps: Optional[int] = None, print_every: int = 100,
            final_checkpoint: Optional[str] = None,
            loop_abort_time: float = 0.0,
            timed_checkpoint: float = 0.0,
            profile_dir: Optional[str] = None,
            profile_steps=(10, 15)):
        import jax.numpy as jnp

        from ls1_mardyn_tpu.driver import _TraceCapture

        steps = steps if steps is not None else self.config.steps
        profiler = _TraceCapture(profile_dir, profile_steps, steps)
        slab = self.kind == "slab"
        if self._FM is None:
            self._flush_mol()
            # first element is (F, M) for both decompositions
            self._FM = self._recompute_forces()
        t_start = _time.time()
        gv = None
        check_every = min(print_every, 100) if print_every else 100
        ovf_window = []
        nloc = None
        for k in range(1, steps + 1):
            self.step += 1
            for p in self._plugins:
                p.before_event_new_timestep(self, self.step)
                p.before_forces(self, self.step)
            self._flush_mol()
            if self._FM is None:
                self._FM = self._recompute_forces()
            if slab:
                (self.mol_sharded, self._FM, gv, self._macro, overflow,
                 nloc) = self.sim._step_sharded_lb(
                    self.mol_sharded, self.sim.make_aux(self._FM),
                    self._edges_arg(),
                    jnp.asarray(self.step, jnp.int32),
                )
            else:
                (self.mol_sharded, self._FM, gv, self._macro,
                 overflow, nloc) = self.sim._step_sharded(
                    self.mol_sharded, self._FM,
                    jnp.asarray(self.step, jnp.int32),
                    self.sim._bounds_default,
                )
            ovf_window.append(overflow)
            self._mol_cache = None
            self.last_globals = gv
            profiler.tick(k, lambda: float(gv.upot))
            self.time += self.config.timestep
            if self.step > self.config.equilibration_steps:
                self._cv_win.append(gv.upot)
            if self.gc is not None:
                self.mol_sharded = self.gc.step(self.mol_sharded, self.step)
            for p in self._plugins:
                p.after_forces(self, self.step)
                p.end_step(self, self.step)
            if print_every and self.step % print_every == 0:
                global_log.info(
                    "Simstep = %d\tT = %g\tU_pot = %g\tp = %g",
                    self.step, float(gv.temperature), float(gv.upot),
                    float(gv.pressure),
                )
            if self.step % check_every == 0 or k == steps:
                # NaN watchdog FIRST (re-spec'ing garbage state would
                # only rebuild and re-crash; Simulation.cpp:1236-1239)
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
                    self._respec()
                elif nloc is not None:
                    # measured per-device load -> rebalance when the
                    # imbalance factor drifts past the threshold
                    if self._lb_cooldown > 0:
                        self._lb_cooldown -= 1
                    else:
                        counts = np.asarray(nloc)
                        mean = max(float(counts.mean()), 1e-12)
                        if float(counts.max()) > self._lb_threshold * mean:
                            self._rebalance()
            if timed_checkpoint and (_time.time() - t_start) > timed_checkpoint:
                self.write_checkpoint("timed.restart.dat")
                global_log.warning(
                    "walltime limit: wrote timed.restart.dat at step %d",
                    self.step,
                )
                break
            if loop_abort_time and (_time.time() - t_start) > loop_abort_time:
                global_log.warning(
                    "loop abort time reached at step %d", self.step
                )
                break
            if self.run_abort:
                global_log.info("run aborted by plugin at step %d", self.step)
                break
        profiler.finish(
            lambda: float(gv.upot) if gv is not None else None
        )
        for p in self._plugins:
            p.finish(self)
        if final_checkpoint:
            self.write_checkpoint(final_checkpoint)
        el = max(_time.time() - t_start, 1e-12)
        n = int(float(gv.n)) if gv is not None else 0
        global_log.info(
            "Simulation loop took: %.3f s (%.3f steps/s)", el, steps / el
        )
        global_log.info("Molecule-updates per second: %.3e", n * steps / el)
        return gv

    @staticmethod
    def from_xml(path: str, **kw) -> "ParallelMDSimulation":
        from ls1_mardyn_tpu.io.xml_config import read_xml_config

        return ParallelMDSimulation(read_xml_config(path), **kw)
