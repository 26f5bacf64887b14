"""Multi-chip simulation driver: the user-facing layer over
SlabSimulation.

The role of the reference's `<parallelisation type="DomainDecomposition">`
wiring (/root/reference/src/Simulation.cpp:332-420 + MarDyn.cpp main):
take the same XML/scene inputs as the single-chip MDSimulation, split
the box into z slabs over the available devices, and run the jitted
shard_map step loop with the plugin hooks operating on gathered state
at their own frequencies.

Select from the CLI with --parallel N (or auto when more than one
device is visible).
"""

from __future__ import annotations

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


class ParallelMDSimulation:
    """XML scene -> slab-decomposed multi-chip run.

    Exposes the same plugin-facing surface as MDSimulation
    (molecules(), box, config, pp, table, last_globals, time) so the
    output plugins work unchanged on gathered state.
    """

    def __init__(self, config, n_devices: Optional[int] = None,
                 dtype=None, cell_cap: int = 0):
        import jax
        import jax.numpy as jnp

        from ls1_mardyn_tpu.driver import MDSimulation
        from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta
        from ls1_mardyn_tpu.parallel.decomposition import (
            SlabConfig,
            SlabSimulation,
        )

        dtype = dtype or jnp.float32
        if n_devices is None:
            n_devices = jax.device_count()
        self.n_devices = n_devices

        # reuse the single-chip scene construction (readers, tables,
        # thermostats, LRC) -- but not its engine
        base = MDSimulation(config, dtype=dtype, force_mode="cells",
                            cell_cap=cell_cap)
        self.config = config
        self.table = base.table
        self.pp = base.pp
        self.box = base.box
        self.time = float(config.current_time)
        self.step = 0
        self.last_globals = None
        self._plugins = base._plugins
        self.timers = base.timers

        mol = base.engine.mol
        n = int(np.asarray(mol.valid).sum())
        rc = config.lj_cutoff
        interpret = jax.default_backend() != "tpu"

        # cell grid: cells >= rc everywhere, nz divisible by n_devices
        dims = [max(1, int(np.floor(b / rc))) for b in self.box]
        nz = max(n_devices, (dims[2] // n_devices) * n_devices)
        nx, ny = dims[0], dims[1]
        cap = cell_cap or max(
            32, int(2 ** np.ceil(np.log2(max(rc**3 * n / base.volume * 3, 8))))
        )
        is_1clj = (
            self.table.K == 1
            and len(self.table.components[0].ljcenters) == 1
            and not self.table.has_electrostatics()
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
        if base.ewald is not None:
            ewald_alpha = float(base.ewald.params.alpha)
            if hasattr(base.ewald.params, "grid"):
                pme_grid = tuple(base.ewald.params.grid)
                pme_order = int(base.ewald.params.order)
            else:
                ewald_kmax = int(base.ewald.params.kmax)
        common = dict(
            cap=cap,
            box=tuple(float(b) for b in self.box),
            n_local_cap=2 * n // n_devices + 256,
            migrate_cap=max(64, n // (8 * n_devices)),
            dt=config.timestep,
            target_temperature=config.temperature,
            thermostat=config.ensemble_type.upper() == "NVT",
            eps24=float(self.table.eps24[0, 0, 0, 0]) if is_1clj else 0.0,
            sig2=float(self.table.sig2[0, 0, 0, 0]) if is_1clj else 0.0,
            shift6=float(self.table.shift6[0, 0, 0, 0]) if is_1clj else 0.0,
            rc2=float(config.cutoff**2),
            interpret=interpret,
            upot_corr=float(getattr(base.lrc, "upot_corr", 0.0)),
            virial_corr=float(getattr(base.lrc, "virial_corr", 0.0)),
            ms_meta=None if is_1clj else _MSMeta(self.table),
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
                **{**common, "cap": cap3,
                   "n_local_cap": 2 * n // n_devices + 256},
            )
            self.sim = Mesh3DSimulation(mcfg, self.pp)
            global_log.info(
                "parallel: %d-device 3-D mesh decomposition %s, local "
                "cells (%d, %d, %d), %s kernel",
                n_devices, grid3, mcfg.nxl, mcfg.nyl, mcfg.nzl,
                "1CLJ" if is_1clj else "multi-site",
            )
        else:
            slab_cfg = SlabConfig(
                n_devices=n_devices,
                nz_local=nz // n_devices,
                ny=ny,
                nx=nx,
                tx=tx,
                **common,
            )
            self.sim = SlabSimulation(slab_cfg, self.pp)
            global_log.info(
                "parallel: %d-device slab decomposition, grid "
                "(%d, %d, %d), %s kernel",
                n_devices, nx, ny, nz, "1CLJ" if is_1clj else "multi-site",
            )
        self.mol_sharded = self.sim.distribute(mol)
        self._FM = None

    # plugin-facing surface --------------------------------------------
    def molecules(self):
        return self.sim.gather_global(self.mol_sharded)

    def forces_array(self):
        return None

    def write_checkpoint(self, path: str, binary: bool = False):
        self.sim.write_checkpoint(
            self.mol_sharded, path, self.table,
            current_time=self.time, binary=binary,
        )

    # main loop ----------------------------------------------------------
    def run(self, steps: Optional[int] = None, print_every: int = 100,
            final_checkpoint: Optional[str] = None):
        steps = steps if steps is not None else self.config.steps
        for p in self._plugins:
            p.init(self)
        if self._FM is None:
            # first element is (F, M) for both decompositions
            self._FM = self.sim._force_sharded(self.mol_sharded)[0]
        t0 = _time.time()
        gv = None
        for k in range(1, steps + 1):
            self.step += 1
            for p in self._plugins:
                p.before_event_new_timestep(self, self.step)
                p.before_forces(self, self.step)
            self.mol_sharded, self._FM, gv, overflow = self.sim._step_sharded(
                self.mol_sharded, self._FM
            )
            self.last_globals = gv
            self.time += self.config.timestep
            for p in self._plugins:
                p.after_forces(self, self.step)
                p.end_step(self, self.step)
            if print_every and self.step % print_every == 0:
                global_log.info(
                    "Simstep = %d\tT = %g\tU_pot = %g\tp = %g",
                    self.step, float(gv.temperature), float(gv.upot),
                    float(gv.pressure),
                )
                if bool(overflow):
                    raise RuntimeError(
                        "slab capacity overflow; raise cell_cap/migrate_cap"
                    )
        for p in self._plugins:
            p.finish(self)
        if final_checkpoint:
            self.write_checkpoint(final_checkpoint)
        el = max(_time.time() - t0, 1e-12)
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
