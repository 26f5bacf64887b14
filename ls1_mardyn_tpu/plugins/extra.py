"""Remaining registry plugins: parallel-diagnostic facades and small
NEMD/sampling utilities, completing the reference's
PluginFactory::registerDefaultPlugins inventory
(/root/reference/src/plugins/PluginFactory.cpp:79-128).
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _slab_sim(sim):
    """The SlabSimulation when running under ParallelMDSimulation."""
    return getattr(sim, "sim", None)


@PluginFactory.register("LoadbalanceWriter")
class LoadbalanceWriter(PluginBase):
    """Per-rank load + imbalance time series
    (src/io/LoadBalanceWriter.{h,cpp}).  Single-chip runs log a single
    rank with imbalance 1."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        ssim = _slab_sim(sim)
        path = f"{self.output_prefix}.lb.dat"
        if ssim is not None:
            from ls1_mardyn_tpu.parallel.diagnostics import write_loadbalance

            write_loadbalance(ssim, sim.mol_sharded, path, step=step)
        else:
            import os

            gv = sim.last_globals
            n = int(float(gv.n)) if gv is not None else 0
            new = not os.path.exists(path)
            with open(path, "a") as f:
                if new:
                    f.write("# step imbalance max avg rank0\n")
                f.write(f"{step} 1.0000 {n} {n:.1f} {n}\n")


@PluginFactory.register("HaloParticleWriter")
class HaloParticleWriter(PluginBase):
    """Halo molecule dump per rank (src/io/HaloParticleWriter.{h,cpp});
    single-chip runs have no halo and write nothing."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        ssim = _slab_sim(sim)
        if ssim is None:
            return
        from ls1_mardyn_tpu.parallel.diagnostics import write_halo_particles

        write_halo_particles(ssim, sim.mol_sharded, self.output_prefix,
                             step=step)


@PluginFactory.register("CommunicationPartnerWriter")
class CommunicationPartnerWriter(PluginBase):
    """Per-rank communication partner table
    (src/io/CommunicationPartnerWriter.h)."""

    def init(self, sim):
        ssim = _slab_sim(sim)
        if ssim is None:
            return
        from ls1_mardyn_tpu.parallel.diagnostics import (
            write_communication_partners,
        )

        write_communication_partners(ssim, f"{self.output_prefix}.cp.dat")


@PluginFactory.register("KDTreePrinter")
class KDTreePrinter(PluginBase):
    """Decomposition structure dump (src/plugins/KDTreePrinter.h; this
    build's decomposition is a static slab table)."""

    def init(self, sim):
        ssim = _slab_sim(sim)
        if ssim is None:
            return
        from ls1_mardyn_tpu.parallel.diagnostics import write_decomposition

        write_decomposition(ssim, f"{self.output_prefix}.decomp_tree.dat")


@PluginFactory.register("MPICheckpointWriter")
class MPICheckpointWriter(PluginBase):
    """Parallel checkpoint writes (src/io/MPICheckpointWriter.cpp):
    every rank contributes its slab; here the gathered binary writer."""

    def end_step(self, sim, step):
        if step == 0 or step % self.write_frequency:
            return
        sim.write_checkpoint(
            f"{self.output_prefix}-{step}.restart.dat", binary=True
        )


@PluginFactory.register("ExamplePlugin")
class ExamplePlugin(PluginBase):
    """Hook-point demonstrator (src/plugins/ExamplePlugin.{h,cpp}):
    prints its message at the configured hook."""

    def __init__(self, params=None):
        super().__init__(params)
        self.message = self.params.get("message", "Your code would be called here.")
        self.where = self.params.get("writeposition", "endStep")
        self.calls = 0

    def _fire(self, where):
        if where == self.where:
            self.calls += 1
            print(f"[ExamplePlugin @ {where}] {self.message}")

    def before_event_new_timestep(self, sim, step):
        self._fire("beforeEventNewTimestep")

    def before_forces(self, sim, step):
        self._fire("beforeForces")

    def after_forces(self, sim, step):
        self._fire("afterForces")

    def end_step(self, sim, step):
        self._fire("endStep")


@PluginFactory.register("MmspdBinWriter")
class MmspdBinWriter(PluginBase):
    """Binary mmspd variant (src/io/MmspdBinWriter.cpp): header line +
    per-frame little-endian float records (cid, x, y, z)."""

    def init(self, sim):
        self._fname = f"{self.output_prefix}.mmspd.bin"
        with open(self._fname, "wb") as f:
            f.write(b"MMSPDb 1.0\n")
            box = sim.box
            np.asarray(
                [box[0], box[1], box[2]], dtype="<f8"
            ).tofile(f)

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid].astype("<f4")
        cid = np.asarray(mol.cid)[valid].astype("<f4")
        with open(self._fname, "ab") as f:
            np.asarray([len(r)], dtype="<i8").tofile(f)
            np.concatenate([cid[:, None], r], axis=1).tofile(f)


@PluginFactory.register("Permittivity")
class Permittivity(PluginBase):
    """Static dielectric constant from dipole-moment fluctuations
    (src/plugins/Permittivity.{h,cpp}):
      eps = 1 + (<M^2> - <M>^2) / (3 eps0 V kT)  (reduced: 4 pi eps0=1
      -> eps = 1 + 4 pi (<M^2>-<M>^2) / (3 V T))."""

    def __init__(self, params=None):
        super().__init__(params)
        self._m = []

    def after_forces(self, sim, step):
        import jax.numpy as jnp

        from ls1_mardyn_tpu.models.interaction import site_offsets

        mol = sim.engine.mol
        pp = sim.pp
        sites = site_offsets(pp, mol.q, mol.cid)
        # total dipole moment: permanent dipoles (unit vectors * |mu|)
        e = np.asarray(sites["dip_e"])  # [N, ND, 3]
        mu = np.asarray(sim.table.dip_abs)[np.asarray(mol.cid)]  # [N, ND]
        valid = np.asarray(mol.valid)
        M = (mu[..., None] * e)[valid].sum(axis=(0, 1))
        self._m.append(M)

    def finish(self, sim):
        if not self._m:
            return
        M = np.asarray(self._m)
        var = (M * M).sum(axis=1).mean() - (M.mean(axis=0) ** 2).sum()
        T = float(sim.config.temperature) or 1.0
        V = float(np.prod(sim.box))
        eps = 1.0 + 4.0 * np.pi * var / (3.0 * V * T)
        with open(f"{self.output_prefix}.permittivity", "w") as f:
            f.write("# <M^2>-<M>^2  V  T  epsilon\n")
            f.write(f"{var:.8g} {V:.8g} {T:.8g} {eps:.8g}\n")
        self.epsilon = eps


@PluginFactory.register("Dropaligner")
class Dropaligner(PluginBase):
    """Re-center a droplet's center of mass to a fixed point
    (src/plugins/NEMD/Dropaligner-class role; like COMaligner with a
    spherical selection)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.center = np.array(
            [float(p.get("xpos", 0)), float(p.get("ypos", 0)),
             float(p.get("zpos", 0))]
        )
        self.radius = float(p.get("radius", 1e30))
        self.interval = int(float(p.get("interval", 1)))

    def before_forces(self, sim, step):
        if step % self.interval:
            return
        import dataclasses

        import jax.numpy as jnp

        mol = sim.engine.mol
        r = np.array(mol.r)
        valid = np.asarray(mol.valid)
        sel = valid & (((r - self.center) ** 2).sum(1) < self.radius**2)
        if sel.sum() == 0:
            return
        shift = self.center - r[sel].mean(axis=0)
        box = np.asarray(sim.box)
        r[valid] = (r[valid] + shift) % box
        sim.engine.mol = dataclasses.replace(
            mol, r=jnp.asarray(r, mol.r.dtype)
        )


@PluginFactory.register("Dropaccelerator")
class Dropaccelerator(PluginBase):
    """Accelerate the molecules inside a sphere by a fixed velocity
    increment over a step window (src/plugins/NEMD/Dropaccelerator)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.center = np.array(
            [float(p.get("xposition", 0)), float(p.get("yposition", 0)),
             float(p.get("zposition", 0))]
        )
        self.radius = float(p.get("dropradius", 1.0))
        self.velocity = float(p.get("velocity", 0.0))  # total dv (y)
        self.start = int(float(p.get("starttime", 0)))
        self.steps = max(1, int(float(p.get("steps", 1))))

    def before_forces(self, sim, step):
        if not (self.start <= step < self.start + self.steps):
            return
        import dataclasses

        import jax.numpy as jnp

        mol = sim.engine.mol
        r = np.asarray(mol.r)
        v = np.array(mol.v)
        valid = np.asarray(mol.valid)
        sel = valid & (((r - self.center) ** 2).sum(1) < self.radius**2)
        v[sel, 1] += self.velocity / self.steps
        sim.engine.mol = dataclasses.replace(
            mol, v=jnp.asarray(v, mol.v.dtype)
        )


@PluginFactory.register("MirrorSystem")
class MirrorSystem(PluginBase):
    """One-shot system mirroring about a plane
    (src/plugins/NEMD/MirrorSystem role): reflects positions (and the
    normal velocity component) across y = yPos."""

    def __init__(self, params=None):
        super().__init__(params)
        self.ypos = float(self.params.get("yPos", 0.0))
        self.done = False

    def before_forces(self, sim, step):
        if self.done:
            return
        import dataclasses

        import jax.numpy as jnp

        mol = sim.engine.mol
        r = np.array(mol.r)
        v = np.array(mol.v)
        box = np.asarray(sim.box)
        r[:, 1] = (2.0 * self.ypos - r[:, 1]) % box[1]
        v[:, 1] = -v[:, 1]
        sim.engine.mol = dataclasses.replace(
            mol, r=jnp.asarray(r, mol.r.dtype), v=jnp.asarray(v, mol.v.dtype)
        )
        self.done = True


@PluginFactory.register("DirectedPM")
class DirectedPM(PluginBase):
    """Directed profile measurement (src/plugins/DirectedPM class role):
    per-y-bin density, directed velocity, and directed temperature
    (kinetic energy minus the bin drift)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.nbins = int(float(self.params.get("bins", 50)))
        self._acc = None
        self._samples = 0

    def after_forces(self, sim, step):
        mol = sim.engine.mol
        valid = np.asarray(mol.valid)
        y = np.asarray(mol.r)[valid, 1]
        v = np.asarray(mol.v)[valid]
        Ly = float(sim.box[1])
        b = np.clip((y / Ly * self.nbins).astype(int), 0, self.nbins - 1)
        if self._acc is None:
            self._acc = np.zeros((self.nbins, 5))
        for k in range(self.nbins):
            sel = b == k
            n = sel.sum()
            if n == 0:
                continue
            self._acc[k, 0] += n
            self._acc[k, 1:4] += v[sel].sum(axis=0)
            self._acc[k, 4] += (v[sel] ** 2).sum()
        self._samples += 1

    def finish(self, sim):
        if not self._samples:
            return
        mass = float(np.asarray(sim.pp.mass)[0])
        V_bin = float(np.prod(sim.box)) / self.nbins
        with open(f"{self.output_prefix}.directedpm", "w") as f:
            f.write("# bin rho vx vy vz T_directed\n")
            for k in range(self.nbins):
                n, sx, sy, sz, v2 = self._acc[k]
                if n == 0:
                    f.write(f"{k} 0 0 0 0 0\n")
                    continue
                vd = np.array([sx, sy, sz]) / n
                t_dir = mass * (v2 / n - (vd**2).sum()) / 3.0
                rho = n / self._samples / V_bin
                f.write(
                    f"{k} {rho:.6g} {vd[0]:.6g} {vd[1]:.6g} {vd[2]:.6g} "
                    f"{t_dir:.6g}\n"
                )


@PluginFactory.register("MettDeamonFeedrateDirector")
class MettDeamonFeedrateDirector(PluginBase):
    """Adjusts a MettDeamon's feed rate to match the measured outflow
    (src/plugins/NEMD/MettDeamonFeedrateDirector.cpp role)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.update_freq = int(float(self.params.get("updatefreq", 100)))
        self._last_deleted = 0

    def end_step(self, sim, step):
        if step % self.update_freq:
            return
        from ls1_mardyn_tpu.plugins.nemd2 import MettDeamon

        for p in sim._plugins:
            if isinstance(p, MettDeamon):
                outflow = p.deleted - self._last_deleted
                self._last_deleted = p.deleted
                per_interval = max(
                    1, int(np.ceil(outflow * p.interval / self.update_freq))
                )
                p.feed_rate = per_interval
