"""NEMD / boundary-condition plugins.

Re-creations of the reference's physics plugin set
(/root/reference/src/plugins/: Mirror.cpp, WallPotential.cpp,
FixRegion.cpp, COMaligner.cpp, SpatialProfile + profiles/,
InMemoryCheckpointing.h).  Each mutates or observes device state from
the host loop; the heavy lifting stays jitted.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _replace_mol(sim, **kw):
    import dataclasses as dc

    sim.engine.mol = dc.replace(sim.engine.mol, **kw)


@PluginFactory.register("Mirror")
class Mirror(PluginBase):
    """Reflective boundary at a plane (src/plugins/Mirror.cpp,
    REFLECT type): molecules crossing the mirror get their normal
    velocity flipped and position reflected."""

    def __init__(self, params=None):
        super().__init__(params)
        self.position = float(self.params.get("position", 0.0))
        self.axis = int(float(self.params.get("axis", 1)))
        # +1: mirror repels from above (keep y < pos); -1: keep y > pos
        self.direction = int(float(self.params.get("direction", 1)))

    def end_step(self, sim, step):
        import jax.numpy as jnp

        mol = sim.engine.mol
        y = mol.r[:, self.axis]
        v = mol.v[:, self.axis]
        if self.direction > 0:
            crossed = (y > self.position) & mol.valid
        else:
            crossed = (y < self.position) & mol.valid
        y_new = jnp.where(crossed, 2 * self.position - y, y)
        v_new = jnp.where(crossed, -v, v)
        _replace_mol(
            sim,
            r=mol.r.at[:, self.axis].set(y_new),
            v=mol.v.at[:, self.axis].set(v_new),
        )


@PluginFactory.register("WallPotential")
class WallPotential(PluginBase):
    """LJ-9-3 / LJ-10-4 wall (src/plugins/WallPotential.cpp): adds a
    one-body force from a structureless wall at yc along an axis."""

    def __init__(self, params=None):
        super().__init__(params)
        self.potential = int(float(self.params.get("potential", 93)))
        self.yc = float(self.params.get("yc", 0.0))
        self.axis = int(float(self.params.get("axis", 1)))
        self.eps = float(self.params.get("epsilon", 1.0))
        self.sig = float(self.params.get("sigma", 1.0))
        self.delta = float(self.params.get("delta", 0.0))

    def wall_force(self, y):
        """u(93) = eps*((sig/y)^9 - (sig/y)^3); returns (u, f_y)."""
        import jax.numpy as jnp

        d = jnp.maximum(jnp.abs(y - self.yc) + self.delta, 1e-6)
        s3 = (self.sig / d) ** 3
        if self.potential == 93:
            u = self.eps * (s3 ** 3 - s3)
            f = self.eps * (9 * s3 ** 3 - 3 * s3) / d
        else:  # 104
            s4 = (self.sig / d) ** 4
            u = self.eps * (s4 ** 2 * (self.sig / d) ** 2 - s4)
            f = self.eps * (10 * s4 ** 2 * (self.sig / d) ** 2 - 4 * s4) / d
        return u, f * jnp.sign(y - self.yc)

    def end_step(self, sim, step):
        """One-body wall kick (applied as an impulse dt*f; the reference
        adds it in siteWiseForces before integration)."""
        import jax.numpy as jnp

        mol = sim.engine.mol
        y = mol.r[:, self.axis]
        _, f = self.wall_force(y)
        dt = sim.config.timestep
        mass = np.asarray(sim.pp.mass)[np.asarray(mol.cid)]
        dv = dt * f / jnp.asarray(mass, mol.r.dtype)
        dv = jnp.where(mol.valid, dv, 0.0)
        _replace_mol(sim, v=mol.v.at[:, self.axis].add(dv))


@PluginFactory.register("FixRegion")
class FixRegion(PluginBase):
    """Freeze molecules inside a box region (src/plugins/FixRegion.cpp):
    zero their velocities every step."""

    def __init__(self, params=None):
        super().__init__(params)
        g = lambda k, d: float(self.params.get(k, d))
        self.lo = np.array([g("xmin", 0), g("ymin", 0), g("zmin", 0)])
        self.hi = np.array(
            [g("xmax", 1e30), g("ymax", 1e30), g("zmax", 1e30)]
        )

    def end_step(self, sim, step):
        import jax.numpy as jnp

        mol = sim.engine.mol
        lo = jnp.asarray(self.lo, mol.r.dtype)
        hi = jnp.asarray(self.hi, mol.r.dtype)
        inside = jnp.all((mol.r >= lo) & (mol.r < hi), axis=-1)
        v = jnp.where(inside[:, None], 0.0, mol.v)
        L = jnp.where(inside[:, None], 0.0, mol.L)
        _replace_mol(sim, v=v, L=L)


@PluginFactory.register("COMaligner")
class COMaligner(PluginBase):
    """Re-center the center of mass (src/plugins/COMaligner.cpp):
    every interval, shift all molecules so the COM returns to the box
    center (fraction `correctionFactor`)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.interval = int(float(self.params.get("interval", 25)))
        self.factor = float(self.params.get("alignmentCorrection", 1.0))

    def end_step(self, sim, step):
        if step % self.interval:
            return
        import jax.numpy as jnp

        mol = sim.engine.mol
        mass = jnp.asarray(np.asarray(sim.pp.mass), mol.r.dtype)[mol.cid]
        w = mass * mol.valid.astype(mol.r.dtype)
        com = jnp.sum(mol.r * w[:, None], axis=0) / jnp.sum(w)
        target = jnp.asarray(sim.box / 2.0, mol.r.dtype)
        shift = (target - com) * self.factor
        from ls1_mardyn_tpu.ops.cells import wrap_positions

        r = wrap_positions(mol.r + shift[None, :], tuple(sim.box))
        _replace_mol(sim, r=r)


@PluginFactory.register("SpatialProfile")
class SpatialProfile(PluginBase):
    """1-D spatial profiles (src/plugins/SpatialProfile.cpp +
    plugins/profiles/): density / temperature / velocity per slab
    along an axis, written periodically."""

    def __init__(self, params=None):
        super().__init__(params)
        self.axis = {"x": 0, "y": 1, "z": 2}.get(
            str(self.params.get("axis", "y")).lower(), 1
        )
        self.nbins = int(float(self.params.get("bins", 100)))
        self.sampling_frequency = int(float(self.params.get("samplefrequency", 10)))

    def init(self, sim):
        self._rho = np.zeros(self.nbins)
        self._t = np.zeros(self.nbins)
        self._vy = np.zeros((self.nbins, 3))
        self._samples = 0
        self._written = 0

    def end_step(self, sim, step):
        if step % self.sampling_frequency == 0:
            mol = sim.engine.mol
            valid = np.asarray(mol.valid)
            y = np.asarray(mol.r)[valid, self.axis]
            v = np.asarray(mol.v)[valid]
            mass = np.asarray(sim.pp.mass)[np.asarray(mol.cid)[valid]]
            L = sim.box[self.axis]
            b = np.clip((y / (L / self.nbins)).astype(int), 0, self.nbins - 1)
            cnt = np.bincount(b, minlength=self.nbins)
            self._rho += cnt
            mv2 = mass * (v ** 2).sum(1)
            with np.errstate(invalid="ignore", divide="ignore"):
                self._t += np.where(
                    cnt > 0,
                    np.bincount(b, weights=mv2, minlength=self.nbins)
                    / np.maximum(3 * cnt, 1),
                    0.0,
                )
            for d in range(3):
                self._vy[:, d] += np.where(
                    cnt > 0,
                    np.bincount(b, weights=v[:, d], minlength=self.nbins)
                    / np.maximum(cnt, 1),
                    0.0,
                )
            self._samples += 1
        if step % self.write_frequency == 0 and self._samples:
            self._write(sim, step)

    def _write(self, sim, step):
        L = sim.box[self.axis]
        dz = L / self.nbins
        vol = sim.volume / self.nbins
        with open(f"{self.output_prefix}_{self._written:04d}.profile", "w") as f:
            f.write(f"# spatial profile, step {step}, samples {self._samples}\n")
            f.write("# y\trho\tT\tvx\tvy\tvz\n")
            for i in range(self.nbins):
                f.write(
                    f"{(i + 0.5) * dz:.6f}\t"
                    f"{self._rho[i] / self._samples / vol:.8f}\t"
                    f"{self._t[i] / self._samples:.8f}\t"
                    + "\t".join(
                        f"{self._vy[i, d] / self._samples:.8f}" for d in range(3)
                    )
                    + "\n"
                )
        self._written += 1

    def finish(self, sim):
        if self._samples:
            self._write(sim, sim.step)


@PluginFactory.register("InMemoryCheckpointing")
class InMemoryCheckpointing(PluginBase):
    """In-RAM snapshot/restore (src/plugins/InMemoryCheckpointing.h:18-70
    + parallel/ResilienceComm: redundancy-based resilience): keeps the
    last `writefrequency`-aligned snapshot of the full molecule state
    and restores it on demand (restartAtIteration)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.restart_at = int(float(self.params.get("restartAtIteration", -1)))
        self._snapshot = None
        self._snapshot_step = -1

    def end_step(self, sim, step):
        import jax

        if step % self.write_frequency == 0:
            self._snapshot = jax.tree.map(
                lambda a: np.array(a), sim.engine.mol
            )
            self._snapshot_step = step
            self._snapshot_time = sim.time

    def before_event_new_timestep(self, sim, step):
        if step == self.restart_at and self._snapshot is not None:
            sim.engine.mol = self._to_state(self._snapshot)
            sim.engine.forces = None
            sim.engine.prepare_start()
            sim.time = self._snapshot_time
            self.restart_at = -1  # restore once

    @staticmethod
    def _to_state(snap):
        import jax.numpy as jnp

        from ls1_mardyn_tpu.state import MoleculeState

        return MoleculeState(
            r=jnp.asarray(snap.r),
            v=jnp.asarray(snap.v),
            q=jnp.asarray(snap.q),
            L=jnp.asarray(snap.L),
            cid=jnp.asarray(snap.cid),
            mid=jnp.asarray(snap.mid),
            valid=jnp.asarray(snap.valid),
        )
