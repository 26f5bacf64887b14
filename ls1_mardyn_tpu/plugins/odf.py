"""Orientation distribution function (ODF) plugin.

The role of /root/reference/src/io/ODF.{h,cpp} (+ ODFCellProcessor):
for dipolar fluids (one dipole per molecule, body-frame direction
[0,0,1]), histogram the mutual orientation of every molecule pair
within a shell cutoff over three angles (ODF.cpp:123-260):

  cosPhi1   =  r_hat_12 . e1          (e = world dipole axis)
  cosPhi2   = -r_hat_12 . e2
  gamma12   = angle between the projections of e1 and e2 onto the
              plane perpendicular to r_12 (torsion angle)

binned on a (phi1, phi2, gamma) grid; phi bins are uniform in cos,
gamma bins uniform in the angle.  The whole pair sweep is one jitted
min-image N^2 pass + jnp.histogramdd (TPU-friendly; no cell
traversal needed at sampling frequencies).
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _dipole_axis(q):
    """World dipole direction for body axis [0,0,1] (the quaternion
    rotation's third column; ODF.cpp:190-192)."""
    import jax.numpy as jnp

    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
        axis=-1,
    )


def odf_histogram(mol, box, shell_rc, bins):
    """[phi1, phi2, gamma] weighted pair histogram (both pair orders,
    like the reference's double-counted cell sweep)."""
    import jax.numpy as jnp

    b1, b2, b3 = bins
    box = jnp.asarray(box, mol.r.dtype)
    e = _dipole_axis(mol.q)
    dr = mol.r[None, :, :] - mol.r[:, None, :]  # r2 - r1
    dr = dr - jnp.round(dr / box) * box
    d2 = jnp.sum(dr * dr, axis=-1)
    n = mol.r.shape[0]
    pair_ok = (
        mol.valid[:, None]
        & mol.valid[None, :]
        & ~jnp.eye(n, dtype=bool)
        & (d2 < shell_rc * shell_rc)
    )
    d = jnp.sqrt(jnp.where(pair_ok, d2, 1.0))
    rhat = dr / d[..., None]
    e1 = e[:, None, :]
    e2 = e[None, :, :]
    cos1 = jnp.sum(rhat * e1, axis=-1)
    cos2 = -jnp.sum(rhat * e2, axis=-1)
    # projections onto the plane perpendicular to rhat
    p1 = e1 - cos1[..., None] * rhat
    p2 = e2 + cos2[..., None] * rhat
    n1 = jnp.linalg.norm(p1, axis=-1)
    n2 = jnp.linalg.norm(p2, axis=-1)
    safe = (n1 > 1e-12) & (n2 > 1e-12)
    cosg = jnp.sum(p1 * p2, axis=-1) / jnp.where(safe, n1 * n2, 1.0)
    cosg = jnp.clip(cosg, -1.0, 1.0)
    gamma = jnp.arccos(jnp.where(safe, cosg, 1.0))
    w = (pair_ok & safe).astype(mol.r.dtype)
    sample = jnp.stack(
        [cos1.reshape(-1), cos2.reshape(-1), gamma.reshape(-1)], axis=1
    )
    hist, _ = jnp.histogramdd(
        sample,
        bins=(b1, b2, b3),
        range=((-1.0, 1.0), (-1.0, 1.0), (0.0, float(np.pi))),
        weights=w.reshape(-1),
    )
    return hist


@PluginFactory.register("ODF")
class ODF(PluginBase):
    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.phi1_increments = int(float(p.get("phi1increments", 10)))
        self.phi2_increments = int(float(p.get("phi2increments", 10)))
        self.gamma_increments = int(float(p.get("gammaincrements", 10)))
        self.shell_cutoff = float(p.get("shellcutoff", 0.0))
        self.sampling_frequency = int(float(p.get("recordingtimesteps", 1)))
        self.init_statistics = int(float(p.get("initstatistics", 0)))

    def init(self, sim):
        import jax

        if not self.shell_cutoff:
            self.shell_cutoff = sim.lj_cutoff
        self._hist = np.zeros(
            (self.phi1_increments, self.phi2_increments, self.gamma_increments)
        )
        self._samples = 0
        self._written = 0
        self._jit = jax.jit(odf_histogram, static_argnums=(2, 3))

    def after_forces(self, sim, step):
        if step < self.init_statistics or step % self.sampling_frequency:
            return
        bins = (
            self.phi1_increments,
            self.phi2_increments,
            self.gamma_increments,
        )
        self._hist += np.asarray(
            self._jit(sim.molecules(), sim.box, float(self.shell_cutoff), bins)
        )
        self._samples += 1

    def end_step(self, sim, step):
        if step == 0 or step % self.write_frequency or not self._samples:
            return
        self._written += 1
        self._write(f"{self.output_prefix}_{self._written:03d}.ODF")

    def finish(self, sim):
        if self._samples:
            self._write(f"{self.output_prefix}_final.ODF")

    def _write(self, fname):
        total = self._hist.sum()
        norm = self._hist / total if total else self._hist
        with open(fname, "w") as f:
            f.write(
                "# cosPhi1_bin cosPhi2_bin gamma_bin count fraction\n"
            )
            for i in range(self.phi1_increments):
                for j in range(self.phi2_increments):
                    for k in range(self.gamma_increments):
                        f.write(
                            f"{i} {j} {k} {self._hist[i, j, k]:.6g} "
                            f"{norm[i, j, k]:.6g}\n"
                        )
