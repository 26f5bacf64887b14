"""Cavity sampling ensemble.

The role of /root/reference/src/ensemble/CavityEnsemble.{h,cpp} + the
CavityWriter plugin (src/io/CavityWriter.h): a static Nx x Ny x Nz grid
of pseudo-molecule probe positions; a probe is an *active cavity* when
at most `max_neighbours` real molecules sit within radius r
(countNeighbours + decideActivity(neigh, id),
CavityEnsemble.cpp:313-330).  Cavity statistics characterize nucleation
in metastable vapors.

TPU-native: the probe grid is a fixed array; neighbor counting is one
jitted min-image distance matrix [n_probe, N] + row-sum -- a sampling
pass, run only at the writer's frequency.
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _count_neighbours(probe_r, mol, box, r2):
    import jax.numpy as jnp

    box = jnp.asarray(box, mol.r.dtype)
    dr = probe_r[:, None, :] - mol.r[None, :, :]
    dr = dr - jnp.round(dr / box) * box
    d2 = jnp.sum(dr * dr, axis=-1)
    ok = mol.valid[None, :] & (d2 < r2)
    return jnp.sum(ok, axis=1)


class CavityEnsemble:
    """Probe grid + activity decision (CavityEnsemble.cpp)."""

    def __init__(self, box, grid=(10, 10, 10), radius=1.0, max_neighbours=0):
        self.box = np.asarray(box, float)
        self.grid = tuple(int(g) for g in grid)
        self.radius = float(radius)
        self.max_neighbours = int(max_neighbours)
        nx, ny, nz = self.grid
        ix, iy, iz = np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        )
        frac = np.stack([ix.ravel(), iy.ravel(), iz.ravel()], -1) + 0.5
        self.probe_r = frac / np.array(self.grid) * self.box
        self._jit = None

    def cavity_step(self, mol):
        """Returns (active_mask [n_probe] bool, neighbour counts)."""
        import jax
        import jax.numpy as jnp

        if self._jit is None:
            self._jit = jax.jit(_count_neighbours)
        counts = np.asarray(
            self._jit(
                jnp.asarray(self.probe_r, mol.r.dtype),
                mol,
                self.box,
                self.radius**2,
            )
        )
        return counts <= self.max_neighbours, counts

    def num_cavities(self, mol) -> int:
        active, _ = self.cavity_step(mol)
        return int(active.sum())


@PluginFactory.register("CavityWriter")
class CavityWriter(PluginBase):
    """Writes active cavity positions per frame (CavityWriter.h:13-40):
    xyz-like output of probe points classified as cavities."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.grid = (
            int(float(p.get("Nx", 10))),
            int(float(p.get("Ny", 10))),
            int(float(p.get("Nz", 10))),
        )
        self.radius = float(p.get("radius", 1.0))
        self.max_neighbours = int(float(p.get("maxNeighbours", 0)))

    def init(self, sim):
        self.ensemble = CavityEnsemble(
            sim.box,
            grid=self.grid,
            radius=self.radius,
            max_neighbours=self.max_neighbours,
        )

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        active, counts = self.ensemble.cavity_step(sim.molecules())
        pos = self.ensemble.probe_r[active]
        with open(f"{self.output_prefix}-{step}.cav.xyz", "w") as f:
            f.write(f"{len(pos)}\n")
            f.write(
                f"cavities step {step} (radius {self.radius}, "
                f"maxNeighbours {self.max_neighbours})\n"
            )
            for p_ in pos:
                f.write(f"C {p_[0]:.6g} {p_[1]:.6g} {p_[2]:.6g}\n")
