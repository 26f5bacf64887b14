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

    def __init__(self, box, grid=(10, 10, 10), radius=1.0, max_neighbours=0,
                 wrap_box=None):
        """box: extent the probe grid spans (the control volume).
        wrap_box: the PERIODIC DOMAIN box for min-image neighbor
        distances — defaults to box; must be the full domain when the
        probe grid is restricted to a sub-volume."""
        self.box = np.asarray(box, float)
        self.wrap_box = (
            self.box if wrap_box is None else np.asarray(wrap_box, float)
        )
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
                self.wrap_box,
                self.radius**2,
            )
        )
        return counts <= self.max_neighbours, counts

    def num_cavities(self, mol) -> int:
        active, _ = self.cavity_step(mol)
        return int(active.sum())


# per-component element letter in the cavity .xyz output
# (CavityWriter.cpp:223-227)
_CAV_ELEMENT = {0: "C", 1: "N", 2: "O", 3: "F"}


@PluginFactory.register("CavityWriter")
class CavityWriter(PluginBase):
    """Writes active cavity positions per frame (CavityWriter.h:13-40):
    xyz-like output of probe points classified as cavities.

    Reference refinements (CavityWriter.cpp:48-130, 176-229):
    - ControlVolume restriction: the probe grid spans the configured
      sub-volume instead of the whole domain;
    - per-component ensembles (repeated <componentid> entries): one
      CavityEnsemble and one output file per tracked component,
      named  <prefix>-c<cid>-<zero-padded frame>.cav.xyz  with the
      component's element letter (C/N/O/F/Ne)."""

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
        cv = p.get("ControlVolume", {})
        self.control_volume = cv if isinstance(cv, dict) else {}
        cids = p.get("componentid", [0])
        if not isinstance(cids, list):
            cids = [cids]
        self.cids = [int(float(c)) for c in cids]

    def init(self, sim):
        import numpy as _np

        box = _np.asarray(sim.box, float)
        cv = self.control_volume
        lo = _np.array([float(cv.get(k, 0.0)) for k in ("x0", "y0", "z0")])
        hi = _np.array([
            float(cv.get(k, d))
            for k, d in (("x1", box[0]), ("y1", box[1]), ("z1", box[2]))
        ])
        if (lo > hi).any() or (lo < 0).any() or (hi > box).any():
            raise ValueError(
                f"CavityWriter: bad ControlVolume {lo} .. {hi}"
            )
        self.ensembles = {}
        for cid in self.cids:
            # probe grid spans the control volume; min-image wrapping
            # stays on the FULL domain box (a CV-sized wrap would
            # alias far molecules into the neighbor count)
            ens = CavityEnsemble(
                hi - lo,
                grid=self.grid,
                radius=self.radius,
                max_neighbours=self.max_neighbours,
                wrap_box=box,
            )
            # shift the probe grid into the control volume
            ens.probe_r = ens.probe_r + lo
            self.ensembles[cid] = ens
        self._frame = 0

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        self._frame += 1
        mol = sim.molecules()
        for cid, ens in self.ensembles.items():
            active, counts = ens.cavity_step(mol)
            pos = ens.probe_r[active]
            elem = _CAV_ELEMENT.get(cid, "Ne")
            name = (f"{self.output_prefix}-c{cid}-"
                    f"{self._frame:04d}.cav.xyz")
            with open(name, "w") as f:
                f.write(f"{len(pos)}\n")
                f.write(
                    f"cavities step {step} component {cid} (radius "
                    f"{self.radius}, maxNeighbours "
                    f"{self.max_neighbours})\n"
                )
                for p_ in pos:
                    f.write(
                        f"{elem} {p_[0]:.6g}\t{p_[1]:.6g}\t{p_[2]:.6g}\n"
                    )
