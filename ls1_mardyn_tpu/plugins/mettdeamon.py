"""MettDeamon: reservoir-slab particle feed (steady-state evaporation).

Reference: /root/reference/src/plugins/NEMD/MettDeamon.{h,cpp}
(1,902 LoC).  Semantics reproduced:

  - a RESERVOIR of equilibrated liquid (read from an ASCII phase-space
    file or cut from the start configuration, Reservoir::
    readParticleData) is sliced into y-bins of ``binwidth``; bin
    particle positions are normalized to the slab origin
    (MettDeamon.cpp:1495);
  - each step the feed sum advances by the actual feed rate; when it
    exceeds one bin width, the active reservoir bin is inserted at the
    feed boundary (y + feed.sum - binwidth, MettDeamon.cpp:1186), the
    bin queue advances cyclically, and inserted molecules become
    FROZEN component variants (<changes><change><from>/<to>);
  - frozen (trapped) molecules ride with the feed: every step their
    x/z/orientation reset to the stored values, y advances by the
    feed rate, velocities reset to the stored values and angular
    momentum zeroed (beforeEventNewTimestep refreshes the store,
    preForce_action applies it -- MettDeamon.cpp:447,535-559,656-697);
  - crossing the TRANSITION PLANE (2 bin widths from the feed wall,
    MettDeamon.cpp:1046-1048) releases them: component switched back
    and the release velocity applied (unchanged / fix_value /
    add_fix_value, releaseTrappedMolecule:573-631);
  - feed-rate methods: ``constant`` (4: feed = init) and
    ``deleted-molecules`` (1: feed = deleted-per-step /
    (area_xz * reservoir density), MettDeamon.cpp:1017) -- the balance
    that holds a steady evaporating film;
  - a ``manipfree`` y-window is never touched.

Config schema matches the reference XML (control/updatefreq, feed/
init|direction|method, release_velo, reservoir/file|width|binwidth|
ins_percent, changes list).
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _get(d, path, default=None):
    cur = d
    for k in path.split("/"):
        if not isinstance(cur, dict) or k not in cur:
            return default
        cur = cur[k]
    return cur


@PluginFactory.register("MettDeamon")
class MettDeamon(PluginBase):
    """Reservoir-slab feeder (reference semantics)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.update_freq = int(float(_get(p, "control/updatefreq", 100)))
        self.numvals = int(float(_get(p, "control/numvals", 100)))
        self.feed_init = float(_get(p, "control/feed/init", 0.0))
        self.direction = int(float(_get(p, "control/feed/direction", 1)))
        method = int(float(_get(p, "control/feed/method", 4)))
        self.feed_method = {1: "deleted", 3: "density", 4: "constant",
                            5: "directed"}.get(method, "constant")
        if self.feed_method in ("density", "directed"):
            # density/directed control reduce to the deleted-molecules
            # balance under our dense bookkeeping
            self.feed_method = "deleted"
        self.rv_method = int(float(
            _get(p, "control/feed/release_velo/method", 1)))
        self.rv_fix = float(_get(
            p, "control/feed/release_velo/fix_value", 0.0))
        self.manip_ymin = float(_get(p, "control/manipfree/ymin", -1e30))
        self.manip_ymax = float(_get(p, "control/manipfree/ymax", -1e30))
        res = p.get("reservoir", {}) if isinstance(
            p.get("reservoir"), dict) else {}
        self.res_file = _get(res, "file/data") or (
            res.get("file") if isinstance(res.get("file"), str) else None)
        self.res_width = float(res.get("width", 0.0) or 0.0)
        self.bin_width = float(res.get("binwidth", 0.0) or 0.0)
        self.ins_percent = float(res.get("ins_percent", 1.0) or 1.0)
        # component freeze/unfreeze maps (1-based ids in the XML)
        self.changes = []
        ch = p.get("changes", {}) or {}
        for ce in (ch.get("change") if isinstance(
                ch.get("change"), list) else [ch.get("change")]):
            if isinstance(ce, dict):
                self.changes.append((int(float(ce.get("from", 1))) - 1,
                                     int(float(ce.get("to", 1))) - 1))
        self.inserted = 0
        self.released = 0
        self.deleted_sum = 0
        self._rng = np.random.default_rng(
            int(float(p.get("seed", 17))))

    # -- lifecycle ----------------------------------------------------

    def init(self, sim):
        K = sim.table.K
        self.freeze = np.arange(K)
        self.unfreeze = np.arange(K)
        for a, b in self.changes:
            if 0 <= a < K and 0 <= b < K:
                self.freeze[a] = b
                self.unfreeze[b] = a
        self.trapped_cids = np.flatnonzero(
            self.unfreeze != np.arange(K))
        box = np.asarray(sim.box, float)
        self.boxy = box[1]
        self.area_xz = box[0] * box[2]
        if not self.bin_width:
            self.bin_width = max(self.res_width / 4.0, 1.0)
        if self.direction == 1:
            self.transition_y = 2 * self.bin_width
        else:
            self.transition_y = self.boxy - 2 * self.bin_width

        self._load_reservoir(sim)
        self.feed_actual = self.feed_init
        self.feed_sum = 0.0
        self._del_window = []
        self._prev_n = None
        n = sim.engine.mol.capacity
        self._stored = np.zeros((n, 10))  # r(3) v(3) q(4)
        self._has_store = np.zeros(n, bool)
        self._log = open("MettDeamon_feed.dat", "w")
        self._log.write("# step feed_actual feed_sum inserted "
                        "released deleted_window\n")

    def _load_reservoir(self, sim):
        if self.res_file:
            from ls1_mardyn_tpu.io.ascii_reader import read_inp

            data = read_inp(self.res_file)
            r, v, q = (np.asarray(data.r, float),
                       np.asarray(data.v, float),
                       np.asarray(data.q, float))
            cid = np.asarray(data.cid, np.int64)
            y0 = r[:, 1].min()
            width = r[:, 1].max() - y0 + 1e-12
        else:
            mol = sim.engine.mol
            valid = np.asarray(mol.valid).astype(bool)
            r = np.asarray(mol.r)[valid].astype(float)
            v = np.asarray(mol.v)[valid].astype(float)
            q = np.asarray(mol.q)[valid].astype(float)
            cid = np.asarray(mol.cid)[valid].astype(np.int64)
            width = self.res_width or self.bin_width * 4
            if self.direction == 1:
                sel = r[:, 1] < width
                y0 = 0.0
            else:
                sel = r[:, 1] > self.boxy - width
                y0 = self.boxy - width
            r, v, q, cid = r[sel], v[sel], q[sel], cid[sel]
        if len(r) == 0:
            raise ValueError("MettDeamon: empty reservoir")
        self.res_density = len(r) / (self.area_xz * width)
        nbins = max(1, int(round(width / self.bin_width)))
        yrel = r[:, 1] - y0
        bidx = np.minimum((yrel / self.bin_width).astype(int), nbins - 1)
        self.bins = []
        for b in range(nbins):
            m = bidx == b
            rb = r[m].copy()
            # positions normalized to the slab origin
            # (MettDeamon.cpp:1495)
            rb[:, 1] = yrel[m] - b * self.bin_width
            self.bins.append(dict(r=rb, v=v[m].copy(), q=q[m].copy(),
                                  cid=cid[m].copy()))
        self.active_bin = 0

    # -- helpers ------------------------------------------------------

    def _trapped_mask(self, cid, valid):
        t = np.zeros_like(valid)
        for c in self.trapped_cids:
            t |= cid == c
        return t & valid

    def _manip_ok(self, y):
        """True where the molecule may be manipulated."""
        return ~((y > self.manip_ymin) & (y < self.manip_ymax))

    # -- hooks --------------------------------------------------------

    def before_event_new_timestep(self, sim, step):
        mol = sim.engine.mol
        valid = np.asarray(mol.valid).astype(bool)
        cid = np.asarray(mol.cid)
        n_now = int(valid.sum())
        if self._prev_n is not None and n_now < self._prev_n:
            self._del_window.append(self._prev_n - n_now)
            self.deleted_sum += self._prev_n - n_now
            self._del_window = self._del_window[-self.numvals:]
        self._prev_n = n_now
        # refresh the trap store (beforeEventNewTimestep:447)
        t = self._trapped_mask(cid, valid)
        if t.any():
            r = np.asarray(mol.r)
            v = np.asarray(mol.v)
            q = np.asarray(mol.q)
            self._stored[t, 0:3] = r[t]
            self._stored[t, 3:6] = v[t]
            self._stored[t, 6:10] = q[t]
            self._has_store |= t
        self._has_store &= valid

    def before_forces(self, sim, step):
        import jax.numpy as jnp

        mol = sim.engine.mol
        dtype = mol.r.dtype
        valid = np.asarray(mol.valid).astype(bool)
        r = np.array(mol.r, float)
        v = np.array(mol.v, float)
        q = np.array(mol.q, float)
        L = np.array(mol.L, float)
        cid = np.array(mol.cid)
        mid = np.array(mol.mid)
        changed = False

        t = self._trapped_mask(cid, valid) & self._has_store \
            & self._manip_ok(r[:, 1])
        if t.any():
            y = r[:, 1]
            if self.direction == 1:
                behind = y > self.transition_y
            else:
                behind = y < self.transition_y
            rel = t & behind
            stay = t & ~behind
            if rel.any():
                cid[rel] = self.unfreeze[cid[rel]]
                v[rel] = self._stored[rel, 3:6]
                if self.rv_method == 2:
                    v[rel, 1] = self.rv_fix
                elif self.rv_method == 3:
                    v[rel, 1] += self.rv_fix
                self._has_store[rel] = False
                self.released += int(rel.sum())
                changed = True
            if stay.any():
                # ride with the feed; lateral pinning + stored
                # orientation/velocity (preForce_action:729-739)
                r[stay, 0] = self._stored[stay, 0]
                r[stay, 2] = self._stored[stay, 2]
                dy = self.feed_actual if self.direction == 1 \
                    else -self.feed_actual
                r[stay, 1] = self._stored[stay, 1] + dy
                q[stay] = self._stored[stay, 6:10]
                v[stay] = self._stored[stay, 3:6]
                L[stay] = 0.0
                changed = True

        self.feed_sum += self.feed_actual
        if self.bins and self.feed_sum >= self.bin_width:
            b = self.bins[self.active_bin]
            nb = len(b["r"])
            keep = self._rng.random(nb) < self.ins_percent
            free = np.flatnonzero(~valid)
            n_ins = int(keep.sum())
            if n_ins > len(free):
                from ls1_mardyn_tpu.utils.logger import global_log

                global_log.warning(
                    "MettDeamon: %d free slots for %d reservoir "
                    "molecules; inserting what fits (raise the "
                    "capacity reserve)", len(free), n_ins)
                ki = np.flatnonzero(keep)[: len(free)]
                keep = np.zeros(nb, bool)
                keep[ki] = True
                n_ins = len(free)
            slots = free[:n_ins]
            rb = b["r"][keep].copy()
            if self.direction == 1:
                rb[:, 1] = rb[:, 1] + self.feed_sum - self.bin_width
            else:
                rb[:, 1] = self.boxy - self.bin_width + rb[:, 1] \
                    - (self.feed_sum - self.bin_width)
            r[slots] = rb
            v[slots] = b["v"][keep]
            q[slots] = b["q"][keep]
            L[slots] = 0.0
            cid[slots] = self.freeze[b["cid"][keep]]
            mx = int(mid[valid].max()) if valid.any() else 0
            mid[slots] = mx + 1 + np.arange(n_ins)
            valid[slots] = True
            self._stored[slots, 0:3] = rb
            self._stored[slots, 3:6] = b["v"][keep]
            self._stored[slots, 6:10] = b["q"][keep]
            self._has_store[slots] = True
            self.inserted += n_ins
            self.feed_sum -= self.bin_width
            self.active_bin = (self.active_bin + 1) % len(self.bins)
            changed = True

        if changed:
            import dataclasses as dc

            sim.engine.mol = dc.replace(
                mol,
                r=jnp.asarray(r, dtype),
                v=jnp.asarray(v, dtype),
                q=jnp.asarray(q, dtype),
                L=jnp.asarray(L, dtype),
                cid=jnp.asarray(cid, mol.cid.dtype),
                mid=jnp.asarray(mid, mol.mid.dtype),
                valid=jnp.asarray(valid),
            )
            sim.engine.forces = None

    def after_forces(self, sim, step):
        # feed-rate update (postForce_action:796-849 +
        # calcDeltaY:1017): deleted molecules per step / (rho * A)
        if self.feed_method == "deleted" and step and \
                step % self.update_freq == 0:
            if self._del_window:
                per_step = sum(self._del_window) / max(
                    len(self._del_window), 1)
                self.feed_actual = per_step / (
                    self.res_density * self.area_xz)
        if step % max(self.write_frequency, 1) == 0 and \
                hasattr(self, "_log"):
            self._log.write("%d %.8g %.8g %d %d %d\n" % (
                step, self.feed_actual, self.feed_sum, self.inserted,
                self.released, sum(self._del_window)))
            self._log.flush()

    def finish(self, sim):
        if hasattr(self, "_log"):
            self._log.close()
