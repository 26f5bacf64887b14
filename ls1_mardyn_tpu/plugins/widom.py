"""Widom test-particle insertion: excess chemical potential sampling.

The reference supports Widom sampling through ChemicalPotential's
_widom mode (/root/reference/src/ensemble/ChemicalPotential.cpp:281,
329: trial insertions through the GCMC machinery that are never
accepted), with per-bin accumulators Sum exp(-dU/T) and instance
counts (Domain.cpp:820-827).  Here it is a plugin with the same
statistics:

- every `samplefrequency` steps, `insertions` virtual test particles
  at uniform random positions/orientations inside an optional
  restricted control volume (`cv` params mirror ChemicalPotential's
  restricted CV) -- all probes of one sample run as ONE jitted vmap;
- accumulators: n (instances), Sum exp(-dU/T), and per-write-BLOCK
  partial sums, from which the output reports the block mu, the
  running mu, and the standard error of mu across completed blocks
  (the block-averaging practice the reference's profile bins enable);
- mu_ex = -T ln <exp(-dU/T)>  (Widom 1963).
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


@PluginFactory.register("WidomInsertion")
class WidomInsertion(PluginBase):
    def __init__(self, params=None):
        super().__init__(params)
        self.component = int(float(self.params.get("cid", 1))) - 1
        self.insertions = int(float(self.params.get("insertions", 16)))
        self.sampling_frequency = int(
            float(self.params.get("samplefrequency", 10))
        )
        self.temperature = float(self.params.get("temperature", 0.0))
        # restricted control volume (ChemicalPotential setControlVolume)
        cv = self.params.get("cv", {})
        self._cv = None
        if isinstance(cv, dict) and cv:
            self._cv = tuple(
                float(cv.get(k, d))
                for k, d in (("x0", 0.0), ("y0", 0.0), ("z0", 0.0),
                             ("x1", -1.0), ("y1", -1.0), ("z1", -1.0))
            )

    def init(self, sim):
        import jax

        self._key = jax.random.PRNGKey(
            int(float(self.params.get("seed", 4711)))
        )
        # global accumulators + per-block partials
        self._acc = 0.0
        self._n = 0
        self._blk_acc = 0.0
        self._blk_n = 0
        self._block_means = []  # <exp(-dU/T)> of each completed block
        self._probe = None
        self._f = open(f"{self.output_prefix}.widom", "w")
        self._f.write(
            "#step\tsamples\tmu_block\tmu_running\tstderr_mu\n"
        )

    def _bounds(self, sim):
        box = np.asarray(sim.box, np.float64)
        if self._cv is None:
            return np.zeros(3), box
        x0, y0, z0, x1, y1, z1 = self._cv
        lo = np.array([x0, y0, z0])
        hi = np.array([
            x1 if x1 > 0 else box[0],
            y1 if y1 > 0 else box[1],
            z1 if z1 > 0 else box[2],
        ])
        return lo, hi

    def end_step(self, sim, step):
        if step % self.sampling_frequency:
            return
        import jax
        import jax.numpy as jnp

        from ls1_mardyn_tpu.ensemble.grand_canonical import (
            single_molecule_energy,
        )

        mol = sim.engine.mol
        T = self.temperature or sim.config.temperature
        dt = mol.r.dtype
        box = jnp.asarray(np.asarray(sim.box), dt)
        if self._probe is None:
            self._probe = jax.jit(
                jax.vmap(
                    single_molecule_energy,
                    in_axes=(None, None, None, 0, 0, None, None),
                )
            )
        self._key, k1, k2 = jax.random.split(self._key, 3)
        lo, hi = self._bounds(sim)
        r = jnp.asarray(lo, dt) + jax.random.uniform(
            k1, (self.insertions, 3), dtype=dt
        ) * jnp.asarray(hi - lo, dt)
        qv = jax.random.normal(k2, (self.insertions, 4), dtype=dt)
        q = qv / jnp.linalg.norm(qv, axis=1, keepdims=True)
        du = np.asarray(
            self._probe(
                mol, sim.pp, box, r, q,
                jnp.asarray(self.component, jnp.int32),
                jnp.asarray(-1, jnp.int32),
            ),
            np.float64,
        )
        w = np.exp(-du / T)
        self._acc += float(np.sum(w))
        self._n += len(w)
        self._blk_acc += float(np.sum(w))
        self._blk_n += len(w)
        if step % self.write_frequency == 0 and self._n:
            blk_mean = (
                self._blk_acc / self._blk_n if self._blk_n else np.nan
            )
            if self._blk_n:
                self._block_means.append(blk_mean)
            self._blk_acc, self._blk_n = 0.0, 0
            mu_blk = -T * np.log(max(blk_mean, 1e-300))
            mu_run = -T * np.log(max(self._acc / self._n, 1e-300))
            # standard error of mu across completed blocks, propagated
            # through the log: sigma_mu ~= T * sigma_<w> / <w>
            if len(self._block_means) >= 2:
                bm = np.asarray(self._block_means)
                sem_w = bm.std(ddof=1) / np.sqrt(len(bm))
                err = T * sem_w / max(bm.mean(), 1e-300)
            else:
                err = np.nan
            self._f.write(
                f"{step}\t{self._n}\t{mu_blk:.10e}\t{mu_run:.10e}\t"
                f"{err:.4e}\n"
            )
            self._f.flush()

    def finish(self, sim):
        self._f.close()

    @property
    def mu_excess(self):
        T = self.temperature
        if not self._n:
            return float("nan")
        return -T * np.log(max(self._acc / self._n, 1e-300))

    @property
    def stderr_mu(self):
        if len(self._block_means) < 2:
            return float("nan")
        bm = np.asarray(self._block_means)
        T = self.temperature
        return float(
            T * bm.std(ddof=1) / np.sqrt(len(bm))
            / max(bm.mean(), 1e-300)
        )
