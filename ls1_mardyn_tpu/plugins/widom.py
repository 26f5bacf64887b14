"""Widom test-particle insertion: excess chemical potential sampling.

The reference supports Widom sampling through ChemicalPotential's
_widom mode (/root/reference/src/ensemble/ChemicalPotential.cpp:281,
329: test insertions that are never accepted).  Here it is a plugin:
every `samplefrequency` steps, insert `insertions` virtual test
particles at uniform random positions/orientations, average
exp(-dU/T), and report  mu_ex = -T ln <exp(-dU/T)>.
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
        self.sampling_frequency = int(float(self.params.get("samplefrequency", 10)))
        self.temperature = float(self.params.get("temperature", 0.0))

    def init(self, sim):
        import jax

        self._key = jax.random.PRNGKey(
            int(float(self.params.get("seed", 4711)))
        )
        self._acc = 0.0
        self._n = 0
        self._f = open(f"{self.output_prefix}.widom", "w")
        self._f.write("#step\tsamples\tmu_excess\n")

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
        box = jnp.asarray(sim.box, mol.r.dtype)
        for _ in range(self.insertions):
            self._key, k1, k2 = jax.random.split(self._key, 3)
            r = jax.random.uniform(k1, (3,), dtype=mol.r.dtype) * box
            qv = jax.random.normal(k2, (4,), dtype=mol.r.dtype)
            q = qv / jnp.linalg.norm(qv)
            du = float(
                single_molecule_energy(
                    mol, sim.pp, box, r, q,
                    jnp.asarray(self.component, jnp.int32),
                    jnp.asarray(-1, jnp.int32),
                )
            )
            self._acc += np.exp(-du / T)
            self._n += 1
        if step % self.write_frequency == 0 and self._n:
            mu_ex = -T * np.log(max(self._acc / self._n, 1e-300))
            self._f.write(f"{step}\t{self._n}\t{mu_ex:.10e}\n")
            self._f.flush()

    def finish(self, sim):
        self._f.close()

    @property
    def mu_excess(self):
        T = self.temperature
        if not self._n:
            return float("nan")
        return -T * np.log(max(self._acc / self._n, 1e-300))
