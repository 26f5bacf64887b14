"""RDF output plugin.

The reference's RDF plugin (/root/reference/src/io/RDF.{h:37,cpp}):
samples pair-distance histograms every `samplingfrequency` steps and
writes normalized g(r) every `writefrequency` steps to
<outputprefix>_<n>.rdf.
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.ops.cells import CellGridSpec, neighbor_table
from ls1_mardyn_tpu.ops.rdf import normalize_rdf, pair_distance_histogram
from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


@PluginFactory.register("RDF")
class RDF(PluginBase):
    def __init__(self, params=None):
        super().__init__(params)
        self.nbins = int(float(self.params.get("bins", 100)))
        self.sampling_frequency = int(
            float(self.params.get("samplingfrequency", 10))
        )
        self.rmax = float(self.params.get("intervallength", 0.0)) * self.nbins

    def init(self, sim):
        import jax.numpy as jnp

        if not self.rmax:
            self.rmax = sim.lj_cutoff
        cap = sim.engine.spec.cap
        self._spec = sim.engine.spec
        nbr_ids, nbr_shift = neighbor_table(self._spec)
        self._nbr_ids = jnp.asarray(nbr_ids)
        self._nbr_shift = jnp.asarray(nbr_shift)
        self._hist = np.zeros(self.nbins)
        self._samples = 0
        self._written = 0

    def end_step(self, sim, step):
        if step % self.sampling_frequency == 0:
            h = pair_distance_histogram(
                sim.molecules(),
                self._spec,
                self._nbr_ids,
                self._nbr_shift.astype(sim.molecules().r.dtype),
                rmax=float(self.rmax),
                nbins=self.nbins,
            )
            self._hist += np.asarray(h, dtype=np.float64)
            self._samples += 1
        if step % self.write_frequency == 0 and self._samples:
            self._write(sim, step)

    def _write(self, sim, step):
        gv = sim.last_globals
        n = int(float(gv.n)) if gv is not None else int(
            sim.molecules().num_valid()
        )
        r, g = normalize_rdf(
            self._hist, n, sim.volume, float(self.rmax), self._samples
        )
        fname = f"{self.output_prefix}_{self._written:04d}.rdf"
        with open(fname, "w") as f:
            f.write(f"# RDF at step {step}; samples={self._samples}\n")
            f.write("# r\tg(r)\n")
            for i in range(self.nbins):
                f.write(f"{r[i]:.8f}\t{g[i]:.8f}\n")
        self._written += 1

    def finish(self, sim):
        if self._samples:
            self._write(sim, sim.step)
