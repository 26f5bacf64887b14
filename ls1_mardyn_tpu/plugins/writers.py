"""Default output plugins (writers).

Re-creations of the reference's observable/trajectory writers
(/root/reference/src/io/): ResultWriter, EnergyLogWriter, XyzWriter,
CheckpointWriter, MaxWriter, FlopRateWriter.  Column layouts follow the
originals so downstream tooling keeps working.

Host-side readback only happens at each plugin's write frequency.
"""

from __future__ import annotations

import time as _time
from collections import deque

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


class _Accumulator:
    """Sliding-window average (src/utils/Accumulator.h analogue)."""

    def __init__(self, window: int = 1000):
        self.window = window
        self.buf = deque(maxlen=window)

    def add(self, v):
        self.buf.append(float(v))

    def average(self):
        return sum(self.buf) / len(self.buf) if self.buf else 0.0


@PluginFactory.register("ResultWriter")
class ResultWriter(PluginBase):
    """Global U/p/T/beta time series -> <prefix>.res
    (src/io/ResultWriter.cpp:32-85)."""

    def init(self, sim):
        self._u_acc = _Accumulator(1000)
        self._p_acc = _Accumulator(1000)
        self._f = open(f"{self.output_prefix}.res", "w")
        self._f.write(
            f"# ls1 MarDyn (TPU) simulation started at {_time.ctime()}\n"
        )
        self._f.write("# Averages are accumulated over 1000 time steps.\n")
        cols = ["# step", "time", "U_pot", "U_pot_avg", "p", "p_avg",
                "beta_trans", "beta_rot", "c_v", "N"]
        self._f.write(" ".join(f"{c:>16}" for c in cols) + "\n")

    def end_step(self, sim, step):
        gv = sim.last_globals
        if gv is None:
            return
        self._u_acc.add(float(gv.upot))
        self._p_acc.add(float(gv.pressure))
        if step % self.write_frequency == 0:
            cv = sim.cv() if hasattr(sim, "cv") else 0.0
            vals = [
                float(sim.time), float(gv.upot), self._u_acc.average(),
                float(gv.pressure), self._p_acc.average(),
                float(gv.beta_trans), float(gv.beta_rot), cv,
                int(float(gv.n)),
            ]
            self._f.write(
                f"{step:>10} " + " ".join(f"{v:>16.9e}" if not isinstance(v, int)
                                          else f"{v:>16}" for v in vals) + "\n"
            )
            self._f.flush()

    def finish(self, sim):
        self._f.write(f"# simulation finished at {_time.ctime()}\n")
        self._f.close()


@PluginFactory.register("EnergyLogWriter")
class EnergyLogWriter(PluginBase):
    """Global energy log -> <prefix> (src/io/EnergyLogWriter.cpp):
    N, U_pot, U_kinTrans, U_kinRot, T, p per step."""

    def init(self, sim):
        self._f = open(f"{self.output_prefix}.elog", "w")
        self._f.write("#step\tN\tU_pot\tU_kinTrans\tU_kinRot\tT\tp\n")

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        gv = sim.last_globals
        if gv is None:
            return
        self._f.write(
            f"{step}\t{int(float(gv.n))}\t{float(gv.upot):.10e}\t"
            f"{0.5 * float(gv.summv2):.10e}\t{0.5 * float(gv.sum_iw2):.10e}\t"
            f"{float(gv.temperature):.10e}\t{float(gv.pressure):.10e}\n"
        )
        self._f.flush()

    def finish(self, sim):
        self._f.close()


@PluginFactory.register("XyzWriter")
class XyzWriter(PluginBase):
    """XYZ trajectory (src/io/XyzWriter.cpp): element guessed from
    component id, positions per frame."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid]
        cid = np.asarray(mol.cid)[valid]
        fname = f"{self.output_prefix}.buildup.xyz"
        mode = "a" if getattr(self, "_started", False) else "w"
        self._started = True
        elements = ["Ar", "He", "Xe", "Kr", "Ne"]
        with open(fname, mode) as f:
            f.write(f"{len(r)}\n")
            f.write(f"comment: step {step}\n")
            for i in range(len(r)):
                el = elements[int(cid[i]) % len(elements)]
                f.write(f"{el} {r[i,0]} {r[i,1]} {r[i,2]}\n")


@PluginFactory.register("CheckpointWriter")
class CheckpointWriter(PluginBase):
    """Periodic ASCII checkpoints (src/io/CheckpointWriter.cpp);
    restart by pointing <phasespacepoint><file> at the output."""

    def end_step(self, sim, step):
        if step == 0 or step % self.write_frequency:
            return
        incremental = str(self.params.get("incremental", "true")).lower() in (
            "1", "true", "yes",
        )
        suffix = f"-{step}" if incremental else ""
        sim.write_checkpoint(f"{self.output_prefix}{suffix}.restart.dat")


@PluginFactory.register("MaxWriter")
class MaxWriter(PluginBase):
    """Max velocity/force magnitudes per output interval
    (src/io/MaxWriter.cpp)."""

    def init(self, sim):
        self._f = open(f"{self.output_prefix}.max", "w")
        self._f.write("#step\tvmax\tfmax\n")

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        v = np.asarray(mol.v)[valid]
        vmax = float(np.sqrt((v * v).sum(axis=1)).max()) if len(v) else 0.0
        fmax = 0.0
        F = sim.forces_array()
        if F is not None:
            Fv = np.asarray(F)[valid]
            fmax = float(np.sqrt((Fv * Fv).sum(axis=1)).max()) if len(Fv) else 0.0
        self._f.write(f"{step}\t{vmax:.10e}\t{fmax:.10e}\n")
        self._f.flush()

    def finish(self, sim):
        self._f.close()


@PluginFactory.register("FlopRateWriter")
class FlopRateWriter(PluginBase):
    """Measured FLOP rate (src/io/FlopRateWriter.cpp +
    adapter/FlopCounter.h:60): a jitted cell traversal counts the
    ACTUAL cutoff pairs per component pair on write steps (the
    FlopCounter role -- the reference also re-traverses the container
    to count rather than modeling from density), converts them to
    flops with FlopCounter's per-interaction costs, and divides by
    wall time.  Falls back to the mean-density pair model only if the
    counting traversal's private binning overflows."""

    # flop counts per interaction type (FlopCounter's model)
    FLOPS = {"lj": 30, "charge": 14, "dipole": 98, "quadrupole": 128}

    def init(self, sim):
        self._t0 = _time.time()
        self._f = open(f"{self.output_prefix}.floprate", "w")
        self._f.write("#step\tFLOP/step(measured)\tGFLOPS\n")
        self._spec = None
        self._cap = 0

    def _count_pairs(self, sim):
        """Exact [K,K] LJ/electrostatic pair counts via
        ops.rdf.pair_count_by_component; None on binning overflow."""
        import jax.numpy as jnp

        from ls1_mardyn_tpu.ops.cells import CellGridSpec, neighbor_table
        from ls1_mardyn_tpu.ops.rdf import pair_count_by_component

        mol = sim.molecules()
        r = np.asarray(mol.r)
        valid = np.asarray(mol.valid)
        rc = max(float(sim.config.lj_cutoff), float(sim.config.cutoff))
        box = tuple(float(b) for b in np.asarray(sim.box))
        if self._spec is None or bool(self._overflow):
            # size the cell capacity from the live occupancy (2x margin,
            # multiple of 8); only rebuilt on overflow -> rare recompiles
            dims = tuple(max(1, int(np.floor(b / rc))) for b in box)
            cl = np.asarray(box) / np.asarray(dims)
            c3 = np.clip(
                (r[valid] / cl).astype(np.int64), 0,
                np.asarray(dims) - 1,
            )
            lin = (c3[:, 0] * dims[1] + c3[:, 1]) * dims[2] + c3[:, 2]
            occ = np.bincount(lin, minlength=int(np.prod(dims))).max() if valid.any() else 1
            cap = max(8, int(-(-2 * int(occ) // 8) * 8))
            if self._spec is None or cap > self._spec.cap:
                self._spec = CellGridSpec(dims=dims, box=box, cap=cap)
                ids, shift = neighbor_table(self._spec)
                self._nbr = (jnp.asarray(ids), jnp.asarray(shift))
        lj, cc, ovf = pair_count_by_component(
            jnp.asarray(r), jnp.asarray(valid),
            jnp.asarray(np.asarray(mol.cid)),
            self._spec, self._nbr[0],
            self._nbr[1].astype(jnp.asarray(r).dtype),
            float(sim.config.lj_cutoff) ** 2, float(sim.config.cutoff) ** 2,
            sim.table.K,
        )
        self._overflow = bool(ovf)
        if self._overflow:
            return None
        return np.asarray(lj), np.asarray(cc)

    def _model_pairs(self, sim):
        """Mean-density fallback: [K,K] pair counts from composition."""
        mol = sim.molecules()
        cid = np.asarray(mol.cid)
        valid = np.asarray(mol.valid)
        K = sim.table.K
        nk = np.array([np.sum(valid & (cid == k)) for k in range(K)], float)
        n = nk.sum()
        pairs_kl = np.outer(nk, nk)
        np.fill_diagonal(pairs_kl, nk * (nk - 1))
        pairs_kl *= 0.5
        vol = sim.volume or 1.0
        frac = lambda rc: (4.0 / 3.0) * np.pi * rc ** 3 / vol
        return (pairs_kl * frac(float(sim.config.lj_cutoff)),
                pairs_kl * frac(float(sim.config.cutoff)))

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        self._overflow = getattr(self, "_overflow", False)
        counted = self._count_pairs(sim)
        if counted is None:  # overflow: retry once with the regrown cap
            counted = self._count_pairs(sim)
        lj_kl, cc_kl = counted if counted is not None else self._model_pairs(sim)
        comps = sim.table.components
        nl = np.array([len(c.ljcenters) for c in comps], float)
        nc = np.array([len(c.charges) for c in comps], float)
        nd = np.array([len(c.dipoles) for c in comps], float)
        nq = np.array([len(c.quadrupoles) for c in comps], float)
        # per-pair site-interaction flops, exact per component pair
        # (the 7 potforce.h loop bodies FlopCounter tallies)
        f_lj = np.outer(nl, nl) * self.FLOPS["lj"]
        f_cc = (
            np.outer(nc, nc) * self.FLOPS["charge"]
            + (np.outer(nc, nd) + np.outer(nd, nc) + np.outer(nd, nd))
            * self.FLOPS["dipole"]
            + (np.outer(nc, nq) + np.outer(nq, nc) + np.outer(nd, nq)
               + np.outer(nq, nd) + np.outer(nq, nq))
            * self.FLOPS["quadrupole"]
        )
        flops = float((lj_kl * f_lj).sum() + (cc_kl * f_cc).sum())
        dt = max(_time.time() - self._t0, 1e-9)
        self._f.write(f"{step}\t{flops:.4e}\t{flops * step / dt / 1e9:.4f}\n")
        self._f.flush()

    def finish(self, sim):
        self._f.close()


@PluginFactory.register("TestPlugin")
class TestPlugin(PluginBase):
    """Hook-order canary (src/plugins/TestPlugin.cpp)."""

    def init(self, sim):
        self.calls = []

    def before_event_new_timestep(self, sim, step):
        self.calls.append(("beforeEventNewTimestep", step))

    def before_forces(self, sim, step):
        self.calls.append(("beforeForces", step))

    def after_forces(self, sim, step):
        self.calls.append(("afterForces", step))

    def end_step(self, sim, step):
        self.calls.append(("endStep", step))
