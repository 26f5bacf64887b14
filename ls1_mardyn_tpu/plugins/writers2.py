"""Additional writers: GammaWriter (surface tension), VISWriter,
PovWriter, DecompWriter.

References: /root/reference/src/io/GammaWriter.{h,cpp} (gamma from the
diagonal pressure-tensor anisotropy), VISWriter.cpp, PovWriter.cpp,
DecompWriter.cpp.
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


@PluginFactory.register("GammaWriter")
class GammaWriter(PluginBase):
    """Surface tension from pressure-tensor anisotropy
    (GammaWriter.cpp):  gamma = L_n/2 * (P_nn - (P_t1t1 + P_t2t2)/2)
    with n the interface normal (default y).  Needs per-molecule virial
    vectors, i.e. the general force path (the RMM kernel does not track
    per-axis virials)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.normal = {"x": 0, "y": 1, "z": 2}.get(
            str(self.params.get("normal", "y")).lower(), 1
        )
        self._acc = 0.0
        self._n = 0

    def init(self, sim):
        self._f = open(f"{self.output_prefix}.gamma", "w")
        self._f.write("#step\tgamma_instant\tgamma_avg\n")

    def end_step(self, sim, step):
        eng = sim.engine
        if eng.forces is None:
            return
        mol = eng.mol
        valid = np.asarray(mol.valid)
        Vi = np.asarray(eng.forces.Vi)[valid]
        v = np.asarray(mol.v)[valid]
        mass = np.asarray(sim.pp.mass)[np.asarray(mol.cid)[valid]]
        # P_dd * V = sum m v_d^2 + sum_mol Vi_d  (Vi already carries the
        # 0.5*drm_d*f_d convention summed over both molecules)
        PV = (mass[:, None] * v * v).sum(axis=0) + Vi.sum(axis=0)
        nrm = self.normal
        t1, t2 = [d for d in range(3) if d != nrm]
        Ln = sim.box[nrm]
        gamma = 0.5 * (PV[nrm] - 0.5 * (PV[t1] + PV[t2])) / (
            sim.volume / Ln
        )
        self._acc += gamma
        self._n += 1
        if step % self.write_frequency == 0:
            self._f.write(
                f"{step}\t{gamma:.10e}\t{self._acc / self._n:.10e}\n"
            )
            self._f.flush()

    def finish(self, sim):
        self._f.close()


@PluginFactory.register("VISWriter")
class VISWriter(PluginBase):
    """Simple visualization records (VISWriter.cpp): per frame, one line
    per molecule: id cid q0 q1 q2 q3 x y z."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid]
        q = np.asarray(mol.q)[valid]
        cid = np.asarray(mol.cid)[valid]
        mid = np.asarray(mol.mid)[valid]
        mode = "a" if getattr(self, "_started", False) else "w"
        self._started = True
        with open(f"{self.output_prefix}.vis", mode) as f:
            f.write(f"#frame step={step} N={len(r)}\n")
            for i in range(len(r)):
                f.write(
                    f"{mid[i]} {cid[i] + 1} "
                    f"{q[i,0]:.6f} {q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f} "
                    f"{r[i,0]:.6f} {r[i,1]:.6f} {r[i,2]:.6f}\n"
                )


@PluginFactory.register("PovWriter")
class PovWriter(PluginBase):
    """POV-Ray scene export (PovWriter.cpp): one sphere per molecule."""

    PALETTE = ("Red", "Green", "Blue", "Yellow", "Cyan", "Magenta")

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid]
        cid = np.asarray(mol.cid)[valid]
        with open(f"{self.output_prefix}_{step}.pov", "w") as f:
            f.write('#include "colors.inc"\n')
            f.write(f"// step {step}, N={len(r)}\n")
            box = sim.box
            f.write(
                f"camera {{ location <{box[0]*1.5}, {box[1]*1.5}, "
                f"{-box[2]*0.5}> look_at <{box[0]/2}, {box[1]/2}, "
                f"{box[2]/2}> }}\n"
            )
            f.write(
                f"light_source {{ <{box[0]}, {box[1]*2}, {-box[2]}> "
                "color White }\n"
            )
            for i in range(len(r)):
                col = self.PALETTE[int(cid[i]) % len(self.PALETTE)]
                f.write(
                    f"sphere {{ <{r[i,0]:.4f}, {r[i,1]:.4f}, {r[i,2]:.4f}>,"
                    f" 0.5 pigment {{ color {col} }} }}\n"
                )


@PluginFactory.register("DecompWriter")
class DecompWriter(PluginBase):
    """Domain-decomposition layout dump (DecompWriter.cpp): slab ranges
    per device (informational; single-chip runs report one slab)."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        import jax

        with open(f"{self.output_prefix}.decomp", "w") as f:
            devs = jax.devices()
            f.write(f"#step {step}  n_devices {len(devs)}\n")
            Lz = sim.box[2]
            for i, d in enumerate(devs):
                f.write(
                    f"rank {i} device {d} z=[{i*Lz/len(devs):.4f},"
                    f"{(i+1)*Lz/len(devs):.4f})\n"
                )
