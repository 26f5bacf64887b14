"""Remaining registry plugins: parallel-diagnostic facades and small
NEMD/sampling utilities, completing the reference's
PluginFactory::registerDefaultPlugins inventory
(/root/reference/src/plugins/PluginFactory.cpp:79-128).
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _slab_sim(sim):
    """The SlabSimulation when running under ParallelMDSimulation."""
    return getattr(sim, "sim", None)


@PluginFactory.register("LoadbalanceWriter")
class LoadbalanceWriter(PluginBase):
    """Per-rank load + imbalance time series
    (src/io/LoadBalanceWriter.{h,cpp}).  Single-chip runs log a single
    rank with imbalance 1."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        ssim = _slab_sim(sim)
        path = f"{self.output_prefix}.lb.dat"
        if ssim is not None:
            from ls1_mardyn_tpu.parallel.diagnostics import write_loadbalance

            write_loadbalance(ssim, sim.mol_sharded, path, step=step)
        else:
            import os

            gv = sim.last_globals
            n = int(float(gv.n)) if gv is not None else 0
            new = not os.path.exists(path)
            with open(path, "a") as f:
                if new:
                    f.write("# step imbalance max avg rank0\n")
                f.write(f"{step} 1.0000 {n} {n:.1f} {n}\n")


@PluginFactory.register("HaloParticleWriter")
class HaloParticleWriter(PluginBase):
    """Halo molecule dump per rank (src/io/HaloParticleWriter.{h,cpp});
    single-chip runs have no halo and write nothing."""

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        ssim = _slab_sim(sim)
        if ssim is None:
            return
        from ls1_mardyn_tpu.parallel.diagnostics import write_halo_particles

        write_halo_particles(ssim, sim.mol_sharded, self.output_prefix,
                             step=step)


@PluginFactory.register("CommunicationPartnerWriter")
class CommunicationPartnerWriter(PluginBase):
    """Per-rank communication partner table
    (src/io/CommunicationPartnerWriter.h)."""

    def init(self, sim):
        ssim = _slab_sim(sim)
        if ssim is None:
            return
        from ls1_mardyn_tpu.parallel.diagnostics import (
            write_communication_partners,
        )

        write_communication_partners(ssim, f"{self.output_prefix}.cp.dat")


@PluginFactory.register("KDTreePrinter")
class KDTreePrinter(PluginBase):
    """Decomposition structure dump (src/plugins/KDTreePrinter.h; this
    build's decomposition is a static slab table)."""

    def init(self, sim):
        ssim = _slab_sim(sim)
        if ssim is None:
            return
        from ls1_mardyn_tpu.parallel.diagnostics import write_decomposition

        write_decomposition(ssim, f"{self.output_prefix}.decomp_tree.dat")


@PluginFactory.register("MPICheckpointWriter")
class MPICheckpointWriter(PluginBase):
    """Parallel checkpoint writes in the reference's MPICheckpointWriter
    binary .dat format (byte layout of
    src/io/MPICheckpointWriter.cpp:330-393: 64-byte magic header,
    ICRVQD record stream; readable by the reference's MPI_IOReader).
    Every rank contributes its slab in the reference; here the gathered
    single-host write produces one bounding box."""

    def end_step(self, sim, step):
        if step == 0 or step % self.write_frequency:
            return
        from ls1_mardyn_tpu.io.binary_io import write_mpi_checkpoint

        write_mpi_checkpoint(
            f"{self.output_prefix}-{step}.restart.dat",
            sim.export_phasespace()
            if hasattr(sim, "export_phasespace")
            else sim._export_phasespace(),
        )


@PluginFactory.register("ExamplePlugin")
class ExamplePlugin(PluginBase):
    """Hook-point demonstrator (src/plugins/ExamplePlugin.{h,cpp}):
    prints its message at the configured hook."""

    def __init__(self, params=None):
        super().__init__(params)
        self.message = self.params.get("message", "Your code would be called here.")
        self.where = self.params.get("writeposition", "endStep")
        self.calls = 0

    def _fire(self, where):
        if where == self.where:
            self.calls += 1
            print(f"[ExamplePlugin @ {where}] {self.message}")

    def before_event_new_timestep(self, sim, step):
        self._fire("beforeEventNewTimestep")

    def before_forces(self, sim, step):
        self._fire("beforeForces")

    def after_forces(self, sim, step):
        self._fire("afterForces")

    def end_step(self, sim, step):
        self._fire("endStep")


@PluginFactory.register("MmspdBinWriter")
class MmspdBinWriter(PluginBase):
    """Binary mmspd variant (src/io/MmspdBinWriter.cpp): header line +
    per-frame little-endian float records (cid, x, y, z)."""

    def init(self, sim):
        self._fname = f"{self.output_prefix}.mmspd.bin"
        with open(self._fname, "wb") as f:
            f.write(b"MMSPDb 1.0\n")
            box = sim.box
            np.asarray(
                [box[0], box[1], box[2]], dtype="<f8"
            ).tofile(f)

    def end_step(self, sim, step):
        if step % self.write_frequency:
            return
        mol = sim.molecules()
        valid = np.asarray(mol.valid)
        r = np.asarray(mol.r)[valid].astype("<f4")
        cid = np.asarray(mol.cid)[valid].astype("<f4")
        with open(self._fname, "ab") as f:
            np.asarray([len(r)], dtype="<i8").tofile(f)
            np.concatenate([cid[:, None], r], axis=1).tofile(f)


@PluginFactory.register("Permittivity")
class Permittivity(PluginBase):
    """Static dielectric constant from dipole-moment fluctuations,
    with the reference's block-average bookkeeping
    (src/plugins/Permittivity.{h,cpp}):

      eps_block  = 1 + 4 pi (<M^2>_b - <M>_b^2) / (3 V T)
      eps2_block = 1 + 4 pi  <M^2>_b            / (3 V T)

    sampled every <recordingtimesteps> after <initstatistics>, blocked
    every <writefrequency> steps (Permittivity.cpp:222-230); running
    averages of M and <M^2> appended to <prefix>.permRAV every
    <runningaveragestep> recorded steps (writeRunningAverage,
    Permittivity.cpp:105-131); final <prefix>.perm table with one row
    per block plus the block-average and whole-run permittivities
    incl. the first-block weighting correction
    (Permittivity.cpp:240-300)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.write_frequency = int(float(p.get("writefrequency", 1000)))
        self.init_statistics = int(float(p.get("initstatistics", 0)))
        self.recording_timesteps = int(float(p.get("recordingtimesteps", 1)))
        self.rav_steps = int(float(p.get("runningaveragestep", 100)))
        self._block_m = []     # recorded M vectors of the current block
        self._blocks = []      # (mean M [3], mean M^2, n_particles)
        self._rav_sum = np.zeros(3)
        self._rav_sq = 0.0
        self._rav_n = 0
        self._rav_counter = 0
        self._npart = 0
        self._rav_rows = []

    def _sample_M(self, sim):
        from ls1_mardyn_tpu.models.interaction import site_offsets

        mol = sim.engine.mol
        sites = site_offsets(sim.pp, mol.q, mol.cid)
        e = np.asarray(sites["dip_e"])  # [N, ND, 3]
        mu = np.asarray(sim.table.dip_abs)[np.asarray(mol.cid)]  # [N, ND]
        valid = np.asarray(mol.valid)
        self._npart += int(valid.sum())
        return (mu[..., None] * e)[valid].sum(axis=(0, 1))

    def end_step(self, sim, step):
        if step <= self.init_statistics:
            return
        V = float(np.prod(sim.box))
        T = float(sim.config.temperature) or 1.0
        if step % self.recording_timesteps == 0:
            M = self._sample_M(sim)
            self._block_m.append(M)
            self._rav_sum += M
            self._rav_sq += float(M @ M)
            self._rav_n += 1
            if self._rav_n % self.rav_steps == 0:
                self._rav_counter += 1
                n = self._rav_counter * self.rav_steps
                msq_inst = float(M @ M)
                k = 4.0 * np.pi / (3.0 * T * V)
                self._rav_rows.append(
                    [step, n, *M, msq_inst, 1.0 + k * msq_inst,
                     *(self._rav_sum / n), self._rav_sq / n,
                     1.0 + k * self._rav_sq / n]
                )
        if step % self.write_frequency == 0 and self._block_m:
            B = np.asarray(self._block_m)
            self._blocks.append(
                (B.mean(axis=0), float((B * B).sum(axis=1).mean()),
                 self._npart, step)
            )
            self._block_m = []
            self._npart = 0

    def finish(self, sim):
        if self._block_m:  # flush a partial final block
            B = np.asarray(self._block_m)
            self._blocks.append(
                (B.mean(axis=0), float((B * B).sum(axis=1).mean()),
                 self._npart, -1)
            )
        if not self._blocks:
            return
        T = float(sim.config.temperature) or 1.0
        V = float(np.prod(sim.box))
        k = 4.0 * np.pi / (3.0 * T * V)
        with open(f"{self.output_prefix}.permRAV", "w") as f:
            f.write("time steps\trecording steps\tMx_inst\tMy_inst\t"
                    "Mz_inst\tMsquared_inst\tperm_inst\tMx_rav\tMy_rav\t"
                    "Mz_rav\tMsquared_rav\tperm_rav\n")
            for row in self._rav_rows:
                f.write("\t".join(f"{x:.7g}" for x in row) + "\n")
        # first-block weighting correction (Permittivity.cpp:247-256)
        corr0 = 0.0
        if self.init_statistics % self.write_frequency:
            corr0 = (
                self.init_statistics % self.write_frequency
            ) / self.write_frequency
        eps_sum = eps2_sum = wsum = 0.0
        tot_sq = 0.0
        tot_m = np.zeros(3)
        rows = []
        for i, (m, msq, npart, step) in enumerate(self._blocks):
            m2 = float(m @ m)
            eps = 1.0 + k * (msq - m2)
            eps2 = 1.0 + k * msq
            w = (1.0 - corr0) if i == 0 else 1.0
            eps_sum += eps * w
            eps2_sum += eps2 * w
            wsum += w
            tot_sq += msq
            tot_m += m
            rows.append((step, npart, *m, m2, msq, eps, eps2))
        nb = len(self._blocks)
        tot_m /= nb
        eps_total = 1.0 + k * (tot_sq / nb - float(tot_m @ tot_m))
        with open(f"{self.output_prefix}.perm", "w") as f:
            f.write("timestep\tN_particles\tMx\tMy\tMz\t<M>squared\t"
                    "<M_squared>\tepsilon\tepsilon2\n")
            for row in rows:
                f.write("\t".join(f"{x:.7g}" for x in row) + "\n")
            f.write(f"block average epsilon\t{eps_sum / wsum:.7g}\t"
                    f"epsilon2\t{eps2_sum / wsum:.7g}\n")
            f.write(f"epsilon_total\t{eps_total:.7g}\n")
        self.epsilon = eps_sum / wsum


@PluginFactory.register("Dropaligner")
class Dropaligner(PluginBase):
    """Re-center a droplet's center of mass to a fixed point
    (src/plugins/NEMD/Dropaligner-class role; like COMaligner with a
    spherical selection)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.center = np.array(
            [float(p.get("xpos", 0)), float(p.get("ypos", 0)),
             float(p.get("zpos", 0))]
        )
        self.radius = float(p.get("radius", 1e30))
        self.interval = int(float(p.get("interval", 1)))

    def before_forces(self, sim, step):
        if step % self.interval:
            return
        import dataclasses

        import jax.numpy as jnp

        mol = sim.engine.mol
        r = np.array(mol.r)
        valid = np.asarray(mol.valid)
        sel = valid & (((r - self.center) ** 2).sum(1) < self.radius**2)
        if sel.sum() == 0:
            return
        shift = self.center - r[sel].mean(axis=0)
        box = np.asarray(sim.box)
        r[valid] = (r[valid] + shift) % box
        sim.engine.mol = dataclasses.replace(
            mol, r=jnp.asarray(r, mol.r.dtype)
        )


@PluginFactory.register("Dropaccelerator")
class Dropaccelerator(PluginBase):
    """Accelerate the molecules inside a sphere by a fixed velocity
    increment over a step window (src/plugins/NEMD/Dropaccelerator)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.center = np.array(
            [float(p.get("xposition", 0)), float(p.get("yposition", 0)),
             float(p.get("zposition", 0))]
        )
        self.radius = float(p.get("dropradius", 1.0))
        self.velocity = float(p.get("velocity", 0.0))  # total dv (y)
        self.start = int(float(p.get("starttime", 0)))
        self.steps = max(1, int(float(p.get("steps", 1))))

    def before_forces(self, sim, step):
        if not (self.start <= step < self.start + self.steps):
            return
        import dataclasses

        import jax.numpy as jnp

        mol = sim.engine.mol
        r = np.asarray(mol.r)
        v = np.array(mol.v)
        valid = np.asarray(mol.valid)
        sel = valid & (((r - self.center) ** 2).sum(1) < self.radius**2)
        v[sel, 1] += self.velocity / self.steps
        sim.engine.mol = dataclasses.replace(
            mol, v=jnp.asarray(v, mol.v.dtype)
        )


@PluginFactory.register("MirrorSystem")
class MirrorSystem(PluginBase):
    """One-shot system mirroring about a plane
    (src/plugins/NEMD/MirrorSystem role): reflects positions (and the
    normal velocity component) across y = yPos."""

    def __init__(self, params=None):
        super().__init__(params)
        self.ypos = float(self.params.get("yPos", 0.0))
        self.done = False

    def before_forces(self, sim, step):
        if self.done:
            return
        import dataclasses

        import jax.numpy as jnp

        mol = sim.engine.mol
        r = np.array(mol.r)
        v = np.array(mol.v)
        box = np.asarray(sim.box)
        r[:, 1] = (2.0 * self.ypos - r[:, 1]) % box[1]
        v[:, 1] = -v[:, 1]
        sim.engine.mol = dataclasses.replace(
            mol, r=jnp.asarray(r, mol.r.dtype), v=jnp.asarray(v, mol.v.dtype)
        )
        self.done = True


@PluginFactory.register("DirectedPM")
class DirectedPM(PluginBase):
    """Moving-droplet analysis in cylindrical bins
    (src/plugins/DirectedPM.{h,cpp}): molecules of one component are
    binned in (R^2, h=y, phi) around the box axis
    (DirectedPM.h:141-147: R2max = 0.24*minXZ^2, equal-R^2 rings so
    every bin has the same volume); every <outputFrequency> steps the
    per-bin densities classify bins into droplet (rho > rohCut *
    maxDeviation, inside the permissible range that excludes the wall
    adsorbate below heightWall and the membrane above heightMembrane,
    DirectedPM.h:150-162) and vapor.  The droplet's directed velocity
    (y) from the previous block is subtracted from the y-velocity
    variance of droplet bins (DirectedPM.cpp:126-128); rohCut
    self-adjusts to the measured liquid density
    (DirectedPM.cpp:322).  Outputs: the global row file
    (Global_output_DPM_MK.txt, DirectedPM.cpp:368-379: directed
    velocity, gas/liquid density, pressures from the per-bin virial,
    Txyz/Txz with and without the directed part) and the 2-D
    density/temperature profiles (drop_MK_DirectedPM_<step>.NDpr /
    .Temppr, DirectedPM.cpp:383-450)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.component = int(float(p.get("Component", p.get("component", 1))))
        self.r_inc = int(float(p.get("rIncrements", 50)))
        self.h_inc = int(float(p.get("hIncrements", 50)))
        self.phi_inc = int(float(p.get("phiIncrements", 1)))
        self.roh_cut = float(p.get("rohCutLiq", 0.5))
        self.percent = float(p.get("maxDeviation", 1.0))
        self.height_wall = float(p.get("heightWall", 0.0))
        self.height_membrane = float(p.get("heightMembrane", 1e30))
        self.out_freq = int(float(p.get("outputFrequency", 1000)))
        self._acc = None
        self._first = True
        self._v_dir_old = 0.0
        self._roh_new = self.roh_cut
        self._steps_in_block = 0

    def _geom(self, sim):
        box = np.asarray(sim.box, float)
        min_xz = min(box[0], box[2])
        r2max = 0.24 * min_xz * min_xz
        inv = np.array([
            self.r_inc / r2max,
            self.h_inc / box[1],
            self.phi_inc / (2.0 * np.pi),
        ])
        vol = np.pi / (inv[0] * inv[1] * self.phi_inc)
        centre = np.array([0.5 * box[0], 0.0, 0.5 * box[2]])
        return inv, vol, centre

    def after_forces(self, sim, step):
        mol = sim.engine.mol
        fr = sim.engine.forces
        inv, vol, centre = self._geom(sim)
        nb = self.r_inc * self.h_inc * self.phi_inc
        if self._acc is None:
            # N, vx, vy, vz, vx2, vy2, vz2, dirvy2, Vix, Viy, Viz
            self._acc = np.zeros((nb, 11))
        valid = np.asarray(mol.valid) & (
            np.asarray(mol.cid) == self.component - 1
        )
        r = np.asarray(mol.r)[valid] - centre
        v = np.asarray(mol.v)[valid]
        vi = np.asarray(fr.Vi)[valid] if fr is not None else np.zeros_like(v)
        R2 = r[:, 0] ** 2 + r[:, 2] ** 2
        phi = np.arctan2(r[:, 2], r[:, 0])
        phi = np.where(phi < 0, phi + 2 * np.pi, phi)
        rb = np.floor(R2 * inv[0]).astype(int)
        hb = np.floor(r[:, 1] * inv[1]).astype(int)
        pb = np.floor(phi * inv[2]).astype(int)
        ok = (rb >= 0) & (rb < self.r_inc) & (hb >= 0) & (hb < self.h_inc) \
            & (pb >= 0) & (pb < self.phi_inc)
        uid = (hb * self.r_inc * self.phi_inc + rb * self.phi_inc + pb)[ok]
        cols = np.concatenate(
            [np.ones((ok.sum(), 1)), v[ok], v[ok] ** 2,
             (v[ok, 1:2] - self._v_dir_old) ** 2, vi[ok]], axis=1
        )
        np.add.at(self._acc, uid, cols)
        self._steps_in_block += 1
        if step % self.out_freq == 0 and step > 0:
            self._flush(sim, step, inv, vol)

    def _flush(self, sim, step, inv, vol):
        nf = self.out_freq
        A = self._acc
        n, vel, v2, dirvy2, vi = (
            A[:, 0], A[:, 1:4], A[:, 4:7], A[:, 7], A[:, 8:11]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            rho = (n / nf) / vol
            t_xyz = v2.sum(axis=1) / (3.0 * n)
        # permissible range: exclude wall / membrane h-rows
        hb = np.arange(self.r_inc * self.h_inc * self.phi_inc) // (
            self.r_inc * self.phi_inc
        )
        h_edge = 1.0 / inv[1]
        perm = (hb > np.ceil(self.height_wall / h_edge)) & (
            hb < np.floor(self.height_membrane / h_edge)
        )
        cut = (self.roh_cut if self._first else self._roh_new) * self.percent
        self._first = False
        liq = (rho > cut) & perm
        gas = perm & ~liq
        n_liq, n_gas = n[liq].sum(), n[gas].sum()
        if n_liq > 0:
            v_drop = vel[liq].sum(axis=0) / n_liq
            self._v_dir_old = v_drop[1]
            self._roh_new = (n_liq / nf) / (max(liq.sum(), 1) * vol)
            # droplet Ekin with the directed y part removed
            ek_liq = 0.5 * (
                v2[liq, 0].sum() + dirvy2[liq].sum() + v2[liq, 2].sum()
            )
            ekxz_liq = 0.5 * (v2[liq, 0].sum() + v2[liq, 2].sum())
            t_liq = 2.0 * ek_liq / (3.0 * n_liq)
            txz_liq = 2.0 * ekxz_liq / (2.0 * n_liq)
            p_liq = (
                t_liq * (n_liq / nf) / (vol * liq.sum())
                + vi[liq].sum() / (3.0 * vol * liq.sum() * nf)
            )
        else:
            v_drop = np.zeros(3)
            t_liq = txz_liq = p_liq = 0.0
        if n_gas > 0:
            ek_gas = 0.5 * v2[gas].sum()
            t_gas = 2.0 * ek_gas / (3.0 * n_gas)
            txz_gas = (v2[gas, 0].sum() + v2[gas, 2].sum()) / (2.0 * n_gas)
            rho_gas = (n_gas / nf) / (vol * gas.sum())
            p_gas = (
                t_gas * (n_gas / nf) / (vol * gas.sum())
                + vi[gas].sum() / (3.0 * vol * gas.sum() * nf)
            )
        else:
            t_gas = txz_gas = rho_gas = p_gas = 0.0
        import os

        mode = "a" if os.path.exists("Global_output_DPM_MK.txt") else "w"
        with open("Global_output_DPM_MK.txt", mode) as f:
            f.write(
                f"{step} \t\t{v_drop[1]:.6g} \t\t {rho_gas:.6g} \t\t "
                f"{self._roh_new:.6g} \t\t {p_gas:.6g} \t\t {p_liq:.6g} "
                f"\t\t {t_gas:.6g} \t\t {t_liq:.6g} \t\t {txz_gas:.6g} "
                f"\t\t {txz_liq:.6g}\n"
            )
        # 2-D (h x r) profiles, phi-major row layout as the reference
        rr = np.arange(self.r_inc)
        r_centers = 0.5 * (np.sqrt(rr + 1) + np.sqrt(rr)) / np.sqrt(inv[0])
        for suffix, field in ((".NDpr", rho),
                              (".Temppr", np.nan_to_num(t_xyz))):
            with open(f"drop_MK_DirectedPM_{step}{suffix}", "w") as f:
                f.write(f"//Segment volume: {vol:.6g}\n"
                        f"//Accumulated data sets: {nf}\n"
                        "// \t dr \t dh \t dphi \n")
                f.write("\t" + "\t".join(
                    f"{1 / x:.6g}" for x in inv) + "\n")
                f.write("0 \t" + " \t".join(
                    f"{x:.6g}" for x in r_centers) + " \t\n")
                M = field.reshape(self.h_inc, self.r_inc, self.phi_inc)
                for h in range(self.h_inc):
                    hval = (h + 0.5) / inv[1]
                    row = M[h].T.reshape(-1)  # phi-major, r within
                    f.write(f"{hval:.6g}  \t" + "\t".join(
                        f"{x:.6g}" for x in row) + "\n")
        self._acc[:] = 0.0
        self._steps_in_block = 0


@PluginFactory.register("MettDeamonFeedrateDirector")
class MettDeamonFeedrateDirector(PluginBase):
    """Adjusts a MettDeamon's feed rate to match the measured outflow
    (src/plugins/NEMD/MettDeamonFeedrateDirector.cpp role)."""

    def __init__(self, params=None):
        super().__init__(params)
        self.update_freq = int(float(self.params.get("updatefreq", 100)))
        self._last_deleted = 0

    def end_step(self, sim, step):
        if step % self.update_freq:
            return
        from ls1_mardyn_tpu.plugins.nemd2 import MettDeamon

        for p in sim._plugins:
            if isinstance(p, MettDeamon):
                outflow = p.deleted - self._last_deleted
                self._last_deleted = p.deleted
                per_interval = max(
                    1, int(np.ceil(outflow * p.interval / self.update_freq))
                )
                p.feed_rate = per_interval
