"""RegionSampling: per-region sampling framework.

Reference: /root/reference/src/plugins/NEMD/RegionSampling.{h,cpp}
(2,094 LoC) -- cuboid sample regions, each carrying up to three
sampling modules:

  - ``profiles`` (SampleRegion::sampleProfiles:961-1092 +
    calcGlobalValuesProfiles:1267-1420 + writeDataProfiles:1513-1676):
    y-binned per-component scalar/vector profiles, split by molecule
    flux direction (all / vy>=0 / vy<=0).  Scalars per bin: N, rotDOF,
    2*EkinRot; vectors: sum v, sum v^2, sum F.  Output files
    ``scalquant_{all,pos,neg}_reg{id}_TS{step:09d}.dat`` /
    ``vectquant_...`` with the reference's column set (DOF_total,
    DOF_trans, DOF_rot, rho, Ekin_total/trans/drift/rot/T, Epot, T,
    T_trans, T_rot | F, v, Ekin_trans/drift per axis, T per axis).
  - ``VDF`` (sampleVDF:1096-1191, writeDataVDF:1676-1800): velocity
    distribution histograms per y-bin and velocity class, split into
    the reference's 12 data structures (pjy/njy flux directions x
    abs/per-component-sign classes), with per-component
    discretizations (numclasses, maxvalue).
  - ``fieldYR`` (sampleFieldYR:1192-1266, writeDataFieldYR:1797-1875):
    density field over (y-bin, R^2-linear shell) around the region's
    y-axis, three sections (all / x>=0 / x<0), ASCII or binary.

Config schema matches the reference's XML (coords with "box" literals,
``<sampling type=...>`` with control start/frequency/stop and
subdivision by number|width).  `refcoordsID != 0` (DistControl-relative
coordinates) is not supported and raises.
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _coord(val, box_len):
    if isinstance(val, dict):
        if int(float(val.get("refcoordsID", 0))):
            raise NotImplementedError(
                "RegionSampling: refcoordsID != 0 (DistControl-relative "
                "region corners) is not supported")
        val = val.get("#text", 0.0)
    s = str(val).strip()
    if s == "box":
        return float(box_len)
    return float(s)


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


class _ProfilesModule:
    def __init__(self, params, region):
        self.region = region
        ctl = params.get("control", {}) or {}
        self.start = int(float(ctl.get("start", 0)))
        self.freq = max(1, int(float(ctl.get("frequency", 100))))
        self.stop = int(float(ctl.get("stop", 1_000_000_000)))
        self.single_comp = bool(int(float(params.get(
            "single_component", 0) or 0)))
        sub = params.get("subdivision", {}) or {}
        self.sub_type = str(sub.get("type", "number"))
        self.sub_num = int(float(sub.get("number", 1)))
        self.sub_width = float(sub.get("width", 1.0))

    def init(self, sim):
        lo, hi = self.region.lo, self.region.hi
        width = hi[1] - lo[1]
        if self.sub_type == "width":
            self.nbins = max(1, int(width / self.sub_width))
        else:
            self.nbins = max(1, self.sub_num)
        self.bin_width = width / self.nbins
        area = (hi[0] - lo[0]) * (hi[2] - lo[2])
        self.bin_volume = self.bin_width * area
        K = sim.table.K
        self.ncomp = 2 if self.single_comp else (K + 1)
        self._reset()

    def _reset(self):
        nb, nc = self.nbins, self.ncomp
        # [dir(all,pos,neg), comp(0=all), bin]
        self.N = np.zeros((3, nc, nb))
        self.rotdof = np.zeros((3, nc, nb))
        self.ekinrot2 = np.zeros((3, nc, nb))
        # vector [dir, comp, bin, dim]
        self.v_sum = np.zeros((3, nc, nb, 3))
        self.v2_sum = np.zeros((3, nc, nb, 3))
        self.f_sum = np.zeros((3, nc, nb, 3))

    def sample(self, st):
        """st: dict with r, v, F, cid, mass, rot_dof, iw2 for molecules
        inside the region."""
        lo = self.region.lo
        b = np.floor((st["r"][:, 1] - lo[1]) / self.bin_width).astype(int)
        ok = (b >= 0) & (b < self.nbins)
        if not ok.any():
            return
        b = b[ok]
        v = st["v"][ok]
        F = st["F"][ok]
        cid = st["cid"][ok]
        rdof = st["rot_dof"][ok]
        iw2 = st["iw2"][ok]
        nb = self.nbins
        ccol = np.ones_like(cid) if self.single_comp else (cid + 1)
        for d, sel in ((0, slice(None)), (1, v[:, 1] >= 0.0),
                       (2, v[:, 1] <= 0.0)):
            bs, vs, Fs, cs = b[sel], v[sel], F[sel], ccol[sel]
            rs, is_ = rdof[sel], iw2[sel]
            for cc in (np.zeros_like(cs), cs):  # comp 0 = all, then cid
                idx = cc * nb + bs
                ml = self.ncomp * nb
                self.N[d].reshape(-1)[:ml] += np.bincount(
                    idx, minlength=ml)[:ml]
                self.rotdof[d].reshape(-1)[:ml] += np.bincount(
                    idx, weights=rs, minlength=ml)[:ml]
                self.ekinrot2[d].reshape(-1)[:ml] += np.bincount(
                    idx, weights=is_, minlength=ml)[:ml]
                for dim in range(3):
                    self.v_sum[d, :, :, dim].reshape(-1)[:ml] += \
                        np.bincount(idx, weights=vs[:, dim],
                                    minlength=ml)[:ml]
                    self.v2_sum[d, :, :, dim].reshape(-1)[:ml] += \
                        np.bincount(idx, weights=vs[:, dim] ** 2,
                                    minlength=ml)[:ml]
                    self.f_sum[d, :, :, dim].reshape(-1)[:ml] += \
                        np.bincount(idx, weights=Fs[:, dim],
                                    minlength=ml)[:ml]

    def maybe_write(self, sim, step):
        if step <= self.start or step > self.stop:
            return
        if (step - self.start) % self.freq != 0:
            return
        self._write(sim, step)
        self._reset()

    def _write(self, sim, step):
        nb, nc = self.nbins, self.ncomp
        mass_tbl = np.asarray(sim.pp.mass)
        inv_samples = 1.0 / self.freq
        mids = self.region.lo[1] + (np.arange(nb) + 0.5) * self.bin_width
        # per-comp masses: comp index 1..nc-1 -> component mass; for
        # single_component mode all molecules fold into comp 1 (mass
        # of component 0 -- matches the reference's cid=1 collapse)
        cmass = np.zeros(nc)
        for c in range(1, nc):
            cmass[c] = mass_tbl[min(c - 1, len(mass_tbl) - 1)]

        names = ["all", "pos", "neg"]
        for d in range(3):
            N = self.N[d]
            ek_trans_c = self.v2_sum[d] * cmass[:, None, None]  # [c,b,3]
            with np.errstate(divide="ignore", invalid="ignore"):
                invN = np.where(N > 0, 1.0 / np.maximum(N, 1), 0.0)
            ek_drift_c = (self.v_sum[d] ** 2) * cmass[:, None, None] \
                * invN[:, :, None]
            # comp 0 = sum over comps of the per-comp kinetic terms
            ek_trans_c[0] = ek_trans_c[1:].sum(0)
            ek_drift_c[0] = ek_drift_c[1:].sum(0)
            ek_trans = ek_trans_c.sum(-1)
            ek_drift = ek_drift_c.sum(-1)
            ek_rot = self.ekinrot2[d]
            dof_trans = N * 3
            dof_rot = self.rotdof[d]
            dof_tot = dof_trans + dof_rot
            with np.errstate(divide="ignore", invalid="ignore"):
                T = np.where(dof_tot > 0,
                             (ek_trans + ek_rot - ek_drift)
                             / np.maximum(dof_tot, 1), 0.0)
                T_trans = np.where(dof_trans > 0,
                                   ek_trans / np.maximum(dof_trans, 1),
                                   0.0)
                T_rot = np.where(dof_rot > 0,
                                 ek_rot / np.maximum(dof_rot, 1), 0.0)
                vdrift = self.v_sum[d] * invN[:, :, None]
                fmean = self.f_sum[d] * invN[:, :, None]
                T_comp = (ek_trans_c - ek_drift_c) * invN[:, :, None]
            rho = N / (self.bin_volume * self.freq)

            scal = "scalquant_%s_reg%d_TS%09d.dat" % (
                names[d], self.region.rid, step)
            vect = "vectquant_%s_reg%d_TS%09d.dat" % (
                names[d], self.region.rid, step)
            with open(scal, "w") as f:
                f.write("%24s" % "pos")
                for c in range(nc):
                    for col in ("DOF_total", "DOF_trans", "DOF_rot",
                                "rho", "Ekin_total", "Ekin_trans",
                                "Ekin_drift", "Ekin_rot", "Ekin_T",
                                "Epot", "T", "T_trans", "T_rot"):
                        f.write("%24s" % ("%s[%d]" % (col, c)))
                f.write("\n")
                for s in range(nb):
                    f.write("%24.15e" % mids[s])
                    for c in range(nc):
                        vals = (
                            dof_tot[c, s], dof_trans[c, s],
                            dof_rot[c, s], rho[c, s],
                            0.5 * (ek_trans[c, s] + ek_rot[c, s])
                            * inv_samples,
                            0.5 * ek_trans[c, s] * inv_samples,
                            0.5 * ek_drift[c, s] * inv_samples,
                            0.5 * ek_rot[c, s] * inv_samples,
                            0.5 * (ek_trans[c, s] + ek_rot[c, s]
                                   - ek_drift[c, s]) * inv_samples,
                            0.0,
                            T[c, s], T_trans[c, s], T_rot[c, s],
                        )
                        for vv in vals:
                            f.write("%24.15e" % vv)
                    f.write("\n")
            with open(vect, "w") as f:
                f.write("%24s" % "pos")
                for c in range(nc):
                    for col in ("Fx", "Fy", "Fz", "vx", "vy", "vz",
                                "Ekin_trans,x", "Ekin_trans,y",
                                "Ekin_trans,z", "Ekin_drift,x",
                                "Ekin_drift,y", "Ekin_drift,z",
                                "Tx", "Ty", "Tz"):
                        f.write("%24s" % ("%s[%d]" % (col, c)))
                f.write("\n")
                for s in range(nb):
                    f.write("%24.15e" % mids[s])
                    for c in range(nc):
                        row = list(fmean[c, s]) + list(vdrift[c, s]) \
                            + list(0.5 * ek_trans_c[c, s] * inv_samples) \
                            + list(0.5 * ek_drift_c[c, s] * inv_samples) \
                            + list(T_comp[c, s])
                        for vv in row:
                            f.write("%24.15e" % vv)
                    f.write("\n")


class _VDFModule:
    def __init__(self, params, region):
        self.region = region
        ctl = params.get("control", {}) or {}
        self.start = int(float(ctl.get("start", 0)))
        self.freq = max(1, int(float(ctl.get("frequency", 100))))
        self.stop = int(float(ctl.get("stop", 1_000_000_000)))
        self.single_comp = bool(int(float(params.get(
            "single_component", 0) or 0)))
        sub = params.get("subdivision", {}) or {}
        self.sub_type = str(sub.get("type", "number"))
        self.sub_num = int(float(sub.get("number", 1)))
        self.sub_width = float(sub.get("width", 1.0))
        self.prefix = str(params.get("outputfile", {}).get(
            "prefix", "VDF")) if isinstance(
            params.get("outputfile"), dict) else "VDF"
        # per-cid discretizations: numclasses + maxvalue
        self.disc = {}
        dd = params.get("discretizations", {}) or {}
        for de in _as_list(dd.get("discretization")):
            cid = int(float(de.get("cid", 1)))
            self.disc[cid] = (
                int(float(de.get("numclasses", 50))),
                float(de.get("maxvalue", 5.0)),
            )

    STRUCTS = ["pjy_abs", "pjy_pvx", "pjy_pvy", "pjy_pvz", "pjy_nvx",
               "pjy_nvz", "njy_abs", "njy_pvx", "njy_pvz", "njy_nvx",
               "njy_nvy", "njy_nvz"]

    def init(self, sim):
        lo, hi = self.region.lo, self.region.hi
        width = hi[1] - lo[1]
        if self.sub_type == "width":
            self.nbins = max(1, int(width / self.sub_width))
        else:
            self.nbins = max(1, self.sub_num)
        self.bin_width = width / self.nbins
        K = sim.table.K
        self.ncomp = 2 if self.single_comp else (K + 1)
        if not self.disc:
            self.disc = {c: (50, 5.0) for c in range(self.ncomp)}
        # component 0 (all) inherits the first discretization
        if 0 not in self.disc:
            self.disc[0] = self.disc[min(self.disc)]
        for c in range(self.ncomp):
            self.disc.setdefault(c, self.disc[0])
        self._reset()

    def _reset(self):
        self.hist = {
            c: {s: np.zeros((self.nbins, self.disc[c][0]), np.int64)
                for s in self.STRUCTS}
            for c in range(self.ncomp)
        }

    def sample(self, st):
        lo = self.region.lo
        b = np.floor((st["r"][:, 1] - lo[1]) / self.bin_width).astype(int)
        ok = (b >= 0) & (b < self.nbins)
        b, v = b[ok], st["v"][ok]
        cid = st["cid"][ok]
        ccol = np.ones_like(cid) if self.single_comp else (cid + 1)
        for c in range(self.ncomp):
            ncls, vmax = self.disc[c]
            w = vmax / ncls
            sel = slice(None) if c == 0 else (ccol == c)
            bs, vs = b[sel], v[sel]
            cls_d = np.floor(np.abs(vs) / w).astype(int)  # [n,3]
            in_rng = (cls_d < ncls).all(1)
            bs, vs, cls_d = bs[in_rng], vs[in_rng], cls_d[in_rng]
            pjy = vs[:, 1] > 0.0
            h = self.hist[c]
            for dim, name in enumerate("xyz"):
                pos = vs[:, dim] > 0.0
                for jy, jname in ((pjy, "pjy"), (~pjy, "njy")):
                    for sgn, sname in ((pos, "pv"), (~pos, "nv")):
                        key = "%s_%s%s" % (jname, sname, name)
                        if key not in h:
                            continue  # the reference omits 4 combos
                        m = jy & sgn
                        np.add.at(h[key], (bs[m], cls_d[m, dim]), 1)
            vabs = np.sqrt((vs * vs).sum(1))
            cls_a = np.floor(vabs / w).astype(int)
            oka = cls_a < ncls
            for jy, key in ((pjy, "pjy_abs"), (~pjy, "njy_abs")):
                m = jy & oka
                np.add.at(h[key], (bs[m], cls_a[m]), 1)

    def maybe_write(self, sim, step):
        if step <= self.start or step > self.stop:
            return
        if (step - self.start) % self.freq != 0:
            return
        for c in range(self.ncomp):
            ncls, vmax = self.disc[c]
            w = vmax / ncls
            for s in self.STRUCTS:
                fn = "%s_reg%d_cid%d_%s_TS%09d.dat" % (
                    self.prefix, self.region.rid, c, s, step)
                with open(fn, "wb") as f:
                    f.write(np.uint32(ncls).tobytes())
                    f.write(np.uint32(self.nbins).tobytes())
                    f.write(self.hist[c][s].astype(
                        np.uint64).tobytes())
            with open("%s_reg%d_cid%d_classes_TS%09d.dat" % (
                    self.prefix, self.region.rid, c, step), "w") as f:
                f.write("%24s\n" % ("classes_cid%d" % c))
                for vi in range(ncls):
                    f.write("%24.15e\n" % ((vi + 0.5) * w))
        mids = self.region.lo[1] + (np.arange(self.nbins) + 0.5) \
            * self.bin_width
        with open("VDF_reg%d_bin_coords_TS%09d.dat" % (
                self.region.rid, step), "w") as f:
            f.write("%24s\n" % "coords")
            for m in mids:
                f.write("%24.15e\n" % m)
        self._reset()


class _FieldYRModule:
    def __init__(self, params, region):
        self.region = region
        ctl = params.get("control", {}) or {}
        self.start = int(float(ctl.get("start", 0)))
        self.freq = max(1, int(float(ctl.get("frequency", 100))))
        self.stop = int(float(ctl.get("stop", 1_000_000_000)))
        of = params.get("outputfile", {}) if isinstance(
            params.get("outputfile"), dict) else {}
        self.prefix = str(of.get("prefix", "fieldYR"))
        self.binary = str(of.get("type", "ASCII")).lower() == "binary"
        self.sub = {"y": ("number", 1, None),
                    "r": ("number", 1, None)}
        for se in _as_list(params.get("subdivision")):
            dim = str(se.get("dim", "y")).lower()
            self.sub[dim] = (se.get("type", "number"),
                             se.get("number"), se.get("width"))

    def init(self, sim):
        lo, hi = self.region.lo, self.region.hi
        widthy = hi[1] - lo[1]
        ty = self.sub.get("y") or ("number", 1, None)
        if ty[0] == "width" and ty[2]:
            self.nbins = max(1, int(widthy / float(ty[2])))
        else:
            self.nbins = max(1, int(float(ty[1] or 1)))
        self.bin_width = widthy / self.nbins
        rmax = 0.5 * min(hi[0] - lo[0], hi[2] - lo[2])
        tr = self.sub.get("r") or ("number", 1, None)
        if tr[0] == "width" and tr[2]:
            self.nshells = max(1, int(rmax / float(tr[2])))
        else:
            self.nshells = max(1, int(float(tr[1] or 1)))
        self.rmax = rmax
        self.shell_w2 = rmax * rmax / self.nshells
        self.shell_volume = np.pi * self.shell_w2 * self.bin_width
        self._reset()

    def _reset(self):
        # [section(all, x>=0, x<0), shell, bin]
        self.N = np.zeros((3, self.nshells, self.nbins))

    def sample(self, st):
        lo, hi = self.region.lo, self.region.hi
        r = st["r"]
        xrel = r[:, 0] - (lo[0] + 0.5 * (hi[0] - lo[0]))
        yrel = r[:, 1] - lo[1]
        zrel = r[:, 2] - (lo[2] + 0.5 * (hi[2] - lo[2]))
        by = np.floor(yrel / self.bin_width).astype(int)
        r2 = xrel * xrel + zrel * zrel
        bs = np.floor(r2 / self.shell_w2).astype(int)
        ok = (by >= 0) & (by < self.nbins) & (bs >= 0) \
            & (bs < self.nshells)
        by, bs, xr = by[ok], bs[ok], xrel[ok]
        for sec, m in ((0, slice(None)), (1, xr >= 0.0), (2, xr < 0.0)):
            np.add.at(self.N[sec], (bs[m], by[m]), 1)

    def maybe_write(self, sim, step):
        if step <= self.start or step > self.stop:
            return
        if (step - self.start) % self.freq != 0:
            return
        rho = self.N / (self.shell_volume * self.freq)
        for sec in range(3):
            fn = "%s_sec%d_reg%d_TS%09d.dat" % (
                self.prefix, sec, self.region.rid, step)
            if self.binary:
                with open(fn, "wb") as f:
                    f.write(np.uint32(self.nbins).tobytes())
                    f.write(np.uint32(self.nshells).tobytes())
                    f.write(rho[sec].astype(np.float64).tobytes())
            else:
                with open(fn, "w") as f:
                    for si in range(self.nshells):
                        f.write("".join("%24.15e" % v
                                        for v in rho[sec][si]) + "\n")
        self._reset()


class _Region:
    def __init__(self, rid, params, box):
        self.rid = rid
        co = params.get("coords", {}) or {}
        self.lo = np.array([
            _coord(co.get("lcx", 0.0), box[0]),
            _coord(co.get("lcy", 0.0), box[1]),
            _coord(co.get("lcz", 0.0), box[2]),
        ])
        self.hi = np.array([
            _coord(co.get("ucx", "box"), box[0]),
            _coord(co.get("ucy", "box"), box[1]),
            _coord(co.get("ucz", "box"), box[2]),
        ])
        self.modules = []
        for se in _as_list(params.get("sampling")):
            t = str(se.get("type", "profiles")).lower()
            if t == "profiles":
                self.modules.append(_ProfilesModule(se, self))
            elif t == "vdf":
                self.modules.append(_VDFModule(se, self))
            elif t == "fieldyr":
                self.modules.append(_FieldYRModule(se, self))
            else:
                raise ValueError(
                    f"RegionSampling: unknown sampling type {t!r}")

    def inside(self, r):
        return np.all((r >= self.lo) & (r < self.hi), axis=1)


@PluginFactory.register("RegionSampling")
class RegionSampling(PluginBase):
    """Per-region profile / VDF / fieldYR sampler (reference schema)."""

    def __init__(self, params=None):
        super().__init__(params)
        self._region_params = _as_list(self.params.get("region"))
        self.regions = []

    def init(self, sim):
        box = np.asarray(sim.box, float)
        self.regions = [
            _Region(i + 1, rp, box)
            for i, rp in enumerate(self._region_params)
        ]
        for reg in self.regions:
            for m in reg.modules:
                m.init(sim)

    def end_step(self, sim, step):
        if not self.regions:
            return
        from ls1_mardyn_tpu.ops.integrator import _body_omega

        mol = sim.engine.mol
        valid = np.asarray(mol.valid).astype(bool)
        r = np.asarray(mol.r)[valid]
        v = np.asarray(mol.v)[valid]
        cid = np.asarray(mol.cid)[valid]
        forces = sim.engine.forces
        F = (np.asarray(forces.F)[valid] if forces is not None
             else np.zeros_like(v))
        pp = sim.pp
        rot_dof = np.asarray(pp.rot_dof)[cid].astype(float)
        w = np.asarray(_body_omega(pp, mol.cid, mol.q, mol.L))[valid]
        iw2 = (np.asarray(pp.inertia)[cid] * w * w).sum(1)
        st_all = dict(r=r, v=v, F=F, cid=cid,
                      rot_dof=rot_dof, iw2=iw2)
        for reg in self.regions:
            m_in = reg.inside(r)
            st = {k: (val[m_in] if isinstance(val, np.ndarray) else val)
                  for k, val in st_all.items()}
            for mod in reg.modules:
                mod.sample(st)
                mod.maybe_write(sim, step)
