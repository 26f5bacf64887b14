"""SpatialProfile: the reference's full profile system.

Reference: /root/reference/src/plugins/SpatialProfile.cpp (417 LoC) +
/root/reference/src/plugins/profiles/ (DensityProfile,
VelocityAbsProfile, Velocity3dProfile, TemperatureProfile, DOFProfile,
KineticProfile, VirialProfile, Virial2DProfile).

Semantics reproduced:
  - modes: ``cartesian`` (x*y*z grid over the box) and ``cylinder``
    (r^2-linear radial bins * h * phi around the (x,z)-centre axis,
    SpatialProfile.cpp:163-186 -- equal-volume ring segments; molecules
    outside R2max are skipped, getCylUID:352-414);
  - uID layouts identical to getCartesianUID/getCylUID (the output
    matrix routines depend on them);
  - profile selection via <profiles><density>1</density>...; when none
    are selected, ALL profiles are written (readXML:88-94); dependent
    profiles are created automatically (density for velocity/virial,
    DOF+kinetic for temperature/virial2D);
  - cadence: <timesteps><init> skips the first steps,
    <timesteps><recording> records every Nth step; <writefrequency>
    writes accumulated profiles and resets (endStep:229-328);
  - <profiledComponent> filters to one component (1-based) or "all";
  - output files and formats: .NDpr (density), .VAbspr, .V3Dpr,
    .Temppr, _1D-Y.Vipr (1-D virial pressure), .Vipr (2-D virial),
    each with the reference's header + writeKartMatrix/writeCylMatrix
    layout (ProfileBase.cpp:16-76).

Sampling is vectorized numpy over the device state read back at the
recording cadence (host-side observation, like all writers here).
"""

from __future__ import annotations

import numpy as np

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory


def _flag(params, key, default=False):
    v = params.get(key)
    if v is None:
        return default
    try:
        return bool(int(float(v)))
    except (TypeError, ValueError):
        return str(v).strip().lower() in ("true", "yes", "on")


@PluginFactory.register("SpatialProfile")
class SpatialProfile(PluginBase):
    """Cartesian / cylinder binned profiles of density, velocity,
    temperature, and virial pressure (full reference profile set)."""

    def __init__(self, params=None):
        super().__init__(params)
        p = self.params
        self.mode = str(p.get("mode", "cartesian")).strip().lower()
        if self.mode not in ("cartesian", "cylinder"):
            raise ValueError(
                f"SpatialProfile: invalid mode {self.mode!r} "
                "(cartesian/cylinder)")
        if self.mode == "cylinder":
            self.units = (
                int(float(p.get("r", 1))),
                int(float(p.get("h", 1))),
                int(float(p.get("phi", 1))),
            )
        else:
            self.units = (
                int(float(p.get("x", 1))),
                int(float(p.get("y", 1))),
                int(float(p.get("z", 1))),
            )
        ts = p.get("timesteps", {}) if isinstance(
            p.get("timesteps"), dict) else {}
        self.init_statistics = int(float(ts.get("init", 1)))
        # "samplefrequency" is the pre-round-5 1-D shorthand's name for
        # the recording cadence
        self.recording_timesteps = max(1, int(float(
            ts.get("recording", p.get("samplefrequency", 1)))))
        comp = str(p.get("profiledComponent", "all")).strip()
        self.profiled_comp = None if comp in ("", "all") else int(comp)

        prof = p.get("profiles", {}) if isinstance(
            p.get("profiles"), dict) else {}
        dens = _flag(prof, "density")
        vel = _flag(prof, "velocity")
        vel3 = _flag(prof, "velocity3d")
        temp = _flag(prof, "temperature")
        viri = _flag(prof, "virial")
        vir2 = _flag(prof, "virial2D")
        if not any((dens, vel, vel3, temp, viri, vir2)):
            dens = vel = vel3 = temp = viri = vir2 = True  # ALL
        # dependencies (readXML:97-129): density feeds velocity/virial;
        # DOF+kinetic feed temperature/virial2D
        self.want = dict(
            density=dens or vel or vel3 or viri or vir2,
            velocity=vel, velocity3d=vel3, temperature=temp,
            virial=viri, virial2d=vir2,
            dof=temp or vir2, kinetic=temp or vir2,
        )

        # legacy 1-D shorthand (<axis>/<bins>) from the pre-round-5
        # implementation keeps working: bins along one axis
        if "axis" in p or "bins" in p:
            ax = {"x": 0, "y": 1, "z": 2}.get(
                str(p.get("axis", "y")).lower(), 1)
            nb = int(float(p.get("bins", 100)))
            u = [1, 1, 1]
            u[ax] = nb
            self.units = tuple(u)
            self.mode = "cartesian"

    # -- uID helpers (must match getCartesianUID/getCylUID) -----------

    def _setup(self, sim):
        self.box = np.asarray(sim.box, float)
        n0, n1, n2 = self.units
        if self.mode == "cylinder":
            min_xz = min(self.box[0], self.box[2])
            self.r2max = 0.24 * min_xz * min_xz
            self.inv = np.array([
                n0 / self.r2max,
                n1 / self.box[1],
                n2 / (2 * np.pi),
            ])
            self.segment_volume = np.pi / (
                self.inv[0] * self.inv[1] * n2)
            self.centre = np.array(
                [0.5 * self.box[0], 0.0, 0.5 * self.box[2]])
        else:
            self.inv = np.asarray(self.units) / self.box
            self.segment_volume = float(np.prod(self.box)
                                        / np.prod(self.units))
        self.n_uids = int(n0 * n1 * n2)

    def _uids(self, r):
        """[N] uIDs (or -1 = skip) for positions r."""
        n0, n1, n2 = self.units
        if self.mode == "cylinder":
            xc = r[:, 0] - self.centre[0]
            yc = r[:, 1] - self.centre[1]
            zc = r[:, 2] - self.centre[2]
            r2 = xc * xc + zc * zc
            phi = np.arctan2(zc, xc)
            phi = np.where(phi < 0.0, phi + 2 * np.pi, phi)
            run = np.floor(r2 * self.inv[0]).astype(np.int64)
            hun = np.floor(yc * self.inv[1]).astype(np.int64)
            pun = np.floor(phi * self.inv[2]).astype(np.int64)
            ok = (run >= 0) & (run < n0) & (hun >= 0) & (hun < n1) \
                & (pun >= 0) & (pun < n2)
            uid = hun * (n0 * n2) + run * n2 + pun
            return np.where(ok, uid, -1)
        xun = np.floor(r[:, 0] * self.inv[0]).astype(np.int64)
        yun = np.floor(r[:, 1] * self.inv[1]).astype(np.int64)
        zun = np.floor(r[:, 2] * self.inv[2]).astype(np.int64)
        xun = np.clip(xun, 0, n0 - 1)
        yun = np.clip(yun, 0, n1 - 1)
        zun = np.clip(zun, 0, n2 - 1)
        return xun * (n1 * n2) + yun * n2 + zun

    # -- lifecycle ----------------------------------------------------

    def init(self, sim):
        self._setup(sim)
        self._reset()
        self._step_of_last_write = 0

    def _reset(self):
        n = self.n_uids
        self.acc = dict(
            number=np.zeros(n),
            v3=np.zeros((n, 3)),
            vabs=np.zeros(n),
            dof=np.zeros(n),
            kinetic=np.zeros(n),
            vi3=np.zeros((n, 3)),
        )
        self.datasets = 0

    def end_step(self, sim, step):
        if step < self.init_statistics:
            return
        if step % self.recording_timesteps == 0:
            self._record(sim)
        if step % self.write_frequency == 0 and self.datasets:
            self._output(sim, step)
            self._reset()

    def _record(self, sim):
        import jax.numpy as jnp

        from ls1_mardyn_tpu.ops.integrator import _body_omega

        mol = sim.engine.mol
        valid = np.asarray(mol.valid).astype(bool)
        cid = np.asarray(mol.cid)[valid]
        if self.profiled_comp is not None:
            sel = cid == (self.profiled_comp - 1)
        else:
            sel = slice(None)
        r = np.asarray(mol.r)[valid][sel]
        v = np.asarray(mol.v)[valid][sel]
        cid = cid[sel]
        uid = self._uids(r)
        ok = uid >= 0
        uid = uid[ok]
        v = v[ok]
        cid = cid[ok]
        nb = self.n_uids
        pp = sim.pp
        mass = np.asarray(pp.mass)[cid]

        self.acc["number"] += np.bincount(uid, minlength=nb)
        for d in range(3):
            self.acc["v3"][:, d] += np.bincount(
                uid, weights=v[:, d], minlength=nb)
        self.acc["vabs"] += np.bincount(
            uid, weights=np.sqrt((v * v).sum(1)), minlength=nb)
        if self.want["dof"] or self.want["kinetic"]:
            rot_dof = np.asarray(pp.rot_dof)[cid]
            self.acc["dof"] += np.bincount(
                uid, weights=3.0 + rot_dof, minlength=nb)
            mv2 = mass * (v * v).sum(1)
            # rotational kinetic term I w^2 from the quaternion state
            w = np.asarray(_body_omega(
                pp, mol.cid, mol.q, mol.L))[valid][sel][ok]
            iw2 = (np.asarray(pp.inertia)[cid] * w * w).sum(1)
            self.acc["kinetic"] += np.bincount(
                uid, weights=mv2 + iw2, minlength=nb)
        if self.want["virial"] or self.want["virial2d"]:
            forces = sim.engine.forces
            if forces is not None and forces.Vi is not None:
                vi = np.asarray(forces.Vi)[valid][sel][ok]
                for d in range(3):
                    self.acc["vi3"][:, d] += np.bincount(
                        uid, weights=vi[:, d], minlength=nb)
        self.datasets += 1

    # -- output (reference file formats) ------------------------------

    def _matrix(self, f, entry):
        """writeKartMatrix / writeCylMatrix layouts
        (ProfileBase.cpp:16-76)."""
        n0, n1, n2 = self.units
        if self.mode == "cylinder":
            for rr in range(n0):
                f.write("%.6g \t" % (
                    0.5 * (np.sqrt(rr + 1) + np.sqrt(rr))
                    / np.sqrt(self.inv[0])))
            f.write("\n")
            for h in range(n1):
                f.write("%.6g  \t" % ((h + 0.5) / self.inv[1]))
                for phi in range(n2):
                    for rr in range(n0):
                        uid = h * (n0 * n2) + rr * n2 + phi
                        entry(uid, f)
                f.write("\n")
        else:
            for z in range(n2):
                f.write("%.6g  \t" % ((z + 0.5) / self.inv[2]))
            f.write("\n")
            for y in range(n1):
                f.write("%.6g  \t" % ((y + 0.5) / self.inv[1]))
                for z in range(n2):
                    for x in range(n0):
                        uid = x * (n1 * n2) + y * n2 + z
                        entry(uid, f)
                f.write("\n")

    def _header(self, f, what):
        f.write("//Segment volume: %g\n//Accumulated data sets: %d\n"
                "//Local profile of %s. Output file generated by the "
                "\"%s\" method, plugins/profiles. \n"
                % (self.segment_volume, self.datasets, *what))
        f.write("// \t dX \t dY \t dZ \n")
        f.write("\t%g\t%g\t%g\n" % tuple(1.0 / self.inv))

    def _output(self, sim, step):
        prefix = "%s_%d" % (self.output_prefix, step)
        num = self.acc["number"]
        nds = np.maximum(num, 1)

        if self.want["density"]:
            with open(prefix + ".NDpr", "w") as f:
                self._header(f, ("the number density", "DensityProfile"))
                f.write("0 \t")
                self._matrix(f, lambda u, fo: fo.write("%.6g\t" % (
                    num[u] / (self.segment_volume * self.datasets))))
        if self.want["velocity"]:
            with open(prefix + ".VAbspr", "w") as f:
                self._header(
                    f, ("the velocity magnitude", "VelocityAbsProfile"))
                f.write("0 \t")
                self._matrix(f, lambda u, fo: fo.write("%.6g\t" % (
                    self.acc["vabs"][u] / nds[u] if num[u] else 0.0)))
        if self.want["velocity3d"]:
            with open(prefix + ".V3Dpr", "w") as f:
                self._header(f, ("X-Y-Z components of velocity",
                                 "Velocity3dProfile"))
                f.write("0 \t")

                def v3entry(u, fo):
                    for d in range(3):
                        fo.write("%.6g\t" % (
                            self.acc["v3"][u, d] / nds[u]
                            if num[u] else 0.0))
                self._matrix(f, v3entry)
        if self.want["temperature"]:
            with open(prefix + ".Temppr", "w") as f:
                self._header(f, ("the temperature", "TemperatureProfile"))
                f.write("//Temperature expressed by 2Ekin/#DOF\n")
                f.write("0 \t")
                self._matrix(f, lambda u, fo: fo.write("%.6g\t" % (
                    self.acc["kinetic"][u] / self.acc["dof"][u]
                    if self.acc["dof"][u] else 0.0)))
        if self.want["virial"]:
            self._output_virial_1d(sim, prefix)
        if self.want["virial2d"]:
            self._output_virial_2d(sim, prefix)

    def _output_virial_1d(self, sim, prefix):
        """VirialProfile.cpp: per-y-layer partial pressures
        p_d = rho_layer * (T + <Vi_d>) summed over the x/z (or r/phi)
        bins of the layer; one line y, vn-vt, px, py, pz."""
        n0, n1, n2 = self.units
        layer_h = self.box[1] / n1
        if self.mode == "cylinder":
            radius = self.box[0] / 2
            layer_vol = layer_h * np.pi * radius * radius
        else:
            layer_vol = layer_h * self.box[0] * self.box[2]
        T = float(getattr(sim.last_globals, "temperature", 0.0) or 0.0)
        with open(prefix + "_1D-Y.Vipr", "w") as f:
            self._header(f, ("the partial pressures", "VirialProfile"))
            f.write("0 \t\n")
            f.write("# y\tvn-vt\tpx\tpy\tpz\n# \n")
            for y in range(n1):
                hval = (y + 0.5) / self.inv[1]
                if self.mode == "cylinder":
                    uids = np.array([
                        y * (n0 * n2) + rr * n2 + phi
                        for rr in range(n0) for phi in range(n2)
                    ])
                else:
                    uids = np.array([
                        x * (n1 * n2) + y * n2 + z
                        for x in range(n0) for z in range(n2)
                    ])
                ny = self.acc["number"][uids].sum()
                vi = self.acc["vi3"][uids].sum(0)
                if ny > 0:
                    rho = ny / (layer_vol * self.datasets)
                    p = rho * (T + vi / ny)
                    pd = p[1] - 0.5 * (p[0] + p[2])
                else:
                    p = np.zeros(3)
                    pd = 0.0
                f.write("%.6g\t%.6g\t%.6g\t%.6g\t%.6g\n" % (
                    hval, pd, p[0], p[1], p[2]))

    def _output_virial_2d(self, sim, prefix):
        """Virial2DProfile.cpp: per-bin pressure from the local kinetic
        temperature (2Ekin/DOF) and the local virial sum."""
        num = self.acc["number"]
        with open(prefix + ".Vipr", "w") as f:
            self._header(f, ("the local pressure", "Virial2DProfile"))
            f.write("0 \t")

            def entry(u, fo):
                n = num[u]
                dof = self.acc["dof"][u]
                if n and dof:
                    t_loc = self.acc["kinetic"][u] / dof
                    rho = n / (self.segment_volume * self.datasets)
                    vi = self.acc["vi3"][u].sum() / n
                    fo.write("%.6g\t" % (rho * (t_loc + vi / 3.0)))
                else:
                    fo.write("0\t")
            self._matrix(f, entry)

    def finish(self, sim):
        if self.datasets:
            self._output(sim, getattr(sim, "step", 0))
