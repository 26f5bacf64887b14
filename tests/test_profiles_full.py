"""Full profile system: SpatialProfile (cartesian 3-D + cylinder,
reference profile set) and RegionSampling (per-region profiles / VDF /
fieldYR modules).

Reference formats: src/plugins/SpatialProfile.cpp + plugins/profiles/
(.NDpr/.Temppr/.V3Dpr/.VAbspr/_1D-Y.Vipr/.Vipr), and
src/plugins/NEMD/RegionSampling.cpp (scalquant_/vectquant_ .dat files).
"""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _cfg(n=216, rho=0.4, T=1.0, plugins=(), box=None):
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array(box if box is not None else [L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec(
            name="CubicGridGenerator", params={"numMolecules": str(n)}
        ),
        plugins=[PluginSpec(name=nm, params=pr) for nm, pr in plugins],
    )


def test_spatial_profile_cartesian_full_set(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(plugins=[(
        "SpatialProfile",
        {"mode": "cartesian", "x": "1", "y": "8", "z": "6",
         "writefrequency": "8",
         "timesteps": {"init": "1", "recording": "2"},
         "outputprefix": "cart",
         "profiles": {"density": "1", "temperature": "1",
                      "velocity": "1", "velocity3d": "1",
                      "virial": "1", "virial2D": "1"}},
    )])
    sim = MDSimulation(cfg)
    sim.run(steps=8, print_every=0)
    files = os.listdir(".")
    for suffix in (".NDpr", ".Temppr", ".VAbspr", ".V3Dpr",
                   "_1D-Y.Vipr", ".Vipr"):
        assert any(f.startswith("cart") and f.endswith(suffix)
                   for f in files), (suffix, files)
    # density integral over the 1x8x6 grid == N
    nd = next(f for f in files if f.endswith(".NDpr"))
    lines = open(nd).read().splitlines()
    vals = []
    for ln in lines[6:]:
        vals.extend(float(x) for x in ln.split()[1:])
    seg_vol = float(sim.volume) / (8 * 6)
    np.testing.assert_allclose(sum(vals) * seg_vol, 216, rtol=1e-6)
    # local temperature is near the thermostat target in filled bins
    tp = next(f for f in files if f.endswith(".Temppr"))
    tvals = []
    for ln in open(tp).read().splitlines()[7:]:
        tvals.extend(float(x) for x in ln.split()[1:])
    tvals = np.array(tvals)
    assert 0.2 < tvals[tvals > 0].mean() < 3.0


def test_spatial_profile_cylinder(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(plugins=[(
        "SpatialProfile",
        {"mode": "cylinder", "r": "4", "h": "5", "phi": "1",
         "writefrequency": "4",
         "timesteps": {"init": "1", "recording": "1"},
         "outputprefix": "cyl",
         "profiles": {"density": "1"}},
    )])
    sim = MDSimulation(cfg)
    sim.run(steps=4, print_every=0)
    files = [f for f in os.listdir(".") if f.startswith("cyl")]
    nd = next(f for f in files if f.endswith(".NDpr"))
    lines = open(nd).read().splitlines()
    # r-label header row + 5 h rows, 4 r entries each
    data_rows = [ln.split() for ln in lines[6:]]
    assert len(data_rows) == 5
    assert all(len(row) == 1 + 4 for row in data_rows)
    dens = np.array([[float(x) for x in row[1:]] for row in data_rows])
    # equal-volume ring segments: density roughly uniform for a
    # homogeneous fluid (no zero bins inside the cylinder)
    assert (dens > 0).all()
    assert dens.max() / dens.min() < 5.0


def test_region_sampling_profiles(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(plugins=[(
        "RegionSampling",
        {"region": {
            "coords": {"lcx": "0.0", "lcy": "0.0", "lcz": "0.0",
                       "ucx": "box", "ucy": "box", "ucz": "box"},
            "sampling": {"type": "profiles",
                         "control": {"start": "0", "frequency": "6",
                                     "stop": "1000000"},
                         "subdivision": {"type": "number",
                                         "number": "10"}},
        }},
    )])
    sim = MDSimulation(cfg)
    sim.run(steps=6, print_every=0)
    files = os.listdir(".")
    for d in ("all", "pos", "neg"):
        assert "scalquant_%s_reg1_TS%09d.dat" % (d, 6) in files, files
        assert "vectquant_%s_reg1_TS%09d.dat" % (d, 6) in files, files
    scal = open("scalquant_all_reg1_TS%09d.dat" % 6).read().splitlines()
    hdr = scal[0]
    for col in ("DOF_total[0]", "rho[1]", "Ekin_drift[0]", "T_rot[1]"):
        assert col in hdr
    assert len(scal) == 1 + 10
    # density column (rho[0] = all components): mean over bins matches
    # the global density (sampled every step over 6 steps)
    cols = hdr.split()
    rho_idx = cols.index("rho[0]")
    rho = np.array([float(ln.split()[rho_idx]) for ln in scal[1:]])
    global_rho = 216 / float(sim.volume)
    np.testing.assert_allclose(rho.mean(), global_rho, rtol=0.05)
    # temperature column near target where bins are filled
    t_idx = cols.index("T[0]")
    T = np.array([float(ln.split()[t_idx]) for ln in scal[1:]])
    assert 0.2 < T[T > 0].mean() < 3.0


def test_region_sampling_vdf_and_fieldyr(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(plugins=[(
        "RegionSampling",
        {"region": {
            "coords": {"lcx": "0.0", "lcy": "0.0", "lcz": "0.0",
                       "ucx": "box", "ucy": "box", "ucz": "box"},
            "sampling": [
                {"type": "VDF",
                 "control": {"start": "0", "frequency": "4",
                             "stop": "1000000"},
                 "subdivision": {"type": "number", "number": "4"},
                 "discretizations": {
                     "discretization": {"cid": "1",
                                        "numclasses": "16",
                                        "maxvalue": "6.0"}}},
                {"type": "fieldYR",
                 "outputfile": {"type": "ASCII",
                                "prefix": "fieldYR"},
                 "control": {"start": "0", "frequency": "4",
                             "stop": "1000000"},
                 "subdivision": [
                     {"dim": "y", "type": "number", "number": "5"},
                     {"dim": "r", "type": "number", "number": "3"}]},
            ],
        }},
    )])
    sim = MDSimulation(cfg)
    sim.run(steps=4, print_every=0)
    files = os.listdir(".")
    # VDF: 12 data structures + classes per cid + bin coords
    assert "VDF_reg1_cid1_pjy_abs_TS%09d.dat" % 4 in files, files
    assert "VDF_reg1_cid1_njy_abs_TS%09d.dat" % 4 in files
    assert "VDF_reg1_cid1_classes_TS%09d.dat" % 4 in files
    assert "VDF_reg1_bin_coords_TS%09d.dat" % 4 in files
    with open("VDF_reg1_cid1_pjy_abs_TS%09d.dat" % 4, "rb") as f:
        raw = f.read()
    ncls = np.frombuffer(raw[:4], np.uint32)[0]
    nbins = np.frombuffer(raw[4:8], np.uint32)[0]
    assert (ncls, nbins) == (16, 4)
    hist = np.frombuffer(raw[8:], np.uint64).reshape(4, 16)
    # every molecule lands in one (pjy|njy) abs histogram each step
    with open("VDF_reg1_cid1_njy_abs_TS%09d.dat" % 4, "rb") as f:
        hist2 = np.frombuffer(f.read()[8:], np.uint64).reshape(4, 16)
    assert 0 < hist.sum() + hist2.sum() <= 4 * 216
    # fieldYR: 3 sections, 3 shells x 5 bins each
    for sec in range(3):
        fn = "fieldYR_sec%d_reg1_TS%09d.dat" % (sec, 4)
        assert fn in files, files
        rows = open(fn).read().splitlines()
        assert len(rows) == 3
        assert all(len(r.split()) == 5 for r in rows)
