"""GammaWriter / VISWriter / PovWriter / DecompWriter smoke + physics."""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _cfg(n=216, rho=0.4, T=1.0, plugins=(), force_mode="cells"):
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        output_plugins=[PluginSpec(nm, dict(pr)) for nm, pr in plugins],
    ), force_mode


def test_writers_produce_files(tmp_path):
    os.chdir(tmp_path)
    cfg, fm = _cfg(plugins=[
        ("GammaWriter", {"writefrequency": "2", "outputprefix": "g"}),
        ("VISWriter", {"writefrequency": "2", "outputprefix": "vis"}),
        ("PovWriter", {"writefrequency": "4", "outputprefix": "pov"}),
        ("DecompWriter", {"writefrequency": "4", "outputprefix": "dec"}),
    ])
    sim = MDSimulation(cfg, force_mode=fm)
    sim.run(steps=4, print_every=0)
    assert (tmp_path / "g.gamma").exists()
    assert (tmp_path / "vis.vis").exists()
    assert (tmp_path / "pov_4.pov").exists()
    assert (tmp_path / "dec.decomp").exists()
    gl = (tmp_path / "g.gamma").read_text().splitlines()
    assert len(gl) >= 3
    # isotropic bulk: gamma should be small relative to P*L
    vals = [abs(float(x.split()[1])) for x in gl[1:]]
    assert all(np.isfinite(vals))


def test_gamma_zero_for_isotropic_bulk(tmp_path):
    """In a homogeneous bulk fluid the average surface tension vanishes
    (statistically); check |gamma| is small vs the pressure scale."""
    os.chdir(tmp_path)
    cfg, fm = _cfg(n=500, rho=0.5, plugins=[
        ("GammaWriter", {"writefrequency": "1", "outputprefix": "g"}),
    ])
    sim = MDSimulation(cfg, force_mode=fm)
    gv = sim.run(steps=30, print_every=0)
    lines = (tmp_path / "g.gamma").read_text().splitlines()[1:]
    gam = np.array([float(x.split()[2]) for x in lines])  # running avg
    p = float(gv.pressure)
    L = sim.box[1]
    # gamma_avg should be much smaller than the naive scale p*L/2
    assert abs(gam[-1]) < 0.5 * abs(p) * L


def test_mmpld_writer_format(tmp_path):
    import struct

    os.chdir(tmp_path)
    cfg, fm = _cfg(n=100, plugins=[
        ("MmpldWriter", {"writecontrol": {"writefrequency": "2", "start": "0",
                                          "stop": "100"},
                         "outputprefix": "mega"}),
    ])
    sim = MDSimulation(cfg, force_mode=fm)
    sim.run(steps=4, print_every=0)
    raw = (tmp_path / "mega.mmpld").read_bytes()
    assert raw[:6] == b"MMPLD\x00"
    version, nframes = struct.unpack_from("<HI", raw, 6)
    assert version == 100
    assert nframes == 2
    # first frame offset from the seek table
    seek0 = struct.unpack_from("<Q", raw, 12 + 48)[0]
    nlists = struct.unpack_from("<I", raw, seek0)[0]
    assert nlists == 1
    vt, ct = struct.unpack_from("<BB", raw, seek0 + 4)
    assert (vt, ct) == (1, 0)
    count = struct.unpack_from("<Q", raw, seek0 + 4 + 2 + 8)[0]
    assert count == 100
