"""VTK writers, MmspdWriter, ODF plugin, compression wrapper."""

import gzip
import os
import xml.etree.ElementTree as ET

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.compression import open_compressed
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _cfg(n=216, rho=0.4, T=1.0, plugins=()):
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        output_plugins=[PluginSpec(nm, dict(pr)) for nm, pr in plugins],
    )


def test_vtk_writers(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(plugins=[
        ("VTKMoleculeWriter", {"writefrequency": "2", "outputprefix": "m"}),
        ("VTKGridWriter", {"writefrequency": "2", "outputprefix": "g"}),
    ])
    sim = MDSimulation(cfg, force_mode="cells")
    sim.run(steps=2, print_every=0)

    # molecule file: well-formed XML, right point count, finite coords
    tree = ET.parse(tmp_path / "m_2.vtu")
    piece = tree.getroot().find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == 216
    pts = piece.find("Points/DataArray").text.split()
    assert len(pts) == 216 * 3
    assert all(np.isfinite(float(x)) for x in pts[:30])
    names = [d.get("Name") for d in piece.findall("PointData/DataArray")]
    assert set(names) == {"id", "component", "velocity", "force"}

    # grid file: hexahedra, counts sum to N
    tree = ET.parse(tmp_path / "g_grid_2.vtu")
    piece = tree.getroot().find(".//Piece")
    ncell = int(piece.get("NumberOfCells"))
    counts = [
        int(x)
        for x in piece.find("CellData/DataArray").text.split()
    ]
    assert len(counts) == ncell
    assert sum(counts) == 216
    types = set(piece.findall("Cells/DataArray")[-1].text.split())
    assert types == {"12"}  # VTK_HEXAHEDRON


def test_mmspd_writer(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(n=100, plugins=[
        ("MmspdWriter", {"writefrequency": "2", "outputprefix": "mm"}),
    ])
    sim = MDSimulation(cfg, force_mode="cells")
    sim.run(steps=2, print_every=0)
    raw = (tmp_path / "mm.mmspd").read_bytes()
    assert raw.startswith(b"\xef\xbb\xbfMMSPDu 1.0\n")
    lines = raw.decode("utf-8-sig").splitlines()
    hdr = lines[1].split()
    assert hdr[0] == "1" and hdr[8] == "1"  # one box, one component
    # frames: '> N' then N records
    fi = lines.index("> 100")
    rec = lines[fi + 1].split()
    assert len(rec) == 4 and rec[0] == "0"


def test_odf_antiparallel_dipoles(tmp_path):
    """Two tilted antiparallel dipoles: cosPhi1 = cosPhi2 = cos(50deg)
    (ODF.cpp:213-214 sign conventions), coplanar projections ->
    gamma = 0."""
    import jax.numpy as jnp

    from ls1_mardyn_tpu.plugins.odf import odf_histogram
    from ls1_mardyn_tpu.state import MoleculeState

    # dipole axis is body [0,0,1]; tilt both molecules about y so the
    # projections onto the plane perpendicular to r_12 are nonzero:
    # mol1 at 50 deg -> cosPhi1 = cos(50) ~ 0.643 (bin 3 of 4 in cos),
    # mol2 at 130 deg -> cosPhi2 = -r_hat.e2 = +0.643 (bin 3),
    # both projections along +x -> gamma = 0 (bin 0)
    a1, a2 = np.radians(50.0), np.radians(130.0)
    r = np.array([[2.0, 2.0, 2.0], [2.0, 2.0, 4.0]])
    q = np.array(
        [
            [np.cos(a1 / 2), 0, np.sin(a1 / 2), 0],
            [np.cos(a2 / 2), 0, np.sin(a2 / 2), 0],
        ]
    )
    mol = MoleculeState.from_numpy(
        r=r, v=np.zeros_like(r), q=q, dtype=jnp.float64
    )
    hist = np.asarray(
        odf_histogram(mol, np.array([8.0, 8.0, 8.0]), 3.0, (4, 4, 4))
    )
    assert hist.sum() == 2.0  # both pair orders
    assert hist[3, 3, 0] == 2.0


def test_odf_plugin_runs(tmp_path):
    os.chdir(tmp_path)
    # Stockmayer-ish fluid: reuse driver with a dipolar component via
    # the inp-less path is involved; instead just check the plugin on
    # the LJ fluid degrades gracefully (identity quaternions -> all
    # weight at cosPhi extremes, file written)
    cfg = _cfg(n=64, plugins=[
        ("ODF", {"writefrequency": "2", "outputprefix": "odf",
                 "phi1increments": "5", "phi2increments": "5",
                 "gammaincrements": "5", "shellcutoff": "2.5"}),
    ])
    sim = MDSimulation(cfg, force_mode="cells")
    sim.run(steps=2, print_every=0)
    out = (tmp_path / "odf_001.ODF").read_text().splitlines()
    assert out[0].startswith("#")
    rows = [x.split() for x in out[1:]]
    assert len(rows) == 125
    frac = np.array([float(x[4]) for x in rows])
    assert abs(frac.sum() - 1.0) < 1e-9


def test_compression_roundtrip(tmp_path):
    msg = "hello compressed world\n" * 10
    for name, opener in [
        ("a.gz", gzip.open),
        ("b.bz2", None),
        ("c.xz", None),
        ("d.txt", None),
    ]:
        p = str(tmp_path / name)
        with open_compressed(p, "wt") as f:
            f.write(msg)
        with open_compressed(p, "rt") as f:
            assert f.read() == msg
        if opener:  # gzip file really is gzip
            with opener(p, "rt") as f:
                assert f.read() == msg
