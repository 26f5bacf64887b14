"""Binary checkpoint format: roundtrip + driver restart + byte-level
parity with the reference's record layout (BinaryReader.cpp:163-240)."""

import os
import struct

import numpy as np

from ls1_mardyn_tpu.io.binary_io import (
    read_binary_checkpoint,
    write_binary_checkpoint,
)
from ls1_mardyn_tpu.io.generators import cubic_grid


def test_binary_roundtrip(tmp_path):
    data = cubic_grid(100, [6.0, 6.0, 6.0], 1.0, seed=9)
    data.q = np.random.default_rng(0).normal(size=(100, 4))
    data.q /= np.linalg.norm(data.q, axis=1, keepdims=True)
    data.L = np.random.default_rng(1).normal(size=(100, 3))
    dpath = str(tmp_path / "cp.dat")
    hpath = str(tmp_path / "cp.header.xml")
    write_binary_checkpoint(dpath, hpath, data)
    back = read_binary_checkpoint(dpath, hpath, components=data.components)
    np.testing.assert_array_equal(back.mid, data.mid)
    np.testing.assert_array_equal(back.cid, data.cid)
    np.testing.assert_allclose(back.r, data.r, atol=0)
    np.testing.assert_allclose(back.v, data.v, atol=0)
    np.testing.assert_allclose(back.q, data.q, atol=0)
    np.testing.assert_allclose(back.L, data.L, atol=0)
    assert np.allclose(back.box, data.box)


def test_binary_record_layout_matches_reference(tmp_path):
    """First record must be exactly u64 id, u32 cid(1-based), 13 f64 LE
    (the layout BinaryReader.cpp reads field by field)."""
    data = cubic_grid(3, [5.0, 5.0, 5.0], 0.8, seed=2)
    dpath = str(tmp_path / "cp.dat")
    write_binary_checkpoint(dpath, str(tmp_path / "h.xml"), data)
    raw = open(dpath, "rb").read()
    assert len(raw) == 3 * (8 + 4 + 13 * 8)
    rid, cid = struct.unpack_from("<QI", raw, 0)
    x, y, z = struct.unpack_from("<3d", raw, 12)
    assert rid == data.mid[0]
    assert cid == data.cid[0] + 1
    np.testing.assert_allclose([x, y, z], data.r[0])


def test_driver_binary_restart(tmp_path):
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.xml_config import read_xml_config

    cfg_path = "/root/reference/examples/Argon/200K_18mol_l/config.xml"
    sim = MDSimulation.from_xml(cfg_path)
    sim.run(steps=3, print_every=0)
    sim.write_checkpoint(str(tmp_path / "bin.dat"), binary=True)
    assert (tmp_path / "bin.dat.header.xml").exists()

    cfg2 = read_xml_config(cfg_path)
    cfg2.phasespace_file_type = "binary"
    cfg2.phasespace_file = str(tmp_path / "bin.dat")
    cfg2.phasespace_header = str(tmp_path / "bin.dat.header.xml")
    sim2 = MDSimulation(cfg2)
    n1 = int(sim.molecules().num_valid())
    assert int(sim2.mol.num_valid()) == n1
    gv = sim2.run(steps=1, print_every=0)
    assert np.isfinite(float(gv.upot))
