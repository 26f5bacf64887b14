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


def test_mpi_checkpoint_format_roundtrip(tmp_path):
    """MPICheckpointWriter .dat byte format
    (MPICheckpointWriter.cpp:330-393): magic + 64-byte header +
    ICRVQD/BB sections + packed uint64/float64 records; roundtrips
    through read_mpi_checkpoint, and the header bytes match the
    reference layout."""
    import numpy as np

    from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
    from ls1_mardyn_tpu.io.binary_io import (
        MPI_CKPT_MAGIC,
        read_mpi_checkpoint,
        write_mpi_checkpoint,
    )
    from ls1_mardyn_tpu.models.components import Component

    rng = np.random.default_rng(5)
    n = 37
    c = Component(cid=0)
    c.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0, 2.5, True)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    data = PhaseSpaceData(
        components=[c], mixing_xi=np.ones((1, 1)),
        mixing_eta=np.ones((1, 1)), eps_rf=1e10,
        box=np.array([9.0, 10.0, 11.0]), temperature=1.0,
        current_time=0.0,
        mid=rng.permutation(n).astype(np.int64) + 1,
        cid=rng.integers(0, 1, n).astype(np.int32),
        r=rng.uniform(0, 9, (n, 3)), v=rng.normal(0, 1, (n, 3)),
        q=q, L=rng.normal(0, 0.1, (n, 3)),
    )
    path = tmp_path / "ckpt.restart.dat"
    write_mpi_checkpoint(path, data)
    raw = path.read_bytes()
    assert raw.startswith(MPI_CKPT_MAGIC)
    assert raw[52:56] == np.int32(0x0A0B0C0D).tobytes()  # endianness
    assert raw[64:71] == b"ICRVQD\0"
    assert raw[71:74] == b"BB\0"
    # per-molecule record = 2*uint64 + 13*double = 120 bytes
    assert len(raw) == 64 + 7 + 3 + 8 + 64 + n * 120

    back = read_mpi_checkpoint(path)
    np.testing.assert_array_equal(back.mid, data.mid)
    np.testing.assert_array_equal(back.cid, data.cid)
    np.testing.assert_array_equal(back.r, data.r)
    np.testing.assert_array_equal(back.v, data.v)
    np.testing.assert_array_equal(back.q, data.q)
    np.testing.assert_array_equal(back.L, data.L)
    np.testing.assert_array_equal(back.box, data.box)
