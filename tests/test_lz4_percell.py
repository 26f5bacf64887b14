"""Native LZ4 frame codec + PerCellGenerator (VERDICT r1 small gaps:
src/plugins/compression.{h,cpp} lz4 mode, src/io/PerCellGenerator.h:14)."""

import os

import numpy as np
import pytest

from ls1_mardyn_tpu.io.compression import open_compressed
from ls1_mardyn_tpu.io.generators import per_cell
from ls1_mardyn_tpu.native import get_lz4


@pytest.mark.skipif(get_lz4() is None, reason="no g++ toolchain")
def test_lz4_roundtrip(tmp_path):
    os.chdir(tmp_path)
    rng = np.random.default_rng(1)
    blobs = [
        b"",
        b"a",
        b"compressible " * 5000,
        rng.bytes(70000),
        rng.bytes(5 * 1024 * 1024),  # multi-block (4 MiB block size)
    ]
    for i, data in enumerate(blobs):
        p = f"b{i}.lz4"
        with open_compressed(p, "wb") as f:
            f.write(data)
        with open_compressed(p, "rb") as f:
            assert f.read() == data, i
    # compressible data actually compresses
    with open_compressed("c.lz4", "wb") as f:
        f.write(b"compressible " * 5000)
    assert os.path.getsize("c.lz4") < 0.1 * 13 * 5000
    # text mode
    with open_compressed("t.lz4", "wt") as f:
        f.write("x\n" * 100)
    with open_compressed("t.lz4", "rt") as f:
        assert f.read() == "x\n" * 100


def test_per_cell_generator_counts():
    box = [10.0, 10.0, 10.0]
    data = per_cell(3, box, 2.5, 1.0)
    dims = np.floor(np.asarray(box) / 2.5).astype(int)  # 4x4x4
    assert len(data.mid) == 3 * int(np.prod(dims))
    cl = np.asarray(box) / dims
    c3 = np.clip((data.r / cl).astype(int), 0, dims - 1)
    lin = (c3[:, 2] * dims[1] + c3[:, 1]) * dims[0] + c3[:, 0]
    counts = np.bincount(lin, minlength=int(np.prod(dims)))
    assert (counts == 3).all()  # EXACTLY numMoleculesPerCell each

    # numPerCell=0 + generateAtLeastTwoParticles
    d2 = per_cell(0, box, 2.5, 1.0)
    assert len(d2.mid) == 2


def test_per_cell_generator_via_xml(tmp_path):
    os.chdir(tmp_path)
    import jax.numpy as jnp

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig

    cfg = XMLConfig(
        timestep=0.002, temperature=1.0,
        box=np.array([8.0, 8.0, 8.0]), cutoff=2.5, lj_cutoff=2.5,
        generator=PluginSpec("PerCellGenerator",
                             {"numMoleculesPerCell": "4",
                              "initTemperature": "1.0"}),
    )
    sim = MDSimulation(cfg, dtype=jnp.float64)
    gv = sim.run(steps=3, print_every=0)
    assert int(float(gv.n)) == 4 * 27  # 3x3x3 cells at cutoff 2.5
    assert np.isfinite(float(gv.upot))
