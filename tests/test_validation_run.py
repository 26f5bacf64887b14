"""Tier-3 validation runner (SURVEY.md section 4 /
validation/validationRun/validationRun.py): run the same scene for 25
steps through two independent force paths and diff the plugin outputs
(ResultWriter time series), exactly how the reference diffs old-vs-new
binaries."""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _cfg(outprefix):
    n, rho, T = 343, 0.55, 1.1
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        output_plugins=[
            PluginSpec(
                "ResultWriter",
                {"writefrequency": "1", "outputprefix": outprefix},
            )
        ],
    )


def _series(path):
    rows = []
    for line in open(path):
        if line.lstrip().startswith("#"):
            continue
        rows.append([float(x) for x in line.split()])
    return np.asarray(rows)


def test_force_paths_agree_over_25_steps(tmp_path):
    """cells (LegacyCellProcessor analogue) vs Pallas kernel: identical
    scene, 25 NVT steps, ResultWriter outputs must match."""
    os.chdir(tmp_path)
    sims = {}
    for mode in ("cells", "pallas"):
        sim = MDSimulation(_cfg(f"res_{mode}"), force_mode=mode)
        sim.run(steps=25, print_every=0)
        sims[mode] = sim
    a = _series(tmp_path / "res_cells.res")
    b = _series(tmp_path / "res_pallas.res")
    assert a.shape == b.shape and a.shape[0] == 25
    # columns: step time U_pot U_pot_avg p p_avg ... -- trajectories
    # must track each other to f32 accumulation noise over 25 steps
    np.testing.assert_allclose(a[:, 2], b[:, 2], rtol=5e-4)  # U_pot
    np.testing.assert_allclose(a[:, 4], b[:, 4], rtol=5e-3)  # p
