"""Widom insertion sanity: in the ideal-gas limit mu_ex -> 0; in a
dense LJ fluid mu_ex is positive (repulsive cores dominate)."""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _run(rho, tmp_path, steps=4):
    tmp_path.mkdir(parents=True, exist_ok=True)
    os.chdir(tmp_path)
    n = 200
    L = (n / rho) ** (1 / 3)
    cfg = XMLConfig(
        timestep=0.002,
        temperature=1.5,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        plugins=[PluginSpec("WidomInsertion", {
            "cid": "1", "insertions": "512", "samplefrequency": "1",
            "writefrequency": "2", "temperature": "1.5",
            "outputprefix": "widom",
        })],
    )
    sim = MDSimulation(cfg)
    sim.run(steps=steps, print_every=0)
    w = [p for p in sim._plugins if p.__class__.__name__ == "WidomInsertion"][0]
    return w.mu_excess


def test_widom_dilute_vs_dense(tmp_path):
    mu_dilute = _run(0.02, tmp_path / "a")
    mu_dense = _run(0.7, tmp_path / "b")
    # dilute: near-ideal, |mu_ex| ~ 0.  dense (rho=0.7, T=1.5): the
    # attractive well dominates, mu_ex is strongly negative (literature
    # LJ EOS gives ~ -2 at this state point)
    assert abs(mu_dilute) < 0.5
    assert mu_dense < mu_dilute - 0.3
    assert (tmp_path / "b" / "widom.widom").exists()


def test_widom_block_stats_and_cv(tmp_path):
    """Block-averaged error bars + restricted control volume
    (ChemicalPotential's restricted CV; Domain.cpp:820-827 accumulator
    statistics)."""
    tmp_path.mkdir(parents=True, exist_ok=True)
    os.chdir(tmp_path)
    n, rho = 200, 0.3
    L = (n / rho) ** (1 / 3)
    cfg = XMLConfig(
        timestep=0.002,
        temperature=1.5,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        plugins=[PluginSpec("WidomInsertion", {
            "cid": "1", "insertions": "128", "samplefrequency": "1",
            "writefrequency": "2", "temperature": "1.5",
            "outputprefix": "widom",
            "cv": {"x0": "1.0", "x1": str(L / 2)},
        })],
    )
    sim = MDSimulation(cfg)
    sim.run(steps=8, print_every=0)
    w = [p for p in sim._plugins
         if p.__class__.__name__ == "WidomInsertion"][0]
    # 8 steps / writefrequency 2 -> 4 completed blocks
    assert len(w._block_means) == 4
    assert np.isfinite(w.stderr_mu) and w.stderr_mu >= 0
    lines = open("widom.widom").read().splitlines()
    assert lines[0].startswith("#step\tsamples\tmu_block")
    assert len(lines) == 1 + 4
    # every data row: finite mu_block/mu_running
    for row in lines[1:]:
        _, _, mb, mr, _ = row.split("\t")
        assert np.isfinite(float(mb)) and np.isfinite(float(mr))
