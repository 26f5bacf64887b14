"""RMM fast-path engine wiring: MDSimulation routes eligible 1CLJ
scenes onto the dense cell-layout engine (rmm_engine.RMMEngine) and the
result matches the general engine's trajectory.

The reference measures its headline speed on the real driver loop
(/root/reference/src/MarDyn.cpp:262-266); this test pins that the
product driver actually runs the benchmark pipeline (VCP1CLJRMM +
LeapfrogRMM role, Simulation.cpp:819-854) rather than a slower twin.
"""

import os

import numpy as np
import pytest

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
from ls1_mardyn_tpu.rmm_engine import RMMEngine, pick_rmm_grid


def _cfg(n, L, T=1.1, steps=10, plugins=(), ensemble="NVT"):
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        ensemble_type=ensemble,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        output_plugins=list(plugins),
    )


def test_rmm_engine_selected_for_1clj():
    # explicit opt-in at any size
    sim = MDSimulation(_cfg(864, 13.0), force_mode="rmm")
    assert isinstance(sim.engine, RMMEngine), type(sim.engine)
    # auto upgrades the scenes the Pallas kernel path would take
    # (construction only -- no forces are evaluated until run)
    n = 20000
    L = (n / 0.6) ** (1 / 3)
    sim = MDSimulation(_cfg(n, L))
    assert isinstance(sim.engine, RMMEngine), type(sim.engine)


def test_rmm_engine_matches_general_engine(tmp_path):
    os.chdir(tmp_path)
    n, L = 864, 13.0
    rmm = MDSimulation(_cfg(n, L), force_mode="rmm")
    assert isinstance(rmm.engine, RMMEngine)
    gen = MDSimulation(_cfg(n, L), force_mode="pallas")
    assert not isinstance(gen.engine, RMMEngine)
    gv_r = rmm.run(steps=12, print_every=0)
    gv_g = gen.run(steps=12, print_every=0)
    # same physics, same leapfrog + velocity-scaling thermostat; only
    # the state layout and summation orders differ
    assert float(gv_r.upot) == pytest.approx(float(gv_g.upot), rel=2e-5)
    assert float(gv_r.temperature) == pytest.approx(
        float(gv_g.temperature), rel=2e-5
    )
    assert int(gv_r.n) == int(gv_g.n) == n
    # plugin-facing state round-trips through the dense layout
    mol_r = rmm.molecules()
    assert int(np.asarray(mol_r.valid).sum()) == n


def test_rmm_engine_plugin_observers(tmp_path):
    """Observer plugins (ResultWriter at its cadence) work through the
    dense engine's gather-on-read properties."""
    os.chdir(tmp_path)
    n, L = 864, 13.0
    sim = MDSimulation(
        _cfg(n, L, plugins=[
            PluginSpec("ResultWriter", {"writefrequency": "5",
                                        "outputprefix": "rmmtest"}),
        ]),
        force_mode="rmm",
    )
    assert isinstance(sim.engine, RMMEngine)
    sim.run(steps=10, print_every=0)
    res = tmp_path / "rmmtest.res"
    assert res.exists()
    txt = res.read_text()
    assert "U_pot" in txt


def test_rmm_checkpoint_restart(tmp_path):
    os.chdir(tmp_path)
    n, L = 864, 13.0
    sim = MDSimulation(_cfg(n, L), force_mode="rmm")
    assert isinstance(sim.engine, RMMEngine)
    gv = sim.run(steps=6, print_every=0,
                 final_checkpoint=str(tmp_path / "cp.dat"))
    cfg2 = _cfg(n, L)
    cfg2.generator = None
    cfg2.phasespace_file = str(tmp_path / "cp.dat")
    sim2 = MDSimulation(cfg2)
    assert int(sim2.mol.num_valid()) == n
    gv2 = sim2.run(steps=1, print_every=0)
    assert abs(float(gv2.temperature) - float(gv.temperature)) < 0.05


def test_rmm_ineligible_fallbacks():
    # muVT keeps the general engine (insertions mutate the flat state)
    sim = MDSimulation(_cfg(864, 13.0, ensemble="muVT"), force_mode="rmm")
    assert not isinstance(sim.engine, RMMEngine)
    # non-whitelisted plugin keeps the general engine
    sim = MDSimulation(
        _cfg(864, 13.0, plugins=[PluginSpec("GammaWriter", {})]),
        force_mode="rmm",
    )
    assert not isinstance(sim.engine, RMMEngine)
    # tiny box (no >=4-cell grid with skin) keeps the general engine
    dims, _cap = pick_rmm_grid(
        np.random.default_rng(0).uniform(0, 8, (100, 3)), [8.0] * 3, 2.5
    )
    assert dims is None
