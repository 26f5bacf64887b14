"""H2O + NaBr electrolyte scene (the reference's bhfmm validation
workload, test_input/H20_NaBr_0.01_T_293.15.inp): SPC/E-like 3-charge
water + Na+ + Br- ions with full periodic electrostatics through the
Ewald solver (our FastMultipoleMethod capability slot)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.ascii_reader import read_inp
from ls1_mardyn_tpu.io.xml_config import XMLConfig

INP = "/root/reference/test_input/H20_NaBr_0.01_T_293.15.inp"


@pytest.fixture(scope="module")
def scene():
    if not os.path.exists(INP):
        pytest.skip("reference test_input not available")
    return read_inp(INP)


def test_scene_reads(scene):
    assert len(scene.components) == 3
    water = scene.components[0]
    assert len(water.ljcenters) == 1 and len(water.charges) == 3
    # charge neutrality per water molecule
    assert abs(sum(c.q for c in water.charges)) < 1e-12
    assert len(scene.mid) == 1000
    np.testing.assert_allclose(scene.box, [58.5389] * 3)


def test_h2o_nabr_runs_with_ewald(scene, tmp_path, monkeypatch):
    os.chdir(tmp_path)
    cfg = XMLConfig(
        timestep=0.01,
        temperature=float(scene.temperature),
        box=np.asarray(scene.box),
        cutoff=9.0,
        lj_cutoff=9.0,
        electrostatic_solver="Ewald",
        ewald_accuracy=1e-4,
    )
    monkeypatch.setattr(
        MDSimulation, "_load_phasespace", lambda self, c: scene
    )
    sim = MDSimulation(cfg, dtype=jnp.float64)
    assert sim.ewald is not None
    sim.engine.prepare_start()
    u0 = float(sim.engine.macro.upot)
    assert np.isfinite(u0)
    gv = sim.run(steps=3, print_every=0)
    assert np.isfinite(float(gv.upot))
    t = float(gv.temperature)
    assert np.isfinite(t) and 0 < t < 10 * float(scene.temperature)
    assert int(float(gv.n)) == 1000
