"""The reference's shipped example scenes run unchanged (BASELINE.md
scene-coverage targets: Argon 1CLJ, CO2 2CLJ-class, EOX LJ+dipole)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.driver import MDSimulation

EX = "/root/reference/examples"

CASES = [
    # (config, N, n_sites_lj, has_dipole)
    (f"{EX}/Argon/200K_18mol_l/config.xml", 2048, 1, False),
    (f"{EX}/CO2/370K_15mol_l/config.xml", 2048, 3, False),
    (f"{EX}/EOX/600K_15mol_l/config.xml", 2048, 3, True),
]


def test_adsorption_example_runs(tmp_path):
    """The Adsorption CO2 scene (BASELINE.md scene coverage) runs
    unchanged: ASCII .xdr phase-space restart, 2CLJ+quadrupole CO2,
    TemperatureControl slab regions; the legacy DomainProfiles output
    plugin maps to the profile writer exactly as the reference does
    (PluginFactory.cpp:181)."""
    config = f"{EX}/Adsorption/CO2/run01/config.xml"
    if not os.path.exists(config):
        pytest.skip("reference examples not available")
    os.chdir(tmp_path)
    sim = MDSimulation.from_xml(config, dtype=jnp.float64)
    mol = sim.engine.mol
    assert int(np.asarray(mol.valid).sum()) == 400
    comp = sim.table.components[0]
    assert len(comp.ljcenters) == 2 and len(comp.quadrupoles) == 1
    assert len(sim.config.temp_control) == 1  # one 50-slab region
    gv = sim.run(steps=2, print_every=0)
    assert np.isfinite(float(gv.upot))
    assert 100.0 < float(gv.temperature) < 900.0  # ~293 K reduced units


def test_evaporation_example_runs(tmp_path):
    """The stationary Evaporation scene (BASELINE.md scene coverage)
    runs unchanged: 3-component 1CLJ via MultiObjectGenerator GridFiller
    + EqualVelocityDistribution, N ~ 45.6k."""
    config = f"{EX}/Evaporation/stationary/sim01/run01/config.xml"
    if not os.path.exists(config):
        pytest.skip("reference examples not available")
    os.chdir(tmp_path)
    sim = MDSimulation.from_xml(config, dtype=jnp.float64)
    assert len(sim.table.components) == 3
    mol = sim.engine.mol
    n = int(np.asarray(mol.valid).sum())
    assert 40_000 < n < 50_000  # fcc fill at rho=0.730205 in 40^3
    gv = sim.run(steps=2, print_every=0)
    assert np.isfinite(float(gv.upot))
    assert 0.4 < float(gv.temperature) < 1.6  # target T = 0.80


@pytest.mark.parametrize("config,n,n_lj,has_dip", CASES)
def test_reference_example_runs(config, n, n_lj, has_dip, tmp_path):
    if not os.path.exists(config):
        pytest.skip("reference examples not available")
    os.chdir(tmp_path)
    sim = MDSimulation.from_xml(config, dtype=jnp.float64)
    assert len(sim.table.components) == 1
    comp = sim.table.components[0]
    assert len(comp.ljcenters) == n_lj
    assert (len(comp.dipoles) > 0) == has_dip
    gv = sim.run(steps=2, print_every=0)
    assert int(float(gv.n)) == n
    assert np.isfinite(float(gv.upot))
    assert np.isfinite(float(gv.temperature))
    # NVT: the thermostat drives toward the configured target
    assert 0.1 * sim.config.temperature < float(gv.temperature) < (
        10 * sim.config.temperature
    )
