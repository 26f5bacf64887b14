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
