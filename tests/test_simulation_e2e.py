"""End-to-end single-chip simulation tests.

Covers the reference's integration tier: energy conservation in NVE
(BASELINE.md stability target: drift < 1e-4 over 10k steps; here a
shorter CPU-sized run), NVT thermostat convergence, and rigid-body
integration sanity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.io.ascii_reader import read_inp
from ls1_mardyn_tpu.scene import build_scene
from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation


def _lj_fluid(n=256, rho=0.6, T=1.1, seed=1, shifted=False, rc=3.0):
    from ls1_mardyn_tpu.models.components import Component

    L = (n / rho) ** (1.0 / 3.0)
    comps = None
    if shifted:
        c = Component(cid=0)
        # truncated-SHIFTED LJ: continuous U at the cutoff, so NVE energy
        # conservation is limited only by the integrator (the unshifted
        # truncated potential has an O(u(rc)) energy jump per cutoff
        # crossing -- same in the reference)
        c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, rc, True)
        comps = [c]
    return cubic_grid(n, [L, L, L], T, seed=seed, components=comps), L


def test_nve_energy_conservation():
    data, L = _lj_fluid(n=256, rho=0.5, T=0.9, shifted=True)
    mol, pp, table, box = build_scene(data, cutoff=3.0)
    cfg = SimConfig(dt=0.002, thermostat=False, cell_cap=64, cell_chunk=16)
    sim = SingleChipSimulation(mol, pp, box, cfg)
    sim.prepare_start()

    energies = []

    def cb(k, mol_state, gv):
        if k % 20 == 0:
            e = float(gv.upot) + 0.5 * (float(gv.summv2) + float(gv.sum_iw2))
            energies.append(e)

    sim.run(200, callback=cb)
    e = np.array(energies)
    drift = np.abs(e - e[0]).max() / max(abs(e[0]), 1.0)
    assert drift < 2e-4, f"energy drift {drift}"


def test_nvt_thermostat_reaches_target():
    data, L = _lj_fluid(n=256, rho=0.5, T=0.7)
    # start cold, thermostat to T=1.2
    mol, pp, table, box = build_scene(data, cutoff=3.0)
    cfg = SimConfig(
        dt=0.002, target_temperature=1.2, thermostat=True, cell_cap=64,
        cell_chunk=16,
    )
    sim = SingleChipSimulation(mol, pp, box, cfg)
    gv = sim.run(300)
    T = float(gv.temperature)
    assert abs(T - 1.2) / 1.2 < 0.05, f"T={T}"


def test_rigid_body_free_rotation_conserves_L_and_energy():
    """Torque-free rigid rotor: angular momentum (world frame) constant,
    rotational kinetic energy constant, quaternion stays normalized.
    Exercises the upd_preF quaternion ladder (FullMolecule.cpp:334-364)."""
    from ls1_mardyn_tpu.models.components import Component
    from ls1_mardyn_tpu.models.interaction import PairParams
    from ls1_mardyn_tpu.models.components import ComponentTable
    from ls1_mardyn_tpu.state import MoleculeState, Forces
    from ls1_mardyn_tpu.ops.integrator import upd_pre_force, upd_post_force

    c = Component(cid=0)
    # asymmetric rigid molecule: two LJ sites on z + one off-axis charge
    c.add_ljcenter(0.0, 0.0, 0.5, 1.0, 1.0, 1.0)
    c.add_ljcenter(0.0, 0.0, -0.5, 1.0, 1.0, 1.0)
    c.add_charge(0.3, 0.0, 0.0, 0.5, 0.1)
    table = ComponentTable([c], cutoff=5.0)
    pp = PairParams.from_table(table, dtype=jnp.float64)
    mol = MoleculeState.from_numpy(
        r=np.zeros((1, 3)),
        v=np.zeros((1, 3)),
        L=np.array([[0.4, 0.3, 0.2]]),
        dtype=jnp.float64,
    )
    forces = Forces.zeros(1, jnp.float64)
    dt = 0.001

    def body(carry, _):
        m = carry
        m = upd_pre_force(m, forces, pp, dt)
        m, mv2, iw2 = upd_post_force(m, forces, pp, dt)
        return m, iw2

    mol2, iw2s = jax.lax.scan(body, mol, None, length=2000)
    # world-frame L conserved exactly (no torque)
    np.testing.assert_allclose(np.asarray(mol2.L), [[0.4, 0.3, 0.2]], atol=1e-14)
    # quaternion normalized
    np.testing.assert_allclose(
        np.sum(np.asarray(mol2.q) ** 2), 1.0, atol=1e-12
    )
    # rotational kinetic energy conserved to integrator order
    iw2s = np.asarray(iw2s)[:, 0]
    assert abs(iw2s[-1] - iw2s[0]) / iw2s[0] < 1e-4


def test_momentum_conservation_nve():
    data, L = _lj_fluid(n=128, rho=0.4, T=1.0)
    mol, pp, table, box = build_scene(data, cutoff=3.0)
    cfg = SimConfig(dt=0.002, thermostat=False, cell_cap=64, cell_chunk=8)
    sim = SingleChipSimulation(mol, pp, box, cfg)
    sim.run(100)
    mass = np.asarray(pp.mass)[np.asarray(sim.mol.cid)]
    p = (mass[:, None] * np.asarray(sim.mol.v)).sum(axis=0)
    np.testing.assert_allclose(p, 0.0, atol=1e-10)
