"""Analytic force/potential tests on the reference's 4-particle
lattices + reader sanity checks.

Reproduces ForceCalculationTest
(/root/reference/src/tests/integrationTests/ForceCalculationTest.cpp:23-63):
  - U0 scene: unit-spacing lattice, eps=sigma=1 -> Upot = 0,
    |F| components = 24, virial = 96
  - F0 scene: 2^(1/6) spacing -> F = 0, U = -1 per interacting pair
"""

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.ascii_reader import read_inp
from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit
from ls1_mardyn_tpu.scene import build_scene


def test_force_calculation_u0(ref_input_dir):
    data = read_inp(f"{ref_input_dir}/ForceCalculationTestU0.inp")
    mol, pp, table, box = build_scene(data, cutoff=1.1)
    forces, macro = compute_forces_n2_jit(mol, pp, box)

    expected = {
        1: [-24.0, -24.0, 0.0],
        2: [24.0, -24.0, 0.0],
        3: [-24.0, 24.0, 0.0],
        4: [24.0, 24.0, 0.0],
    }
    mids = np.asarray(mol.mid)
    F = np.asarray(forces.F)
    for i in range(4):
        np.testing.assert_allclose(F[i], expected[int(mids[i])], atol=1e-8)
    np.testing.assert_allclose(float(macro.upot), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(macro.total_virial), 96.0, atol=1e-8)


def test_force_calculation_f0(ref_input_dir):
    data = read_inp(f"{ref_input_dir}/ForceCalculationTestF0.inp")
    mol, pp, table, box = build_scene(data, cutoff=1.3)
    forces, macro = compute_forces_n2_jit(mol, pp, box)
    np.testing.assert_allclose(np.asarray(forces.F), 0.0, atol=1e-6)
    # 4 particles, 4 interacting pairs at r=2^(1/6) (diagonals are
    # outside the 1.3 cutoff); U = -1 per pair
    np.testing.assert_allclose(float(macro.upot), -4.0, atol=1e-6)


def test_newton_third_law_random_multisite(ref_input_dir):
    """Total force/torque about origin must vanish for an isolated
    (non-periodic-image-interacting) random water configuration."""
    data = read_inp(f"{ref_input_dir}/VectorizationWater.inp")
    # shrink to a handful of molecules, keep them isolated near origin
    n = 24
    data.mid, data.cid = data.mid[:n], data.cid[:n]
    data.r, data.v = data.r[:n].copy(), data.v[:n]
    data.q, data.L = data.q[:n], data.L[:n]
    rng = np.random.default_rng(5)
    # non-overlapping jittered grid cluster, away from the box walls
    grid = np.stack(np.meshgrid(*[np.arange(3)] * 3, indexing="ij"), -1)
    grid = grid.reshape(-1, 3)[:n] * 4.0 + 12.0
    data.r = grid + rng.uniform(-0.4, 0.4, size=(n, 3))
    mol, pp, table, box = build_scene(data, cutoff=8.0)
    forces, macro = compute_forces_n2_jit(mol, pp, box)
    F = np.asarray(forces.F)
    scale = np.abs(F).max()
    assert scale > 0
    # Newton's third law: sum of forces = 0 (relative to force scale)
    np.testing.assert_allclose(F.sum(axis=0) / scale, 0.0, atol=1e-11)
    # angular momentum conservation: sum of (r x F + M) = 0
    tau = np.cross(np.asarray(mol.r), F).sum(axis=0) + np.asarray(forces.M).sum(
        axis=0
    )
    np.testing.assert_allclose(tau / scale, 0.0, atol=1e-10)


def test_reader_water_scene(ref_input_dir):
    data = read_inp(f"{ref_input_dir}/VectorizationWater.inp")
    assert len(data.components) == 1
    c = data.components[0]
    # water model: LJ sites + charges or dipole/quad depending on scene
    assert c.num_sites() >= 2
    assert data.r.shape[0] == len(data.mid)
    assert (data.r >= 0).all() and (data.r <= data.box[None, :]).all()


def test_reader_1clj_scene(ref_input_dir):
    data = read_inp(f"{ref_input_dir}/VectorizationLennardJones1CLJ.inp")
    assert len(data.components) == 1
    assert len(data.components[0].ljcenters) == 1
    assert data.r.shape[0] == 250
