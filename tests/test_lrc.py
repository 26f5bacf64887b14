"""Long-range correction tests (homogeneous + planar).

Planar validation mirrors the reference's internal consistency: in the
homogeneous limit the slab-based correction must reduce to the
homogeneous mean-field tail (Planar.cpp vs Homogeneous.cpp)."""

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.ops.lrc import HomogeneousLRC
from ls1_mardyn_tpu.ops.lrc_planar import PlanarLRC
from ls1_mardyn_tpu.scene import build_scene


def test_homogeneous_lrc_1clj_analytic():
    # U_corr = rho*N*eps*(8pi/9 sig^12 rc^-9 - 8pi/3 sig^6 rc^-3)
    n, rho, rc = 1000, 0.8, 2.5
    L = (n / rho) ** (1 / 3)
    data = cubic_grid(n, [L, L, L], 1.0)
    mol, pp, table, box = build_scene(data, cutoff=rc)
    lrc = HomogeneousLRC(table, [n], L ** 3)
    expected = rho * n * (
        8 * np.pi / 9 * rc ** -9 - 8 * np.pi / 3 * rc ** -3
    )
    np.testing.assert_allclose(lrc.upot_corr, expected, rtol=1e-12)


def test_planar_reduces_to_homogeneous_in_bulk():
    n, rho, rc = 2000, 0.6, 2.5
    L = (n / rho) ** (1 / 3)
    data = cubic_grid(n, [L, L, L], 1.0)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float64)
    hom = HomogeneousLRC(table, [n], L ** 3)
    pl = PlanarLRC(table, box, nslabs=200, axis=1)
    F, u_corr, _ = pl(mol)
    # wrapped planar sum misses images beyond L/2: O((rc/(L/2))^3) error
    np.testing.assert_allclose(float(u_corr), hom.upot_corr, rtol=2e-2)
    # homogeneous limit: no net correction force
    np.testing.assert_allclose(
        np.asarray(F).mean(axis=0), 0.0,
        atol=1e-3 * abs(hom.upot_corr) / n,
    )


def test_planar_forces_point_into_liquid_slab():
    """Vapor-liquid slab: tail forces on particles just outside the
    liquid must point back toward it (cohesion)."""
    rho, rc = 0.7, 2.5
    Lx = Lz = 10.0
    Ly = 30.0
    # liquid slab occupying y in [10, 20)
    n = int(rho * Lx * Lz * 10.0)
    data = cubic_grid(n, [Lx, 10.0, Lz], 1.0, seed=2)
    data.r[:, 1] += 10.0
    data.box = np.array([Lx, Ly, Lz])
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float64)
    pl = PlanarLRC(table, box, nslabs=120, axis=1)
    F, u_corr, _ = pl(mol)
    Fy = np.asarray(F)[:, 1]
    y = np.asarray(mol.r)[:, 1]
    # particles near the lower interface (y ~ 10-11) are pulled up (+y),
    # near the upper interface (y ~ 19-20) pulled down (-y)
    lower = (y > 10.0) & (y < 10.8)
    upper = (y > 19.2) & (y < 20.0)
    assert Fy[lower].mean() > 0
    assert Fy[upper].mean() < 0
    assert float(u_corr) < 0  # attractive tail


def test_planar_per_site_matches_com_for_single_site():
    n, rho, rc = 500, 0.5, 2.5
    L = (n / rho) ** (1 / 3)
    data = cubic_grid(n, [L, L, L], 1.0, seed=5)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float64)
    ps = PlanarLRC(table, box, nslabs=80, axis=1, per_site=True)
    com = PlanarLRC(table, box, nslabs=80, axis=1, per_site=False)
    Fp, up, _ = ps(mol)
    Fc, uc, _ = com(mol)
    np.testing.assert_allclose(float(up), float(uc), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Fp), np.asarray(Fc), atol=1e-12)
    _, M, _, _ = ps.forces_torques(mol)
    np.testing.assert_allclose(np.asarray(M), 0.0, atol=1e-14)


def test_planar_per_site_torque_at_interface():
    """A tilted 2CLJ dumbbell at a vapor-liquid interface: the site
    nearer the liquid feels a stronger pull, so per-site resolution
    yields a torque (Planar.cpp site loops); COM mode cannot."""
    from ls1_mardyn_tpu.models.components import Component, ComponentTable
    from ls1_mardyn_tpu.models.interaction import PairParams
    from ls1_mardyn_tpu.state import MoleculeState

    rho, rc = 0.7, 2.5
    Lx = Lz = 10.0
    Ly = 30.0
    c = Component(cid=0)
    c.add_ljcenter(0, 0, 0.5, 0.5, 1.0, 1.0, rc, False)
    c.add_ljcenter(0, 0, -0.5, 0.5, 1.0, 1.0, rc, False)
    table = ComponentTable([c], cutoff=rc, lj_cutoff=rc)

    # liquid slab y in [10, 20): random molecules
    rng = np.random.default_rng(8)
    n = int(rho * Lx * Lz * 10.0 / 1.0)
    r = rng.uniform(0, 1, (n, 3)) * np.array([Lx, 10.0, Lz])
    r[:, 1] += 10.0
    # plus one probe molecule above the interface, tilted 45 deg about x
    # (body z-axis leaning toward the slab)
    probe_r = np.array([[5.0, 21.2, 5.0]])
    a = np.pi / 4
    probe_q = np.array([[np.cos(a / 2), np.sin(a / 2), 0.0, 0.0]])
    allr = np.vstack([r, probe_r])
    allq = np.vstack([np.tile([1.0, 0, 0, 0], (n, 1)), probe_q])
    mol = MoleculeState.from_numpy(
        r=allr, v=np.zeros_like(allr), q=allq, dtype=jnp.float64
    )
    box = np.array([Lx, Ly, Lz])
    pl = PlanarLRC(table, box, nslabs=120, axis=1, per_site=True)
    F, M, u, _ = pl.forces_torques(mol)
    Mp = np.asarray(M)[n]
    Fp = np.asarray(F)[n]
    assert Fp[1] < 0  # pulled toward the liquid below
    # rotation by a about +x moves body +z site toward -y (the liquid):
    # that site is pulled harder along -y -> torque about +x axis
    assert abs(Mp[0]) > 1e-8
    assert abs(Mp[1]) < 1e-12 and abs(Mp[2]) < 1e-12  # symmetry
