"""Smooth particle-mesh Ewald validation.

Same ground truths as test_ewald.py (the role of the reference's bhfmm
FFT-accelerated far field, src/bhfmm/fft/): the mesh path must agree
with the direct k-space Ewald path and with known lattice sums.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.ops.ewald import EwaldParams, EwaldSolver
from ls1_mardyn_tpu.ops.pme import PMEParams, PMESolver

from test_ewald import MADELUNG_NACL, _charge_scene, _nacl, _real_space_direct


def test_madelung_constant_nacl_pme():
    r, q, box = _nacl(cells=4, d=1.0)
    rc = 1.9
    mol, pp, table = _charge_scene(r, q, box, rc)
    params = PMEParams(alpha=2.0, grid=(32, 32, 32), order=6)
    solver = PMESolver(box, params, dtype=jnp.float64)
    u_recip, F_recip, M_recip = solver(mol, pp)
    u_real, F_real = _real_space_direct(mol, pp, box, params.alpha, rc)
    u_total = float(u_recip) + u_real
    n = len(r)
    madelung = -2.0 * u_total / n
    np.testing.assert_allclose(madelung, MADELUNG_NACL, rtol=1e-5)
    Ftot = np.asarray(F_recip) + np.asarray(F_real)
    np.testing.assert_allclose(Ftot, 0.0, atol=1e-6)


def test_pme_matches_direct_ewald():
    """Mesh k-space must agree with the direct [N,K]-matmul k-space on
    a disordered charge system (energy and per-molecule forces)."""
    rng = np.random.default_rng(11)
    n = 48
    box = np.array([6.0, 6.0, 6.0])
    r = rng.uniform(0.0, 6.0, size=(n, 3))
    q = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    rc = 2.9
    alpha = 1.8
    mol, pp, table = _charge_scene(r, q, box, rc)
    direct = EwaldSolver(box, EwaldParams(alpha=alpha, kmax=16), jnp.float64)
    mesh = PMESolver(
        box, PMEParams(alpha=alpha, grid=(48, 48, 48), order=6), jnp.float64
    )
    u_d, F_d, M_d = direct(mol, pp)
    u_m, F_m, M_m = mesh(mol, pp)
    np.testing.assert_allclose(float(u_m), float(u_d), rtol=2e-5)
    scale = np.abs(np.asarray(F_d)).max()
    np.testing.assert_allclose(
        np.asarray(F_m), np.asarray(F_d), atol=2e-4 * scale
    )


def test_pme_forces_match_energy_gradient():
    """The interpolated forces are the exact gradient of the
    discretized mesh energy."""
    rng = np.random.default_rng(12)
    n = 16
    box = np.array([5.0, 5.0, 5.0])
    r = rng.uniform(0.0, 5.0, size=(n, 3))
    q = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    rc = 2.4
    alpha = 2.0
    mol, pp, table = _charge_scene(r, q, box, rc)
    solver = PMESolver(
        box, PMEParams(alpha=alpha, grid=(32, 32, 32), order=4), jnp.float64
    )

    def u_of(rpos):
        m = dataclasses.replace(mol, r=rpos)
        u, _, _ = solver(m, pp)
        return float(u)

    _, F, _ = solver(mol, pp)
    F = np.asarray(F)
    h = 1e-5
    for (i, d) in ((0, 0), (3, 1), (7, 2)):
        rp = mol.r.at[i, d].add(h)
        rm = mol.r.at[i, d].add(-h)
        fd = -(u_of(rp) - u_of(rm)) / (2 * h)
        np.testing.assert_allclose(F[i, d], fd, rtol=5e-4, atol=1e-7)


def test_pme_params_auto():
    p = PMEParams.auto(np.array([10.0, 10.0, 10.0]), rc=3.0)
    assert all(g >= 8 and (g & (g - 1)) == 0 for g in p.grid)
    assert p.alpha > 0


def test_pme_sorted_gather_matches_direct():
    """The gather-free force interpolation (_gather_sorted, the
    transpose of the sorted spread) is bit-for-bit the same
    discretization as the direct [NS, p^3] mesh gather."""
    rng = np.random.default_rng(7)
    for (n, grid, p, L) in [
        (500, (8, 8, 8), 4, 10.0),
        (257, (12, 10, 8), 6, 13.7),
    ]:
        box = (L, L * 1.1, L * 0.9)
        params = PMEParams(alpha=0.8, grid=grid, order=p)
        rs = jnp.asarray(rng.uniform(0, 1, (n, 3)) * np.asarray(box))
        wq = jnp.asarray(rng.normal(size=n))
        wq = wq - wq.mean()
        pa = PMESolver(box, params, dtype=jnp.float64, gather_mode="direct")
        pb = PMESolver(box, params, dtype=jnp.float64, gather_mode="sorted")
        ua, Fa = jax.jit(pa.mesh_energy_forces)(rs, wq)
        ub, Fb = jax.jit(pb.mesh_energy_forces)(rs, wq)
        assert float(abs(ua - ub)) < 1e-10
        err = float(jnp.max(jnp.abs(Fa - Fb)) / jnp.max(jnp.abs(Fa)))
        assert err < 1e-12, (n, grid, p, err)


def test_blocked_spread_gather_match_sorted():
    """The blocked (no-scatter, no-data-dependent-gather) spread and
    force interpolation must reproduce the sorted paths to summation-
    order precision -- they are the production default on TPU, where
    the sorted paths' per-offset O(ngp) segment sums cost 19 s / 12 s
    at N=1e6, G=256^3 (PME_PHASES.json)."""
    import numpy as np

    from ls1_mardyn_tpu.ops.pme import (
        _gather_blocked,
        _gather_sorted,
        _grid_indices_weights,
        _spread_blocked,
        _spread_sorted,
    )

    rng = np.random.default_rng(0)
    N, box, grid, p = 3000, (11.0, 9.5, 10.2), (32, 16, 32), 4
    rs = jnp.asarray(rng.uniform(0, 1, (N, 3)) * np.asarray(box))
    wq = jnp.asarray(rng.normal(size=N))
    giw = _grid_indices_weights(
        rs, wq, box, grid, p, jnp.float64, with_derivs=True,
        products=False,
    )
    Q0 = _spread_sorted(giw["bw"], giw["w3"], wq, grid, p, jnp.float64)
    Q1, ovf = _spread_blocked(
        giw["bw"], giw["w3"], wq, grid, p, jnp.float64
    )
    assert not bool(ovf)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q0),
                               atol=1e-13)
    phi = jnp.asarray(rng.normal(size=int(np.prod(grid))))
    F0 = _gather_sorted(
        giw["bw"], giw["w3"], giw["dw3"], giw["scale"], wq, phi, grid,
        p, jnp.float64,
    )
    F1, ovf2 = _gather_blocked(
        giw["bw"], giw["w3"], giw["dw3"], giw["scale"], wq, phi, grid,
        p, jnp.float64,
    )
    assert not bool(ovf2)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F0),
                               atol=1e-12)


def test_blocked_spread_overflow_flags():
    """All sites in one block must overflow the bucket capacity and
    raise the flag (the solver then poisons the energy with NaN so the
    watchdog aborts instead of silently dropping charge)."""
    import numpy as np

    from ls1_mardyn_tpu.ops.pme import (
        _grid_indices_weights,
        _spread_blocked,
    )

    N, box, grid, p = 4096, (16.0, 16.0, 16.0), (16, 16, 16), 4
    rs = jnp.ones((N, 3), jnp.float64) * 0.5  # one cell
    wq = jnp.ones((N,), jnp.float64)
    giw = _grid_indices_weights(rs, wq, box, grid, p, jnp.float64,
                                with_derivs=False, products=False)
    _Q, ovf = _spread_blocked(giw["bw"], giw["w3"], wq, grid, p,
                              jnp.float64)
    assert bool(ovf)
