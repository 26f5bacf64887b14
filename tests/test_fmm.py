"""FMM: solid-harmonics conventions, translation operators, and the
full octree pipeline against direct summation.

Mirrors the reference's test tiers for bhfmm
(/root/reference/src/bhfmm/: SolidHarmonicsExpansionTest,
WignerRotationTest exercise the expansion math; FMM validation configs
compare against direct electrostatics): here the math identities are
pinned to machine precision and the end-to-end solver is compared to
the O(N^2) oracle.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.ops.fmm import (
    FMMSolver,
    _idx,
    _l2l_matrix,
    _m2l_matrix,
    _m2m_matrix,
    _sh_RS,
    direct_coulomb,
)


def _rvec_np(v, p):
    R, _ = _sh_RS(np.asarray(v, float), p)
    out = np.zeros(((p + 1) ** 2,), complex)
    for n in range(p + 1):
        for m in range(-n, n + 1):
            out[_idx(n, m)] = R[(n, m)]
    return out


def _svec_np(v, p):
    _, S = _sh_RS(np.asarray(v, float), p)
    out = np.zeros(((p + 1) ** 2,), complex)
    for n in range(p + 1):
        for m in range(-n, n + 1):
            out[_idx(n, m)] = S[(n, m)]
    return out


def test_rs_identity():
    """1/|r-a| = sum_{n,m} R_n^m(a) conj(S_n^m(r)) for |r| > |a|."""
    rng = np.random.default_rng(1)
    for _ in range(4):
        a = rng.normal(size=3) * 0.25
        r = rng.normal(size=3)
        r = r / np.linalg.norm(r) * 2.0
        p = 18
        tot = np.sum(_rvec_np(a, p) * np.conj(_svec_np(r, p)))
        direct = 1.0 / np.linalg.norm(r - a)
        assert abs(tot - direct) / direct < 1e-12
        assert abs(tot.imag) < 1e-14


def test_r_addition_theorem():
    """R_n^m(a+b) = sum_{j<=n,k} R_j^k(a) R_{n-j}^{m-k}(b) (exact)."""
    rng = np.random.default_rng(2)
    p = 6
    a = rng.normal(size=3)
    b = rng.normal(size=3)
    Ra, _ = _sh_RS(a, p)
    Rb, _ = _sh_RS(b, p)
    Rab, _ = _sh_RS(a + b, p)
    for n in range(p + 1):
        for m in range(-n, n + 1):
            tot = 0.0
            for j in range(n + 1):
                for k in range(-j, j + 1):
                    if abs(m - k) <= n - j:
                        tot += Ra[(j, k)] * Rb[(n - j, m - k)]
            assert abs(tot - Rab[(n, m)]) < 1e-12


def test_operator_chain_vs_direct():
    """P2M -> M2M -> M2L -> L2L -> evaluate == direct potential of a
    charge cluster at a well-separated point (the numpy operator
    builders are the single source of truth for the device pipeline)."""
    rng = np.random.default_rng(4)
    p = 10
    na = 20
    a = rng.uniform(-0.5, 0.5, (na, 3))
    q = rng.normal(size=na)
    M = sum(q[i] * _rvec_np(a[i], p) for i in range(na))
    # M2M: shift center by t1
    t1 = np.array([0.6, 0.2, -0.4])
    M1 = _m2m_matrix(t1, p) @ M
    M1_direct = sum(q[i] * _rvec_np(a[i] - t1, p) for i in range(na))
    assert np.abs(M1 - M1_direct).max() < 1e-12 * np.abs(M1_direct).max()
    # M2L across t, L2L by u, evaluate at x
    t = np.array([5.0, -4.0, 3.0])
    L = _m2l_matrix(t, p) @ M1
    u = np.array([0.3, -0.2, 0.1])
    L2 = _l2l_matrix(u, p) @ L
    x = rng.uniform(-0.3, 0.3, 3)
    phi = np.real(np.sum(L * _rvec_np(x, p)))
    phi2 = np.real(np.sum(L2 * _rvec_np(x - u, p)))
    pos = t1 + t + x
    direct = sum(q[i] / np.linalg.norm(pos - a[i]) for i in range(na))
    assert abs(phi - direct) / abs(direct) < 1e-8
    assert abs(phi2 - direct) / abs(direct) < 1e-8


def _cluster(n, box, seed, neutral=True):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0, box, (n, 3))
    q = rng.normal(size=n)
    if neutral:
        q -= q.mean()
    return r, q


def test_fmm_depth2_vs_direct():
    """End-to-end free-space FMM (depth 2, order 6) vs O(N^2) direct:
    energy, forces, potential (the VectorizedCellProcessorTest pattern
    applied to the bhfmm role)."""
    r, q = _cluster(300, 8.0, seed=7)
    phi_d, F_d, U_d = direct_coulomb(r, q)
    s = FMMSolver(box=8.0, depth=2, order=6, cap=64, dtype=jnp.float64)
    U, F, phi = s.compute(r, q)
    # U nearly cancels for a neutral random cluster; normalize the
    # energy error by the non-cancelling scale 1/2 sum|q phi|
    scale = 0.5 * np.abs(q * phi_d).sum()
    assert abs(float(U) - U_d) / scale < 1e-4
    assert np.abs(np.asarray(F) - F_d).max() / np.abs(F_d).max() < 2e-3
    assert np.abs(np.asarray(phi) - phi_d).max() / np.abs(phi_d).max() < 1e-3


def test_fmm_depth3_vs_direct():
    """Depth 3 exercises the M2M upward stack and the L2L downward
    pass (two M2L levels); non-neutral cluster."""
    r, q = _cluster(600, 16.0, seed=9, neutral=False)
    phi_d, F_d, U_d = direct_coulomb(r, q)
    s = FMMSolver(box=16.0, depth=3, order=4, cap=32, dtype=jnp.float64)
    U, F, phi = s.compute(r, q)
    scale = 0.5 * np.abs(q * phi_d).sum()
    assert abs(float(U) - U_d) / scale < 1e-3
    assert np.abs(np.asarray(F) - F_d).max() / np.abs(F_d).max() < 2e-2


def test_fmm_order_convergence():
    """Error decreases with expansion order (the knob the reference
    exposes as <orderOfExpansions>, FastMultipoleMethod.h)."""
    r, q = _cluster(200, 8.0, seed=11)
    _, F_d, U_d = direct_coulomb(r, q)
    errs = []
    for p in (2, 4, 6):
        s = FMMSolver(box=8.0, depth=2, order=p, cap=64, dtype=jnp.float64)
        U, F, _ = s.compute(r, q)
        errs.append(np.abs(np.asarray(F) - F_d).max() / np.abs(F_d).max())
    assert errs[1] < 0.5 * errs[0]
    assert errs[2] < 0.5 * errs[1]


def test_fmm_periodic_madelung():
    """Periodic FMM reproduces the NaCl Madelung constant -- the
    in-box wrapped M2L levels plus the 3x-block lattice recursion sum
    the infinite rock-salt lattice (the reference bhfmm's periodic
    mode; cf. test_ewald.py::test_madelung_constant_nacl for the Ewald
    twin of this test)."""
    cells, d = 4, 1.0
    idx = np.arange(cells)
    g = np.stack(
        np.meshgrid(idx, idx, idx, indexing="ij"), -1
    ).reshape(-1, 3)
    r = (g + 0.5) * d
    q = np.where((g.sum(axis=1) % 2) == 0, 1.0, -1.0)
    n = len(q)
    s = FMMSolver(
        box=cells * d, depth=2, order=6, cap=16, dtype=jnp.float64,
        periodic=True, lattice_scales=8,
    )
    U, F, phi = s.compute(r, q)
    madelung = -2.0 * float(U) / n
    np.testing.assert_allclose(madelung, 1.7475645946, rtol=5e-5)
    # perfect lattice: forces vanish by symmetry (truncation noise)
    assert np.abs(np.asarray(F)).max() < 5e-4


def test_fmm_periodic_vs_ewald():
    """Periodic FMM against the Ewald solver on a random neutral
    configuration with exactly zero box dipole (mirror pairs through
    the box center), where the cubic-shell FMM convention and tinfoil
    Ewald agree: two algorithmically independent periodic solvers."""
    import sys

    sys.path.insert(0, "tests")
    from test_ewald import _charge_scene, _real_space_direct

    from ls1_mardyn_tpu.ops.ewald import EwaldParams, EwaldSolver

    rng = np.random.default_rng(21)
    box = 6.0
    npairs = 24
    ra = rng.uniform(0.2, box - 0.2, (npairs, 3))
    rb = (box - ra) % box  # mirror through center
    r = np.concatenate([ra, rb])
    sgn = np.where(np.arange(npairs) % 2 == 0, 1.0, -1.0)
    q = np.concatenate([sgn, sgn])  # neutral, P = box * sum(sgn) = 0
    assert abs(q.sum()) < 1e-12
    assert np.abs((q[:, None] * r).sum(0)).max() < 1e-10

    s = FMMSolver(
        box=box, depth=2, order=6, cap=32, dtype=jnp.float64,
        periodic=True, lattice_scales=8,
    )
    U_f, F_f, _ = s.compute(r, q)

    rc = 2.9
    mol, pp, table = _charge_scene(r, q, np.array([box] * 3), rc)
    solver = EwaldSolver(
        np.array([box] * 3), EwaldParams(alpha=1.8, kmax=14), jnp.float64
    )
    u_recip, F_recip, _ = solver(mol, pp)
    u_real, F_real = _real_space_direct(mol, pp, np.array([box] * 3), 1.8, rc)
    U_e = float(u_recip) + u_real
    F_e = np.asarray(F_recip) + np.asarray(F_real)
    assert abs(float(U_f) - U_e) / abs(U_e) < 1e-3
    assert np.abs(np.asarray(F_f) - F_e).max() / np.abs(F_e).max() < 5e-3


def test_fmm_valid_mask_and_overflow():
    """Invalid slots are excluded; leaf-capacity overflow raises."""
    r, q = _cluster(64, 8.0, seed=13)
    valid = np.ones(64, bool)
    valid[50:] = False
    s = FMMSolver(box=8.0, depth=2, order=4, cap=64, dtype=jnp.float64)
    U, F, phi = s.compute(r, q, jnp.asarray(valid))
    phi_d, F_d, U_d = direct_coulomb(r[:50], q[:50])
    scale = 0.5 * np.abs(q[:50] * phi_d).sum()
    assert abs(float(U) - U_d) / scale < 1e-3
    # all 64 particles crammed into one leaf cell overflows cap=4
    s2 = FMMSolver(box=8.0, depth=2, order=2, cap=4, dtype=jnp.float64)
    r_cram = np.full((64, 3), 1.0) + np.random.default_rng(0).uniform(
        0, 0.5, (64, 3)
    )
    with pytest.raises(RuntimeError, match="capacity"):
        s2.compute(r_cram, q)


def test_f32_periodic_lattice_scaling():
    """float32 periodic FMM: the lattice-recursion operators must stay
    finite (raw A_k entries grow like (3^k box)^n and overflow f32 by
    scale ~8 -- the scaled-units construction keeps them O(3^-n)) and
    the NaCl Madelung constant must come out at interpolation accuracy.
    Regression for the NaN forces first seen on the TPU A/B run."""
    n_side = 4
    idx = np.arange(n_side)
    g = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), -1).reshape(-1, 3)
    r = (g + 0.5).astype(float)
    q = np.where(g.sum(1) % 2 == 0, 1.0, -1.0).astype(float)
    solver = FMMSolver(box=float(n_side), depth=2, order=8, cap=16,
                       dtype=jnp.float32, periodic=True)
    for A in solver._lat_m2m:
        assert np.isfinite(A).all()
    for T in solver._lat_m2l:
        assert np.isfinite(T).all()
    U, F, _phi, ovf = solver._jit_compute(
        jnp.asarray(r), jnp.asarray(q), jnp.ones(len(r), bool),
        jnp.arange(len(r), dtype=jnp.int32),
    )
    assert not bool(ovf)
    assert np.isfinite(np.asarray(F)).all()
    mad = -float(U) * 2 / len(r)
    assert abs(mad - 1.7475646) < 2e-4, mad
