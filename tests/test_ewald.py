"""Ewald summation validation.

The role of the reference's bhfmm validation scenes
(test_input/FMMCharge.inp, SolidHarmonicsExpansionTest): full periodic
electrostatics must reproduce known lattice sums.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.components import Component, ComponentTable
from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.models.oracle import min_image
from ls1_mardyn_tpu.models.potentials import charge_charge_screened
from ls1_mardyn_tpu.ops.ewald import EwaldParams, EwaldSolver
from ls1_mardyn_tpu.state import MoleculeState

MADELUNG_NACL = 1.7475645946


def _nacl(cells=4, d=1.0):
    """Rock-salt lattice: alternating +-1 charges on a cubic grid."""
    idx = np.arange(cells)
    g = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), -1).reshape(-1, 3)
    r = g * d
    q = np.where((g.sum(axis=1) % 2) == 0, 1.0, -1.0)
    box = np.array([cells * d] * 3)
    return r, q, box


def _charge_scene(r, q_signs, box, rc):
    comps = []
    for sign in (1.0, -1.0):
        c = Component(cid=len(comps))
        c.add_charge(0.0, 0.0, 0.0, 1.0, sign)
        comps.append(c)
    table = ComponentTable(comps, cutoff=rc, lj_cutoff=rc)
    pp = PairParams.from_table(table, dtype=jnp.float64)
    cid = np.where(q_signs > 0, 0, 1).astype(np.int32)
    mol = MoleculeState.from_numpy(r=r, v=np.zeros_like(r), cid=cid, dtype=jnp.float64)
    return mol, pp, table


def _real_space_direct(mol, pp, box, alpha, rc):
    """O(N^2) min-image erfc pair sum (test-side real-space reference)."""
    n = mol.capacity
    q = np.asarray(pp.charge_q)[np.asarray(mol.cid), 0]
    drm = min_image(mol.r[:, None, :] - mol.r[None, :, :], jnp.asarray(box))
    dr2 = jnp.sum(drm * drm, axis=-1)
    mask = (dr2 < rc * rc) & (~np.eye(n, dtype=bool))
    dr2s = jnp.where(mask, dr2, 1.0)
    f, u = charge_charge_screened(
        jnp.where(mask[..., None], drm, 1.0),
        dr2s,
        jnp.asarray(q[:, None] * q[None, :]),
        alpha,
    )
    u = jnp.where(mask, u, 0.0)
    F = jnp.sum(jnp.where(mask[..., None], f, 0.0), axis=1)
    return 0.5 * float(jnp.sum(u)), F


def test_madelung_constant_nacl():
    r, q, box = _nacl(cells=4, d=1.0)
    rc = 1.9
    mol, pp, table = _charge_scene(r, q, box, rc)
    params = EwaldParams(alpha=2.0, kmax=12)
    solver = EwaldSolver(box, params, dtype=jnp.float64)
    u_recip, F_recip, M_recip = solver(mol, pp)
    u_real, F_real = _real_space_direct(mol, pp, box, params.alpha, rc)
    u_total = float(u_recip) + u_real
    n = len(r)
    madelung = -2.0 * u_total / n  # U = -N*M/(2*r_nn), r_nn = 1
    np.testing.assert_allclose(madelung, MADELUNG_NACL, rtol=1e-6)
    # perfect lattice: forces vanish by symmetry
    Ftot = np.asarray(F_recip) + np.asarray(F_real)
    np.testing.assert_allclose(Ftot, 0.0, atol=1e-8)


def test_ewald_parameter_independence():
    """Total energy must not depend on the alpha split (within the
    k-space/real-space truncation error)."""
    rng = np.random.default_rng(3)
    n = 32
    box = np.array([6.0, 6.0, 6.0])
    r = rng.uniform(0.7, 5.3, size=(n, 3))
    q = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    rc = 2.9
    mol, pp, table = _charge_scene(r, q, box, rc)
    totals = []
    for alpha, kmax in ((1.4, 10), (1.8, 14)):
        solver = EwaldSolver(box, EwaldParams(alpha=alpha, kmax=kmax), jnp.float64)
        u_recip, F_r, _ = solver(mol, pp)
        u_real, F_real = _real_space_direct(mol, pp, box, alpha, rc)
        totals.append(float(u_recip) + u_real)
    np.testing.assert_allclose(totals[0], totals[1], rtol=1e-6)


def test_ewald_forces_match_energy_gradient():
    rng = np.random.default_rng(4)
    n = 16
    box = np.array([5.0, 5.0, 5.0])
    r = rng.uniform(0.5, 4.5, size=(n, 3))
    q = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    rc = 2.4
    alpha = 2.0
    mol, pp, table = _charge_scene(r, q, box, rc)
    solver = EwaldSolver(box, EwaldParams(alpha=alpha, kmax=12), jnp.float64)

    def total_u(rpos):
        m = dataclasses.replace(mol, r=rpos)
        u_recip, _, _ = solver(m, pp)
        u_real, _ = _real_space_direct(m, pp, box, alpha, rc)
        return u_recip + u_real

    u0 = total_u(mol.r)
    u_recip, F_recip, _ = solver(mol, pp)
    _, F_real = _real_space_direct(mol, pp, box, alpha, rc)
    F = np.asarray(F_recip) + np.asarray(F_real)
    # finite differences on a few coordinates
    h = 1e-6
    for (i, d) in ((0, 0), (3, 1), (7, 2)):
        rp = mol.r.at[i, d].add(h)
        rm = mol.r.at[i, d].add(-h)
        fd = -(float(total_u(rp)) - float(total_u(rm))) / (2 * h)
        np.testing.assert_allclose(F[i, d], fd, rtol=1e-5, atol=1e-8)


def test_tuned_parameters_meet_accuracy():
    """EwaldParams.tune (Kolafa-Perram estimates) must produce
    parameters whose measured RMS force error against a
    much-higher-resolution reference meets the requested accuracy."""
    rng = np.random.default_rng(9)
    n = 64
    box = np.array([7.0, 7.0, 7.0])
    r = rng.uniform(0.0, 7.0, size=(n, 3))
    q = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    rc = 3.0
    acc = 1e-4
    mol, pp, table = _charge_scene(r, q, box, rc)

    params = EwaldParams.tune(box, rc, q2_sum=float((q * q).sum()), n=n,
                              accuracy=acc)
    sol = EwaldSolver(box, params, dtype=jnp.float64)
    _, F_k, _ = sol(mol, pp)
    u_r, F_r = _real_space_direct(mol, pp, box, params.alpha, rc)
    F = np.asarray(F_k) + np.asarray(F_r)

    # reference: same alpha, much larger kmax + bigger real cutoff is
    # not needed (alpha ties the split); just crank kmax
    ref = EwaldSolver(box, EwaldParams(alpha=params.alpha,
                                       kmax=params.kmax + 10), jnp.float64)
    _, F_k2, _ = ref(mol, pp)
    F_ref = np.asarray(F_k2) + np.asarray(F_r)
    rms = np.sqrt(np.mean((F - F_ref) ** 2))
    assert rms < 10 * acc, (rms, acc, params)
    assert params.kmax >= 4


def test_pme_tune_grid_scales_with_box():
    from ls1_mardyn_tpu.ops.pme import PMEParams

    p1 = PMEParams.tune(np.array([6.0, 6.0, 6.0]), 2.5, 32.0, 32)
    p2 = PMEParams.tune(np.array([24.0, 24.0, 24.0]), 2.5, 2048.0, 2048)
    assert p2.grid[0] > p1.grid[0]
    assert p1.order == 6
