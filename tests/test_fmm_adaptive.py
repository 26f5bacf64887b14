"""Adaptive FMM (threshold-split octree + dual tree traversal) vs the
O(N^2) direct sum.

Validation the reference's own adaptive container never had: it is a
sequential beta that warns it "certainly delivers WRONG results"
(/root/reference/src/bhfmm/FastMultipoleMethod.cpp:43).  The rebuild
must match the direct sum on clustered (depth-inhomogeneous)
distributions, and the gid (intramolecular exclusion) guard must hold
EXACTLY even when a molecule's sites straddle octree nodes.
"""

import numpy as np
import pytest

from ls1_mardyn_tpu.ops.fmm_adaptive import AdaptiveFMMSolver


def _direct(r, q, gid=None):
    """Free-space direct sum with optional same-gid exclusion."""
    n = len(r)
    d = r[:, None, :] - r[None, :, :]
    r2 = np.sum(d * d, axis=-1)
    np.fill_diagonal(r2, 1.0)
    mask = ~np.eye(n, dtype=bool)
    if gid is not None:
        mask &= gid[:, None] != gid[None, :]
    inv = np.where(mask, 1.0 / np.sqrt(r2), 0.0)
    phi = inv @ q
    U = 0.5 * float(q @ phi)
    F = q[:, None] * np.einsum(
        "ij,ijk->ik", q[None, :] * inv / np.where(mask, r2, 1.0), d
    )
    return U, F, phi


def _clustered(rng, n, box):
    """Three dense clusters + a sparse background: forces threshold
    splits to very different depths (the adaptive case)."""
    k = n // 4
    pts = []
    for c in ((0.2, 0.2, 0.2), (0.75, 0.7, 0.3), (0.5, 0.55, 0.8)):
        pts.append(np.asarray(c) * box + rng.normal(0, 0.015 * box, (k, 3)))
    pts.append(rng.uniform(0.02 * box, 0.98 * box, (n - 3 * k, 3)))
    r = np.concatenate(pts)
    return np.clip(r, 1e-6, box * (1 - 1e-6))


def test_adaptive_fmm_matches_direct_clustered():
    rng = np.random.default_rng(11)
    n, box = 480, 10.0
    r = _clustered(rng, n, box)
    q = rng.uniform(-1.0, 1.0, n)
    q -= q.mean()  # neutral

    solver = AdaptiveFMMSolver(box=box, order=8, threshold=24)
    U, F, phi = solver.compute(r, q)
    U0, F0, phi0 = _direct(r, q)

    assert float(U) == pytest.approx(U0, rel=2e-4)
    fs = np.linalg.norm(F0, axis=1).max()
    assert np.max(np.linalg.norm(np.asarray(F) - F0, axis=1)) / fs < 5e-3
    ps = np.abs(phi0).max()
    assert np.max(np.abs(np.asarray(phi) - phi0)) / ps < 1e-3


def test_adaptive_fmm_gid_exclusion_exact():
    """3-site molecules scattered so tightly that threshold splits put
    sites of one molecule into different leaves: the MAC gid guard must
    keep every same-gid pair out of the far field (before the guard,
    deep splits silently leaked intramolecular Coulomb into U and F)."""
    rng = np.random.default_rng(7)
    nmol, box = 120, 8.0
    com = _clustered(rng, 3 * nmol, box)[:nmol]
    # intramolecular extent comparable to the deep-leaf edge
    offs = rng.normal(0, 0.25, (nmol, 3, 3))
    r = np.clip(
        (com[:, None, :] + offs).reshape(-1, 3), 1e-6, box * (1 - 1e-6)
    )
    q = np.tile([0.8, -0.4, -0.4], nmol)
    gid = np.repeat(np.arange(nmol, dtype=np.int32), 3)

    # tiny threshold forces splits well below the molecular extent
    solver = AdaptiveFMMSolver(box=box, order=8, threshold=4)
    U, F, phi = solver.compute(r, q, gid=gid)
    U0, F0, _ = _direct(r, q, gid=gid)

    assert float(U) == pytest.approx(U0, rel=5e-4)
    fs = np.linalg.norm(F0, axis=1).max()
    assert np.max(np.linalg.norm(np.asarray(F) - F0, axis=1)) / fs < 5e-3

    # and the leak magnitude is material: the same scene WITHOUT gid
    # exclusion has a very different energy, so the tolerance above
    # genuinely discriminates
    U_all, _, _ = _direct(r, q)
    assert abs(U_all - U0) > 100 * abs(U0) * 5e-4


def test_adaptive_fmm_plan_reuse_and_valid_mask():
    """A reused TreePlan re-enters the compiled evaluator; invalid
    slots contribute nothing."""
    rng = np.random.default_rng(3)
    n, box = 256, 6.0
    r = rng.uniform(0.1, box - 0.1, (n, 3))
    q = rng.uniform(-1, 1, n)
    valid = np.ones(n, bool)
    valid[::7] = False

    solver = AdaptiveFMMSolver(box=box, order=6, threshold=16)
    plan = solver.build_plan(r, valid)
    U, F, _ = solver.compute(r, q, valid=valid, plan=plan)
    U0, F0, _ = _direct(r[valid], q[valid])
    assert float(U) == pytest.approx(U0, rel=5e-4)
    assert np.allclose(np.asarray(F)[~valid], 0.0)
    fs = np.linalg.norm(F0, axis=1).max()
    err = np.linalg.norm(np.asarray(F)[valid] - F0, axis=1).max() / fs
    assert err < 5e-3
