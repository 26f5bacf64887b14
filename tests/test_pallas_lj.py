"""Golden tests for the Pallas 1CLJ kernel vs the plain-JAX cell path.

The TPU analogue of VCP1CLJRMMTest (/root/reference/src/
particleContainer/adapter/tests/ — SIMD kernel vs scalar oracle); here
the Pallas kernel runs in interpret mode on CPU and must match the
already-oracle-validated cell path to f64 machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.models.components import Component
from ls1_mardyn_tpu.ops.cellforce import compute_forces_cells
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles, neighbor_table
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
from ls1_mardyn_tpu.scene import build_scene


def _run_both(n, rho, cutoff, cap, shifted=False, seed=3):
    L = (n / rho) ** (1.0 / 3.0)
    comps = None
    if shifted:
        c = Component(cid=0)
        c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.3, 0.9, cutoff, True)
        comps = [c]
    data = cubic_grid(n, [L, L, L], 1.0, components=comps, seed=seed)
    mol, pp, table, box = build_scene(data, cutoff=cutoff, dtype=jnp.float64)
    spec = CellGridSpec.create(np.asarray(box), cutoff, cap=cap)
    nbr_ids, nbr_shift = neighbor_table(spec)
    bins = bin_particles(mol.r, mol.valid, spec)
    f_ref, m_ref = jax.jit(
        lambda mol, bins: compute_forces_cells(
            mol, pp, spec, bins,
            jnp.asarray(nbr_ids), jnp.asarray(nbr_shift, mol.r.dtype),
            cell_chunk=16,
        )
    )(mol, bins)
    path = PallasLJPath(table, spec, interpret=True)
    f_pal, m_pal, _ = jax.jit(path.__call__)(mol)
    return f_ref, m_ref, f_pal, m_pal


@pytest.mark.parametrize("shifted", [False, True])
def test_pallas_lj_matches_cell_path(shifted):
    f_ref, m_ref, f_pal, m_pal = _run_both(
        500, 0.55, cutoff=2.5, cap=32, shifted=shifted
    )
    scale = np.abs(np.asarray(f_ref.F)).max()
    np.testing.assert_allclose(
        np.asarray(f_pal.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-13
    )
    np.testing.assert_allclose(
        float(m_pal.upot6lj), float(m_ref.upot6lj), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(m_pal.virial), float(m_ref.virial), rtol=1e-12
    )


def test_pallas_lj_partial_occupancy():
    """Uneven cell occupancy + invalid padding slots must contribute
    exact zeros."""
    f_ref, m_ref, f_pal, m_pal = _run_both(193, 0.2, cutoff=3.0, cap=64)
    scale = np.abs(np.asarray(f_ref.F)).max()
    np.testing.assert_allclose(
        np.asarray(f_pal.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-13
    )
    np.testing.assert_allclose(
        float(m_pal.upot6lj), float(m_ref.upot6lj), rtol=1e-12
    )


def test_pallas_lj_sentinel_f32_large_cap():
    """Regression: sentinel fill values must survive the f32 rounding
    of the neighbor-row cell shift.  At scale 1e6 with cap=128 the
    same-slot sentinel pairs rounded back onto each other (ulp ~ 16 at
    1e8), dr2 collapsed to ~0, and the kernel emitted garbage pairs
    (constant Upot offset) or NaNs.  f64 golden tests can't see this."""
    from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit

    n, rho, cutoff = 343, 0.55, 2.5
    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], 1.1, seed=0)
    mol, pp, table, box = build_scene(data, cutoff=cutoff, dtype=jnp.float32)
    f_ref, m_ref = compute_forces_n2_jit(mol, pp, box)
    spec = CellGridSpec.create(
        tuple(map(float, np.asarray(box))), cutoff, cap=128
    )
    path = PallasLJPath(table, spec, interpret=True)
    assert path.sentinel, "scene must exercise sentinel mode"
    f_k, m_k, _ = jax.jit(path.__call__)(mol)
    F = np.asarray(f_k.F)
    assert np.isfinite(F).all()
    scale = np.abs(np.asarray(f_ref.F)).max()
    np.testing.assert_allclose(
        F / scale, np.asarray(f_ref.F) / scale, atol=2e-6
    )
    np.testing.assert_allclose(float(m_k.upot), float(m_ref.upot), rtol=1e-5)


@pytest.mark.parametrize("sentinel,gram", [(False, False), (True, False), (False, True)])
def test_pallas_lj_zb_matches_row_kernel(sentinel, gram):
    """The z-banded kernel (3 whole z-planes per program, index-map
    mod periodicity) must reproduce the row kernel bit-for-bit on the
    same packed planes."""
    from ls1_mardyn_tpu.ops.pallas_lj import (
        SENTINEL_SCALE,
        lj_cell_forces_pallas,
        lj_cell_forces_pallas_zb,
    )

    nd, cap, tx = 4, 32, 4
    nx = ny = nz = nd
    cl = 2.8
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(5)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float64)
    slot = np.arange(W) % cap
    invalid = slot >= 20
    if sentinel:
        ysent = SENTINEL_SCALE * (1.0 + slot.astype(np.float64))
        r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
        r[:, :, 0, :] = np.where(invalid[None, None], 0.0, r[:, :, 0, :])
        r[:, :, 2, :] = np.where(invalid[None, None], 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0)
    r_i = jnp.asarray(
        np.concatenate([r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2)
    )
    left = r_i[:, :, :, (nx - 1) * cap:]
    right = r_i[:, :, :, :cap]
    r_j = jnp.concatenate([left, r_i, right], axis=3)
    kw = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
              eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
              interpret=True, compute_macro=True, hx=1,
              sentinel=sentinel, fast_recip=False)
    out_a, u6_a, vir_a = lj_cell_forces_pallas(
        r_i, r_j, local_coords=True, jt=True, **kw
    )
    out_b, u6_b, vir_b = lj_cell_forces_pallas_zb(r_i, r_j, gram=gram, **kw)
    tol = 1e-9 if gram else 1e-12  # f64 Gram cancellation ~ulp(|r|^2)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=tol)
    np.testing.assert_allclose(float(u6_b), float(u6_a), rtol=tol)
    np.testing.assert_allclose(float(vir_b), float(vir_a), rtol=tol)


@pytest.mark.parametrize("sentinel", [False, True])
def test_pallas_lj_cw_matches_row_kernel(sentinel):
    """The cell-window kernel (per-i-cell 4-cell j windows as static
    lane sub-slices) must reproduce the jt row kernel bit-for-bit on
    the same packed planes; the alignment-pad 4th window cell must
    contribute exact zeros."""
    from ls1_mardyn_tpu.ops.pallas_lj import (
        SENTINEL_SCALE,
        lj_cell_forces_pallas,
        lj_cell_forces_pallas_cw,
    )

    nd, cap, tx = 4, 32, 4
    nx = ny = nz = nd
    cl = 2.8
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(5)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float64)
    slot = np.arange(W) % cap
    invalid = slot >= 20
    if sentinel:
        ysent = SENTINEL_SCALE * (1.0 + slot.astype(np.float64))
        r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
        r[:, :, 0, :] = np.where(invalid[None, None], 0.0, r[:, :, 0, :])
        r[:, :, 2, :] = np.where(invalid[None, None], 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0)
    r_i = jnp.asarray(
        np.concatenate([r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2)
    )
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, :cap]], axis=3)
    r_j_cw = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    kw = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
              eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
              interpret=True, compute_macro=True,
              sentinel=sentinel, fast_recip=False)
    out_a, u6_a, vir_a = lj_cell_forces_pallas(
        r_i, r_j, local_coords=True, jt=True, hx=1, **kw
    )
    out_b, u6_b, vir_b = lj_cell_forces_pallas_cw(r_i, r_j_cw, **kw)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=1e-12)
    np.testing.assert_allclose(float(u6_b), float(u6_a), rtol=1e-12)
    np.testing.assert_allclose(float(vir_b), float(vir_a), rtol=1e-12)


@pytest.mark.parametrize("sentinel,gsub", [(False, 1), (True, 1),
                                           (False, 2), (True, 4)])
def test_pallas_lj_cwn3l_matches_cw(sentinel, gsub):
    """The Newton-3rd-law cell-window kernel (5 forward rows, j-side
    forces via phase scratch + fold) must reproduce the cw kernel at
    every register-split factor gsub."""
    from ls1_mardyn_tpu.ops.pallas_lj import (
        SENTINEL_SCALE,
        lj_cell_forces_pallas_cw,
        lj_cell_forces_pallas_cwn3l,
    )

    nd, cap, tx = 4, 32, 4
    nx = ny = nz = nd
    cl = 2.8
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(5)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float64)
    slot = np.arange(W) % cap
    invalid = slot >= 20
    if sentinel:
        ysent = SENTINEL_SCALE * (1.0 + slot.astype(np.float64))
        r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
        r[:, :, 0, :] = np.where(invalid[None, None], 0.0, r[:, :, 0, :])
        r[:, :, 2, :] = np.where(invalid[None, None], 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0)
    r_i = jnp.asarray(
        np.concatenate([r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2)
    )
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    kw = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
              eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
              interpret=True, compute_macro=True,
              sentinel=sentinel, fast_recip=False)
    out_a, u6_a, vir_a = lj_cell_forces_pallas_cw(r_i, r_j, **kw)
    out_b, u6_b, vir_b = lj_cell_forces_pallas_cwn3l(r_i, r_j, gsub=gsub, **kw)
    fa = np.asarray(out_a)[:, :, :3]
    fb = np.asarray(out_b)[:, :, :3]
    scale = np.abs(fa).max()
    np.testing.assert_allclose(fb / scale, fa / scale, atol=1e-12)
    np.testing.assert_allclose(float(u6_b), float(u6_a), rtol=1e-11)
    np.testing.assert_allclose(float(vir_b), float(vir_a), rtol=1e-11)

@pytest.mark.parametrize(
    "sentinel,gsub,nd",
    # nd=8 exercises the multi-tile (n_tiles_pk > 1) scratch indexing
    # (opk = t*PKW + k*gw) and the per-tile pad/flatten/roll unfold,
    # which production geometries (nx ~ 60) rely on
    [(False, 1, 4), (True, 2, 4), (False, 1, 8)],
)
def test_pallas_lj_cwn3l_pack_matches_dense(sentinel, gsub, nd):
    """Packed-window mode (14 in-cutoff window cells re-packed into 4
    dense 128-lane chunks) must reproduce the dense 5-row cwn3l kernel:
    the dropped x+2 cells and the center row's backward/x+2 lanes are
    all outside the cutoff, and the pad block's BIGPAD x coordinate
    keeps its lanes masked."""
    from ls1_mardyn_tpu.ops.pallas_lj import (
        SENTINEL_SCALE,
        lj_cell_forces_pallas_cwn3l,
    )

    cap, tx = 32, 4
    nx = ny = nz = nd
    cl = 2.8
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(17)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float64)
    slot = np.arange(W) % cap
    invalid = slot >= 20
    if sentinel:
        ysent = SENTINEL_SCALE * (1.0 + slot.astype(np.float64))
        r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
        r[:, :, 0, :] = np.where(invalid[None, None], 0.0, r[:, :, 0, :])
        r[:, :, 2, :] = np.where(invalid[None, None], 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0)
    r_i = jnp.asarray(
        np.concatenate([r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2)
    )
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    kw = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
              eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
              interpret=True, compute_macro=True,
              sentinel=sentinel, fast_recip=False)
    out_a, u6_a, vir_a = lj_cell_forces_pallas_cwn3l(r_i, r_j, gsub=gsub, **kw)
    out_b, u6_b, vir_b = lj_cell_forces_pallas_cwn3l(
        r_i, r_j, gsub=gsub, pack=True, **kw
    )
    fa = np.asarray(out_a)[:, :, :3]
    fb = np.asarray(out_b)[:, :, :3]
    scale = np.abs(fa).max()
    np.testing.assert_allclose(fb / scale, fa / scale, atol=1e-12)
    np.testing.assert_allclose(float(u6_b), float(u6_a), rtol=1e-11)
    np.testing.assert_allclose(float(vir_b), float(vir_a), rtol=1e-11)


@pytest.mark.parametrize("sentinel,prefix", [(True, 16), (False, 24), (True, 8)])
def test_pallas_lj_cwn3l_skip_tail(sentinel, prefix):
    """Occupancy skipping (dense prefix + pl.when-guarded tail slabs on
    front-packed cells) must reproduce the dense cwn3l kernel exactly:
    skipped slabs hold only invalid slots whose pair blocks are exact
    zeros on both the i and the j (N3L fold) side."""
    from ls1_mardyn_tpu.ops.pallas_lj import (
        SENTINEL_SCALE,
        lj_cell_forces_pallas_cwn3l,
    )

    nd, cap, tx = 4, 32, 4
    nx = ny = nz = nd
    cl = 2.8
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(11)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float64)
    slot = np.arange(W) % cap
    # front-packed variable occupancy spanning every slab boundary
    occ = rng.integers(2, cap + 1, size=(nz, ny, nx)).astype(np.int32)
    occ_l = np.repeat(occ.reshape(nz, ny, nx), cap, axis=-1)
    invalid = slot[None, None, :] >= occ_l
    if sentinel:
        ysent = SENTINEL_SCALE * (1.0 + slot.astype(np.float64))
        r[:, :, 1, :] = np.where(invalid, ysent[None, None], r[:, :, 1, :])
        r[:, :, 0, :] = np.where(invalid, 0.0, r[:, :, 0, :])
        r[:, :, 2, :] = np.where(invalid, 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0)
    r_i = jnp.asarray(np.concatenate([r, w[:, :, None, :]], axis=2))
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    kw = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
              eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
              interpret=True, compute_macro=False,
              sentinel=sentinel, fast_recip=False)
    out_a, _, _ = lj_cell_forces_pallas_cwn3l(r_i, r_j, **kw)
    out_b, _, _ = lj_cell_forces_pallas_cwn3l(
        r_i, r_j, jnp.asarray(occ), prefix=prefix, skip_tail=True, **kw
    )
    fa = np.asarray(out_a)[:, :, :3]
    fb = np.asarray(out_b)[:, :, :3]
    scale = np.abs(fa).max()
    np.testing.assert_allclose(fb / scale, fa / scale, atol=1e-12)
