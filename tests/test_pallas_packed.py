"""Packed-pencil kernel (ops/pallas_packed.py) vs the validated
cell-window kernel, plus pack/unpack round-trip invariants.

Mirrors the reference's SIMD-vs-oracle golden strategy
(/root/reference/src/particleContainer/adapter/tests/): the packed
kernel in f64 interpret mode must reproduce the (already
oracle-validated) cwn3l kernel on identical states, including the
periodic x-wrap edge groups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.ops import pallas_packed as PP
from ls1_mardyn_tpu.ops.pallas_lj import (
    SENTINEL_SCALE,
    lj_cell_forces_pallas_cwn3l,
)


def _dense_state(nd=6, cap=32, n_occ=20, cl=2.8, seed=7, dtype=np.float64):
    nx = ny = nz = nd
    W = nx * cap
    rng = np.random.default_rng(seed)
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(dtype)
    slot = np.arange(W) % cap
    # ragged occupancy: cell c of pencil (z,y) holds occ(c) molecules
    occ = rng.integers(n_occ - 8, n_occ + 1, size=(nz, ny, nx))
    invalid = slot[None, None, :] >= np.repeat(occ, cap, axis=-1)
    w = np.where(invalid, 0.0, 1.0)
    ysent = SENTINEL_SCALE * (1.0 + slot.astype(dtype))
    r[:, :, 1, :] = np.where(invalid, ysent, r[:, :, 1, :])
    r[:, :, 0, :] = np.where(invalid, 0.0, r[:, :, 0, :])
    r[:, :, 2, :] = np.where(invalid, 0.0, r[:, :, 2, :])
    v = rng.normal(size=(nz, ny, 3, W)).astype(dtype) * w[:, :, None, :]
    mid = (np.arange(nz * ny * W).reshape(nz, ny, W) % 9999).astype(dtype) * w
    planes = np.concatenate(
        [r, w[:, :, None, :], v, mid[:, :, None, :]], axis=2
    )
    f0 = rng.normal(size=(nz, ny, 3, W)).astype(dtype) * w[:, :, None, :]
    return jnp.asarray(planes), jnp.asarray(f0), nd, cap, cl


def test_pack_unpack_roundtrip():
    planes, f0, nd, cap, cl = _dense_state()
    W = nd * cap
    Wp = 256
    packed, pf, occ, starts, cnt, ovf = PP.pack_pencils(planes, f0, nd, cap, Wp)
    assert not bool(ovf)
    assert int(cnt.sum()) == int((np.asarray(planes)[:, :, 3] > 0.5).sum())
    # packed cx is nondecreasing over live lanes
    cx = np.asarray(packed[:, :, PP.PCX, :])
    live = np.asarray(packed[:, :, PP.PW, :]) > 0.5
    q = np.arange(Wp)
    for z in range(nd):
        for y in range(nd):
            c = cx[z, y][live[z, y]]
            assert (np.diff(c) >= 0).all()
    back, fb = PP.unpack_pencils(packed, pf, occ, starts, nd, cap)
    pv = np.asarray(planes)
    bv = np.asarray(back)
    wmask = pv[:, :, 3:4, :] > 0.5
    # valid molecules land back at the front of their cell (the pack
    # is stable, so slot order within a cell is preserved exactly)
    np.testing.assert_array_equal(bv[:, :, 3], pv[:, :, 3])
    for c in (0, 1, 2, 4, 5, 6, 7):
        np.testing.assert_allclose(
            np.where(wmask[:, :, 0], bv[:, :, c], 0.0),
            np.where(wmask[:, :, 0], pv[:, :, c], 0.0),
        )
    np.testing.assert_allclose(
        np.asarray(fb) * wmask, np.asarray(f0) * wmask
    )


@pytest.mark.parametrize("seed", [7, 11])
def test_packed_kernel_matches_cwn3l(seed):
    planes, f0, nd, cap, cl = _dense_state(seed=seed)
    nx = ny = nz = nd
    box = (nd * cl, nd * cl, nd * cl)
    kw = dict(nx=nx, ny=ny, nz=nz, box=box, eps24=24.0, sig2=1.0,
              shift6=0.1, rc2=2.5 ** 2, interpret=True,
              compute_macro=True, fast_recip=False)
    r_i = planes[:, :, :4, :]
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    out_a, u6_a, vir_a = lj_cell_forces_pallas_cwn3l(
        r_i, r_j, cap=cap, tx=2, sentinel=True, gsub=1, **kw
    )
    fa = np.asarray(out_a)[:, :, :3]

    Wp = 256
    packed, pf, occ, starts, cnt, ovf = PP.pack_pencils(
        planes, jnp.zeros_like(f0), nx, cap, Wp
    )
    assert not bool(ovf)
    tab, meta, feas = PP.build_tables(occ, starts, cnt, nx=nx, Wp=Wp)
    assert bool(feas)
    # the test scene must actually exercise the wrap pass
    assert int(np.asarray(meta)[:, :, 0, PP.M_ELO].sum()) > 0
    assert int(np.asarray(meta)[:, :, 0, PP.M_EHI].sum()) > 0
    fp, u6_b, vir_b = PP.lj_forces_packed(
        packed[:, :, :4, :], tab, meta, Wp=Wp, **kw
    )
    _, fb = PP.unpack_pencils(packed, fp, occ, starts, nx, cap)
    fbv = np.asarray(fb)
    wmask = np.asarray(planes)[:, :, 3, :] > 0.5
    scale = np.abs(fa).max()
    np.testing.assert_allclose(
        np.where(wmask[:, :, None, :].transpose(0, 1, 2, 3), fbv, 0.0) / scale,
        np.where(wmask[:, :, None, :].transpose(0, 1, 2, 3), fa, 0.0) / scale,
        atol=1e-12,
    )
    np.testing.assert_allclose(float(u6_b), float(u6_a), rtol=1e-11)
    np.testing.assert_allclose(float(vir_b), float(vir_a), rtol=1e-11)
