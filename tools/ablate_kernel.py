"""Ablation study of the 1CLJ row kernel: where does the time go?

Levels build the kernel up piece by piece on the bench-shaped scene:
  dma    : load i tile + 9 j windows, write zeros (loop + DMA skeleton)
  bcast  : + the 3 jplane selector matmuls per row
  dr2    : + dx/dy/dz + dr2 + mask
  phys   : + reciprocal + LJ + fac (no reductions)
  force  : + the 3 force reductions (axis=0 sums)
  macro  : + u6/virial reductions       == full kernel
  defer  : full kernel but force/macro reductions deferred to [8,txc]
           partials collapsed once per tile (reduction-cost probe)
"""

import functools
import os
import sys
import time
from typing import Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
_CENTER = 4
NPLANE = 4


def make_kernel(level, nx, cap, tx, ny, nz, box, eps24, sig2, shift6, rc2, out_dtype):
    def kern(i_ref, *refs):
        row_refs = refs[:9]
        f_ref = refs[9]
        _bx, by, bz = box
        txc = tx * cap
        win = (tx + 2) * cap
        n_tiles = nx // tx
        e24 = jnp.asarray(eps24, out_dtype)
        s2 = jnp.asarray(sig2, out_dtype)
        sh6 = jnp.asarray(shift6, out_dtype)
        cut2 = jnp.asarray(rc2, out_dtype)
        sub4 = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, 1), 0)
        ohr = [(sub4 == c).astype(out_dtype) for c in range(NPLANE)]
        sub4c = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, txc), 0)
        Bsel = [(sub4c == c).astype(out_dtype) for c in range(NPLANE)]
        wlT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 0)
        ilT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 1)
        not_selfT = wlT != ilT + cap
        clx = _bx / nx
        cly = by / ny
        clz = bz / nz
        xoffT = ((ilT // cap) - (wlT // cap) + 1).astype(out_dtype) * clx
        lane_txc = jax.lax.broadcasted_iota(jnp.int32, (1, txc), 1)
        lane0 = (lane_txc == 0).astype(out_dtype)
        lane1 = (lane_txc == 1).astype(out_dtype)

        def tile(t, _):
            off = pl.multiple_of(t * txc, txc)
            ti = i_ref[0, 0, :, pl.ds(off, txc)]
            u6_t = jnp.zeros((), out_dtype)
            vir_t = jnp.zeros((), out_dtype)
            xi = jnp.sum(ti * ohr[0], axis=0, keepdims=True)
            yi = jnp.sum(ti * ohr[1], axis=0, keepdims=True)
            zi = jnp.sum(ti * ohr[2], axis=0, keepdims=True)
            fx = jnp.zeros((1, txc), out_dtype)
            fy = jnp.zeros((1, txc), out_dtype)
            fz = jnp.zeros((1, txc), out_dtype)
            if level == "defer":
                fx8 = jnp.zeros((8, txc), out_dtype)
                fy8 = jnp.zeros((8, txc), out_dtype)
                fz8 = jnp.zeros((8, txc), out_dtype)
                m8 = jnp.zeros((8, txc), out_dtype)
            acc = jnp.zeros((1, txc), out_dtype)
            for k, (dz, dy) in enumerate(_OFFS):
                H = row_refs[k][0, 0, :, pl.ds(off, win)]
                if level == "dma":
                    acc = acc + jnp.sum(H * ohr[0], axis=0, keepdims=True)[:, :txc]
                    continue

                def jplane(c):
                    return jax.lax.dot_general(
                        H, Bsel[c], (((0,), (0,)), ((), ())),
                        preferred_element_type=out_dtype,
                    )

                Xj = jplane(0)
                Yj = jplane(1)
                Zj = jplane(2)
                if level == "bcast":
                    acc = acc + Xj[:1] + Yj[:1] + Zj[:1]
                    continue
                yis = yi - jnp.asarray(dy * cly, out_dtype)
                zis = zi - jnp.asarray(dz * clz, out_dtype)
                dx = xi - Xj + xoffT
                dyv = yis - Yj
                dzv = zis - Zj
                dr2 = dx * dx + dyv * dyv + dzv * dzv
                mask = dr2 < cut2
                if k == _CENTER:
                    mask = mask & not_selfT
                if level == "dr2":
                    acc = acc + jnp.sum(mask.astype(out_dtype), axis=0, keepdims=True)
                    continue
                den = jnp.where(mask, dr2, jnp.asarray(1e30, out_dtype))
                r0 = pl.reciprocal(den, approx=True)
                invdr2 = r0 * (2.0 - den * r0)
                mf = mask.astype(out_dtype)
                lj6 = s2 * invdr2
                lj6 = lj6 * lj6 * lj6
                lj12 = lj6 * lj6
                lj12m6 = lj12 - lj6
                fac = e24 * (lj12 + lj12m6) * invdr2
                if level == "phys":
                    acc = acc + fac[:1] + lj12m6[:1]
                    continue
                if level == "defer":
                    nwin = win // 8
                    fx8 = fx8 + jnp.sum((fac * dx).reshape(nwin, 8, txc), axis=0)
                    fy8 = fy8 + jnp.sum((fac * dyv).reshape(nwin, 8, txc), axis=0)
                    fz8 = fz8 + jnp.sum((fac * dzv).reshape(nwin, 8, txc), axis=0)
                    m8 = m8 + jnp.sum(
                        (e24 * lj12m6 + sh6 * mf + fac * dr2).reshape(nwin, 8, txc),
                        axis=0,
                    )
                    continue
                if level in ("force", "macro"):
                    fx = fx + jnp.sum(fac * dx, axis=0, keepdims=True)
                    fy = fy + jnp.sum(fac * dyv, axis=0, keepdims=True)
                    fz = fz + jnp.sum(fac * dzv, axis=0, keepdims=True)
                if level == "macro":
                    u6_t = u6_t + jnp.sum(e24 * lj12m6 + sh6 * mf)
                    vir_t = vir_t + jnp.sum(fac * dr2)
            if level == "defer":
                fx = jnp.sum(fx8, axis=0, keepdims=True)
                fy = jnp.sum(fy8, axis=0, keepdims=True)
                fz = jnp.sum(fz8, axis=0, keepdims=True)
                u6_t = jnp.sum(m8)
                vir_t = jnp.zeros((), out_dtype)
            scal = (0.5 * u6_t) * lane0 + (0.5 * vir_t) * lane1
            out4 = ohr[0] * (fx + acc) + ohr[1] * fy + ohr[2] * fz + ohr[3] * scal
            f_ref[0, 0, :, pl.ds(off, txc)] = out4
            return _

        jax.lax.fori_loop(0, n_tiles, tile, 0)

    return kern


def run_level(level, r_i, r_j, nx, ny, nz, cap, tx, box, rc2):
    Wj = (nx + 2) * cap
    out_dtype = r_i.dtype
    i_spec = pl.BlockSpec((1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0),
                          memory_space=pltpu.VMEM)
    jmap = lambda z, y, dz, dy: ((z + dz) % nz, (y + dy) % ny, 0, 0)
    j_specs = [
        pl.BlockSpec((1, 1, NPLANE, Wj), functools.partial(jmap, dz=dz, dy=dy),
                     memory_space=pltpu.VMEM)
        for dz, dy in _OFFS
    ]
    out_spec = pl.BlockSpec((1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = make_kernel(level, nx, cap, tx, ny, nz, box, 24.0, 1.0, 0.0, rc2,
                         out_dtype)
    fn = jax.jit(lambda a, b: jnp.sum(pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), out_dtype),
    )(a, *([b] * 9))[0, 0, 0]))
    for _ in range(2):
        float(fn(r_i, r_j))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            s = fn(r_i, r_j)
        float(s)
        ts.append((time.perf_counter() - t0) / 3)
    return min(ts)


def main():
    nd, cap, tx = 64, 32, 4
    nx = ny = nz = nd
    cl = 2.712
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(5)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float32)
    slot = np.arange(W) % cap
    invalid = slot >= 16
    ysent = 1e3 * (1.0 + slot.astype(np.float32))
    r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
    w = np.where(invalid, 0.0, 1.0).astype(np.float32)
    r_i = jnp.asarray(np.concatenate(
        [r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2))
    left = r_i[:, :, :, (nx - 1) * cap:]
    right = r_i[:, :, :, :cap]
    r_j = jnp.concatenate([left, r_i, right], axis=3)
    levels = sys.argv[1:] or ["dma", "bcast", "dr2", "phys", "force", "macro", "defer"]
    for level in levels:
        t = run_level(level, r_i, r_j, nx, ny, nz, cap, tx, box, 2.5 ** 2)
        print(f"{level:7s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
