"""Timing ablations for the cell-window (cw) 1CLJ kernel.

Times pallas_call directly on synthetic packed planes (no sim
machinery), mutating one mechanism at a time.  Some ablations are
physics-WRONG on purpose (e.g. aligned=1 reads the wrong window) --
they exist only to attribute time.

    python tools/ablate_cw.py [nd] [variants...]

variants:
  cw        the production kernel as-is
  lanej     the lanej kernel for comparison
  nomacro   compute_macro=False

Historical ablations (2026-08-18, nd=64): in-kernel misaligned
32-lane window slices cost 95 ms/step (213 vs 118 aligned) -- hence
the phase-stacked j copies; one-hot plane extraction lost 16 ms to
sublane slices.
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from ls1_mardyn_tpu.ops import pallas_lj as P

    args = sys.argv[1:]
    nd = int(args[0]) if args and args[0].isdigit() else 64
    variants = [a for a in args if not a.isdigit()] or ["cw", "lanej", "nomacro"]
    cap, tx = 32, 4
    nx = ny = nz = nd
    cl = 2.7
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(0)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float32)
    slot = np.arange(W) % cap
    invalid = slot >= 16
    ysent = P.SENTINEL_SCALE * (1.0 + slot.astype(np.float32))
    r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
    r[:, :, 0, :] = np.where(invalid[None, None], 0.0, r[:, :, 0, :])
    r[:, :, 2, :] = np.where(invalid[None, None], 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0).astype(np.float32)
    r_i = jnp.asarray(
        np.concatenate([r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2)
    )
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j2 = jnp.concatenate([left, r_i, r_i[:, :, :, :cap]], axis=3)
    r_j4 = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    kw = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
              eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
              compute_macro=True, sentinel=True, fast_recip=True)

    fns = {}
    for v in variants:
        if v == "lanej":
            fns[v] = jax.jit(
                lambda ri, rj2, rj4: P.lj_cell_forces_pallas_lanej(
                    ri, rj2, hx=1, defer=True, **kw
                )[1]
            )
        elif v == "nomacro":
            kw2 = dict(kw, compute_macro=False)
            fns[v] = jax.jit(
                lambda ri, rj2, rj4, kw2=kw2: P.lj_cell_forces_pallas_cw(
                    ri, rj4, **kw2
                )[1]
            )
        else:
            fns[v] = jax.jit(
                lambda ri, rj2, rj4: P.lj_cell_forces_pallas_cw(ri, rj4, **kw)[1]
            )

    out = {}
    for v, fn in fns.items():
        out[v] = float(fn(r_i, r_j2, r_j4))
    print("u6:", out)

    times = {v: [] for v in fns}
    for _ in range(5):
        for v, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(r_i, r_j2, r_j4))
            times[v].append(time.perf_counter() - t0)
    n = nd ** 3 * 16  # approx molecule count (16 real slots per cell)
    for v in variants:
        t = min(times[v])
        print("%-9s min %8.2f ms  -> %6.1f Mupd/s" % (v, t * 1e3, n / t / 1e6))


if __name__ == "__main__":
    main()
