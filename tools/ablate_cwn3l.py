"""Timing ablations for the Newton-3rd-law cell-window (cwn3l) kernel.

Times pallas_call directly on synthetic packed planes, disabling one
mechanism at a time.  The ablations are PHYSICS-WRONG on purpose; they
exist only to attribute time.

    python tools/ablate_cwn3l.py [nd] [variants...]

variants:
  full      the production kernel (sentinel + fast_recip, no macro)
  macro     with the Upot/virial accumulators
  nojf      j-side force colsums + scratch RMW skipped
  nolj      LJ polynomial chain skipped (fac = invdr2)
  norcp     masking/reciprocal/Newton skipped too (fac = dr2)
  nojf+nolj both
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
    nd = int(args[0]) if args and args[0].isdigit() else 60
    variants = [a for a in args if not a.isdigit()] or [
        "full", "macro", "nojf", "nolj", "nojf+nolj", "norcp",
    ]
    cap, tx = 32, 4
    nx = ny = nz = nd
    cl = 2.9
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(0)
    W = nx * cap
    r = rng.uniform(0, cl, size=(nz, ny, 3, W)).astype(np.float32)
    slot = np.arange(W) % cap
    invalid = slot >= 20
    ysent = P.SENTINEL_SCALE * (1.0 + slot.astype(np.float32))
    r[:, :, 1, :] = np.where(invalid[None, None], ysent, r[:, :, 1, :])
    r[:, :, 0, :] = np.where(invalid[None, None], 0.0, r[:, :, 0, :])
    r[:, :, 2, :] = np.where(invalid[None, None], 0.0, r[:, :, 2, :])
    w = np.where(invalid, 0.0, 1.0).astype(np.float32)
    r_i = jnp.asarray(
        np.concatenate([r, np.broadcast_to(w, (nz, ny, W))[:, :, None, :]], axis=2)
    )
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)
    base = dict(nx=nx, ny=ny, nz=nz, cap=cap, tx=tx, box=box,
                eps24=24.0, sig2=1.0, shift6=0.1, rc2=2.5 ** 2,
                sentinel=True, fast_recip=True)

    fns = {}
    for v in variants:
        kw = dict(base)
        kw["compute_macro"] = v == "macro"
        toks = [t for t in v.replace("+", ",").split(",")
                if t not in ("full", "macro")]
        kw["gsub"] = 1
        for t in list(toks):
            if t.startswith("g") and t[1:].isdigit():
                kw["gsub"] = int(t[1:])
                toks.remove(t)
        kw["ablate"] = ",".join(toks)
        fns[v] = functools.partial(P.lj_cell_forces_pallas_cwn3l, **kw)
        out, u6, vir = fns[v](r_i, r_j)
        jax.block_until_ready(out)
        print(f"{v}: compiled  u6={float(u6):.3e}", flush=True)

    times = {v: [] for v in variants}
    reps, inner = 5, 3
    for rept in range(reps):
        for v in variants:
            out, _, _ = fns[v](r_i, r_j)
            float(out[0, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(inner):
                out, _, _ = fns[v](r_i, r_j)
            float(out[0, 0, 0, 0])
            times[v].append((time.perf_counter() - t0) / inner)
    for v in variants:
        ms = 1e3 * np.array(times[v])
        print(f"{v}: {ms.min():.1f} ms  all={np.round(ms, 1).tolist()}")


if __name__ == "__main__":
    main()
