"""Interleaved A/B: dense cwn3l kernel vs packed-pencil kernel.

Synthetic equilibrated-liquid-like state at bench geometry (nd=60,
cap=32, ~19.4 molecules/cell, N~4.2M).  Both sides run their full
per-step force path (including the packed side's phase-stack build
and fold).  Timings are pipelined (queue k calls, sync once) because
the axon tunnel adds ~30-50 ms dispatch latency per synced call.

    python tools/ab_packed.py [nd] [occ_mean]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.ops import pallas_packed as PP
    from ls1_mardyn_tpu.ops import pallas_lj as P

    args = sys.argv[1:]
    nd = int(args[0]) if args and args[0].isdigit() else 60
    variants = [a for a in args if not a.isdigit()] or ["full"]
    occ_mean = 19.4
    cap, tx = 32, 4
    nx = ny = nz = nd
    cl = 2.9
    box = (nd * cl, nd * cl, nd * cl)
    rng = np.random.default_rng(0)
    W = nx * cap
    # non-overlapping start: per-cell 4x4x4 sub-lattice + jitter (the
    # uniform-random alternative creates dr2~0 pairs -> inf forces)
    sub = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"),
                   -1).reshape(-1, 3)
    slot_all = np.arange(W) % cap
    subpos = (sub[slot_all % 64 % len(sub)] + 0.5) * (cl / 4.0)
    jit = rng.uniform(-0.08, 0.08, size=(nz, ny, W, 3))
    r = np.clip(subpos[None, None] + jit, 0.0, cl * 0.999).astype(
        np.float32).transpose(0, 1, 3, 2)
    slot = slot_all
    # sub-Poissonian occupancy like the equilibrated liquid
    occ = np.clip(
        np.round(rng.normal(occ_mean, 1.5, size=(nz, ny, nx))), 8, cap - 2
    ).astype(np.int32)
    invalid = slot[None, None, :] >= np.repeat(occ, cap, axis=-1)
    w = np.where(invalid, 0.0, 1.0).astype(np.float32)
    ysent = P.SENTINEL_SCALE * (1.0 + slot.astype(np.float32))
    r[:, :, 1, :] = np.where(invalid, ysent, r[:, :, 1, :])
    r[:, :, 0, :] = np.where(invalid, 0.0, r[:, :, 0, :])
    r[:, :, 2, :] = np.where(invalid, 0.0, r[:, :, 2, :])
    n = int(occ.sum())
    print(f"nd={nd} N={n} mean_occ={occ.mean():.1f}", flush=True)

    planes = np.concatenate(
        [r, w[:, :, None, :], np.zeros((nz, ny, 4, W), np.float32)], axis=2
    )
    planes = jnp.asarray(planes)
    f0 = jnp.zeros((nz, ny, 3, W), jnp.float32)

    kw = dict(nx=nx, ny=ny, nz=nz, box=box, eps24=24.0, sig2=1.0,
              shift6=0.1, rc2=2.5 ** 2, compute_macro=False,
              fast_recip=True)

    r_i = planes[:, :, :4, :]
    left = r_i[:, :, :, (nx - 1) * cap:]
    r_j = jnp.concatenate([left, r_i, r_i[:, :, :, : 3 * cap]], axis=3)

    Wp = PP._ceil_div(int(occ.sum(-1).max()) + 64, 128) * 128
    print(f"Wp={Wp} (max pencil {int(occ.sum(-1).max())})", flush=True)
    packed, pf, occ_j, starts, cnt, ovf = PP.pack_pencils(
        planes, f0, nx, cap, Wp
    )
    assert not bool(ovf)
    tab, meta, feas = PP.build_tables(occ_j, starts, cnt, nx=nx, Wp=Wp)
    assert bool(feas), "tables infeasible"
    pos4 = packed[:, :, :4, :]

    def run_dense(x):
        out, u6, vir = P.lj_cell_forces_pallas_cwn3l(
            x, jnp.concatenate(
                [x[:, :, :, (nx - 1) * cap:], x, x[:, :, :, : 3 * cap]],
                axis=3,
            ),
            cap=cap, tx=tx, sentinel=True, gsub=1, interpret=False, **kw
        )
        return jnp.sum(out[:, :, :3, :] ** 2)

    def make_packed(abl):
        def run_packed(x):
            f, u6, vir = PP.lj_forces_packed(
                x, tab, meta, Wp=Wp, interpret=False, ablate=abl, **kw
            )
            return jnp.sum(f ** 2)
        return jax.jit(run_packed)

    dense_j = jax.jit(run_dense)
    fns = {"dense": (dense_j, r_i)}
    for v in variants:
        abl = "" if v == "full" else v
        fns[v] = (make_packed(abl), pos4)

    # compile + sanity: the two paths see the same physics
    sd = float(dense_j(r_i))
    for v in variants:
        sp = float(fns[v][0](fns[v][1]))
        print(f"sum f^2 {v}: dense={sd:.6e} packed={sp:.6e} "
              f"rel={abs(sd - sp) / sd:.2e}", flush=True)

    def timed(fn, x, k=8):
        float(fn(x))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            acc = 0.0
            for _ in range(k):
                acc = acc + fn(x)
            float(acc)
            ts.append((time.perf_counter() - t0) / k)
        return min(ts)

    for rep in range(3):
        line = []
        for v, (fn, x) in fns.items():
            line.append(f"{v} {timed(fn, x) * 1e3:8.2f} ms")
        print(f"rep{rep}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
