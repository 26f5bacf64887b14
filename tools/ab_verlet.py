"""A/B: sorted Verlet pair rows vs the dense cwn3l cell-window kernel.

The one algorithmically different short-range design left after the
round-2 pruning campaigns (VERDICT r2 'next' item 2): build, at
verlet-skin cadence, a per-molecule row of <= K neighbor indices
(sorted by cell so consecutive molecules share nearby neighbors), and
evaluate forces each step from gathered neighbor coordinates.  Pair
work drops from ~512-640 candidate lanes per slot to ~K=48 REAL
neighbors -- IF the per-step gather of [N, K] neighbor coordinates is
cheap enough.

This tool measures exactly that gate on the real chip at bench scale:
  1. gather microbenchmarks [M] <- [N, 3] at three index localities
     (random, cell-sorted, contiguous) -- the locality spread shows
     whether sorting can rescue the design;
  2. the implied Verlet force-step time at N=4.2M, K=48
     (gather + ~12-op LJ row math), chunked to bound memory;
  3. an interleaved cwn3l step for the same session's baseline.

Run on TPU: python tools/ab_verlet.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene

    n = int(os.environ.get("LS1_AB_N", 4_194_304))
    K = int(os.environ.get("LS1_AB_K", 48))
    rho, rc, T = 0.8, 2.5, 1.1
    L = (n / rho) ** (1 / 3)

    seed = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "assets", "bench_seed_524288.npz")
    z = np.load(seed)
    r0 = z["r"].astype(np.float64)
    L0 = float(z["L"])
    t = round((n / len(r0)) ** (1 / 3))
    offs = np.array([(i, j, k) for i in range(t) for j in range(t)
                     for k in range(t)], float) * L0
    r = ((r0[None] + offs[:, None]).reshape(-1, 3)) % (L0 * t)
    L = L0 * t

    def sync(x):
        return float(jnp.sum(x[..., :1]))

    def timeit(f, *args, reps=3, inner=4):
        f(*args)  # compile
        best = 1e30
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = f(*args)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    # --- 1. gather microbenchmarks -------------------------------------
    print("# gather microbench: y = x[idx] from [N,3] f32, M = N*K/16")
    x = jnp.asarray(r, jnp.float32)
    M = n * K // 16  # one 1/16 chunk of the full [N, K] index set
    rng = np.random.default_rng(0)
    idx_rand = rng.integers(0, n, M).astype(np.int32)
    idx_sorted = np.sort(idx_rand)
    idx_contig = (np.arange(M) % n).astype(np.int32)
    gather = jax.jit(lambda x, i: x[i])
    for name, idx in (("random", idx_rand), ("cell-sorted", idx_sorted),
                      ("contiguous", idx_contig)):
        ii = jnp.asarray(idx)
        dt = timeit(gather, x, ii)
        gbs = M * 12 / dt / 1e9
        print(f"  {name:12s}: {dt*1e3:8.2f} ms for {M} rows "
              f"-> {gbs:7.2f} GB/s")

    # --- 2. implied Verlet force step ----------------------------------
    # per chunk: gather [C, K, 3] neighbor coords, LJ row math, rowsum
    C = n // 16
    nbr = np.sort(
        rng.integers(0, n, (C, K)).astype(np.int32), axis=1
    )
    nbr_j = jnp.asarray(nbr)
    ri = x[:C]

    @jax.jit
    def verlet_chunk(x, ri, nbr):
        xj = x[nbr.reshape(-1)].reshape(C, K, 3)
        dr = ri[:, None, :] - xj
        dr = dr - jnp.round(dr / L) * L
        dr2 = jnp.sum(dr * dr, axis=-1)
        inv = jnp.where(dr2 < rc * rc, 1.0 / jnp.maximum(dr2, 1e-12), 0.0)
        lj6 = inv * inv * inv
        fac = 24.0 * (lj6 * inv) * (2.0 * lj6 - 1.0)
        return jnp.sum(fac[..., None] * dr, axis=1)

    dt_chunk = timeit(verlet_chunk, x, ri, nbr_j)
    step_est = dt_chunk * 16
    print(f"# verlet chunk ({C}x{K}): {dt_chunk*1e3:.1f} ms "
          f"-> full step est {step_est*1e3:.1f} ms")

    # --- 3. interleaved cwn3l baseline ----------------------------------
    data = cubic_grid(n, [L, L, L], T, seed=7)
    data.r, data.v = r, np.tile(z["v"].astype(np.float64), (t ** 3, 1))
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    spec = CellGridSpec(dims=(56, 60, 60),
                        box=tuple(float(b) for b in np.asarray(box)), cap=32)
    sim = RMMSimulation(table, pp, box, spec, dt=0.002,
                        target_temperature=T, thermostat=True, tx=4,
                        rebin_every=10 ** 9, sample_every=10 ** 9)
    sim.init_from_molecules(mol)
    import functools

    import jax as _jax
    step = _jax.jit(functools.partial(sim._step, compute_macro=False))
    st, _ = step(sim.state)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        s = sim.state
        for _ in range(4):
            s, _ = step(s)
        float(jnp.sum(s.forces[0, 0, 0, :1]))
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"# cwn3l dense step (same session): {best*1e3:.1f} ms")
    print(f"# verdict: verlet/cwn3l = {step_est/best:.2f}x "
          f"({'verlet WINS' if step_est < best else 'cwn3l wins'})")


if __name__ == "__main__":
    main()
