"""Generate the committed bench seed: an equilibrated 1CLJ liquid.

The benchmark state must be an EQUILIBRATED liquid (sub-Poissonian
density fluctuations admit the coarse cell grid, see bench.py), but
equilibrating N=4.2M from the lattice costs ~600 steps of full-size
kernel work -- that cold start is what timed out the round-2 driver
bench (BENCH_r02.json rc=124).  Instead we equilibrate N/8 once,
commit it (assets/bench_seed_524288.npz, ~12 MB), and the bench tiles
it 2x2x2: each octant is a periodic replica, so the tiled state is a
valid liquid configuration of the double-size box with identical
per-cell occupancy statistics, and the bench cold start is just
load + tile + compile.

Usage: python tools/make_bench_seed.py [steps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene

    n = 524288  # 4_194_304 / 8
    rho = 0.8
    rc = 2.5
    temperature = 1.1
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200

    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)

    # lattice-safe grid at cap=32: the perfect lattice aliases cell
    # planes, so measure occupancy on the host and refine until it
    # fits (avoids paying a second ~150 s kernel compile on a cap
    # escalation retry)
    cap = 32
    nd = max(4, int(np.floor(L / (rc + 0.2))))
    nd -= nd % 4
    while nd >= 8:
        edge = L / nd
        c = np.clip((np.asarray(data.r) / edge).astype(np.int64), 0, nd - 1)
        lin = (c[:, 0] * nd + c[:, 1]) * nd + c[:, 2]
        if np.bincount(lin, minlength=nd ** 3).max() <= cap - 2:
            break
        nd += 4
        if L / nd < rc:
            nd -= 4
            cap *= 2
            break
    spec = CellGridSpec(
        dims=(nd, nd, nd),
        box=tuple(float(b) for b in np.asarray(box)),
        cap=cap,
    )
    print("grid", spec.dims, "cap", cap, flush=True)
    sim = RMMSimulation(
        table, pp, box, spec, dt=0.002,
        target_temperature=temperature, thermostat=True,
        tx=max(1, 128 // cap), rebin_every=16, sample_every=64,
    )
    sim.init_from_molecules(mol)
    t0 = time.perf_counter()
    gv = sim.run(steps)
    print("equilibrated %d steps in %.1fs  T=%.4f  upot/N=%.4f" % (
        steps, time.perf_counter() - t0, float(gv.temperature),
        float(gv.upot) / n))
    m = sim.to_molecules()
    r = np.asarray(m.r, np.float64) % L
    v = np.asarray(m.v, np.float64)
    # remove net momentum so tiling does not replicate a drift
    v -= v.mean(axis=0, keepdims=True)
    out = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "bench_seed_%d.npz" % n)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, r=r.astype(np.float32), v=v.astype(np.float32),
                        L=L, rho=rho, rc=rc, temperature=temperature,
                        steps=steps)
    print("wrote", os.path.abspath(out), os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
