"""Interleaved A/B: dense 5-row cwn3l fast step vs packed-window mode
(14 in-cutoff window cells in 4 dense 128-lane chunks, pack=True).

Uses the cached equilibrated bench state (/tmp/ls1_bench_equil_*.npz,
produced by bench.py) at the bench grid so the occupancy distribution
is the real one.  Timings are pipelined (queue k calls, sync once)
because the axon tunnel adds ~30-50 ms dispatch latency per synced
call.

    python tools/ab_pack.py [N]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene

    args = [a for a in sys.argv[1:]]
    n = int(args[0]) if args else 4_194_304
    rho, rc, temperature = 0.8, 2.5, 1.1
    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)
    cache = "/tmp/ls1_bench_equil_%d_%g.npz" % (n, rho)
    seed_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "bench_seed_524288.npz",
    )
    if os.path.exists(cache):
        z = np.load(cache)
        data.r = z["r"].astype(np.float64)
        data.v = z["v"].astype(np.float64)
        print("using equilibrated cache", cache)
    elif os.path.exists(seed_path) and n % 524288 == 0 and round(
        (n // 524288) ** (1 / 3)
    ) ** 3 == n // 524288:
        # committed equilibrated seed, tiled like bench._load_state
        z = np.load(seed_path)
        t = round((n // 524288) ** (1 / 3))
        Ls = float(z["L"])
        offs = np.array([(i, j, k) for i in range(t) for j in range(t)
                         for k in range(t)], np.float64) * Ls
        data.r = ((z["r"].astype(np.float64)[None] + offs[:, None])
                  .reshape(-1, 3)) % (Ls * t)
        data.v = np.tile(z["v"].astype(np.float64), (t ** 3, 1))
        L = Ls * t
        data.box = np.array([L, L, L])
        print("using committed seed tiled %dx (L=%.2f)" % (t ** 3, L))
    else:
        print("NO equilibrated cache -- lattice start (occupancies differ!)")
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)

    from bench import _pick_grid3

    dims = _pick_grid3(np.asarray(data.r, np.float64) % L, L, rc, 32) or (
        60, 60, 60)
    print("grid dims =", dims)
    spec = CellGridSpec(
        dims=dims, box=tuple(float(b) for b in np.asarray(box)), cap=32,
    )
    sim = RMMSimulation(
        table, pp, box, spec, dt=0.002, target_temperature=temperature,
        thermostat=True, tx=4, rebin_every=10 ** 9, sample_every=10 ** 9,
    )
    sim.init_from_molecules(mol)
    st0 = sim.state

    variants = {"dense": False, "pack": True}
    steps = {}
    for name, p in variants.items():
        sim.cw_pack = p
        steps[name] = jax.jit(functools.partial(sim._step, compute_macro=False))
        st, gv = steps[name](st0)  # compile
        print(name, "compiled; sumfv2",
              float(jnp.sum(st.planes[:, :, 4:7] ** 2)))

    ref = np.asarray(steps["dense"](st0)[0].forces)
    f = np.asarray(steps["pack"](st0)[0].forces)
    rel = np.abs(f - ref).max() / max(np.abs(ref).max(), 1e-30)
    print("pack max rel force diff vs dense:", rel)

    times = {v: [] for v in variants}
    reps, inner = 5, 4
    for r in range(reps):
        for v in variants:
            st, gv = steps[v](st0)
            float(jnp.sum(st.forces[0, 0, 0, :1]))  # sync
            t0 = time.perf_counter()
            st = st0
            for _ in range(inner):
                st, gv = steps[v](st)
            float(jnp.sum(st.forces[0, 0, 0, :1]))
            times[v].append((time.perf_counter() - t0) / inner)
    for v in variants:
        ts = np.array(times[v]) * 1e3
        mups = n / (ts.min() / 1e3)
        print(f"{v:8s}  min {ts.min():8.2f} ms  med {np.median(ts):8.2f} ms"
              f"  -> {mups / 1e6:7.1f} Mupd/s")
    # numerical gate: the compiled non-interpret pack path only ever
    # runs here on real hardware, so a silent regression would
    # otherwise ride along with healthy-looking timings
    if rel > 1e-5:
        print("WARNING: pack force mismatch vs dense: rel=%.3g > 1e-5" % rel)
        sys.exit(1)


if __name__ == "__main__":
    main()
