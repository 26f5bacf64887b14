"""Interleaved A/B: cwn3l fast step with vs without the Newton
refinement of the VPU approx reciprocal, plus an NVE drift
qualification at small N.

The raw pl.reciprocal(approx=True) is ~1e-4 relative; the Newton step
(r0*(2-den*r0)) restores ~f32 precision at ~3 extra VPU slots of ~27
per pair-lane.  Dropping it is only admissible if the energy-drift
target (BASELINE.md: <1e-4 over 10k steps) still holds -- this tool
measures both the speed and the drift.

    python tools/ab_recip.py [N] [drift_N] [drift_steps]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n, rho, rc, temperature, equil_cache=True):
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene
    from bench import _pick_grid

    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)
    cache = "/tmp/ls1_bench_equil_%d_%g.npz" % (n, rho)
    if equil_cache and os.path.exists(cache):
        z = np.load(cache)
        data.r = z["r"].astype(np.float64)
        data.v = z["v"].astype(np.float64)
        print("using equilibrated cache", cache)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    nd = _pick_grid(np.asarray(data.r, np.float64) % L, L, rc, 32) or 60
    spec = CellGridSpec(
        dims=(nd, nd, nd),
        box=tuple(float(b) for b in np.asarray(box)), cap=32,
    )
    sim = RMMSimulation(
        table, pp, box, spec, dt=0.002, target_temperature=temperature,
        thermostat=False, tx=4, rebin_every=16, sample_every=10 ** 9,
    )
    sim.init_from_molecules(mol)
    return sim


def main():
    import jax
    import jax.numpy as jnp

    args = sys.argv[1:]
    n = int(args[0]) if args else 4_194_304
    drift_n = int(args[1]) if len(args) > 1 else 131_072
    drift_steps = int(args[2]) if len(args) > 2 else 4000
    rho, rc, temperature = 0.8, 2.5, 1.1

    # --- speed A/B at bench N ------------------------------------------
    sim = build(n, rho, rc, temperature)
    st0 = sim.state
    steps = {}
    for name, newt in (("newton", True), ("raw", False)):
        sim.recip_newton = newt
        steps[name] = jax.jit(functools.partial(sim._step, compute_macro=False))
        st, gv = steps[name](st0)
        print(name, "compiled; summv2", float(jnp.sum(st.planes[:, :, 4:7] ** 2)))
    ref = np.asarray(steps["newton"](st0)[0].forces)
    f = np.asarray(steps["raw"](st0)[0].forces)
    print("raw max rel force diff:", np.abs(f - ref).max() / np.abs(ref).max())

    times = {v: [] for v in steps}
    reps, inner = 5, 4
    for r in range(reps):
        for v in steps:
            st, gv = steps[v](st0)
            float(jnp.sum(st.forces[0, 0, 0, :1]))
            t0 = time.perf_counter()
            st = st0
            for _ in range(inner):
                st, gv = steps[v](st)
            float(jnp.sum(st.forces[0, 0, 0, :1]))
            times[v].append((time.perf_counter() - t0) / inner)
    for v in steps:
        ts = np.array(times[v]) * 1e3
        print(f"{v:8s}  min {ts.min():8.2f} ms  med {np.median(ts):8.2f} ms"
              f"  -> {n / ts.min() / 1e3:7.1f} Mupd/s")

    # --- NVE drift at small N ------------------------------------------
    for name, newt in (("newton", True), ("raw", False)) if drift_steps else ():
        sim = build(drift_n, rho, rc, temperature, equil_cache=False)
        sim.recip_newton = newt
        # re-jit with the new flag
        sim._step_jit = jax.jit(functools.partial(sim._step, compute_macro=True))
        sim._step_fast_jit = jax.jit(
            functools.partial(sim._step, compute_macro=False)
        )
        sim.sample_every = 200
        es = []
        for k in range(drift_steps // 200):
            gv = sim.run(200)
            e = float(gv.upot) * drift_n + 1.5 * drift_n * float(gv.temperature)
            es.append(e)
        es = np.array(es)
        drift = (es[-1] - es[0]) / abs(es[0])
        rate = drift / drift_steps * 10_000
        print(f"{name:8s} NVE drift over {drift_steps} steps: "
              f"{drift:.3e}  ({rate:.3e} per 10k steps)")


if __name__ == "__main__":
    main()
