"""Interleaved A/B of the cwn3l kernel across cell-grid sizes.

Total kernel work is ~ n_cells * cap^2 * 5 * 4 lane evaluations,
independent of occupancy: empty slots cost the same as full ones.  At
fixed cap=32, a coarser grid (higher mean occupancy) therefore does
strictly less work as long as no cell overflows.  The LJ liquid at
rho=0.8 is strongly sub-Poissonian (S(0) ~ 0.06), so mean occupancy can
safely sit at ~75% of cap -- far above what a Poisson-tail analysis
would allow.

Usage: python tools/ab_nd.py [N] [nd ...]   (default N=4.2M, nd=64 56 52)
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

    args = sys.argv[1:]
    n = int(args[0]) if args else 4_194_304
    nds = [int(a) for a in args[1:]] or [64, 56, 52]
    rho, rc, temperature = 0.8, 2.5, 1.1
    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)

    sims = {}
    steps = {}
    st0 = {}
    for nd in nds:
        spec = CellGridSpec(
            dims=(nd, nd, nd),
            box=tuple(float(b) for b in np.asarray(box)),
            cap=32,
        )
        edge = min(spec.cell_len)
        occ = n / (nd ** 3)
        print(f"nd={nd}: edge={edge:.3f} mean_occ={occ:.1f} "
              f"({100*occ/32:.0f}% of cap)", flush=True)
        if edge < rc:
            print(f"  SKIP: edge < rc")
            continue
        sim = RMMSimulation(
            table, pp, box, spec, dt=0.002, target_temperature=temperature,
            thermostat=True, tx=4, rebin_every=10 ** 9, sample_every=10 ** 9,
        )
        try:
            sim.init_from_molecules(mol)
        except RuntimeError as e:
            print(f"  SKIP: init overflow ({e})")
            continue
        sims[nd] = sim
        st0[nd] = sim.state
        steps[nd] = jax.jit(functools.partial(sim._step, compute_macro=False))
        st, gv = steps[nd](st0[nd])
        jax.block_until_ready(st.planes)
        print(f"  compiled; T={float(gv.temperature):.4f}", flush=True)

    times = {nd: [] for nd in sims}
    reps, inner = 5, 3
    for r in range(reps):
        for nd in sims:
            st, gv = steps[nd](st0[nd])
            float(st.planes[0, 0, 0, 0])  # sync
            t0 = time.perf_counter()
            for _ in range(inner):
                st, gv = steps[nd](st, )
            float(st.planes[0, 0, 0, 0])
            times[nd].append((time.perf_counter() - t0) / inner)
    for nd in sims:
        ms = 1e3 * np.array(times[nd])
        print(f"nd={nd}: {ms.min():.1f} ms/step (min of {reps})  "
              f"all={np.round(ms, 1).tolist()}")


if __name__ == "__main__":
    main()
