"""Interleaved A/B of the 1CLJ kernel variants on the real chip.

Builds the bench scene once, then times each requested variant's jitted
step in interleaved rounds (throttle variance on shared hardware makes
back-to-back timing unreliable).  Usage:

    python tools/ab_kernels.py [N] [variants...]

variants: row zb gram n3l lanej lanej_nodefer (default: row lanej)
"""

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
    n = int(args[0]) if args and args[0].isdigit() else 4_194_304
    variants = [a for a in args if not a.isdigit()] or ["row", "n3l"]
    rho, rc, temperature = 0.8, 2.5, 1.1
    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    skin = 0.2
    nd = max(4, int(np.floor(L / (rc + skin))))
    nd -= nd % 4
    spec = CellGridSpec(
        dims=(nd, nd, nd),
        box=tuple(float(b) for b in np.asarray(box)),
        cap=32,
    )
    sim = RMMSimulation(
        table, pp, box, spec, dt=0.002, target_temperature=temperature,
        thermostat=True, tx=4, rebin_every=10 ** 9, sample_every=10 ** 9,
    )

    def configure(v):
        sim.cw = v.startswith(("cw", "cwn3l"))
        sim.cwn3l = v.startswith("cwn3l")
        sim.cw_gsub = int(v.rsplit("g", 1)[1]) if v.startswith("cwn3l") and "g" in v[5:] else 1
        sim.zb = v in ("zb", "gram")
        sim.zb_gram = v == "gram"
        sim.n3l = v == "n3l"
        sim.lanej = v in ("lanej", "lanej_nodefer")
        sim.lanej_defer = v == "lanej"

    import functools

    configure(variants[0])
    sim.init_from_molecules(mol)
    st0 = sim.state

    # jit defers tracing to the first CALL, so each variant must be
    # configured AND called before moving to the next one
    steps = {}
    out = {}
    for v in variants:
        configure(v)
        steps[v] = jax.jit(functools.partial(sim._step, compute_macro=True))
        st, gv = steps[v](st0)
        out[v] = float(gv.upot)
    print("upot agreement:", out)

    times = {v: [] for v in variants}
    reps, inner = 5, 3
    for r in range(reps):
        for v in variants:
            st, gv = steps[v](st0)
            float(gv.upot)  # sync
            t0 = time.perf_counter()
            for _ in range(inner):
                st, gv = steps[v](st0)
            float(gv.upot)
            times[v].append((time.perf_counter() - t0) / inner)
    for v in variants:
        ts = np.array(times[v]) * 1e3
        mups = n / (ts.min() / 1e3)
        print(f"{v:6s}  min {ts.min():8.2f} ms  med {np.median(ts):8.2f} ms  "
              f"-> {mups/1e6:7.1f} Mupd/s")


if __name__ == "__main__":
    main()
