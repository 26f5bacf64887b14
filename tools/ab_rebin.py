"""Interleaved A/B: lax.sort shift-merge rebin vs the fused Pallas
rebin kernel (ops/pallas_rebin.py), on the equilibrated bench state.

    python tools/ab_rebin.py [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tools.ab_recip import build

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    sim = build(n, 0.8, 2.5, 1.1)
    # drift a few steps so the rebin has real movers
    st = sim.state
    for _ in range(8):
        st, _ = sim._step_fast_jit(st)
    st0 = st

    fns = {"sort": sim._rebin_shift_jit, "pallas": sim._rebin_shift_pl_jit}
    outs = {}
    for v, fn in fns.items():
        s2, ovf = fn(st0)
        outs[v] = s2
        print(v, "compiled; overflow:", bool(ovf),
              " checksum", float(jnp.sum(s2.planes[:, :, 0, :])))
    pa = np.asarray(outs["sort"].planes)
    pb = np.asarray(outs["pallas"].planes)
    print("bit-identical planes:", np.array_equal(pa, pb))
    fa = np.asarray(outs["sort"].forces)
    fb = np.asarray(outs["pallas"].forces)
    print("bit-identical forces:", np.array_equal(fa, fb))

    times = {v: [] for v in fns}
    reps, inner = 5, 3
    for r in range(reps):
        for v, fn in fns.items():
            s2, ovf = fn(st0)
            float(jnp.sum(s2.planes[0, 0, 0, :1]))
            t0 = time.perf_counter()
            for _ in range(inner):
                s2, ovf = fn(st0)
            float(jnp.sum(s2.planes[0, 0, 0, :1]))
            times[v].append((time.perf_counter() - t0) / inner)
    for v in fns:
        ts = np.array(times[v]) * 1e3
        print(f"{v:8s}  min {ts.min():8.2f} ms  med {np.median(ts):8.2f} ms")


if __name__ == "__main__":
    main()
