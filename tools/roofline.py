"""Microbenchmark of this environment's device rooflines.

Measures HBM read bandwidth, f32/bf16 matmul throughput, and VPU f32
elementwise throughput, so the MD kernel's efficiency claims are
auditable (VERDICT r1: "commit a microbenchmark ... so the projection
is auditable instead of asserted").  Prints one JSON dict.

Sync discipline: the axon remote backend does not reliably block in
block_until_ready, so every timed computation ends in a scalar
reduction read back to host.  The ~35 ms dispatch/readback latency of
the tunnel dominates small workloads, so every metric chains K
dependent repetitions of the measured op inside ONE jit and reports
(t_2K - t_K) / K -- latency and the final reduction cancel in the
difference.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *a, reps=5):
    for _ in range(2):
        float(fn(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _diff_time(make_fn, x, k=4):
    """Time per repetition via the 2k-vs-k difference."""
    import jax

    t1 = _time(jax.jit(make_fn(k)), x)
    t2 = _time(jax.jit(make_fn(2 * k)), x)
    return (t2 - t1) / k


def main():
    import jax
    import jax.numpy as jnp

    out = {}

    z = jnp.zeros((8, 128), jnp.float32)
    out["latency_ms"] = _time(jax.jit(jnp.sum), z, reps=8) * 1e3

    # HBM copy bandwidth: K materialized (optimization_barrier-fenced)
    # scale passes over a 1 GB array -- each pass reads and writes the
    # full array; reported as total bytes moved (2x size per pass)
    n = 256 * 1024 * 1024  # 1 GB f32
    x = jnp.ones((n,), jnp.float32)

    def mk_read(k):
        def f(x):
            y = x
            for _ in range(k):
                y = jax.lax.optimization_barrier(y * 1.0000001)
            return jnp.sum(y)
        return f

    t = _diff_time(mk_read, x, k=3)
    out["hbm_copy_GBs"] = 2 * n * 4 / t / 1e9

    # matmul: K chained m^3 f32 / bf16 matmuls
    m = 8192
    for dtname, key in (("float32", "mxu_f32_Tflops"), ("bfloat16", "mxu_bf16_Tflops")):
        a = jnp.ones((m, m), jnp.dtype(dtname)) * 1e-3

        def mk_mm(k):
            def f(a):
                c = a
                for _ in range(k):
                    c = jax.lax.dot_general(
                        c, a, (((1,), (0,)), ((), ())),
                        preferred_element_type=a.dtype,
                    ) * jnp.asarray(1e-4, a.dtype)
                return jnp.sum(c.astype(jnp.float32))
            return f

        t = _diff_time(mk_mm, a, k=3)
        out[key] = 2 * m ** 3 / t / 1e12

    # VPU f32 fma: K extra chain segments of 100 fmas on a 256 MB array
    nv = 64 * 1024 * 1024
    xv = jnp.ones((nv,), jnp.float32)
    seg = 100

    def mk_vpu(k):
        def f(x):
            y = x
            for _ in range(k * seg):
                y = y * 1.0000001 + 1e-12
            return jnp.sum(y)
        return f

    t = _diff_time(mk_vpu, xv, k=2)
    out["vpu_f32_fma_Tflops"] = 2.0 * seg * nv / t / 1e12

    # VPU divide (the LJ kernel's per-pair hot op): segments of 16
    segd = 16

    def mk_div(k):
        def f(x):
            y = x
            for _ in range(k * segd):
                y = 1.0 / (y + 1.5)
            return jnp.sum(y)
        return f

    t = _diff_time(mk_div, xv, k=2)
    out["vpu_f32_div_Gops"] = segd * nv / t / 1e9

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
