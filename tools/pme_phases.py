"""Per-phase SPME timings on the real device (VERDICT r1 item 5).

Times the phases of the reciprocal-space pass separately at a
configurable site count:
  - spread:        sorted scatter-free B-spline charge spreading
  - fft:           forward FFT + kernel multiply + inverse FFT
  - gather_direct: force interpolation via the [NS, p^3] mesh gather
  - gather_sorted: force interpolation via the gather-free transpose
                   of the sorted spread (_gather_sorted)
plus the fused end-to-end pass for both modes, so the restructure work
is evidence-driven.  Usage: python tools/pme_phases.py [N] [order]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jax_sync(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(jax.device_get(leaf))
        break


def _timeit(fn, *a, reps=3, inner=2):
    """min seconds per call; chains inner calls per timing to amortize
    the dispatch/readback latency of the remote-TPU tunnel."""
    r = fn(*a)
    jax_sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = fn(*a)
        jax_sync(r)
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.ops.pme import (
        PMEParams,
        PMESolver,
        _gather_sorted,
        _grid_indices_weights,
        _spread_sorted,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    order = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    rho = 0.05  # charge-site density; box sized accordingly
    L = float((n / rho) ** (1.0 / 3.0))
    box = (L, L, L)
    params = PMEParams.auto(box, rc=10.0, accuracy=1e-4)
    params = PMEParams(alpha=params.alpha, grid=params.grid, order=order)
    dtype = jnp.float32

    rng = np.random.default_rng(3)
    rs = jnp.asarray(rng.uniform(0, L, (n, 3)), dtype)
    wq = jnp.asarray(np.where(np.arange(n) % 2 == 0, 1.0, -1.0), dtype)

    p = params.order
    grid = params.grid
    ng = int(np.prod(grid))
    solver_d = PMESolver(box, params, dtype=dtype, gather_mode="direct",
                         spread_mode="sorted")
    solver_s = PMESolver(box, params, dtype=dtype, gather_mode="sorted",
                         spread_mode="sorted")
    solver_b = PMESolver(box, params, dtype=dtype)  # blocked (default)

    @jax.jit
    def phase_spread(rs, wq):
        giw = _grid_indices_weights(rs, wq, box, grid, p, dtype,
                                    products=False)
        Q = _spread_sorted(giw["bw"], giw["w3"], wq, grid, p, dtype)
        return jnp.sum(Q)

    @jax.jit
    def phase_fft(Q):
        Qh = jnp.fft.fftn(Q)
        conv = solver_s.kern.astype(dtype) * Qh
        phi = jnp.real(jnp.fft.ifftn(conv)).astype(dtype) * ng
        return jnp.sum(phi)

    @jax.jit
    def phase_gather_direct(rs, wq, phi_flat):
        giw = _grid_indices_weights(
            rs, wq, box, grid, p, dtype, with_derivs=True
        )
        ph = phi_flat[giw["lin"]]
        F = jnp.stack(
            [-jnp.sum(giw["D"][d] * ph, axis=1) * wq for d in range(3)],
            axis=-1,
        )
        return jnp.sum(F)

    @jax.jit
    def phase_gather_sorted(rs, wq, phi_flat):
        giw = _grid_indices_weights(
            rs, wq, box, grid, p, dtype, with_derivs=True, products=False
        )
        F = _gather_sorted(giw["bw"], giw["w3"], giw["dw3"], giw["scale"],
                           wq, phi_flat, grid, p, dtype)
        return jnp.sum(F)

    @jax.jit
    def phase_spread_blocked(rs, wq):
        from ls1_mardyn_tpu.ops.pme import _spread_blocked

        giw = _grid_indices_weights(rs, wq, box, grid, p, dtype,
                                    products=False)
        Q, _ovf = _spread_blocked(giw["bw"], giw["w3"], wq, grid, p,
                                  dtype)
        return jnp.sum(Q)

    @jax.jit
    def phase_gather_blocked(rs, wq, phi_flat):
        from ls1_mardyn_tpu.ops.pme import _gather_blocked

        giw = _grid_indices_weights(
            rs, wq, box, grid, p, dtype, with_derivs=True, products=False
        )
        F, _ovf = _gather_blocked(giw["bw"], giw["w3"], giw["dw3"],
                                  giw["scale"], wq, phi_flat, grid, p,
                                  dtype)
        return jnp.sum(F)

    @jax.jit
    def full_blocked(rs, wq):
        u, F = solver_b.mesh_energy_forces(rs, wq)
        return u + jnp.sum(F)

    @jax.jit
    def full_direct(rs, wq):
        u, F = solver_d.mesh_energy_forces(rs, wq)
        return u + jnp.sum(F)

    @jax.jit
    def full_sorted(rs, wq):
        u, F = solver_s.mesh_energy_forces(rs, wq)
        return u + jnp.sum(F)

    Q0 = jnp.zeros(tuple(grid), dtype)
    phi0 = jnp.zeros((ng,), dtype)

    out = {
        "n_sites": n,
        "order": p,
        "grid": list(grid),
        "backend": jax.default_backend(),
        "spread_s": _timeit(phase_spread, rs, wq),
        "fft_s": _timeit(phase_fft, Q0),
        "gather_direct_s": _timeit(phase_gather_direct, rs, wq, phi0),
        "gather_sorted_s": _timeit(phase_gather_sorted, rs, wq, phi0),
        "spread_blocked_s": _timeit(phase_spread_blocked, rs, wq),
        "gather_blocked_s": _timeit(phase_gather_blocked, rs, wq, phi0),
        "full_direct_s": _timeit(full_direct, rs, wq),
        "full_sorted_s": _timeit(full_sorted, rs, wq),
        "full_blocked_s": _timeit(full_blocked, rs, wq),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
