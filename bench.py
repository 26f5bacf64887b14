"""Headline benchmark: 1CLJ Argon molecule-updates/second per chip.

Mirrors the reference's own headline metric, "Molecule-updates per
second" (N_global * steps / wallclock, /root/reference/src/
MarDyn.cpp:262-266), on the BASELINE.md workload: single-site LJ fluid,
N >= 4M, NVT.  Prints ONE JSON line.

Baseline target (BASELINE.json): 1e9 updates/s on a v5e-8 slice ==
1.25e8 updates/s/chip; vs_baseline = value / 1.25e8.

Env overrides: LS1_BENCH_N, LS1_BENCH_STEPS, LS1_BENCH_RHO.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene

    n = int(os.environ.get("LS1_BENCH_N", 4_194_304))
    steps = int(os.environ.get("LS1_BENCH_STEPS", 20))
    rho = float(os.environ.get("LS1_BENCH_RHO", 0.8))
    rc = 2.5
    temperature = 1.1

    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)

    # cell grid: cell edge >= rc + verlet skin so rebinning can run
    # every `rebin_every` steps (skin/2 > max drift).  Tighter grids
    # overflow on the perfect-lattice start (3-plane aliasing), so the
    # skin also buys occupancy safety.
    skin = 0.2
    nd = max(4, int(np.floor(L / (rc + skin))))
    nd -= nd % 4  # keep nx divisible by the x-tile
    # lattice aliasing against the cell grid can exceed cap=32 for some
    # N; retry with doubled capacity (default-N behavior unchanged)
    cap = int(os.environ.get("LS1_BENCH_CAP", 32))
    while True:
        spec = CellGridSpec(dims=(nd, nd, nd), box=tuple(float(b) for b in np.asarray(box)), cap=cap)
        assert min(spec.cell_len) >= rc, (spec.cell_len, rc)
        sim = RMMSimulation(
            table, pp, box, spec, dt=0.002, target_temperature=temperature,
            thermostat=True, tx=4, rebin_every=16, sample_every=16,
        )
        try:
            sim.init_from_molecules(mol)
            break
        except RuntimeError:
            if cap >= 256:
                raise
            cap *= 2
    # warmup (compile + cache both step variants and rebin); NB
    # block_until_ready does not reliably block through the axon remote
    # backend, so sync via an actual scalar readback
    gv = sim.run(17)
    float(gv.upot)

    t0 = time.perf_counter()
    gv = sim.run(steps)
    float(gv.upot)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    mups = n * steps / dt / n_chips
    out = {
        "metric": "1CLJ molecule-updates/s/chip (N=%d, rho=%.2f, rc=%.1f, NVT)" % (n, rho, rc),
        "value": mups,
        "unit": "updates/s/chip",
        "vs_baseline": mups / 1.25e8,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
