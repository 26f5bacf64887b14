"""Headline benchmark: 1CLJ Argon molecule-updates/second per chip.

Mirrors the reference's own headline metric, "Molecule-updates per
second" (N_global * steps / wallclock, /root/reference/src/
MarDyn.cpp:262-266), on the BASELINE.md workload: single-site LJ fluid,
N >= 4M, NVT.  Prints ONE JSON line.

The measured state is the EQUILIBRATED liquid (600 NVT steps from the
lattice, cached in /tmp across runs): production throughput is a
property of the liquid, and the liquid's sub-Poissonian density
fluctuations (S(0) ~ 0.1 at rho=0.8) let the cell grid run at ~60%
mean occupancy of cap=32 without overflow, where the perfect-lattice
start aliases up to 35/cell.  Kernel work scales as n_cells * cap^2
independent of occupancy, so the coarsest overflow-safe grid is
fastest; the grid is chosen by measuring per-cell occupancy of the
actual start state (nd=60 vs the lattice-safe nd=64 measured 59 vs 81
ms/step, tools/ab_nd.py 2026-08-18).

Baseline target (BASELINE.json): 1e9 updates/s on a v5e-8 slice ==
1.25e8 updates/s/chip; vs_baseline = value / 1.25e8.

Env overrides: LS1_BENCH_N, LS1_BENCH_STEPS, LS1_BENCH_RHO,
LS1_BENCH_CAP, LS1_BENCH_NOEQUIL=1 (skip equilibration: lattice
start on the lattice-safe grid, the pre-round-2 behavior).
"""

import json
import os
import sys
import time

import numpy as np


def _occ_ok(r, L, dims, cap, headroom):
    dims = np.asarray(dims)
    edge = L / dims
    c = np.clip((r / edge).astype(np.int64), 0, dims - 1)
    idx = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
    occ = np.bincount(idx, minlength=int(np.prod(dims)))
    return occ.max() <= cap - headroom


def _pick_grid(r, L, rc, cap, headroom=2):
    """Coarsest cubic grid (nx divisible by 4, edge >= rc) whose
    per-cell occupancy of the actual start state stays below cap with
    `headroom` slots to spare for drift between rebins."""
    nd_hi = int(np.floor(L / rc))  # finest grid with edge >= rc
    for nd in range(4, nd_hi + 1, 4):  # coarsest (= least work) first
        if _occ_ok(r, L, (nd, nd, nd), cap, headroom):
            return nd
    return None


def _pick_grid3(r, L, rc, cap, headroom=2, skin_min=0.29):
    """Coarsest grid over ANISOTROPIC candidates (nx, ny, nz): kernel
    work is n_cells * cap^2 regardless of occupancy, so fewer, fatter
    cells win whenever the occupancy distribution admits them.  nx
    stays a multiple of 4 (tx tiling / 128-lane rows at cap=32); y/z
    only need edge >= rc.  Candidates are scanned in ascending
    cell-count order, so the first admissible one is optimal under
    the occupancy constraint."""
    # skin_min keeps the verlet-skin rebin cadence at its cap (the
    # driver uses rebin_every ~ skin / 0.018): a thinner edge trades
    # kernel time for rebin time at a measured net loss (bench at
    # (56,56,64): -7% cells, rebin 16 -> 11, net 0)
    nd_hi = int(np.floor(L / (rc + skin_min)))
    # all axes in multiples of 4: nx for the 128-lane rows, ny for the
    # rebin kernel's row chunking (a prime ny degenerates the chunk
    # loop to 1-row chunks and explodes Mosaic compile time)
    xs = range(4, nd_hi + 1, 4)
    cands = [
        (nx * ny * nz, (nx, ny, nz))
        for nx in xs for ny in xs for nz in xs
        if max(ny, nz) - min(ny, nz) <= 8 and abs(ny - nx) <= 8
        and abs(nz - nx) <= 8
    ]
    cands.sort()
    # only scan the band just below the cubic optimum: grids much
    # coarser than that overflow on density fluctuations anyway, and
    # every probe costs a 3N bincount pass
    nd_cubic = _pick_grid(r, L, rc, cap, headroom)
    hi_cells = nd_cubic ** 3 if nd_cubic else float("inf")
    min_cells = max(len(r) / (cap - headroom), 0.8 * hi_cells)
    for cells, dims in cands:
        if cells < min_cells or cells >= hi_cells:
            continue
        if _occ_ok(r, L, dims, cap, headroom):
            return dims
    if nd_cubic:
        return (nd_cubic, nd_cubic, nd_cubic)
    nd = _pick_grid(r, L, rc, cap, headroom)
    return (nd, nd, nd) if nd else None


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
    cap = int(os.environ.get("LS1_BENCH_CAP", 32))
    no_equil = os.environ.get("LS1_BENCH_NOEQUIL", "") == "1"
    rc = 2.5
    temperature = 1.1

    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], temperature, seed=7)

    cache = "/tmp/ls1_bench_equil_%d_%g.npz" % (n, rho)
    if not no_equil and os.path.exists(cache):
        z = np.load(cache)
        data.r, data.v = z["r"].astype(np.float64), z["v"].astype(np.float64)
    elif not no_equil:
        # equilibrate from the lattice on a lattice-safe grid (the
        # perfect lattice aliases the coarser grids past cap)
        mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
        skin = 0.2
        nd0 = max(4, int(np.floor(L / (rc + skin))))
        nd0 -= nd0 % 4
        cap0 = cap
        while True:
            spec = CellGridSpec(
                dims=(nd0, nd0, nd0),
                box=tuple(float(b) for b in np.asarray(box)), cap=cap0,
            )
            sim = RMMSimulation(
                table, pp, box, spec, dt=0.002,
                target_temperature=temperature, thermostat=True, tx=4,
                rebin_every=16, sample_every=64,
            )
            try:
                sim.init_from_molecules(mol)
                break
            except RuntimeError:
                if cap0 >= 256:
                    raise
                cap0 *= 2
        sim.run(600)
        m = sim.to_molecules()
        r = np.asarray(m.r, np.float64) % L
        v = np.asarray(m.v, np.float64)
        np.savez(cache, r=r.astype(np.float32), v=v.astype(np.float32))
        data.r, data.v = r, v
        del sim

    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)

    if no_equil:
        skin = 0.2
        nd = max(4, int(np.floor(L / (rc + skin))))
        nd -= nd % 4
        dims = (nd, nd, nd)
    if not no_equil:
        dims = _pick_grid3(np.asarray(data.r, np.float64) % L, L, rc, cap)
        if dims is None:
            nd = max(4, int(np.floor(L / rc)))
            nd -= nd % 4
            dims = (nd, nd, nd)
    while True:
        spec = CellGridSpec(dims=dims, box=tuple(float(b) for b in np.asarray(box)), cap=cap)
        assert min(spec.cell_len) >= rc, (spec.cell_len, rc)
        # verlet skin: rebin cadence must keep drift under
        # (edge - rc)/2; at dt=0.002 and T=1.1 the per-step drift is
        # ~0.009 (4 sigma_v), so edge 2.9 supports ~20 steps
        skin = min(spec.cell_len) - rc
        rebin_every = max(1, min(16, int(skin / (2 * 0.009))))
        sim = RMMSimulation(
            table, pp, box, spec, dt=0.002, target_temperature=temperature,
            thermostat=True, tx=4, rebin_every=rebin_every,
            sample_every=16,
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
        "metric": "1CLJ molecule-updates/s/chip (N=%d, rho=%.2f, rc=%.1f, NVT, equilibrated)" % (n, rho, rc),
        "value": mups,
        "unit": "updates/s/chip",
        "vs_baseline": mups / 1.25e8,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
