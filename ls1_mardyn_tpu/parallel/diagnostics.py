"""Multi-chip diagnostics.

TPU-native counterparts of the reference's parallel observability
plugins:
  - LoadbalanceWriter (/root/reference/src/io/LoadBalanceWriter.{h,cpp}):
    per-rank load + global max/avg imbalance time series
  - HaloParticleWriter (src/io/HaloParticleWriter.{h,cpp}): dump the
    halo particles each rank holds
  - CommunicationPartnerWriter (src/io/CommunicationPartnerWriter.h):
    per-rank list of communication partners and exchange regions
  - KDTreePrinter (src/plugins/KDTreePrinter.h): decomposition
    structure dump (here: the uniform slab table -- this build uses a
    static slab decomposition, SURVEY section 2.5)

All are host-side readbacks of the sharded state; run them at output
frequency, not per step.
"""

from __future__ import annotations

import numpy as np


def loadbalance_report(sim, mol_sharded) -> dict:
    """Per-device molecule counts and imbalance factors (the
    LoadbalanceWriter's load metric with particle-count load -- the
    TradLoad model, src/parallel/LoadCalc.h:44)."""
    cfg = sim.cfg
    valid = np.asarray(mol_sharded.valid)
    ncap = cfg.n_local_cap
    counts = [
        int(valid[p * ncap : (p + 1) * ncap].sum())
        for p in range(cfg.n_devices)
    ]
    total = sum(counts)
    avg = total / cfg.n_devices if cfg.n_devices else 0.0
    mx = max(counts) if counts else 0
    return {
        "counts": counts,
        "total": total,
        "avg": avg,
        "max": mx,
        # f_LB = max/avg, the standard imbalance factor
        "imbalance": (mx / avg) if avg else 1.0,
    }


def write_loadbalance(sim, mol_sharded, path: str, step: int = 0):
    rep = loadbalance_report(sim, mol_sharded)
    import os

    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write("# step imbalance max avg " + " ".join(
                f"rank{p}" for p in range(sim.cfg.n_devices)
            ) + "\n")
        f.write(
            f"{step} {rep['imbalance']:.4f} {rep['max']} {rep['avg']:.1f} "
            + " ".join(str(c) for c in rep["counts"]) + "\n"
        )
    return rep


def halo_particles(sim, mol_sharded) -> list:
    """Per-device halo contents: the z-boundary cell rows each device
    imports from its +-1 neighbors (what HaloParticleWriter dumps).
    Returns [(device, from_below[ids...], from_above[ids...])]."""
    cfg = sim.cfg
    ncap = cfg.n_local_cap
    r = np.asarray(mol_sharded.r)
    mid = np.asarray(mol_sharded.mid)
    valid = np.asarray(mol_sharded.valid)
    out = []
    cl_z = cfg.slab_h / cfg.nz_local
    for p in range(cfg.n_devices):
        lo, hi = p * ncap, (p + 1) * ncap
        z = r[lo:hi, 2] - p * cfg.slab_h
        v = valid[lo:hi]
        top_row = v & (z >= cfg.slab_h - cl_z)  # exported up
        bot_row = v & (z < cl_z)  # exported down
        out.append((p, mid[lo:hi][bot_row], mid[lo:hi][top_row]))
    halos = []
    P = cfg.n_devices
    for p in range(P):
        _, below_bot, below_top = out[(p - 1) % P]
        _, above_bot, above_top = out[(p + 1) % P]
        # device p imports the top row of p-1 and the bottom row of p+1
        halos.append((p, below_top, above_bot))
    return halos


def write_halo_particles(sim, mol_sharded, prefix: str, step: int = 0):
    for p, from_below, from_above in halo_particles(sim, mol_sharded):
        with open(f"{prefix}_rank{p}_step{step}.halo", "w") as f:
            f.write(f"# device {p}: imported halo molecule ids\n")
            f.write(
                "from_below " + " ".join(map(str, from_below.tolist())) + "\n"
            )
            f.write(
                "from_above " + " ".join(map(str, from_above.tolist())) + "\n"
            )


def communication_partners(sim) -> list:
    """Per-device partner table (CommunicationPartnerWriter role): with
    the slab decomposition each device exchanges LEAVING_ONLY payloads
    and HALO_COPIES rows with ranks +-1 on the ring."""
    cfg = sim.cfg
    P = cfg.n_devices
    rows = []
    for p in range(P):
        rows.append(
            {
                "rank": p,
                "partners": [(p - 1) % P, (p + 1) % P],
                "leaving_payload": (cfg.migrate_cap, 16),
                "halo_rows": (1, cfg.ny, (cfg.nx + 2 * 1) * cfg.cap),
                "periodic_wrap": p in (0, P - 1),
            }
        )
    return rows


def write_communication_partners(sim, path: str):
    with open(path, "w") as f:
        f.write("# rank partners leaving_payload halo_row_shape wrap\n")
        for row in communication_partners(sim):
            f.write(
                f"{row['rank']} {row['partners']} {row['leaving_payload']} "
                f"{row['halo_rows']} {row['periodic_wrap']}\n"
            )


def write_decomposition(sim, path: str):
    """Decomposition structure dump (KDTreePrinter analogue: this
    build's decomposition is a static 1-D slab table, not a KD tree)."""
    cfg = sim.cfg
    with open(path, "w") as f:
        f.write(
            f"# slab decomposition: {cfg.n_devices} devices along z, "
            f"box {cfg.box}\n"
        )
        f.write("# rank z0 z1 cells(nx ny nz_local) capacity\n")
        for p in range(cfg.n_devices):
            f.write(
                f"{p} {p * cfg.slab_h:.6g} {(p + 1) * cfg.slab_h:.6g} "
                f"({cfg.nx} {cfg.ny} {cfg.nz_local}) {cfg.n_local_cap}\n"
            )
