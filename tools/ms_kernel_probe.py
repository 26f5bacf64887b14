"""Bisect the multi-site kernel's TPU fault envelope.

The N=1M h2o bench (grid 35^3, cap 128, tx 1, P 24) crashed the TPU
worker ("kernel fault") during warmup; smaller configs (14^3 cap 64
tx 2) are known good from round-3 runs.  This tool runs the KERNEL
ALONE on synthetic data across a config ladder so the faulting
geometry is identified without the driver around it.

Usage: python tools/ms_kernel_probe.py [idx ...]   (default: all)
Each config runs in ITS OWN python process ideally (a fault kills the
process); pass one index per invocation for clean bisection.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (nx, ny, nz, cap, tx, jw, label)
    (14, 14, 14, 64, 2, 0, "r3-known-good"),
    (20, 20, 20, 128, 1, 0, "cap128-tx1-small"),
    (35, 35, 35, 64, 1, 0, "grid35-cap64-tx1-misaligned-skip"),
    (35, 35, 35, 128, 1, 0, "h2o-crash-config"),
    (35, 35, 35, 128, 1, 128, "h2o-config-jw128"),
    (34, 35, 35, 64, 2, 0, "picker-choice"),
]


def run(idx):
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.models.components import Component, ComponentTable
    from ls1_mardyn_tpu.ops.pallas_multisite import (
        _MSMeta,
        multisite_cell_forces_pallas,
    )

    nx, ny, nz, cap, tx, jw, label = CONFIGS[idx]
    if (tx * cap) % 128:
        print(f"[{idx}] {label}: skipped (misaligned)", flush=True)
        return
    # water-class component: 1 LJ + 3 charges
    c = Component(cid=0)
    c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, False)
    c.add_charge(0.0, 0.0, 0.0, 0.0, -0.8476)
    c.add_charge(0.316, 0.245, 0.0, 0.01, 0.4238)
    c.add_charge(-0.316, 0.245, 0.0, 0.01, 0.4238)
    table = ComponentTable([c], cutoff=3.0, lj_cutoff=3.0)
    meta = _MSMeta(table)
    P = meta.P
    box = (nx * 3.1, ny * 3.1, nz * 3.1)
    rng = np.random.default_rng(idx)
    W = nx * cap
    Wj = (nx + 2) * cap
    g = np.zeros((nz, ny, P, W), np.float32)
    # fill ~half the slots with plausible positions/valid
    occ = cap // 2
    for plane, scale in ((0, box[0]), (1, box[1]), (2, box[2])):
        g[:, :, plane, :] = rng.uniform(0, scale, (nz, ny, W))
    val = np.zeros((nz, ny, nx, cap), np.float32)
    val[:, :, :, :occ] = 1.0
    g[:, :, 3, :] = val.reshape(nz, ny, W)
    gj = np.concatenate(
        [g[:, :, :, (nx - 1) * cap:], g, g[:, :, :, :cap]], axis=3
    )
    r_i = jax.device_put(g)
    r_j = jax.device_put(gj)
    print(f"[{idx}] {label}: grid ({nx},{ny},{nz}) cap {cap} tx {tx} "
          f"jw {jw} P {P} ...", flush=True)
    t0 = time.perf_counter()
    out, u6, uX, rf = multisite_cell_forces_pallas(
        r_i, r_j, nx=nx, ny=ny, nz=nz, cap=cap, tx=tx,
        box=box, rc2=9.0, rc2_lj=9.0, screen_alpha=0.32,
        meta=meta, interpret=False, jw=jw,
    )
    v = float(u6)  # sync
    print(f"[{idx}] {label}: OK u6={v:.3g} "
          f"({time.perf_counter() - t0:.1f}s incl compile)", flush=True)


def main():
    idxs = [int(a) for a in sys.argv[1:]] or list(range(len(CONFIGS)))
    for i in idxs:
        run(i)


if __name__ == "__main__":
    main()
