"""Interleaved A/B: dense vs occupancy-packed multi-site kernel on the
CO2 N~1M bench scene (VERDICT r4 item 1 -- the occupancy lever).

Per-session TPU throughput varies ~20%, so only same-process
interleaved timings are meaningful.  Runs both force paths on the same
molecule state (the bench scene through build_scene), alternating
timed windows, and reports ms/eval, the pair-lane ledger for both
geometries, and force parity.  Merges the result into
BENCH_MS_CO2.json.

Usage: python tools/ab_mspack.py [--n N] [--reps R] [--json OUT]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T0 = time.perf_counter()


def log(msg):
    print("[ab_mspack %6.1fs] %s" % (time.perf_counter() - T0, msg),
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=5)
    ap.add_argument("--json", default=os.path.join(REPO,
                                                   "BENCH_MS_CO2.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools.bench_ms import co2_scene
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.pallas_lj import HX
    from ls1_mardyn_tpu.ops.pallas_ms_packed import (
        TI, PallasMultiSitePackedPath,
    )
    from ls1_mardyn_tpu.ops.pallas_ms_path import (
        PallasMultiSitePath, pick_ms_grid,
    )
    from ls1_mardyn_tpu.scene import build_scene

    data, cfg_kw = co2_scene(args.n)
    n = len(data.mid)
    mol, pp, table, box = build_scene(
        data, cutoff=cfg_kw["cutoff"], dtype=jnp.float32)
    rc = cfg_kw["cutoff"]

    pick = pick_ms_grid(data.r, np.asarray(box, float), rc)
    assert pick is not None
    dims, cap, tx = pick
    spec = CellGridSpec(dims=dims,
                        box=tuple(float(b) for b in np.asarray(box)),
                        cap=cap)
    # occupancy ledger at the committed grid
    edge = np.asarray(box, float) / np.asarray(dims)
    ci = tuple(np.minimum((data.r[:, a] / edge[a]).astype(np.int64),
                          dims[a] - 1) for a in range(3))
    lin = (ci[2] * dims[1] + ci[1]) * dims[0] + ci[0]
    occ = np.bincount(lin, minlength=int(np.prod(dims)))
    occ_mean, occ_max = float(occ.mean()), int(occ.max())
    nx, ny, nz = dims
    lanes_dense = float(nz * ny * nx * cap * cap * 9 * (tx + 2 * HX))
    # packed ledger: per (z,y) row, sum over i tiles of
    # 9 * TI * chunks(window) lanes with 128-aligned windows
    occ3 = occ.reshape(dims[2], dims[1], dims[0])  # [z,y,x] by lin order
    lanes_packed = 0.0
    for z in range(nz):
        for y in range(ny):
            o = occ3[z, y]
            prefix = np.concatenate([[0], np.cumsum(o)])
            cnt = prefix[-1]
            # j-space starts (left halo at cap-occ[-1], row at cap)
            start = np.concatenate(
                [[cap - o[-1]], cap + prefix, [cap + cnt + o[0]]]
            )
            ntiles = -(-cnt // TI)
            for t in range(int(ntiles)):
                lo = int(np.searchsorted(prefix, t * TI, "right") - 1)
                hi = int(np.searchsorted(
                    prefix, min((t + 1) * TI, cnt) - 1, "right") - 1)
                sw = start[lo]  # start(c_lo - 1): index lo in table
                ew = start[hi + 3] if hi + 3 < len(start) else start[-1]
                base = (sw // TI) * TI
                nch = -(-(ew - base) // TI)
                lanes_packed += 9 * TI * TI * nch
    log("grid %s cap %d tx %d; occ mean %.1f max %d" % (
        dims, cap, tx, occ_mean, occ_max))
    log("pair lanes: dense %.3e packed %.3e (ratio %.2f)" % (
        lanes_dense, lanes_packed, lanes_dense / lanes_packed))

    dense = PallasMultiSitePath(table, spec, tx=tx)
    packd = PallasMultiSitePackedPath(table, spec)
    fd = jax.jit(dense.__call__)
    fp = jax.jit(packd.__call__)

    log("compiling dense")
    t0 = time.perf_counter()
    Fd, Md, _ = fd(mol)
    ud = float(Md.upot)
    log("dense compile+first %.1fs upot %.6g" % (
        time.perf_counter() - t0, ud))
    log("compiling packed")
    t0 = time.perf_counter()
    Fp, Mp, _ = fp(mol)
    up = float(Mp.upot)
    log("packed compile+first %.1fs upot %.6g" % (
        time.perf_counter() - t0, up))

    sample = np.random.default_rng(0).integers(0, n, 20000)
    fda = np.asarray(Fd.F[sample])
    fpa = np.asarray(Fp.F[sample])
    relF = float(np.abs(fpa - fda).max() / (np.abs(fda).max() + 1e-30))
    relU = abs(up - ud) / abs(ud)
    log("parity: relF %.3g relU %.3g" % (relF, relU))

    times = {"dense": [], "packed": []}
    for rep in range(args.reps):
        for name, f in (("dense", fd), ("packed", fp)):
            t0 = time.perf_counter()
            for _ in range(args.inner):
                _F, M, _ = f(mol)
            float(M.upot)
            dt = (time.perf_counter() - t0) / args.inner
            times[name].append(dt * 1e3)
            log("rep %d %s: %.1f ms/eval" % (rep, name, dt * 1e3))

    med_d = float(np.median(times["dense"]))
    med_p = float(np.median(times["packed"]))
    entry = {
        "metric": "co2 kernel A/B: dense vs occupancy-packed "
                  "(N=%d, interleaved)" % n,
        "value": med_p,
        "unit": "ms/eval (packed)",
        "protocol": {
            "dense_ms_per_eval": times["dense"],
            "packed_ms_per_eval": times["packed"],
            "median_dense_ms": med_d,
            "median_packed_ms": med_p,
            "speedup": med_d / med_p,
            "grid": list(dims), "cap": cap, "tx": tx,
            "occ_mean": round(occ_mean, 1), "occ_max": occ_max,
            "pair_lanes_dense": lanes_dense,
            "pair_lanes_packed": lanes_packed,
            "lane_ratio": lanes_dense / lanes_packed,
            "parity_relF_20k_sample": relF,
            "parity_relU": relU,
            "device": jax.devices()[0].device_kind,
            "note": "kernel-only force evaluations (no integrator); "
                    "same process, interleaved windows",
        },
    }
    print(json.dumps(entry), flush=True)
    if args.json:
        from tools.artifact import merge_artifact
        merge_artifact(args.json, [entry])
        log("merged into %s" % args.json)


if __name__ == "__main__":
    main()
