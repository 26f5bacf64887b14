"""Per-phase timings of the multi-site force path on the real device.

The multi-site path (ops/pallas_ms_path.py) does, per step:
  bin      sort-based cell binning of molecule positions
  pack     quaternion site offsets + [N,P] plane assembly + slot gather
  kernel   the Pallas cell-pair kernel itself
  unpack   F/M/Vi gather-back to molecule order
This tool times each phase separately plus the fused path and the full
driver step, so multi-site optimization is evidence-driven (the same
discipline as tools/pme_phases.py for SPME).

Usage: python tools/ms_phases.py [h2o|co2] [--n N] [--json OUT]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_ms import co2_scene, h2o_scene, log  # noqa: E402


def _timeit(fn, sync, reps=3, inner=2):
    r = fn()
    sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = fn()
        sync(r)
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="h2o",
                    choices=["h2o", "co2"])
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.xml_config import XMLConfig
    from ls1_mardyn_tpu.ops.cells import bin_particles
    from ls1_mardyn_tpu.ops.pallas_lj import HX
    from ls1_mardyn_tpu.ops.pallas_multisite import (
        multisite_cell_forces_pallas,
    )

    data, cfg_kw = (co2_scene if args.scene == "co2" else h2o_scene)(args.n)
    cfg = XMLConfig(box=np.asarray(data.box, float), ensemble_type="NVT",
                    **cfg_kw)
    sim = MDSimulation(cfg, dtype=jnp.float32, phase_space_data=data)
    fp = getattr(sim.engine, "force_fn", None) or getattr(
        sim.engine, "_force_fn", None)
    if not hasattr(fp, "meta"):
        log("force path is %s, not the multi-site kernel; aborting"
            % type(fp).__name__)
        sys.exit(1)
    spec, meta = fp.spec, fp.meta
    nx, ny, nz = spec.dims
    cap, P, tx = spec.cap, meta.P, fp.tx
    log("grid %s cap=%d P=%d tx=%d jw=%d" % (spec.dims, cap, P, tx, fp.jw))
    sim.run(steps=2, print_every=0)
    float(sim.last_globals.upot)
    mol = sim.engine.mol

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            np.asarray(jax.device_get(leaves[0]))[...].ravel()[:1]

    out = {"scene": args.scene, "n": len(data.mid),
           "grid": list(spec.dims), "cap": cap, "P": P, "tx": tx,
           "jw": fp.jw, "device": jax.devices()[0].device_kind,
           "phases_ms": {}}

    # bin
    bin_j = jax.jit(lambda r, v: bin_particles(r, v, spec))
    out["phases_ms"]["bin"] = _timeit(
        lambda: bin_j(mol.r, mol.valid), sync)
    log("bin: %.1f ms" % out["phases_ms"]["bin"])

    # pack (site offsets + planes + slot gather)
    bins = bin_j(mol.r, mol.valid)

    def pack():
        idx = bins.slots.reshape(nz, ny, nx * cap)
        safe = jnp.clip(idx, 0, mol.capacity - 1)
        ok = (idx >= 0) & mol.valid[safe]
        packed = fp._pack_planes(mol)
        return jnp.where(ok[..., None], packed[safe], 0.0)

    pack_j = jax.jit(pack)
    out["phases_ms"]["pack"] = _timeit(lambda: pack_j(), sync)
    log("pack: %.1f ms" % out["phases_ms"]["pack"])

    # kernel only (planes prepared once)
    if getattr(fp, "packed", False):
        from ls1_mardyn_tpu.ops.pallas_ms_packed import (
            multisite_cell_forces_packed,
        )

        out["kernel_variant"] = "occupancy-packed"
        build_j = jax.jit(fp._build_views)
        out["phases_ms"]["build_views"] = _timeit(
            lambda: build_j(mol)[1], sync)
        log("build_views (bin+pack+compact): %.1f ms"
            % out["phases_ms"]["build_views"])
        tbl, r_i, r_j, _bins, _prefix = build_j(mol)
        sync((tbl, r_i, r_j))

        def kern():
            return multisite_cell_forces_packed(
                tbl, r_i, r_j, nx=nx, ny=ny, nz=nz, cap=cap,
                Wp=fp.Wp, Wjp=fp.Wjp, cell_plane=fp.cell_plane,
                box=spec.box, rc2=fp.rc2, rc2_lj=fp.rc2_lj,
                screen_alpha=fp.screen_alpha, meta=meta,
                interpret=fp.interpret,
            )[1]
    else:
        g = pack_j()
        Lx = spec.box[0]
        shift_vec = jnp.zeros((P,), jnp.float32).at[0].set(Lx)

        def halo(a):
            pad = jnp.zeros(a.shape[:2] + ((HX - 1) * cap, P), a.dtype)
            left = a[:, :, (nx - 1) * cap:, :] - shift_vec
            right = a[:, :, :cap, :] + shift_vec
            parts = [left, a, right]
            if HX > 1:
                parts = [pad] + parts + [pad]
            return jnp.concatenate(parts, axis=2)

        r_i = jnp.moveaxis(g, -1, 2)
        r_j = jnp.moveaxis(halo(g), -1, 2)
        sync((r_i, r_j))  # materialize before timing the kernel alone

        def kern():
            return multisite_cell_forces_pallas(
                r_i, r_j, nx=nx, ny=ny, nz=nz, cap=cap, tx=tx,
                box=spec.box, rc2=fp.rc2, rc2_lj=fp.rc2_lj,
                screen_alpha=fp.screen_alpha, meta=meta,
                interpret=fp.interpret, jw=fp.jw,
            )[1]

    out["phases_ms"]["kernel"] = _timeit(kern, sync)
    log("kernel: %.1f ms" % out["phases_ms"]["kernel"])

    # full force path
    call_j = jax.jit(fp.__call__)
    out["phases_ms"]["force_path"] = _timeit(
        lambda: call_j(mol)[1].upot6lj, sync)
    log("force_path: %.1f ms" % out["phases_ms"]["force_path"])

    # full driver step
    t0 = time.perf_counter()
    sim.run(steps=5, print_every=0)
    float(sim.last_globals.upot)
    out["phases_ms"]["driver_step"] = (time.perf_counter() - t0) / 5 * 1e3
    log("driver_step: %.1f ms" % out["phases_ms"]["driver_step"])

    # pair-lane roofline estimate
    pair_lanes = nz * ny * nx * cap * cap * 9 * (tx + 2 * HX)
    out["pair_lanes_per_step"] = pair_lanes
    print(json.dumps(out), flush=True)
    if args.json:
        from tools.artifact import merge_artifact
        out.setdefault("metric",
                       "multi-site phase breakdown (%s)"
                       % args.scene)
        merge_artifact(args.json, [out])


if __name__ == "__main__":
    main()
