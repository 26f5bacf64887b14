"""Multi-site benchmark: the reference's flagship kernel class.

The reference's hot kernel is the full multi-site
VectorizedCellProcessor::_calculatePairs
(/root/reference/src/particleContainer/adapter/VectorizedCellProcessor.cpp:797,
seven interaction loop bodies) -- the 1CLJ RMM path measured by bench.py
is its special case.  BASELINE.md's scene coverage is mostly multi-site
(CO2 2CLJ+quadrupole-class, H2O charges).  This tool gives that kernel a
committed number + roofline position at N >= 1M through the PRODUCT
driver (MDSimulation -> PallasMultiSitePath).

Scenes:
  co2   The reference CO2 example (3 LJ + 3 charges per molecule,
        /root/reference/examples/CO2/: rc_LJ = 33.07 reduced = 6.2 sigma,
        T = 0.00117, rho = 0.00134/a0^3), equilibrated 2048-molecule
        .inp tiled kx per axis (periodic replicas -- a valid
        configuration of the k^3 box).  18 live site-pair loop bodies
        (9 LJ + 9 charge-charge).
  h2o   Water-class fluid: 1 LJ + 3 charges in reduced units
        (SPC/E-like geometry scaled to sigma=1), rho=0.8, rc=3.0,
        lattice start, velocity-scaling NVT.  10 live bodies
        (1 LJ + 9 charge-charge) + Ewald/PME k-space via the driver's
        cost-based selection.

Protocol mirrors bench.py: warmup to steady state, k windows of fixed
steps, median rate; scalar readback syncs (axon block_until_ready is
unreliable); grid/cap/tx/planes and a pair-lane roofline estimate ride
in the JSON.

Usage: python tools/bench_ms.py [co2|h2o|both] [--n N] [--json OUT]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def log(msg):
    print("[bench_ms %6.1fs] %s" % (time.perf_counter() - T0, msg),
          file=sys.stderr, flush=True)


REF_CO2 = "/root/reference/examples/CO2/370K_15mol_l/CO2_370K_15mol_l.inp"
REF_EOX = "/root/reference/examples/EOX/600K_15mol_l/EOX_600K_15mol_l.inp"


def tile_phasespace(data, k):
    """Tile an equilibrated periodic box k x k x k: each image is a
    periodic replica, so the tiled state is a valid equilibrated
    configuration of the enlarged box (identical per-cell occupancy
    statistics -- the same trick as bench.py's seed tiling)."""
    n = len(data.mid)
    offs = np.stack(
        np.meshgrid(np.arange(k), np.arange(k), np.arange(k),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(np.float64)
    box = np.asarray(data.box, np.float64)
    r = (data.r[None, :, :] + (offs * box)[:, None, :]).reshape(-1, 3)
    reps = k ** 3
    data.r = r
    data.v = np.tile(data.v, (reps, 1))
    data.q = np.tile(data.q, (reps, 1))
    data.L = np.tile(data.L, (reps, 1))
    data.cid = np.tile(data.cid, reps)
    data.mid = np.arange(1, reps * n + 1, dtype=np.int64)
    data.box = box * k
    return data


def co2_scene(n_target):
    from ls1_mardyn_tpu.io.ascii_reader import read_inp

    data = read_inp(REF_CO2)
    n0 = len(data.mid)
    k = max(1, round((n_target / n0) ** (1.0 / 3.0)))
    data = tile_phasespace(data, k)
    log("co2: %d molecules (tile %dx of %d), box %.1f" % (
        len(data.mid), k, n0, data.box[0]))
    cfg_kw = dict(
        timestep=0.0667516,          # reference config.xml
        temperature=0.00117172223,
        cutoff=33.0702,
        lj_cutoff=33.0702,
        eps_rf=1.0e10,
    )
    return data, cfg_kw


def eox_scene(n_target):
    """The reference EOX example (ethylene oxide: 3 LJ centers + 1
    point dipole, /root/reference/examples/EOX/600K_15mol_l/: rc_LJ =
    33.07 reduced, T = 0.0019, ReactionField eps = 1e10), equilibrated
    2048-molecule .inp tiled kx per axis.  This is BASELINE.md's
    dipole-body scene class: exercises the dipole-dipole loop body
    (VectorizedCellProcessor.h:192-297) + reaction-field term at
    scale."""
    from ls1_mardyn_tpu.io.ascii_reader import read_inp

    data = read_inp(REF_EOX)
    n0 = len(data.mid)
    k = max(1, round((n_target / n0) ** (1.0 / 3.0)))
    data = tile_phasespace(data, k)
    log("eox: %d molecules (tile %dx of %d), box %.1f" % (
        len(data.mid), k, n0, data.box[0]))
    cfg_kw = dict(
        timestep=0.0667516,
        temperature=0.0019000901,
        cutoff=33.0702,
        lj_cutoff=33.0702,
        eps_rf=1.0e10,
    )
    return data, cfg_kw


def h2o_scene(n_target):
    """Water-class: 1 LJ center at the COM + 3 charges (SPC/E geometry
    scaled to sigma = 1): O at origin q=-0.84, H at +-(0.32, 0.25, 0)
    q=+0.42 (bond 0.32 sigma ~ 1 A / 3.17 A).  Reduced units, rho=0.8,
    rc=3.0; erfc-screened real space + k-space via the driver's Ewald
    auto-selection (the H2O+NaBr production path)."""
    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.models.components import Component

    c = Component(cid=0)
    c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, False)
    c.add_charge(0.0, 0.0, 0.0, 0.0, -0.8476)
    c.add_charge(0.316, 0.245, 0.0, 0.01, 0.4238)
    c.add_charge(-0.316, 0.245, 0.0, 0.01, 0.4238)
    rho, T = 0.8, 1.1
    L = (n_target / rho) ** (1.0 / 3.0)
    data = cubic_grid(n_target, [L, L, L], T, components=[c], seed=11)
    # random orientations (quaternions), zero angular momentum start
    rng = np.random.default_rng(5)
    q = rng.normal(size=(n_target, 4))
    data.q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(
        np.float64
    )
    log("h2o: %d molecules lattice, box %.1f rho %.2f" % (n_target, L, rho))
    cfg_kw = dict(
        timestep=0.002,
        temperature=T,
        cutoff=3.0,
        lj_cutoff=3.0,
        electrostatic_solver="Ewald",
        ewald_accuracy=1e-4,
    )
    return data, cfg_kw


def measure(name, data, cfg_kw, steps, windows, budget):
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.xml_config import XMLConfig
    from ls1_mardyn_tpu.ops.pallas_lj import HX

    n = len(data.mid)
    cfg = XMLConfig(box=np.asarray(data.box, float),
                    ensemble_type="NVT", **cfg_kw)
    t0 = time.perf_counter()
    sim = MDSimulation(cfg, dtype=jnp.float32, phase_space_data=data)
    fp = getattr(sim.engine, "force_fn", None) or getattr(
        sim.engine, "_force_fn", None)
    info = {}
    if fp is not None and hasattr(fp, "meta"):
        spec = fp.spec
        tx = fp.tx
        cap = spec.cap
        nxs, nys, nzs = spec.dims
        info = dict(
            grid=list(spec.dims), cap=cap, tx=tx, planes=fp.meta.P,
            jw=fp.jw,
            pair_lanes=float(nzs * nys * nxs * cap * cap * 9 * (tx + 2 * HX)),
            bodies=int(sum(int(m.sum()) for m in fp.meta.masks.values())),
            kernel=("occupancy-packed" if getattr(fp, "packed", False)
                    else "dense"),
        )
    log("%s: driver built in %.1fs; %s" % (
        name, time.perf_counter() - t0, info or type(sim.engine).__name__))

    log("%s: warmup" % name)
    sim.run(steps=3, print_every=0)
    float(sim.last_globals.upot)
    t0 = time.perf_counter()
    sim.run(steps=2, print_every=0)
    float(sim.last_globals.upot)
    t_step = (time.perf_counter() - t0) / 2
    log("%s: probe %.0f ms/step" % (name, t_step * 1e3))
    left = budget - (time.perf_counter() - T0)
    while windows > 1 and left < windows * steps * t_step + 20:
        windows -= 1
    while steps > 3 and left < windows * steps * t_step + 20:
        steps = max(3, steps // 2)
    log("%s: measuring %d windows x %d steps" % (name, windows, steps))
    rates, win_ms = [], []
    for wi in range(windows):
        t0 = time.perf_counter()
        sim.run(steps=steps, print_every=0)
        float(sim.last_globals.upot)
        dt = time.perf_counter() - t0
        rates.append(n * steps / dt)
        win_ms.append(dt / steps * 1e3)
        log("%s: window %d: %.1f ms/step (%.3g updates/s)" % (
            name, wi, win_ms[-1], rates[-1]))
    mups = float(np.median(rates)) / jax.device_count()
    return {
        "metric": "%s molecule-updates/s/chip (N=%d, multi-site driver)"
                  % (name, n),
        "value": mups,
        "unit": "updates/s/chip",
        "protocol": {
            "windows_ms_per_step": [round(w, 2) for w in win_ms],
            "steps_per_window": steps,
            "n": n,
            "device": jax.devices()[0].device_kind,
            **info,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="both",
                    choices=["co2", "h2o", "eox", "both", "all"])
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--budget", type=float, default=1500.0)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    out = []
    scenes = {"both": ["co2", "h2o"],
              "all": ["co2", "h2o", "eox"]}.get(args.scene,
                                                [args.scene])
    mk = {"co2": co2_scene, "h2o": h2o_scene, "eox": eox_scene}
    for s in scenes:
        data, kw = mk[s](args.n)
        try:
            out.append(measure(s, data, kw, args.steps, args.windows,
                               args.budget))
        except Exception as e:
            log("%s FAILED: %r" % (s, e))
            out.append({"metric": s, "error": repr(e)[:500]})
        print(json.dumps(out[-1]), flush=True)
    if args.json:
        from tools.artifact import merge_artifact
        merge_artifact(args.json, out)


if __name__ == "__main__":
    main()
