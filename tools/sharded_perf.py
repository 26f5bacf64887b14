"""Sharded-path perf datapoint (VERDICT r4 item 8): step time of the
multi-chip code path (ParallelMDSimulation) compiled for 1 device on
the real chip, for the H2O/molten-salt class (multi-site kernel +
blocked-SPME k-space) -- the configuration whose multi-chip long-range
path previously had no perf datapoint at all.

Virtual-device CPU wall time is meaningless; what IS measurable on one
chip is the sharded program (shard_map + ppermute ring + fused psum +
psum'd PME mesh) compiled for a 1-device mesh, A/B'd against the
single-chip driver on the same scene, with the packed-vs-dense
multi-site kernel toggle.  Reference role:
/root/reference/src/bhfmm/containers/UniformPseudoParticleContainer.h:95-135
(the duplicated-global-levels communication scheme whose TPU analogue
is the psum'd charge mesh).

Usage: python tools/sharded_perf.py [--n N] [--steps S] [--json OUT]
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
    print("[sharded %6.1fs] %s" % (time.perf_counter() - T0, msg),
          file=sys.stderr, flush=True)


def _measure(sim, steps, label):
    t0 = time.perf_counter()
    sim.run(steps=2, print_every=0)
    float(sim.last_globals.upot)
    log("%s: warm in %.1fs" % (label, time.perf_counter() - t0))
    ms = []
    for _ in range(3):
        t0 = time.perf_counter()
        sim.run(steps=steps, print_every=0)
        float(sim.last_globals.upot)
        ms.append((time.perf_counter() - t0) / steps * 1e3)
        log("%s: %.1f ms/step" % (label, ms[-1]))
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--json", default=os.path.join(REPO,
                                                   "SHARDED_PERF.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools.bench_ms import h2o_scene
    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.xml_config import XMLConfig
    from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation

    data, kw = h2o_scene(args.n)
    n = len(data.mid)

    def cfg():
        return XMLConfig(box=np.asarray(data.box, float),
                         ensemble_type="NVT", **kw)

    entries = []
    # single-chip driver (the packed kernel + blocked SPME)
    t0 = time.perf_counter()
    s1 = MDSimulation(cfg(), dtype=jnp.float32, phase_space_data=data)
    log("single-chip built in %.1fs (%s)" % (
        time.perf_counter() - t0,
        type(getattr(s1.engine, "force_fn", None)
             or s1.engine._force_fn).__name__))
    ms1 = _measure(s1, args.steps, "single")
    u1 = float(s1.last_globals.upot)
    del s1

    results = {"single_chip_ms": ms1}
    for packed in (False, True):
        label = "sharded-%s" % ("packed" if packed else "dense")
        t0 = time.perf_counter()
        try:
            ps = ParallelMDSimulation(
                cfg(), n_devices=1, dtype=jnp.float32,
                phase_space_data=data, ms_packed=packed)
            log("%s built in %.1fs (kind=%s)" % (
                label, time.perf_counter() - t0, ps.kind))
            ms = _measure(ps, args.steps, label)
            up = float(ps.last_globals.upot)
            results["%s_ms" % label] = ms
            results["%s_relU_vs_single" % label] = abs(up - u1) / abs(u1)
            del ps
        except Exception as e:
            log("%s FAILED: %r" % (label, e))
            results["%s_error" % label] = repr(e)[:400]

    entry = {
        "metric": "sharded-path step time, H2O class (N=%d, 1-device "
                  "mesh on the real chip)" % n,
        "value": float(np.median(results.get("sharded-packed_ms")
                                 or results.get("sharded-dense_ms")
                                 or [0.0])),
        "unit": "ms/step",
        "protocol": {
            **results,
            "n": n,
            "scene": "h2o (1 LJ + 3 charges, erfc real space + "
                     "blocked-SPME k-space)",
            "device": jax.devices()[0].device_kind,
            "note": "ParallelMDSimulation slab path (shard_map + "
                    "ppermute + psum'd charge mesh) compiled for 1 "
                    "device; >=2-device correctness is CI-proven on "
                    "the virtual CPU mesh",
        },
    }
    print(json.dumps(entry), flush=True)
    if args.json:
        from tools.artifact import merge_artifact
        merge_artifact(args.json, [entry])
        log("merged into %s" % args.json)


if __name__ == "__main__":
    main()
