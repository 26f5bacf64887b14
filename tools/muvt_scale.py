"""muVT at scale: the BASELINE.md scene-coverage tier "Evaporation/
Adsorption muVT multi-chip at N >= 10M", driven through the PRODUCT
surface (ParallelMDSimulation from an XMLConfig, the same path
`--parallel` CLI runs take).

Hardware reality: this machine exposes ONE real TPU chip, so the run
executes the full multi-chip code path (slab decomposition, ppermute
halo/leaving exchange, sharded GCMC with owner routing) on a 1-device
mesh at N >= 10M; the >= 2-device behavior of the identical code path
is CI-proven on the 8-device virtual CPU mesh
(tests/test_gcmc_multichip.py, tests/test_parallel_plugins.py) and by
the driver's dryrun_multichip.

Reference bar: the reference runs muVT through the same
DomainDecomposition machinery as NVT
(/root/reference/src/ensemble/GrandCanonicalEnsemble.cpp:92-137 +
parallel/DomainDecompMPIBase.cpp); N >= 10M is the BASELINE.json
scene-coverage target, not a reference-committed number.

Writes MUVT_SCALE.json at the repo root.

Usage: python tools/muvt_scale.py [N_millions] [scene]
  scene = "lj" (default): homogeneous LJ liquid at rho=0.60, mu=-2.5
          (measures the interval cost; at this state point Metropolis
          acceptance is ~0, so the accepted-insertion scatter path
          stays cold)
  scene = "evap": the BASELINE Evaporation/Adsorption tier -- a
          two-phase MkTcTS film (liquid slab + vapor, the
          /root/reference/examples/Evaporation scene class) with the
          ChemicalPotential control volume RESTRICTED TO THE VAPOR
          region and mu near saturation, so insertions/deletions
          genuinely accept and the at-scale insertion scatter path
          (the OOM-safe post-scan scatter, PROGRESS r3 s3) executes.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_target = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 10_500_000
    scene = sys.argv[2] if len(sys.argv) > 2 else "lj"
    instances = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
    from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation

    backend = jax.default_backend()
    print(f"backend={backend} devices={len(jax.devices())}")

    import sys as _sys

    def say(msg):
        print(msg)
        _sys.stdout.flush()

    T, rc = 1.10, 2.5
    if scene == "evap":
        # two-phase film + vapor (MkTcTSGenerator, the reference's
        # Evaporation/Adsorption scene class); GC control volume in
        # the vapor only, mu near saturation -> nonzero acceptance
        # liq_frac 0.80 (raised from 0.70 after the L=290 grid still
        # exhausted HBM in the GC interval): N >= 10M in a ~279-edge
        # box (1.37M rc-pitch cells); run with LS1_PAR_CAP_FACTOR=1.25
        # to trim the 2x molecule-capacity headroom
        rho_liq, rho_vap, liq_frac, mu = 0.60, 0.02, 0.80, -1.0
        rho_eff = rho_liq * liq_frac + rho_vap * (1 - liq_frac)
        L = (n_target / rho_eff) ** (1.0 / 3.0)
        rho = rho_eff
        scene_name = ("Evaporation-class two-phase muVT film "
                      "(MkTcTS slab + vapor-restricted GC)")
        say(f"scene: {scene_name} N~{n_target} L={L:.1f}")
        cv_lo_y = (liq_frac + 0.15) * L  # vapor, clear of the interface
        cfg = XMLConfig(
            timestep=0.002,
            temperature=T,
            box=np.array([L, L, L]),
            cutoff=rc,
            lj_cutoff=rc,
            ensemble_type="muVT",
            generator=PluginSpec(
                "MkTcTSGenerator",
                {"density-liquid": str(rho_liq),
                 "density-vapor": str(rho_vap),
                 "liq_fraction": str(liq_frac)},
            ),
            chemical_potentials=[
                PluginSpec(
                    "ChemicalPotential",
                    {
                        "mu": str(mu),
                        "componentid": "1",
                        "instances": str(instances),
                        "everyNTimesteps": "2",
                        "control": {
                            "lower": {"x": 0.0, "y": cv_lo_y, "z": 0.0},
                            "upper": {"x": L, "y": L, "z": L},
                        },
                    },
                )
            ],
        )
    else:
        rho, mu = 0.60, -2.5
        L = (n_target / rho) ** (1.0 / 3.0)
        scene_name = "muVT LJ liquid (interval-cost tier)"
        say(f"scene: N={n_target} L={L:.1f}")
        cfg = XMLConfig(
            timestep=0.002,
            temperature=T,
            box=np.array([L, L, L]),
            cutoff=rc,
            lj_cutoff=rc,
            ensemble_type="muVT",
            generator=PluginSpec(
                "CubicGridGenerator", {"numMolecules": str(n_target)}
            ),
            chemical_potentials=[
                PluginSpec(
                    "ChemicalPotential",
                    {
                        "mu": str(mu),
                        "componentid": "1",
                        "instances": "8",
                        "everyNTimesteps": "2",
                    },
                )
            ],
        )

    t0 = time.time()
    sim = ParallelMDSimulation(cfg, n_devices=1, dtype=jnp.float32)
    t_build = time.time() - t0
    say(f"decomposed: kind={sim.kind} t_build={t_build:.1f}s")
    n0 = n_target  # nominal; actual count read back from gv.n below

    # warmup (compile) + timed window
    t0 = time.time()
    sim.run(steps=2, print_every=0)
    t_compile = time.time() - t0
    say(f"warmup (compile + 2 steps): {t_compile:.1f}s")

    steps = 10
    t0 = time.time()
    gv = sim.run(steps=steps, print_every=0)
    t_run = time.time() - t0
    nv = int(float(gv.n))
    n0 = nv  # actual molecule count (generators size from densities)
    ups = n0 * steps / t_run
    say(f"muVT window: {t_run:.1f}s for {steps} steps")
    # MD-only window on the same state separates the GCMC interval
    # cost from the sharded MD step cost
    gc = sim.gc
    sim.gc = None
    t0 = time.time()
    sim.run(steps=steps, print_every=0)
    t_md = time.time() - t0
    sim.gc = gc
    say(f"MD-only window: {t_md:.1f}s for {steps} steps")
    out = {
        "scene": scene_name,
        "backend": backend,
        "n_devices": len(jax.devices()),
        "decomposition": sim.kind,
        "N": n0,
        "N_after": nv,
        "box": L,
        "rho": rho,
        "T": T,
        "mu": mu,
        "steps_timed": steps,
        "wall_s": t_run,
        "updates_per_s": ups,
        "md_only_wall_s": t_md,
        "md_only_updates_per_s": n0 * steps / t_md,
        "gcmc_attempted": sim.gc.attempted if sim.gc else 0,
        "gcmc_accepted_ins": sim.gc.accepted_ins if sim.gc else 0,
        "gcmc_accepted_del": sim.gc.accepted_del if sim.gc else 0,
        "upot_per_N": float(gv.upot) / max(nv, 1),
        "temperature": float(gv.temperature),
        "build_s": t_build,
        "compile_s": t_compile,
        "multichip_ci": "tests/test_gcmc_multichip.py (8 virtual devices)",
    }
    print(json.dumps(out))
    if backend == "tpu":
        from tools.artifact import merge_artifact
        out = dict(out)
        out.setdefault("metric", "muvt at-scale run (scene=%s)" % scene)
        # every scene merges into MUVT_SCALE.json (metric-keyed rows);
        # the evaporation tier is what the BASELINE scene row demands
        merge_artifact(os.path.join(REPO, "MUVT_SCALE.json"), [out])
        print("wrote (merged) MUVT_SCALE.json")
    else:
        print("(not on TPU: artifact not written)")


if __name__ == "__main__":
    main()
