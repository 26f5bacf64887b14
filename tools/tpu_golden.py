"""TPU-tier golden accuracy run: compiled kernels on the REAL chip vs
the f64 N^2 oracle, full scenes.

Two tiers (VERDICT r1 item 8: "commit the TPU-tier golden run"):

A. Multi-site: every reference Vectorization*.inp scene at FULL
   molecule count (250 / 50), run through the compiled
   PallasMultiSitePath in f32 on the device -- the exact harness of
   VectorizedCellProcessorTest (/root/reference/src/particleContainer/
   adapter/tests/VectorizedCellProcessorTest.cpp:136-215), but on the
   production TPU binary instead of interpret mode.

B. 1CLJ kernel variants (row / zb / gram / lanej / n3l) on a dense
   liquid scene: per-slot forces from the compiled f32 kernel vs the
   f64 oracle evaluated at the positions the kernel actually sees
   (cell-origin + f32 local).  This is the tier that catches
   f32-on-MXU hazards (a default-precision f32 dot_general executes
   as one bf16 pass) that interpret-mode f64 tests cannot see.

Writes TPU_GOLDEN.json at the repo root.  The f64 oracle runs in a
CPU/x64 subprocess (phase=oracle) because x64 cannot be enabled in the
production f32 process.

Usage:  python tools/tpu_golden.py            # full run, writes JSON
        python tools/tpu_golden.py --quick    # 1CLJ tier only
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_INPUT = "/root/reference/test_input"
SCENES = [
    "VectorizationLennardJones1CLJ.inp",
    "VectorizationLennardJones.inp",
    "VectorizationCharge.inp",
    "VectorizationDipole.inp",
    "VectorizationQuadrupole.inp",
    "VectorizationChargeDipole.inp",
    "VectorizationChargeQuadrupole.inp",
    "VectorizationDipoleQuadrupole.inp",
    "VectorizationWater.inp",
    "VectorizationMultiComponentMultiPotentials_50_molecules.inp",
]
CUTOFF = 35.0
TMP = "/tmp/tpu_golden_exchange.npz"
N_1CLJ = 32768  # 32^3 lattice points, rho=0.8 liquid


def make_1clj_positions():
    """Deterministic bench-like scene; returns (r64_effective, box, L).

    r64_effective = cell_origin + f32(local): exactly the coordinates
    the RMM kernel computes with, reconstructed in f64 so the oracle
    and the kernel see the SAME points (isolates kernel arithmetic
    error from state-discretization error)."""
    from ls1_mardyn_tpu.io.generators import cubic_grid

    rho = 0.8
    L = (N_1CLJ / rho) ** (1.0 / 3.0)
    data = cubic_grid(N_1CLJ, [L, L, L], 1.1, seed=11)
    r64 = np.asarray(data.r, np.float64)
    nd = 12  # edge 2.87 > rc=2.5 (sentinel-eligible), max occ 35 < cap 64
    cl = np.asarray([L / nd] * 3, np.float64)
    c3 = np.clip(np.floor(r64 / cl).astype(np.int64), 0, nd - 1)
    local32 = (r64 - c3 * cl).astype(np.float32)
    r_eff = c3 * cl + local32.astype(np.float64)
    return data, r_eff, L, nd


def phase_oracle():
    """CPU / x64 subprocess: compute f64 oracle forces for everything
    the device phase saved, write them back into the exchange file."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.ascii_reader import read_inp
    from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit
    from ls1_mardyn_tpu.scene import build_scene

    dev = dict(np.load(TMP, allow_pickle=False))
    out = {}

    if "lj_r" in dev:
        data, r_eff, L, _ = make_1clj_positions()
        # oracle at the kernel's effective positions, in the kernel's
        # slot order (saved by the device phase)
        order = dev["lj_order"].astype(np.int64)
        assert np.allclose(np.sort(order), np.arange(len(r_eff)))
        mol, pp, table, box = build_scene(
            data, cutoff=2.5, dtype=jnp.float64
        )
        import dataclasses

        mol = dataclasses.replace(mol, r=jnp.asarray(r_eff[order]))
        f, m = compute_forces_n2_jit(mol, pp, box, chunk=512)
        out["lj_F"] = np.asarray(f.F, np.float64)
        out["lj_upot"] = np.float64(m.upot)
        out["lj_virial"] = np.float64(m.total_virial)

    for scene in SCENES:
        key = f"ms_F::{scene}"
        if key not in dev:
            continue
        sdata = read_inp(f"{REF_INPUT}/{scene}")
        mol, pp, table, box = build_scene(sdata, cutoff=CUTOFF,
                                          dtype=jnp.float64)
        f, m = compute_forces_n2_jit(mol, pp, box)
        out[f"oF::{scene}"] = np.asarray(f.F, np.float64)
        out[f"oM::{scene}"] = np.asarray(f.M, np.float64)
        out[f"oU::{scene}"] = np.float64(m.upot)
        out[f"oV::{scene}"] = np.float64(m.total_virial)

    np.savez(TMP, **dev, **out)
    print("oracle phase done:", sorted(out))


def phase_device(quick: bool):
    """Production (TPU) process: run compiled f32 kernels, save
    per-molecule outputs + the slot order."""
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.ascii_reader import read_inp
    from ls1_mardyn_tpu.io.generators import cubic_grid  # noqa: F401
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import NP_RMM, RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene

    backend = jax.default_backend()
    save = {"backend": np.array(backend)}

    # -- tier B: 1CLJ variants -------------------------------------------
    data, r_eff, L, nd = make_1clj_positions()
    mol, pp, table, box = build_scene(data, cutoff=2.5, dtype=jnp.float32)
    spec = CellGridSpec(dims=(nd, nd, nd),
                        box=(float(L),) * 3, cap=64)
    sim = RMMSimulation(table, pp, box, spec, dt=0.002,
                        target_temperature=1.1, thermostat=True, tx=2,
                        interpret=backend == "cpu")

    # recover the slot -> molecule mapping: init stores mid = component
    # id, so temporarily smuggle the molecule index through mid
    import dataclasses

    mol_idx = dataclasses.replace(
        mol, mid=jnp.arange(mol.capacity, dtype=jnp.int32)
    )

    def variant_forces(name):
        sim.cw = name in ("cw", "cwn3l")
        sim.cwn3l = name == "cwn3l"
        sim.zb = name in ("zb", "gram")
        sim.zb_gram = name == "gram"
        sim.n3l = name == "n3l"
        sim.lanej = name == "lanej"
        sim.init_from_molecules(mol_idx)
        # fresh jit per variant via a new lambda: jax.jit CACHES equal
        # callables, and bound methods compare equal, so
        # jax.jit(sim._forces) silently reuses the first variant's trace
        f, u6, vir = jax.jit(lambda p: sim._forces(p))(sim.state.planes)
        p = np.asarray(sim.state.planes)
        fz = np.asarray(f)
        nz, ny, _, W = p.shape
        flat = p.transpose(0, 1, 3, 2).reshape(-1, NP_RMM)
        ff = fz.transpose(0, 1, 3, 2).reshape(-1, 3)
        valid = flat[:, 3] > 0.5
        order = flat[valid, 7].astype(np.int64)
        # kernel returns upot6lj and the virial sum (same conventions
        # as Macroscopic: upot = u6/6, total_virial = vir)
        return order, ff[valid], float(u6) / 6.0, float(vir)

    variants = ["cwn3l", "cw", "row", "lanej", "zb", "gram", "n3l"]
    order0 = None
    for v in variants:
        try:
            order, F, u, vir = variant_forces(v)
        except Exception as e:  # variant ineligible on this shape
            print(f"variant {v}: skipped ({type(e).__name__}: {e})")
            continue
        if order0 is None:
            order0 = order
            save["lj_order"] = order
            save["lj_r"] = np.array(1)
        assert np.array_equal(order, order0), f"{v}: slot order changed"
        save[f"ljF::{v}"] = F
        save[f"ljU::{v}"] = np.float64(u)
        save[f"ljV::{v}"] = np.float64(vir)
        print(f"variant {v}: forces computed, upot6/6={u:.6f}")

    # -- tier A: multi-site full scenes ----------------------------------
    if not quick:
        from ls1_mardyn_tpu.ops.pallas_ms_path import PallasMultiSitePath

        for scene in SCENES:
            sdata = read_inp(f"{REF_INPUT}/{scene}")
            smol, spp, stable, sbox = build_scene(
                sdata, cutoff=CUTOFF, dtype=jnp.float32
            )
            sspec = CellGridSpec.create(np.asarray(sbox), CUTOFF, cap=256)
            try:
                path = PallasMultiSitePath(
                    stable, sspec, interpret=backend == "cpu"
                )
                f, m, _ = jax.jit(path.__call__)(smol)
            except Exception as e:
                print(f"{scene}: skipped ({type(e).__name__}: {e})")
                continue
            save[f"ms_F::{scene}"] = np.asarray(f.F, np.float64)
            save[f"ms_M::{scene}"] = np.asarray(f.M, np.float64)
            save[f"ms_U::{scene}"] = np.float64(m.upot)
            save[f"ms_V::{scene}"] = np.float64(m.total_virial)
            print(f"{scene}: n={int(np.asarray(smol.valid).sum())} done")

    np.savez(TMP, **save)
    print("device phase done")


def relerr(a, b):
    """max |a-b| / max|b| (force-scale-relative, as the reference
    asserts against the largest force component)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.abs(b).max() + 1e-300
    return float(np.abs(a - b).max() / scale)


def compare():
    d = dict(np.load(TMP, allow_pickle=False))
    report = {
        "backend": str(d["backend"]),
        "dtype": "float32",
        "scenes": {},
        "lj_variants": {},
        "note": (
            "max|F_kernel - F_oracle| / max|F_oracle| on the real "
            "device, full scenes; oracle = f64 N^2 min-image "
            "(models/oracle.py) on CPU"
        ),
    }
    if "lj_F" in d:
        bF = d["lj_F"]
        bU = float(d["lj_upot"])
        bV = float(d["lj_virial"])
        for v in ("row", "lanej", "zb", "gram", "n3l"):
            if f"ljF::{v}" not in d:
                continue
            report["lj_variants"][v] = {
                "F_maxrel": relerr(d[f"ljF::{v}"], bF),
                "upot_rel": abs(float(d[f"ljU::{v}"]) - bU) / abs(bU),
                "virial_rel": abs(float(d[f"ljV::{v}"]) - bV)
                / (abs(bV) + 1e-300),
            }
    for scene in SCENES:
        if f"oF::{scene}" not in d or f"ms_F::{scene}" not in d:
            continue
        oU = float(d[f"oU::{scene}"])
        oV = float(d[f"oV::{scene}"])
        report["scenes"][scene] = {
            "F_maxrel": relerr(d[f"ms_F::{scene}"], d[f"oF::{scene}"]),
            "M_maxrel": relerr(d[f"ms_M::{scene}"], d[f"oM::{scene}"]),
            "upot_rel": abs(float(d[f"ms_U::{scene}"]) - oU)
            / (abs(oU) + 1e-300),
            "virial_rel": abs(float(d[f"ms_V::{scene}"]) - oV)
            / (abs(oV) + 1e-300),
        }
    out = os.path.join(REPO, "TPU_GOLDEN.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))
    print("wrote", out)


def main():
    if "--phase=oracle" in sys.argv:
        phase_oracle()
        return
    quick = "--quick" in sys.argv
    phase_device(quick)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase=oracle"],
        check=True, env=env,
    )
    compare()


if __name__ == "__main__":
    main()
