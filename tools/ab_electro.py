"""A/B the three long-range electrostatics solvers on the chip:
direct-Ewald k-space, SPME, and the solid-harmonics FMM, on the same
molten-salt scene (ionic LJ fluid, the FMMCharge.inp class).

Interleaved timings (shared-chip throttle varies ~20% between
sessions; only same-process comparisons are meaningful, see
PROGRESS.md).  Prints one line per solver: wall per evaluation +
max rel force diff vs the direct-Ewald route.

Usage: python tools/ab_electro.py [n_side ...] [--json OUT.json]
       (default sizes 22, 46, 100 -> N = 10648, 97336, 1000000;
       EVEN n_side only -- odd rock-salt lattices carry net charge,
       which the periodic FMM's lattice sum legitimately rejects)
"""

import json
import os
import sys
import time

SOLVERS_SEL = None  # --solvers pme,fmm bisection (worker-crash triage)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(n_side):
    import jax
    import jax.numpy as jnp

    from ls1_mardyn_tpu.models.components import Component, ComponentTable
    from ls1_mardyn_tpu.models.interaction import PairParams
    from ls1_mardyn_tpu.ops.ewald import EwaldParams, EwaldSolver
    from ls1_mardyn_tpu.ops.fmm import FMMElectrostatics
    from ls1_mardyn_tpu.ops.pme import PMEParams, PMESolver
    from ls1_mardyn_tpu.state import MoleculeState

    d = 1.1
    comps = []
    for sign in (1.0, -1.0):
        c = Component(cid=len(comps))
        c.add_ljcenter(0, 0, 0, 1.0, 0.2, 1.0)
        c.add_charge(0, 0, 0, 0.0, sign)
        comps.append(c)
    rc = 2.5
    table = ComponentTable(comps, cutoff=rc, lj_cutoff=rc)
    pp = PairParams.from_table(table, dtype=jnp.float32)
    idx = np.arange(n_side)
    g = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(3)
    r = (g + 0.5) * d + rng.uniform(-0.15, 0.15, (len(g), 3))
    q = np.where(g.sum(1) % 2 == 0, 1.0, -1.0)
    box = np.array([n_side * d] * 3)
    n = len(r)
    print(f"N={n} box={box[0]:.1f} backend={jax.default_backend()}")
    mol = MoleculeState.from_numpy(
        r=r, v=np.zeros_like(r),
        cid=np.where(q > 0, 0, 1).astype(np.int32),
        dtype=jnp.float32,
    )

    q2_sum, n_q = float((q**2).sum()), n
    ep = EwaldParams.tune(box, rc, q2_sum, n_q, accuracy=1e-4)
    pe = PMEParams.tune(box, rc, q2_sum, n_q, accuracy=1e-4)
    solvers = {
        "pme": PMESolver(box, pe, dtype=jnp.float32),
        "fmm": FMMElectrostatics(box, table, pp, n_hint=n,
                                 dtype=jnp.float32, order=8),
    }
    if SOLVERS_SEL is not None:
        solvers = {k: v for k, v in solvers.items()
                   if k in SOLVERS_SEL}
    # the direct k-space [N, K] matmul at N=1e6 needs ~2.6e5 k-vectors
    # for this box: ~1e12 MACs and a worker-killing footprint -- that
    # size is exactly what PME exists for, so cap the direct solver
    import numpy as _np
    n_kvec_est = 4.19 * ep.kmax ** 3 / 2
    if n * n_kvec_est <= 5e12 and (SOLVERS_SEL is None
                                   or "ewald" in SOLVERS_SEL):
        solvers = {"ewald": EwaldSolver(box, ep, dtype=jnp.float32),
                   **solvers}
    else:
        print(f"ewald direct skipped: N*K ~ {n * n_kvec_est:.2g}")
    fns = {
        k: jax.jit(lambda m, p, s=s: s(m, p)[:2]) for k, s in solvers.items()
    }
    out = {}
    u_out = {}
    for k, f in fns.items():
        u, F = f(mol, pp)
        # scalar readback: block_until_ready does not reliably block
        # through the axon remote backend
        u_out[k] = float(u)
        out[k] = np.asarray(F)
    times = {k: [] for k in fns}
    reps, inner = 5, 3
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(inner):
                u, F = f(mol, pp)
            float(u)
            times[k].append((time.perf_counter() - t0) / inner)
    refk = "ewald" if "ewald" in out else (
        "pme" if "pme" in out else None)
    ref = out.get(refk) if refk else None
    scale = np.abs(ref).max() if ref is not None else 1.0
    rec = {"n_side": n_side, "n_sites": n, "box": float(box[0]),
           "ewald_kmax": int(ep.kmax), "pme_grid": list(pe.grid),
           "solvers": {}}

    # Like-for-like total-Coulomb reference for the FMM column: FMM
    # computes ALL Coulomb work, so comparing it against a k-space-only
    # force verifies nothing (round-4 verdict weak item 6).  Build the
    # erfc real-space force on a charge-only component table via the N^2
    # oracle and add the k-space force: that is the product Ewald total.
    f_total_ref = None
    if "fmm" in out and refk is not None and n <= 120_000:
        from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit

        alpha = float((ep if refk == "ewald" else pe).alpha)
        comps_q = []
        for sign in (1.0, -1.0):
            c = Component(cid=len(comps_q))
            c.add_charge(0, 0, 0, 0.0, sign)
            comps_q.append(c)
        table_q = ComponentTable(comps_q, cutoff=rc, lj_cutoff=rc)
        pp_q = PairParams.from_table(table_q, dtype=jnp.float32)
        # the N^2 oracle's per-chunk pair tensors are [chunk, N, ...]:
        # an unchunked 10k^2 sweep is a 34 GB compile-time OOM on the
        # 16 GB chip -- always chunk (largest divisor of n <= 128)
        chunk = next((c for c in range(min(128, n), 0, -1)
                      if n % c == 0), 0)
        fr, _ = compute_forces_n2_jit(
            mol, pp_q, jnp.asarray(box, jnp.float32),
            chunk=chunk, screen_alpha=alpha)
        f_total_ref = np.asarray(fr.F) + out[refk]
        rec["fmm_reference"] = ("erfc real space (N^2 oracle, alpha=%.4f)"
                                " + %s k-space" % (alpha, refk))

    for k in fns:
        ts = np.array(times[k]) * 1e3
        rec["solvers"][k] = {
            "ms_per_eval_min": round(float(ts.min()), 3),
            "ms_per_eval_med": round(float(np.median(ts)), 3),
        }
        if k == "fmm":
            # total-Coulomb force vs the real+k-space Ewald total
            if f_total_ref is not None:
                rel = float(np.abs(out[k] - f_total_ref).max()
                            / np.abs(f_total_ref).max())
                rec["solvers"][k]["max_relF_total_coulomb_vs_%s" % refk] = rel
                print(f"{k:6s}  min {ts.min():8.2f} ms  med "
                      f"{np.median(ts):8.2f} ms  max relF (total Coulomb "
                      f"vs {refk} real+k) {rel:.2e}")
            else:
                rec["solvers"][k]["accuracy"] = (
                    "skipped at this N (N^2 oracle bound); see smaller "
                    "rows / tests/test_fmm.py for the like-for-like check")
                print(f"{k:6s}  min {ts.min():8.2f} ms  med "
                      f"{np.median(ts):8.2f} ms  (accuracy vs total "
                      f"Coulomb checked at smaller N)")
            continue
        if ref is None:
            continue
        rel = float(np.abs(out[k] - ref).max() / scale)
        urel = abs(u_out[k] - u_out[refk]) / max(abs(u_out[refk]), 1e-30)
        rec["solvers"][k].update({
            "max_relF_vs_%s" % refk: rel,
            "relU_vs_%s" % refk: urel,
        })
        print(
            f"{k:6s}  min {ts.min():8.2f} ms  med {np.median(ts):8.2f} ms"
            f"  max rel F vs {refk} {rel:.2e}  relU {urel:.2e}"
        )
    # note: ewald/pme here time the K-SPACE part only (their real-space
    # erfc rides the pair kernel); fmm times the WHOLE Coulomb work
    # (near P2P + far field).  An apples-to-apples product comparison
    # adds the pair kernel's screened-term cost to ewald/pme.
    print("(ewald/pme = k-space only; fmm = all Coulomb incl. near field)")
    return rec


def main():
    args = [a for a in sys.argv[1:]]
    json_out = ""
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    solvers_sel = None
    if "--solvers" in args:
        i = args.index("--solvers")
        solvers_sel = args[i + 1].split(",")
        del args[i:i + 2]
    global SOLVERS_SEL
    SOLVERS_SEL = solvers_sel
    sides = [int(a) for a in args] or [22, 46, 100]
    import jax

    recs = {"device": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "note": "ewald/pme = k-space only (their erfc real space "
                    "rides the pair kernel); fmm = all Coulomb work",
            "sizes": []}
    for s in sides:
        try:
            recs["sizes"].append(measure(s))
        except Exception as e:
            print(f"n_side={s} FAILED: {e!r}")
            recs["sizes"].append({"n_side": s, "error": repr(e)[:300]})
    if json_out:
        # merge by size row: a failed re-run must never clobber a
        # previously measured row (round-4 artifact-integrity rule)
        old_sizes = {}
        if os.path.exists(json_out):
            try:
                with open(json_out) as f:
                    prev = json.load(f)
                for row in prev.get("sizes", []):
                    k = row.get("n_side") or round(
                        row.get("n_sites", 0) ** (1 / 3))
                    if k:
                        old_sizes[int(k)] = row
            except Exception:
                pass
        for row in recs["sizes"]:
            k = int(row.get("n_side") or 0)
            if "error" in row and k in old_sizes and \
                    "error" not in old_sizes[k]:
                keep = dict(old_sizes[k])
                keep["last_error"] = row["error"]
                old_sizes[k] = keep
            elif k:
                old_sizes[k] = row
        recs["sizes"] = [old_sizes[k] for k in sorted(old_sizes)]
        with open(json_out, "w") as f:
            json.dump(recs, f, indent=1)
        print("wrote (merged)", json_out)


if __name__ == "__main__":
    main()
