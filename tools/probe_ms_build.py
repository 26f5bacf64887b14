"""On-chip cost probe for the packed multi-site build phases.

The packed path's per-step overhead (force_path - kernel ~ 283 ms at
CO2 N=1.05M, MS_PHASES.json) is dominated by two HBM gathers in
_build_views:
  (A) i-pack:  packed[msafe]            [rows, W, Pb]   <- [N, Pb]
  (B) j-view:  take_along_axis(g, jsafe) [rows, Wjp, Pb] <- [rows, Wp, Pb]
plus the sort-based binning.  This tool times each in isolation with
synthetic operands of the exact production shapes, plus the candidate
replacements (slice-built j view; thin 9-plane i gather + packed-order
site rotation), so the rebuild is evidence-driven.

Usage: python tools/probe_ms_build.py [--json OUT]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=5, inner=3):
    import jax
    r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = fn()
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # CO2 production geometry (BENCH_MS_CO2.json): grid 27^3 cap 96
    nx = ny = nz = 27
    cap = 96
    Pb = 24
    N = 1_048_576
    rows = nz * ny
    W = nx * cap
    Wp = -(-W // 128) * 128
    Wjp = -(-((nx + 2) * cap) // 128) * 128

    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (N, Pb), jnp.float32)
    msafe = jax.random.randint(key, (rows, W), 0, N, jnp.int32)
    g = jax.random.normal(key, (rows, Wp, Pb), jnp.float32)
    jsafe = jax.random.randint(key, (rows, Wjp), 0, Wp, jnp.int32)
    jax.block_until_ready((packed, msafe, g, jsafe))

    out = {"geometry": {"rows": rows, "W": W, "Wp": Wp, "Wjp": Wjp,
                        "Pb": Pb, "N": N},
           "device": jax.devices()[0].device_kind, "ms": {}}

    # (A) the i-pack gather at Pb planes
    f = jax.jit(lambda: packed[msafe])
    out["ms"]["i_gather_24p"] = timeit(f)
    print("i_gather_24p: %.1f ms (%.0f MB)"
          % (out["ms"]["i_gather_24p"], rows * W * Pb * 4 / 1e6), flush=True)

    # (A') thin i gather: 9 planes only (r, valid, cid, q)
    thin = packed[:, :9]
    f = jax.jit(lambda: thin[msafe])
    out["ms"]["i_gather_9p"] = timeit(f)
    print("i_gather_9p: %.1f ms (%.0f MB)"
          % (out["ms"]["i_gather_9p"], rows * W * 9 * 4 / 1e6), flush=True)

    # (B) the j-view gather
    f = jax.jit(lambda: jnp.take_along_axis(
        g, jsafe[..., None], axis=1))
    out["ms"]["j_gather"] = timeit(f)
    print("j_gather: %.1f ms (%.0f MB)"
          % (out["ms"]["j_gather"], rows * Wjp * Pb * 4 / 1e6), flush=True)

    # (B') slice-built j view: small halo gather + concat of gi slices
    hsafe = jax.random.randint(key, (rows, cap), 0, Wp, jnp.int32)

    def jslice():
        left = jnp.take_along_axis(g, hsafe[..., None], axis=1)
        right = g[:, :cap] + 1.0
        gj = jnp.concatenate([left, right, g], axis=1)
        pad = Wjp + 2 * cap - gj.shape[1]
        if pad > 0:
            gj = jnp.concatenate(
                [gj, jnp.zeros((rows, pad, Pb), jnp.float32)], axis=1)
        return gj

    f = jax.jit(jslice)
    out["ms"]["j_slices"] = timeit(f)
    print("j_slices: %.1f ms" % out["ms"]["j_slices"], flush=True)

    # packed-order site rotation cost (the 15 derived planes from q)
    qn = jax.random.normal(key, (rows, W, 4), jnp.float32)
    pos = jax.random.normal(key, (6, 3), jnp.float32)

    def rot():
        q = qn / jnp.linalg.norm(qn, axis=-1, keepdims=True)
        w, x, y, z = [q[..., i] for i in range(4)]
        outs = []
        for s in range(6):
            px, py, pz = pos[s]
            # quaternion rotate (expanded)
            t2 = (w * x, w * y, w * z, -x * x, x * y, x * z,
                  -y * y, y * z, -z * z)
            ox = 2 * ((t2[6] + t2[8]) * px + (t2[4] - t2[2]) * py
                      + (t2[5] + t2[1]) * pz) + px
            oy = 2 * ((t2[4] + t2[2]) * px + (t2[3] + t2[8]) * py
                      + (t2[7] - t2[0]) * pz) + py
            oz = 2 * ((t2[5] - t2[1]) * px + (t2[7] + t2[0]) * py
                      + (t2[3] + t2[6]) * pz) + pz
            outs += [ox, oy, oz]
        return jnp.stack(outs, axis=-1)

    f = jax.jit(rot)
    out["ms"]["site_rot_packed"] = timeit(f)
    print("site_rot_packed: %.1f ms" % out["ms"]["site_rot_packed"],
          flush=True)

    # sort-based binning cost proxy: [rows, W] key sort
    keys = jax.random.randint(key, (rows, W), 0, W, jnp.int32)
    f = jax.jit(lambda: jnp.sort(keys, axis=-1))
    out["ms"]["row_sort"] = timeit(f)
    print("row_sort: %.1f ms" % out["ms"]["row_sort"], flush=True)

    print(json.dumps(out), flush=True)
    if args.json:
        from tools.artifact import merge_artifact
        out.setdefault("metric", "ms build phase probe")
        merge_artifact(args.json, [out])


if __name__ == "__main__":
    main()
