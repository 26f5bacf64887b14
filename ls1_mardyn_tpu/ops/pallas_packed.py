"""Packed-pencil 1CLJ force kernel ("cwp") + pencil pack/unpack.

The cell-window kernels (ops/pallas_lj.py) pay for every EMPTY slot:
work scales as n_cells * cap * 5 rows * 4*cap lanes regardless of
occupancy, and the equilibrated liquid runs ~60% occupancy, a ~1.65x
tax on both the i and the j side.  This module removes the i-side tax
completely and shrinks the j windows to (about) the occupied lanes:

  Layout: each (z, y) PENCIL (one x-row of cells) stores its valid
  molecules CONTIGUOUSLY, x-cell-sorted, in [nz, ny, 9, Wp] planes
  (x, y, z cell-local; cx = x-cell index as f32; w; vx, vy, vz; mid).
  Tail lanes carry the sentinel y = SENTINEL_SCALE*(1+lane) so the
  kernel never reads validity (same trick as the dense sentinel mode).

  Kernel: i molecules are processed in groups of 16 PACKED sublanes.
  A group spans a known x-cell range [cell_first, cell_last]; all its
  cutoff partners live in cells [cell_first-1, cell_last+1] of the 5
  Newton-3rd-law forward pencils (dz,dy) = (0,0) (0,1) (1,-1) (1,0)
  (1,1) (the C08 forward idea, /root/reference/src/particleContainer/
  LinkedCellTraversals/C08BasedTraversals.h:122-126).  In a packed
  pencil those cells occupy ~3*occupancy ~ 60 contiguous lanes, so ONE
  128-lane window per row covers them.  Window start offsets are
  32-aligned per-group scalars (precomputed at rebin time, read from
  SMEM); 4 phase-shifted copies of the j pencils make every vector
  load 128-aligned (the ops/pallas_lj cw trick, now with dynamic
  offsets).  Work per molecule: 5 rows x 128 lanes, independent of
  cell occupancy -- ~1.65x less than the dense cwn3l kernel at the
  benchmark's 60% occupancy.

  Periodic x wrap: edge groups (first e_lo / last e_hi groups of each
  pencil, whose cell range sticks out of [0, nx)) take ONE extra
  128-lane window on the far end of the pencil in a separate short
  pass -- no halo copies at all.  Pairs are counted once by absolute
  packed-lane order (center row: j_lane > i_lane), so the j-side
  Newton-3rd-law forces always land at true packed-lane positions and
  the phase-scratch fold-back is fully static.

  The i/j pair math recenters both sides on the group's base cell:
  x'' = x_local + (cx - cb)*clx keeps every operand O(window-span)
  (never an absolute coordinate), preserving the cell-local f32
  precision argument of ops/rmm.py.

Replaces: the reference's VCP1CLJRMM + LinkedCells traversal
(/root/reference/src/particleContainer/adapter/VCP1CLJRMM.cpp); the
packed pencil is the TPU answer to its tightly-packed CellDataSoARMM
storage (/root/reference/src/particleContainer/ParticleCellRMM.h:8).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ls1_mardyn_tpu.ops.pallas_lj import SENTINEL_SCALE

# packed plane indices
PX, PY, PZ, PCX, PW, PVX, PVY, PVZ, PMID = range(9)
NP_PACK = 9
# kernel position planes (x, y, z, cx)
KPLANES = 4
# forward rows (dz, dy); index 0 is the center (in-pencil) row
POFFS = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
GSZ = 32  # i molecules per group (default; functions take gsz=)
PH = 8  # phase copies (window offsets align to 128//PH lanes)
WIN = 128  # j window lanes
NT = 16  # table ints per group
# table columns
T_CB = 0
T_W0 = 1  # woff[k] at columns 1..5
T_W2 = 6  # wrap woff2[k] at columns 6..10
T_O2 = 11  # cx offset for the wrap window (+-nx)
# meta columns (per pencil)
M_NG = 0
M_ELO = 1
M_EHI = 2
M_CNT = 3
NMETA = 8
PAD_Y = -7777.0  # phase-copy tail padding (outside every cutoff)
_BIG = np.int32(2 ** 30)


def _ceil_div(a, b):
    return (a + b - 1) // b


# ---------------------------------------------------------------------------
# pack / unpack / tables (XLA, run at rebin cadence)
# ---------------------------------------------------------------------------


def pencil_counts(valid_lane: jnp.ndarray, nx: int, cap: int):
    """occ [nz,ny,nx], starts (exclusive cumsum) [nz,ny,nx], cnt [nz,ny]
    from a dense [nz, ny, nx*cap] validity plane."""
    nz, ny, W = valid_lane.shape
    occ = valid_lane.reshape(nz, ny, nx, cap).sum(-1).astype(jnp.int32)
    starts = jnp.cumsum(occ, axis=-1) - occ
    return occ, starts, occ.sum(-1)


def _sentinel_tail(q, cnt, y, dtype):
    """Apply the packed sentinel fill for lanes >= cnt."""
    sent = SENTINEL_SCALE * (1.0 + q.astype(dtype))
    return jnp.where(q < cnt, y, sent)


def pack_pencils(planes: jnp.ndarray, forces: jnp.ndarray, nx: int,
                 cap: int, Wp: int):
    """Dense [nz,ny,8,nx*cap] planes (+[nz,ny,3,W] forces) -> packed
    [nz,ny,9,Wp] (+ packed forces), occ/starts/cnt, overflow flag.

    One stable per-pencil lax.sort by (valid ? lane : BIG) moves the
    valid molecules to the front in x-cell order (the dense lane order
    is already cell-major)."""
    nz, ny, NP, W = planes.shape
    dtype = planes.dtype
    valid = planes[:, :, 3, :] > 0.5
    occ, starts, cnt = pencil_counts(valid, nx, cap)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, W), 2)
    key = jnp.where(valid, lane, _BIG)
    cxf = (lane // cap).astype(dtype)
    ops = (
        [planes[:, :, c, :] for c in range(NP)]
        + [cxf]
        + [forces[:, :, c, :] for c in range(3)]
    )
    srt = jax.lax.sort([key] + ops, num_keys=1)
    if W < Wp:
        srt = [jnp.pad(a, ((0, 0), (0, 0), (0, Wp - W))) for a in srt]
    overflow = jnp.max(cnt) > Wp
    s = [a[..., :Wp] for a in srt[1:]]
    q = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, Wp), 2)
    c2 = cnt[:, :, None]
    live = q < c2
    x = jnp.where(live, s[0], 0.0)
    y = _sentinel_tail(q, c2, s[1], dtype)
    z = jnp.where(live, s[2], 0.0)
    w = jnp.where(live, s[3], 0.0)
    cx = jnp.where(live, s[8], 0.0)
    vs = [jnp.where(live, s[c], 0.0) for c in (4, 5, 6)]
    mid = jnp.where(live, s[7], 0.0)
    fs = [jnp.where(live, s[c], 0.0) for c in (9, 10, 11)]
    packed = jnp.stack([x, y, z, cx, w] + vs + [mid], axis=2)
    pforces = jnp.stack(fs, axis=2)
    return packed, pforces, occ, starts, cnt, overflow


def unpack_pencils(packed: jnp.ndarray, pforces: jnp.ndarray,
                   occ: jnp.ndarray, starts: jnp.ndarray, nx: int,
                   cap: int, empty_fill=None):
    """Packed [nz,ny,9,Wp] -> dense [nz,ny,8,nx*cap] (+forces).

    Placement is a per-pencil union sort: items keyed by their dense
    destination cx*cap + (q - starts[cx]) plus one filler per EMPTY
    dense slot keyed by its own lane; keys < W are then exactly a
    permutation of [0, W) and the first W sorted entries are the dense
    layout (no gathers, no scatters)."""
    nz, ny, NP, Wp = packed.shape
    W = nx * cap
    dtype = packed.dtype
    w = packed[:, :, PW, :]
    q = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, Wp), 2)
    cx = jnp.clip(packed[:, :, PCX, :].astype(jnp.int32), 0, nx - 1)
    s_at = jnp.take_along_axis(starts, cx, axis=-1)
    dest = jnp.where(w > 0.5, cx * cap + (q - s_at), _BIG)
    item_cols = (
        [packed[:, :, c, :] for c in (PX, PY, PZ, PW, PVX, PVY, PVZ, PMID)]
        + [pforces[:, :, c, :] for c in range(3)]
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, W), 2)
    occ_lane = jnp.repeat(occ, cap, axis=-1)
    empty = (lane % cap) >= occ_lane
    kf = jnp.where(empty, lane, _BIG + 1)
    if empty_fill is None:
        fvals = [jnp.zeros((nz, ny, W), dtype) for _ in item_cols]
    else:
        fvals = empty_fill(lane)
    keys = jnp.concatenate([dest, kf], axis=-1)
    ops = [
        jnp.concatenate([a, b], axis=-1) for a, b in zip(item_cols, fvals)
    ]
    srt = jax.lax.sort([keys] + ops, num_keys=1)
    out = [a[..., :W] for a in srt[1:]]
    planes = jnp.stack(out[:8], axis=2)
    forces = jnp.stack(out[8:], axis=2)
    return planes, forces


def build_tables(occ: jnp.ndarray, starts: jnp.ndarray, cnt: jnp.ndarray,
                 *, nx: int, Wp: int, gsz: int = GSZ, ph: int = PH):
    """Per-group window tables for the packed kernel.

    Returns (tab [nz,ny,Gmax,NT] i32, meta [nz,ny,NMETA] i32,
    feasible [] bool).  Infeasible states (a window that cannot fit in
    128 lanes, a group wrapping both ends, nx < 6) must fall back to
    the dense kernel."""
    nz, ny, _ = occ.shape
    step = WIN // ph
    Gmax = Wp // gsz
    ng = _ceil_div(cnt, gsz)  # [nz,ny]
    t = jnp.arange(Gmax, dtype=jnp.int32)
    first = (gsz * t)[None, None, :]
    last = jnp.minimum(first + gsz - 1, jnp.maximum(cnt, 1)[:, :, None] - 1)
    live_t = first < jnp.maximum(cnt, 1)[:, :, None]
    # cell of packed lane q: #cells whose start <= q, minus 1
    st4 = starts[:, :, None, :]
    cf = (st4 <= first[..., None]).sum(-1).astype(jnp.int32) - 1
    cl_ = (st4 <= last[..., None]).sum(-1).astype(jnp.int32) - 1
    cell_lo = cf - 1
    cell_hi = cl_ + 1
    wrap_lo = cell_lo < 0
    wrap_hi = cell_hi > nx - 1
    cb = jnp.where(live_t, cf, 0)

    woffs, woffs2 = [], []
    feas = jnp.asarray(True)
    for dz, dy in POFFS:
        starts_k = jnp.roll(starts, (-dz, -dy), axis=(0, 1))
        cnt_k = jnp.roll(cnt, (-dz, -dy), axis=(0, 1))[:, :, None]
        a = jnp.clip(cell_lo, 0, nx - 1)
        b = jnp.clip(cell_hi, 0, nx - 1)
        sa = jnp.take_along_axis(starts_k, a, axis=-1)
        woff = (sa // step) * step
        end_b = jnp.where(
            b >= nx - 1,
            cnt_k,
            jnp.take_along_axis(starts_k, jnp.minimum(b + 1, nx - 1), axis=-1),
        )
        feas = feas & jnp.all(jnp.where(live_t, end_b - woff <= WIN, True))
        # wrap window: lo-wrap covers cell nx-1; hi-wrap covers 0..cell_hi-nx
        w2_lo = (jnp.take_along_axis(
            starts_k, jnp.full_like(a, nx - 1), axis=-1) // step) * step
        end2_lo = cnt_k
        hi_c = jnp.clip(cell_hi - nx + 1, 0, nx - 1)
        end2_hi = jnp.take_along_axis(starts_k, hi_c, axis=-1)
        woff2 = jnp.where(wrap_lo, w2_lo, 0)
        end2 = jnp.where(wrap_lo, end2_lo, end2_hi)
        has2 = (wrap_lo | wrap_hi) & live_t
        feas = feas & jnp.all(jnp.where(has2, end2 - woff2 <= WIN, True))
        # NOTE overlap of window 1 and window 2 is harmless: they
        # evaluate j at different periodic images (o2 = +-nx cells =
        # the box length >= 6*rc apart), so a given pair passes the
        # cutoff in at most one of them -- no double count.
        woffs.append(jnp.where(live_t, woff, 0))
        woffs2.append(jnp.where(has2, woff2, 0))
    feas = feas & ~jnp.any(wrap_lo & wrap_hi & live_t) & (nx >= 6)
    o2 = jnp.where(wrap_lo, -nx, nx).astype(jnp.int32)

    cols = [cb] + woffs + woffs2 + [o2] + [
        jnp.zeros_like(cb) for _ in range(NT - T_O2 - 1)
    ]
    tab = jnp.stack(cols, axis=-1)  # [nz,ny,Gmax,NT]
    e_lo = (wrap_lo & live_t).sum(-1).astype(jnp.int32)
    e_hi = (wrap_hi & live_t).sum(-1).astype(jnp.int32)
    meta = jnp.stack(
        [ng.astype(jnp.int32), e_lo, e_hi, cnt.astype(jnp.int32)]
        + [jnp.zeros_like(e_lo) for _ in range(NMETA - 4)],
        axis=-1,
    )[:, :, None, :]  # [nz, ny, 1, NMETA] (Pallas trailing-dims rule)
    return tab, meta, feas


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _cwp_kernel(
    iT_ref,     # [1, 1, Wp, 4] this pencil's positions, sublane-major
    j0_ref,     # [4, 1, ny, 4, Wp] phase stack, plane z
    jp_ref,     # [4, 1, ny, 4, Wp] phase stack, plane z+1
    tab_ref,    # [1, 1, Gmax, NT] SMEM
    meta_ref,   # [1, 1, 1, NMETA] SMEM
    fi_ref,     # [1, 1, 4, Wp] out: i-side forces (+ scalars in plane 3)
    fe_ref,     # [1, 1, Wp, 4] out: edge-pass i forces, sublane-major
    sown_ref,   # [4, 1, ny, 4, Wp] out: j-side forces, own z, phase space
    sup_ref,    # [4, 1, ny, 4, Wp] out: j-side forces, z+1, phase space
    *,
    ny: int,
    Wp: int,
    clx: float,
    cly: float,
    clz: float,
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    compute_macro: bool,
    fast_recip: bool,
    ablate: str,
    gsz: int,
    ph: int,
    out_dtype,
):
    step = WIN // ph
    chg = WIN // gsz
    y = pl.program_id(1)
    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)
    clxv = jnp.asarray(clx, out_dtype)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, KPLANES), 1)
    oh = [(lane4 == c).astype(out_dtype) for c in range(KPLANES)]
    lwin = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)

    @pl.when(y == 0)
    def _init_z_accum():
        sown_ref[...] = jnp.zeros(sown_ref.shape, out_dtype)
        sup_ref[...] = jnp.zeros(sup_ref.shape, out_dtype)

    fi_ref[...] = jnp.zeros(fi_ref.shape, out_dtype)
    fe_ref[...] = jnp.zeros(fe_ref.shape, out_dtype)

    ng = meta_ref[0, 0, 0, M_NG]
    e_lo = meta_ref[0, 0, 0, M_ELO]
    e_hi = meta_ref[0, 0, 0, M_EHI]

    def group_body(t, gi, carry, wrap):
        """Process group t.  gi = (xg, yg, zg, cxg, q0) with [gsz, 1]
        coordinate columns and q0 the group's first absolute lane.
        wrap (static) selects the table's second-window columns."""
        u6_t, vir_t = carry
        xg, yg, zg, cxg, q0 = gi
        cbf = tab_ref[0, 0, t, T_CB].astype(out_dtype)
        # wrap windows recenter the j side by o2 = +-nx cells so both
        # operands stay O(window span) -- never an absolute coordinate
        cbj = cbf - tab_ref[0, 0, t, T_O2].astype(out_dtype) if wrap else cbf
        xi = xg + (cxg - cbf) * clxv  # [GSZ, 1]
        qv = q0 + jax.lax.broadcasted_iota(jnp.int32, (gsz, 1), 0)
        ax = jnp.zeros((gsz, WIN), out_dtype)
        ay = jnp.zeros((gsz, WIN), out_dtype)
        az = jnp.zeros((gsz, WIN), out_dtype)
        if compute_macro:
            au = jnp.zeros((gsz, WIN), out_dtype)
            av = jnp.zeros((gsz, WIN), out_dtype)
        for k, (dz, dy) in enumerate(POFFS):
            col = (T_W2 if wrap else T_W0) + k
            if "notab" in ablate:
                # ablation: static window offsets (PHYSICS-WRONG);
                # attributes the scalar-read + dynamic-address cost
                woff = jnp.int32(128 * k)
            else:
                woff = tab_ref[0, 0, t, col]
            p = (woff // step) % ph
            base = pl.multiple_of(woff - step * p, WIN)
            yw = jax.lax.rem(
                jnp.asarray(y + dy + ny, jnp.int32), jnp.int32(ny)
            )
            jref = j0_ref if dz == 0 else jp_ref
            Hw = jref[p, 0, yw, :, pl.ds(base, WIN)]  # [4, WIN]
            xj = Hw[0:1]
            yj = Hw[1:2]
            zj = Hw[2:3]
            cxj = Hw[3:4]
            xjs = xj + (cxj - cbj) * clxv
            ygs = yg - jnp.asarray(dy * cly, out_dtype)
            zgs = zg - jnp.asarray(dz * clz, out_dtype)
            dx = xi - xjs
            dyv = ygs - yj
            dzv = zgs - zj
            dr2 = dx * dx + dyv * dyv + dzv * dzv
            mask = dr2 < cut2
            if k == 0:
                # in-pencil row: count each pair once by lane order
                jabs = woff + lwin  # [1, WIN]
                mask = mask & (jabs > qv)
            if fast_recip:
                den = jnp.where(mask, dr2, jnp.asarray(1e30, out_dtype))
                r0 = pl.reciprocal(den, approx=True)
                invdr2 = r0 * (2.0 - den * r0)
                mf = mask.astype(out_dtype) if compute_macro else None
            else:
                mf = mask.astype(out_dtype)
                invdr2 = mf / jnp.where(mask, dr2, 1.0)
            lj6 = s2 * invdr2
            lj6 = lj6 * lj6 * lj6
            lj12 = lj6 * lj6
            lj12m6 = lj12 - lj6
            fac = e24 * (lj12 + lj12m6) * invdr2
            fdx = fac * dx
            fdy = fac * dyv
            fdz = fac * dzv
            ax = ax + fdx
            ay = ay + fdy
            az = az + fdz
            if compute_macro:
                au = au + (e24 * lj12m6 + sh6 * mf)
                av = av + fac * dr2
            if "nojf" in ablate:
                continue
            # Newton-3rd-law j forces at true packed lanes (phase space)
            jf = jnp.concatenate(
                [
                    -jnp.sum(fdx, axis=0, keepdims=True),
                    -jnp.sum(fdy, axis=0, keepdims=True),
                    -jnp.sum(fdz, axis=0, keepdims=True),
                    jnp.zeros((1, WIN), out_dtype),
                ],
                axis=0,
            )
            sref = sown_ref if dz == 0 else sup_ref
            cur = sref[p, 0, yw, :, pl.ds(base, WIN)]
            sref[p, 0, yw, :, pl.ds(base, WIN)] = cur + jf
        if compute_macro:
            u6_t = u6_t + jnp.sum(au)
            vir_t = vir_t + jnp.sum(av)
        return u6_t, vir_t, ax, ay, az

    def extract_cols(G):
        xi = jnp.sum(G * oh[0], axis=1, keepdims=True)
        yi = jnp.sum(G * oh[1], axis=1, keepdims=True)
        zi = jnp.sum(G * oh[2], axis=1, keepdims=True)
        ci = jnp.sum(G * oh[3], axis=1, keepdims=True)
        return xi, yi, zi, ci

    def extract_chunk(c):
        """Load one 128-row i chunk (sublane-major: no transpose)."""
        off = pl.multiple_of(c * WIN, WIN)
        G = iT_ref[0, 0, pl.ds(off, WIN), :]  # [128, 4]
        return (off,) + extract_cols(G)

    zero = jnp.zeros((), out_dtype)
    nchunks = (ng + (chg - 1)) // chg

    def chunk_body(c, carry):
        u6_t, vir_t = carry
        off, xi, yi, zi, ci = extract_chunk(c)
        fcols = []
        for g in range(chg):
            s0 = g * gsz
            gi = (
                xi[s0 : s0 + gsz],
                yi[s0 : s0 + gsz],
                zi[s0 : s0 + gsz],
                ci[s0 : s0 + gsz],
                off + s0,
            )
            t = c * chg + g
            u6_t, vir_t, ax, ay, az = group_body(
                t, gi, (u6_t, vir_t), wrap=False
            )
            fcols.append(
                jnp.concatenate(
                    [
                        jnp.sum(ax, axis=1, keepdims=True),
                        jnp.sum(ay, axis=1, keepdims=True),
                        jnp.sum(az, axis=1, keepdims=True),
                        jnp.zeros((gsz, 1), out_dtype),
                    ],
                    axis=1,
                )
            )
        Fcat = jnp.concatenate(fcols, axis=0)  # [128, 4]
        fi_ref[0, 0, :, pl.ds(off, WIN)] = Fcat.T
        return (u6_t, vir_t)

    if "nochunk" in ablate:
        u6, vir = zero, zero
    elif "static" in ablate:
        # static trip count: every pencil walks all Wp//WIN chunks
        # (sentinel tails are inert); enables Mosaic loop pipelining
        u6, vir = jax.lax.fori_loop(
            0, Wp // WIN, chunk_body, (zero, zero),
            unroll="unrollall" in ablate,
        )
    else:
        u6, vir = jax.lax.fori_loop(0, nchunks, chunk_body, (zero, zero))

    # pass 2: wrap windows for the edge groups (t < e_lo, t >= ng-e_hi)
    def edge_body(t, carry):
        u6_t, vir_t = carry
        lane0 = pl.multiple_of(t * gsz, gsz)
        G = iT_ref[0, 0, pl.ds(lane0, gsz), :]  # [gsz, 4]
        gi = extract_cols(G) + (lane0,)
        u6_t, vir_t, ax, ay, az = group_body(
            t, gi, (u6_t, vir_t), wrap=True
        )
        fg = jnp.concatenate(
            [
                jnp.sum(ax, axis=1, keepdims=True),
                jnp.sum(ay, axis=1, keepdims=True),
                jnp.sum(az, axis=1, keepdims=True),
                jnp.zeros((gsz, 1), out_dtype),
            ],
            axis=1,
        )  # [GSZ, 4]
        cur = fe_ref[0, 0, pl.ds(lane0, gsz), :]
        fe_ref[0, 0, pl.ds(lane0, gsz), :] = cur + fg
        return (u6_t, vir_t)

    if "noedge" not in ablate:
        u6, vir = jax.lax.fori_loop(0, e_lo, edge_body, (u6, vir))
        u6, vir = jax.lax.fori_loop(
            jnp.maximum(e_lo, ng - e_hi), ng, edge_body, (u6, vir)
        )

    # stash the pencil's scalars in plane 3, lanes 0/1
    l0 = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    sv = u6 * (l0 == 0).astype(out_dtype) + vir * (l0 == 1).astype(out_dtype)
    fi_ref[0, 0, 3:4, pl.ds(0, WIN)] = sv


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "Wp", "box", "eps24", "sig2", "shift6", "rc2",
        "interpret", "compute_macro", "fast_recip", "ablate", "gsz", "ph",
    ),
)
def lj_forces_packed(
    pos4: jnp.ndarray,  # [nz, ny, 4, Wp]: x, y, z (cell-local), cx
    tab: jnp.ndarray,   # [nz, ny, Gmax, NT] int32
    meta: jnp.ndarray,  # [nz, ny, NMETA] int32
    *,
    nx: int,
    ny: int,
    nz: int,
    Wp: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    compute_macro: bool = True,
    fast_recip: bool = False,
    ablate: str = "",
    gsz: int = GSZ,
    ph: int = PH,
):
    """Returns (forces [nz,ny,3,Wp] in packed layout, u6, vir)."""
    assert pos4.shape == (nz, ny, KPLANES, Wp), pos4.shape
    assert Wp % WIN == 0
    out_dtype = pos4.dtype
    step = WIN // ph
    Gmax = Wp // gsz
    bx, by, bz = box
    clx, cly, clz = bx / nx, by / ny, bz / nz
    assert min(cly, clz) ** 2 >= rc2, "packed kernel needs cell edge >= rc"

    # 4 phase-shifted copies (32-lane steps) so every window load is
    # 128-aligned; tail pad sits outside every cutoff
    pad = jnp.zeros((nz, ny, KPLANES, step * (ph - 1)), out_dtype)
    pad = pad.at[:, :, 1, :].set(jnp.asarray(PAD_Y, out_dtype))
    base = jnp.concatenate([pos4, pad], axis=3)
    JP = jnp.stack(
        [base[:, :, :, step * p : step * p + Wp] for p in range(ph)]
    )
    iT = pos4.transpose(0, 1, 3, 2)  # [nz, ny, Wp, 4] sublane-major

    i_spec = pl.BlockSpec(
        (1, 1, Wp, KPLANES), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    j_specs = [
        pl.BlockSpec(
            (ph, 1, ny, KPLANES, Wp),
            functools.partial(
                lambda z, y, dz: (0, (z + dz) % nz, 0, 0, 0), dz=dz
            ),
            memory_space=pltpu.VMEM,
        )
        for dz in (0, 1)
    ]
    tab_spec = pl.BlockSpec(
        (1, 1, Gmax, NT), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.SMEM,
    )
    meta_spec = pl.BlockSpec(
        (1, 1, 1, NMETA), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.SMEM,
    )
    out_specs = [
        pl.BlockSpec(
            (1, 1, KPLANES, Wp), lambda z, y: (z, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, Wp, KPLANES), lambda z, y: (z, y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (ph, 1, ny, KPLANES, Wp), lambda z, y: (0, z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (ph, 1, ny, KPLANES, Wp), lambda z, y: (0, z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _cwp_kernel,
        ny=ny,
        Wp=Wp,
        clx=clx,
        cly=cly,
        clz=clz,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        compute_macro=compute_macro,
        fast_recip=fast_recip,
        ablate=ablate,
        gsz=gsz,
        ph=ph,
        out_dtype=out_dtype,
    )
    fi, fe, sown, sup = pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs + [tab_spec, meta_spec],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, KPLANES, Wp), out_dtype),
            jax.ShapeDtypeStruct((nz, ny, Wp, KPLANES), out_dtype),
            jax.ShapeDtypeStruct((ph, nz, ny, KPLANES, Wp), out_dtype),
            jax.ShapeDtypeStruct((ph, nz, ny, KPLANES, Wp), out_dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(iT, JP, JP, tab, meta)

    # fold the phase-space j-force accumulators back to packed lanes
    def fold(sp):
        acc = sp[0, :, :, :, :]
        for p in range(1, ph):
            sh = jnp.pad(sp[p], ((0, 0), (0, 0), (0, 0), (step * p, 0)))
            acc = acc + sh[:, :, :, :Wp]
        return acc

    f = fi + fe.transpose(0, 1, 3, 2) + fold(sown)
    f = f + jnp.roll(fold(sup), 1, axis=0)
    u6 = jnp.sum(fi[:, :, 3, 0])
    vir = jnp.sum(fi[:, :, 3, 1])
    return f[:, :, :3, :], u6, vir
