"""Smooth particle-mesh Ewald (SPME): O(N log N) periodic electrostatics.

The scalable long-range solver complementing ops/ewald.py (direct
k-space matmuls, O(N*K)).  This is the TPU-native realization of the
reference's FMM-FFT capability (/root/reference/src/bhfmm/fft/
FFTAcceleration*: grid-based far field with FFT convolution;
cmake ENABLE_FMM_FFT) -- as SURVEY.md section 7 step 9 argues, a
uniform-grid FFT method is the idiomatic TPU equivalent of the
rotation-based FMM tree: XLA's batched 3-D FFTs run on the MXU, and
nothing is tree-shaped.

Method (Essmann et al., JCP 103, 8577 (1995)):
  - charges spread onto a [G1,G2,G3] mesh with cardinal B-splines of
    order p (scatter-free: contributions are sorted by grid id and
    segment-reduced with a cumsum -- the same sort-based trick as
    ops/cells.bin_by_id, because TPU scatters serialize)
  - Q_hat = FFT(Q); energy = 1/2 sum_k G(k) |b1 b2 b3|^2 |Q_hat|^2
    with G(k) = 4 pi/(V k^2) exp(-k^2 / 4 alpha^2)
  - phi = IFFT(G * |B|^2 * Q_hat): the convolved potential mesh;
    U = 1/2 sum_mesh Q * phi (identical by Parseval)
  - forces: analytic B-spline derivative interpolation of phi (exactly
    conservative w.r.t. the discretized energy; gathers only)

Self-energy and intramolecular exclusion corrections are shared with
ops/ewald.py (self_intra_corrections).  The erfc-screened real-space
part rides the standard pair kernels (screen_alpha), exactly as for
direct Ewald.

Multi-chip: each device spreads its local molecules, one psum merges
the global mesh (the analogue of the reference's allreduce of global
multipole levels, UniformPseudoParticleContainer.h:95-135), and force
interpolation needs no further communication.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import PairParams, site_offsets
from ls1_mardyn_tpu.ops.ewald import self_intra_corrections
from ls1_mardyn_tpu.state import MoleculeState


def bspline_weights(frac, p: int):
    """Cardinal B-spline values M_p(frac + j) for j = 0..p-1.

    frac: [...] fractional coordinates in [0, 1).  Returns [..., p]
    weights summing to 1.  Uses the standard recursion
    M_n(u) = (u M_{n-1}(u) + (n-u) M_{n-1}(u-1)) / (n-1)."""
    u = frac[..., None] + jnp.arange(p, dtype=frac.dtype)  # in (0, p)
    # M_2(u) = 1 - |u - 1| on (0,2)
    M = jnp.maximum(0.0, 1.0 - jnp.abs(u - 1.0))
    for n in range(3, p + 1):
        um1 = u - 1.0
        Mm1 = jnp.concatenate(
            [jnp.zeros_like(M[..., :1]), M[..., :-1]], axis=-1
        )  # M_{n-1}(u-1) via shift: M_{n-1} evaluated at (frac + j - 1)
        M = (u * M + (n - u) * Mm1) / (n - 1)
    return M


def bspline_weights_and_derivs(frac, p: int):
    """(M_p(frac+j), M_p'(frac+j)) for j = 0..p-1, using
    M_p'(u) = M_{p-1}(u) - M_{p-1}(u-1)."""
    u = frac[..., None] + jnp.arange(p, dtype=frac.dtype)
    M = jnp.maximum(0.0, 1.0 - jnp.abs(u - 1.0))
    for n in range(3, p):
        Mm1 = jnp.concatenate(
            [jnp.zeros_like(M[..., :1]), M[..., :-1]], axis=-1
        )
        M = (u * M + (n - u) * Mm1) / (n - 1)
    Mpm1 = M  # M_{p-1}(frac + j)
    Mm1 = jnp.concatenate(
        [jnp.zeros_like(M[..., :1]), M[..., :-1]], axis=-1
    )
    dM = Mpm1 - Mm1
    M = (u * Mpm1 + (p - u) * Mm1) / (p - 1)
    return M, dM


def _bsq(G: int, p: int, dtype):
    """|b(m)|^2 Euler exponential-spline factors for one dimension:
    1 / |sum_{j=0}^{p-2} M_p(j+1) e^{2 pi i m j / G}|^2."""
    m = np.arange(G)
    j = np.arange(p - 1)
    Mj = np.asarray(
        bspline_weights(jnp.asarray([0.0], jnp.float64), p)[0]
    )  # M_p(j) for j = 0..p-1 at frac 0 -> M_p(0), M_p(1), ...
    ph = np.exp(2.0 * np.pi * 1j * np.outer(m, j) / G)
    den = ph @ Mj[1:p]
    # odd interpolation orders make the denominator genuinely vanish at
    # m = G/2; the standard treatment zeroes that mode (a clamp would
    # inject a ~1/eps garbage weight instead).  Even orders (4/6, the
    # reachable ones) never hit this.
    d2 = np.abs(den) ** 2
    b2 = np.where(d2 < 1e-10, 0.0, 1.0 / np.maximum(d2, 1e-300))
    return b2.astype(dtype)


@dataclasses.dataclass(frozen=True)
class PMEParams:
    alpha: float
    grid: Tuple[int, int, int]
    order: int = 4

    @staticmethod
    def auto(box, rc: float, accuracy: float = 1e-5) -> "PMEParams":
        box = np.asarray(box, float)
        alpha = float(np.sqrt(-np.log(accuracy)) / rc)
        # mesh spacing ~ 1/(2 alpha) gives k_max ~ 2 pi alpha sqrt(-ln eps)
        kmax = alpha * np.sqrt(-np.log(accuracy)) / np.pi
        G = tuple(int(2 ** np.ceil(np.log2(max(8, 2 * kmax * L))))
                  for L in box)
        return PMEParams(alpha=alpha, grid=G, order=4)

    @staticmethod
    def tune(
        box, rc: float, q2_sum: float, n: int,
        accuracy: float = 1e-5, order: int = 6,
    ) -> "PMEParams":
        """Kolafa-Perram-tuned mesh parameters: alpha/k-cutoff from
        EwaldParams.tune, mesh at 2x the k-space Nyquist rate so the
        order-p B-spline interpolation error stays below the
        truncation error."""
        from ls1_mardyn_tpu.ops.ewald import EwaldParams

        ep = EwaldParams.tune(box, rc, q2_sum, n, accuracy)
        box = np.asarray(box, float)
        L = float(np.max(box))
        G = tuple(
            int(2 ** np.ceil(np.log2(max(8, 4.0 * ep.kmax * b / L))))
            for b in box
        )
        return PMEParams(alpha=ep.alpha, grid=G, order=order)


def _grid_indices_weights(rs, wq, box, grid, p, dtype, with_derivs=False,
                          products=True):
    """Per-dimension spline columns (bw/w3, + dw3/scale when
    with_derivs), and with products=True also the materialized
    [NS, p^3] flattened mesh indices and weight products the direct
    gather path consumes (the sorted paths never need them)."""
    G = jnp.asarray(grid, jnp.int32)
    Gf = jnp.asarray(grid, dtype)
    L = jnp.asarray(box, dtype)
    u = rs / L * Gf  # scaled coordinates [NS, 3]
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base.astype(dtype)
    if with_derivs:
        w, dw = bspline_weights_and_derivs(frac, p)  # [NS, 3, p]
    else:
        w = bspline_weights(frac, p)
        dw = None
    out = dict(
        bw=jnp.mod(base, G[None, :]),  # wrapped base index [NS, 3]
        w3=w,  # per-dimension spline weights [NS, 3, p]
    )
    if with_derivs:
        out["dw3"] = dw  # per-dimension derivative columns [NS, 3, p]
        out["scale"] = Gf / L  # du/dr
    if not products:
        return out
    joff = jnp.arange(p, dtype=jnp.int32)
    idx3 = jnp.mod(base[:, :, None] - joff[None, None, :], G[None, :, None])
    # combined [NS, p, p, p]
    wx, wy, wz = w[:, 0, :], w[:, 1, :], w[:, 2, :]
    W = wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    lin = (
        (idx3[:, 0, :, None, None] * grid[1] + idx3[:, 1, None, :, None])
        * grid[2]
        + idx3[:, 2, None, None, :]
    )
    out["lin"] = lin.reshape(lin.shape[0], -1)
    out["W"] = W.reshape(W.shape[0], -1)
    if with_derivs:
        dwx, dwy, dwz = dw[:, 0, :], dw[:, 1, :], dw[:, 2, :]
        scale = Gf / L  # du/dr
        DX = (dwx[:, :, None, None] * wy[:, None, :, None]
              * wz[:, None, None, :]) * scale[0]
        DY = (wx[:, :, None, None] * dwy[:, None, :, None]
              * wz[:, None, None, :]) * scale[1]
        DZ = (wx[:, :, None, None] * wy[:, None, :, None]
              * dwz[:, None, None, :]) * scale[2]
        out["D"] = [a.reshape(a.shape[0], -1) for a in (DX, DY, DZ)]
    return out


def _spread_sorted(bw, w3, wq, grid, p: int, dtype):
    """Charge spreading with ONE argsort of the N base mesh indices.

    On a mesh PADDED by the spline support (Gp = G + p - 1 per dim),
    every one of the p^3 spline offsets shifts the flat target index by
    a CONSTANT, so a single sorted order serves all offsets.  Two more
    consequences keep the per-offset work linear and gather-free:
      - the segment-edge table searchsorted(lin_s, r + c) is just the
        c=0 table evaluated at shifted positions, so ONE searchsorted
        over the extended range serves every offset via a contiguous
        dynamic slice;
      - the weight product for offset (jx,jy,jz) is formed in-scan from
        the three sorted per-dimension spline columns (2 multiplies)
        instead of materializing the [N, p^3] product table.
    The previous path argsorted all N*p^3 scattered indices (p=6: a
    216x bigger sort) and searchsorted per offset.  The padded margins
    fold back periodically per dimension at the end."""
    G1, G2, G3 = grid
    Gp = (G1 + p - 1, G2 + p - 1, G3 + p - 1)
    ngp = Gp[0] * Gp[1] * Gp[2]
    lin0 = (
        (bw[:, 0] + (p - 1)) * Gp[1] + (bw[:, 1] + (p - 1))
    ) * Gp[2] + (bw[:, 2] + (p - 1))
    order = jnp.argsort(lin0)
    lin_s = lin0[order]
    wq_s = wq[order]
    wx_s = w3[:, 0, :][order]  # [N, p] each
    wy_s = w3[:, 1, :][order]
    wz_s = w3[:, 2, :][order]
    cmax = (p - 1) * (Gp[1] * Gp[2] + Gp[2] + 1)
    # one edge table over the extended range; per-offset edges are a
    # contiguous slice
    edges_full = jnp.searchsorted(
        lin_s, jnp.arange(ngp + cmax + 1, dtype=lin_s.dtype)
    )
    offs = np.array(
        [
            (jx, jy, jz, jx * Gp[1] * Gp[2] + jy * Gp[2] + jz)
            for jx in range(p)
            for jy in range(p)
            for jz in range(p)
        ],
        np.int32,
    )

    def body(acc, xs):
        jx, jy, jz, c = xs
        v_s = (
            wq_s
            * jax.lax.dynamic_index_in_dim(wx_s, jx, 1, keepdims=False)
            * jax.lax.dynamic_index_in_dim(wy_s, jy, 1, keepdims=False)
            * jax.lax.dynamic_index_in_dim(wz_s, jz, 1, keepdims=False)
        )
        csum = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(v_s)])
        edges = jax.lax.dynamic_slice_in_dim(edges_full, c, ngp + 1)
        return acc + (csum[edges[1:]] - csum[edges[:-1]]), None

    acc, _ = jax.lax.scan(
        body,
        jnp.zeros((ngp,), dtype),
        tuple(jnp.asarray(offs[:, i]) for i in range(4)),
    )
    return _fold_padded(acc.reshape(Gp), grid, p)


def _gather_sorted(bw, w3, dw3, scale, wq, phi, grid, p: int, dtype):
    """Force interpolation as the exact linear TRANSPOSE of
    _spread_sorted: gather-free per-site reads of the potential mesh.

    The direct formulation gathers phi at [NS, p^3] scattered indices
    (TPU element gathers run ~1 GB/s -- the dominant SPME cost at
    N >= 1e6 sites).  Dual trick: with sites sorted by their base mesh
    index lin0 (the SAME order as the spread), the per-site value for
    spline offset c,

        v_i = phi_pad[lin_s[i] - c],

    is constant on each lin_s-segment, so it equals a prefix sum of
    telescoping mesh-value differences scattered at the segment edges:

        v = cumsum(zeros(N+1).at[edges_full[m]].add(
                phi_pad[m-c] - phi_pad[m-1-c]))

    The scatter positions edges_full[:ngp+1] are OFFSET-INDEPENDENT
    (sorted, one searchsorted for all p^3 offsets) and the values are a
    contiguous slice of ONE precomputed difference array -- per offset
    this costs an ngp-sized sorted scatter + an N cumsum instead of an
    N-element random gather.  Weight products are formed in-scan from
    the three sorted per-dimension spline/derivative columns, exactly
    like the spread.  Returns site forces [NS, 3] (already multiplied
    by -wq)."""
    G1, G2, G3 = grid
    Gp = (G1 + p - 1, G2 + p - 1, G3 + p - 1)
    ngp = Gp[0] * Gp[1] * Gp[2]
    n = bw.shape[0]

    # padded potential mesh: padded index i <-> real index (i-(p-1)) mod G
    # per dim, so the head margin is a copy of the real tail.
    pad = phi.reshape(grid)
    for ax, G in enumerate(grid):
        head = jax.lax.slice_in_dim(pad, G - (p - 1), G, axis=ax)
        pad = jnp.concatenate([head, pad], axis=ax)
    phi_padf = pad.reshape(-1)

    lin0 = (
        (bw[:, 0] + (p - 1)) * Gp[1] + (bw[:, 1] + (p - 1))
    ) * Gp[2] + (bw[:, 2] + (p - 1))
    order = jnp.argsort(lin0)
    lin_s = lin0[order]
    cmax = (p - 1) * (Gp[1] * Gp[2] + Gp[2] + 1)
    edges_full = jnp.searchsorted(
        lin_s, jnp.arange(ngp + 1, dtype=lin_s.dtype)
    )

    # one difference array serves every offset via a contiguous slice:
    # vals for offset c live at Dphi_ext[cmax-c : cmax-c+ngp] where
    # Dphi_ext[v] = ph[v-cmax] - ph[v-cmax-1] (zero-padded prefix).
    ph_ext = jnp.concatenate([jnp.zeros((cmax + 1,), dtype), phi_padf])
    dphi_ext = ph_ext[1:] - ph_ext[:-1]  # [cmax + ngp]

    # sorted per-dimension spline columns (scale folded into derivs)
    wx_s = w3[:, 0, :][order]
    wy_s = w3[:, 1, :][order]
    wz_s = w3[:, 2, :][order]
    dwx_s = (dw3[:, 0, :] * scale[0])[order]
    dwy_s = (dw3[:, 1, :] * scale[1])[order]
    dwz_s = (dw3[:, 2, :] * scale[2])[order]

    offs = np.array(
        [
            (jx, jy, jz, jx * Gp[1] * Gp[2] + jy * Gp[2] + jz)
            for jx in range(p)
            for jy in range(p)
            for jz in range(p)
        ],
        np.int32,
    )

    col = lambda a, j: jax.lax.dynamic_index_in_dim(a, j, 1, keepdims=False)

    def body(acc, xs):
        jx, jy, jz, c = xs
        vals = jax.lax.dynamic_slice_in_dim(dphi_ext, cmax - c, ngp)
        a = jnp.zeros((n + 1,), dtype).at[edges_full[:-1]].add(
            vals, indices_are_sorted=True
        )
        v = jnp.cumsum(a)[:n]  # phi_pad[lin_s - c] per sorted site
        fx, fy, fz = acc
        wyz = col(wy_s, jy) * col(wz_s, jz)
        fx = fx + (col(dwx_s, jx) * wyz) * v
        fy = fy + (col(wx_s, jx) * col(dwy_s, jy) * col(wz_s, jz)) * v
        fz = fz + (col(wx_s, jx) * col(wy_s, jy) * col(dwz_s, jz)) * v
        return (fx, fy, fz), None

    z = jnp.zeros((n,), dtype)
    (fx, fy, fz), _ = jax.lax.scan(
        body, (z, z, z),
        tuple(jnp.asarray(offs[:, i]) for i in range(4)),
    )
    F_s = jnp.stack([fx, fy, fz], axis=-1) * (-wq[order][:, None])
    # unsort back to site order (one N-row permutation scatter)
    return jnp.zeros_like(F_s).at[order].set(
        F_s, unique_indices=True
    )


def _fold_padded(pad, grid, p: int):
    """Padded mesh [Gp...] -> real mesh [G...]: padded index i maps to
    (i - (p-1)) mod G per dimension, so the head margin [0, p-1) folds
    onto the real tail (shared by the sorted and blocked spreads)."""
    for ax, G in enumerate(grid):
        head = jax.lax.slice_in_dim(pad, 0, p - 1, axis=ax)
        main = jax.lax.slice_in_dim(pad, p - 1, None, axis=ax)
        upd = jax.lax.slice_in_dim(main, G - (p - 1), G, axis=ax) + head
        pad = jax.lax.dynamic_update_slice_in_dim(
            main, upd, G - (p - 1), axis=ax
        )
    return pad


# --- blocked spread/gather -------------------------------------------------
#
# TPU reality check (PME_PHASES.json, N=1e6 / G=256^3 / p=4 on v5e):
# the sorted segment-sum spread costs 19.4 s and the sorted gather
# 12.5 s -- their per-offset work is O(ngp) (a 17M-element gather of
# csum at edges per offset), which explodes when the mesh is much
# finer than the site density; the direct [NS, p^3] mesh gather is
# 0.58 s but the matching direct scatter would serialize at the TPU's
# ~3.4M-elem/s scatter rate.  The BLOCKED path below has no scatters
# and no data-dependent gathers in the hot loop at all: sites are
# bucketed once per call by their base-cell BLOCK (one argsort + one
# N-row scatter), and each mesh block of BLK^3 cells evaluates its
# <= 8 neighbor buckets DENSELY with separable per-axis spline
# contractions, so the accumulation is plain batched matmuls:
#
#   A(s, cx)      = wq_s * Wx(s, cx)          one-hot spline select
#   B(s, cx, cy)  = A * Wy(s, cy)
#   Q(cx, cy, cz) = sum_s B(s, cx, cy) * Wz(s, cz)   <- MXU einsum
#
# and the force gather is the exact transpose (z/y/x contractions of
# the padded potential against W and dW columns).  Cost is
# n_blocks * 8 cap * O(BLK^3) fused VPU/MXU work -- ~100x less wall
# time than the sorted path at production sizes.


def _block_geometry(grid, p: int, blk: int):
    nb = tuple((G + p - 1 + blk - 1) // blk for G in grid)
    return nb, nb[0] * nb[1] * nb[2]


def _auto_cap(n: int, grid, blk: int) -> int:
    """Bucket capacity from the mean over OCCUPIABLE blocks (base
    cells lie in [0, G), so the padded-margin blocks never receive
    sites -- sizing over all blocks undercounts partial-edge blocks
    and overflows on dense lattices).

    Headroom is statistical (mean + 6 sqrt(mean) + 16, rounded to 64):
    the former flat 4x-mean power-of-2 sizing made cap 512 at the
    H2O/N=1e6/G=256^3 geometry (mean 92), whose [nb_tot, 8*cap, W]
    spread view was the 25 GB-over OOM that masqueraded as the r4
    'compile-helper HTTP 500' failure.  Occupancy beyond the 6-sigma
    band is caught by the overflow watchdog (NaN-poisoned energy)."""
    occ = 1
    for G in grid:
        occ *= -(-G // blk)
    mean = max(1.0, n / max(occ, 1))
    need = mean + 6.0 * np.sqrt(mean) + 16.0
    return int(max(16, -(-int(np.ceil(need)) // 64) * 64
                   if need > 64 else 2 ** int(np.ceil(np.log2(need)))))


def _build_site_blocks(bw, w3, dw3, wq, grid, p: int, blk: int, cap: int):
    """Bucket sites by base-cell block.  Sites with wq == 0 (validity
    padding) are routed to the dump bin so they never consume bucket
    slots.  Returns (table [nb_tot*cap, W], overflow, slot_of [N],
    ok_site [N]) with row layout [dbx dby dbz wq w3(3p) dw3(3p)?];
    slot_of maps each ORIGINAL site to its flat table slot (0 where
    ok_site is False), so the gather pass routes results back without
    a second sort."""
    dtype = wq.dtype
    nb, nb_tot = _block_geometry(grid, p, blk)
    n = bw.shape[0]
    bx, by, bz = bw[:, 0] // blk, bw[:, 1] // blk, bw[:, 2] // blk
    bid = (bx * nb[1] + by) * nb[2] + bz
    bid = jnp.where(wq != 0, bid, nb_tot)
    order = jnp.argsort(bid)
    bs = bid[order]
    rank = (
        jnp.arange(n, dtype=jnp.int32)
        - jnp.searchsorted(bs, bs, side="left").astype(jnp.int32)
    )
    live = bs < nb_tot
    ok = live & (rank < cap)
    overflow = jnp.any(live & (rank >= cap))
    dest = jnp.where(ok, bs.astype(jnp.int32) * cap + rank, nb_tot * cap)
    db = (bw - jnp.stack([bx, by, bz], -1) * blk).astype(dtype)
    cols = [db, wq[:, None], w3.reshape(n, -1)]
    if dw3 is not None:
        cols.append(dw3.reshape(n, -1))
    rows = jnp.concatenate(cols, axis=1)[order]
    table = (
        jnp.zeros((nb_tot * cap + 1, rows.shape[1]), dtype)
        .at[dest]
        .set(rows)[:-1]
    )
    slot_of = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.where(ok, dest, 0).astype(jnp.int32))
    )
    ok_site = jnp.zeros((n,), bool).at[order].set(ok)
    return table, overflow, slot_of, ok_site


def _axis_weights(db_ax, dbl_ax, wcols, p: int, blk: int, dtype):
    """W(s, c) for c = 0..blk-1 on one axis: spline index
    j = db + (p-1) + dbl - c; one-hot select from the p weight
    columns.  db_ax [C,S] in-block base offset, dbl_ax [S] static
    source-minus-target block origin in cells, wcols [C,S,p]."""
    c = jnp.arange(blk, dtype=jnp.int32)
    j = (
        db_ax.astype(jnp.int32)[:, :, None]
        + (p - 1)
        + dbl_ax[None, :, None]
        - c[None, None, :]
    )  # [C, S, blk]
    w = jnp.zeros(j.shape, dtype)
    for jj in range(p):
        w = w + wcols[:, :, jj, None] * (j == jj).astype(dtype)
    return w  # [C, S, blk]


def _spread_blocked(bw, w3, wq, grid, p: int, dtype, blk: int = 8,
                    cap: int = 0, chunk: int = 256, cap_scale: int = 1):
    """Blocked charge spreading (see module comment above).  Returns
    (Q [grid], overflow) -- identical assignment to _spread_sorted
    (cell b - j gets weight M_p(frac + j)), different summation
    order.  cap_scale: density concentration factor for auto cap
    sizing (sharded callers pass n_devices: local sites fill ~1/ndev
    of the volume at the global density)."""
    n = bw.shape[0]
    nb, nb_tot = _block_geometry(grid, p, blk)
    if cap <= 0:
        cap = _auto_cap(n * cap_scale, grid, blk)
    table, overflow, _slot, _ok = _build_site_blocks(
        bw, w3, None, wq, grid, p, blk, cap
    )
    # SOURCE-bucket formulation: in the (p-1)-padded cell space a site
    # at base cell b covers cells [b, b+p-1], so bucket B's sites
    # spread onto the 2x2x2-block cube ANCHORED AT B (blocks {B, B+1},
    # the exact transpose of the gather's cube) -- computed chunk-wise
    # from the bucket rows alone; the cubes overlap-add into the
    # padded grid afterwards.  (The former TARGET-centric version
    # materialized the full [nb_tot, 8*cap, W] neighbor view as a loop
    # constant -- 8x the bucket table, 25 GB over HBM at the H2O
    # N=1e6 geometry.)
    assert p <= blk, (p, blk)
    Wr = table.shape[1]
    rows_all = table[: nb_tot * cap].reshape(nb_tot, cap, Wr)
    nb_pad = -(-nb_tot // chunk) * chunk
    if nb_pad != nb_tot:
        rows_all = jnp.pad(rows_all, ((0, nb_pad - nb_tot), (0, 0),
                                      (0, 0)))
    rows_all = rows_all.reshape(-1, chunk, cap, Wr)
    W2 = 2 * blk
    # cube cell c = padded cell B*blk + c: spline index
    # j = db + (p-1) - c, i.e. _axis_weights with dbl = 0 (the same
    # zero offset the gather's cube uses)
    dbl_src = jnp.zeros((cap,), jnp.int32)

    def chunk_fn(rows):
        db = rows[:, :, 0:3]
        wqs = rows[:, :, 3]
        w3f = rows[:, :, 4:4 + 3 * p]
        wx = _axis_weights(db[:, :, 0], dbl_src, w3f[:, :, 0:p], p, W2,
                           dtype)
        wy = _axis_weights(db[:, :, 1], dbl_src, w3f[:, :, p:2 * p], p,
                           W2, dtype)
        wz = _axis_weights(db[:, :, 2], dbl_src, w3f[:, :, 2 * p:3 * p],
                           p, W2, dtype)
        A = wqs[:, :, None] * wx                     # [C, S, cx]
        B = A[:, :, :, None] * wy[:, :, None, :]     # [C, S, cx, cy]
        out = jnp.einsum(
            "csxy,csz->cxyz", B, wz,
            preferred_element_type=dtype,
        )
        return out  # [C, W2, W2, W2]

    cubes = jax.lax.map(chunk_fn, rows_all)  # [nchunks, C, W2,W2,W2]
    cubes = cubes.reshape(nb_pad, W2, W2, W2)[:nb_tot]
    cube6 = cubes.reshape(nb[0], nb[1], nb[2], W2, W2, W2)
    # overlap-add: octant (ox,oy,oz) of bucket B's cube lands on block
    # B+o of the grid; with a one-block trailing margin the adds are
    # eight static-offset updates
    big = jnp.zeros(tuple((nbd + 1) * blk for nbd in nb), dtype)
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                oct_ = cube6[
                    :, :, :,
                    ox * blk:(ox + 1) * blk,
                    oy * blk:(oy + 1) * blk,
                    oz * blk:(oz + 1) * blk,
                ]
                g = (
                    oct_.transpose(0, 3, 1, 4, 2, 5)
                    .reshape(nb[0] * blk, nb[1] * blk, nb[2] * blk)
                )
                big = jax.lax.dynamic_update_slice(
                    big,
                    jax.lax.dynamic_slice(
                        big, (ox * blk, oy * blk, oz * blk), g.shape
                    ) + g,
                    (ox * blk, oy * blk, oz * blk),
                )
    Gp = tuple(G + p - 1 for G in grid)
    pad = big[: Gp[0], : Gp[1], : Gp[2]]
    return _fold_padded(pad, grid, p), overflow


def _gather_blocked(bw, w3, dw3, scale, wq, phi, grid, p: int, dtype,
                    blk: int = 8, cap: int = 0, chunk: int = 256,
                    cap_scale: int = 1):
    """Blocked force interpolation: the exact transpose of
    _spread_blocked (reads phi at cells b - j with weights built from
    the same one-hot spline selects; no data-dependent gathers).
    Returns site forces [NS, 3] (already multiplied by -wq)."""
    n = bw.shape[0]
    nb, nb_tot = _block_geometry(grid, p, blk)
    if cap <= 0:
        cap = _auto_cap(n * cap_scale, grid, blk)
    dw3s = dw3 * jnp.asarray(scale, dtype)[None, :, None]
    table, overflow, slot_of, ok_site = _build_site_blocks(
        bw, w3, dw3s, wq, grid, p, blk, cap
    )
    # padded phi on the block-aligned alloc (tail zeros are never
    # weighted: j falls outside [0, p) there)
    padp = phi.reshape(grid)
    for ax, G in enumerate(grid):
        head = jax.lax.slice_in_dim(padp, G - (p - 1), G, axis=ax)
        padp = jnp.concatenate([head, padp], axis=ax)
    alloc = tuple(nbd * blk for nbd in nb)
    padp = jnp.pad(
        padp,
        [(0, alloc[d] - padp.shape[d]) for d in range(3)],
    )
    # per site bucket B, its support spans cell blocks {B, B+1}:
    # assemble the 2x2x2 block cube of phi per bucket via zero-padded
    # STATIC slices (plain copies; high-edge out-of-range neighbors
    # read zeros, which the one-hot weights never select anyway)
    nbx, nby, nbz = nb
    W = 2 * blk  # cube edge in cells
    tp6 = jnp.pad(
        padp.reshape(nbx, blk, nby, blk, nbz, blk)
        .transpose(0, 2, 4, 1, 3, 5),
        ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0), (0, 0)),
    )  # [nbx+1, nby+1, nbz+1, blk, blk, blk]
    views = [
        tp6[dx:dx + nbx, dy:dy + nby, dz:dz + nbz]
        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
    ]
    cube_all = (
        jnp.stack(views, axis=3)
        .reshape(nbx, nby, nbz, 2, 2, 2, blk, blk, blk)
        .transpose(0, 1, 2, 3, 6, 4, 7, 5, 8)
        .reshape(nb_tot, W, W, W)
    )
    rows_all = table.reshape(nb_tot, cap, table.shape[1])
    nb_pad = -(-nb_tot // chunk) * chunk
    if nb_pad != nb_tot:
        cube_all = jnp.pad(
            cube_all, ((0, nb_pad - nb_tot), (0, 0), (0, 0), (0, 0))
        )
        rows_all = jnp.pad(
            rows_all, ((0, nb_pad - nb_tot), (0, 0), (0, 0))
        )
    cube_all = cube_all.reshape(-1, chunk, W, W, W)
    rows_all = rows_all.reshape(-1, chunk, cap, rows_all.shape[-1])

    def chunk_fn(args):
        cube, rows = args
        db = rows[:, :, 0:3]
        wqs = rows[:, :, 3]
        w3f = rows[:, :, 4:4 + 3 * p]
        dw3f = rows[:, :, 4 + 3 * p:4 + 6 * p]
        zero_off = jnp.zeros((cap,), jnp.int32)

        def axis_w(ax, cols):
            return _axis_weights(
                db[:, :, ax], zero_off, cols, p, W, dtype
            )  # [C, cap, W] over the 2-block cube (origin = bucket B)

        wx = axis_w(0, w3f[:, :, 0:p])
        wy = axis_w(1, w3f[:, :, p:2 * p])
        wz = axis_w(2, w3f[:, :, 2 * p:3 * p])
        dwx = axis_w(0, dw3f[:, :, 0:p])
        dwy = axis_w(1, dw3f[:, :, p:2 * p])
        dwz = axis_w(2, dw3f[:, :, 2 * p:3 * p])
        # separable contractions: z then y then x
        tz = jnp.einsum("cxyz,csz->csxy", cube, wz,
                        preferred_element_type=dtype)
        tdz = jnp.einsum("cxyz,csz->csxy", cube, dwz,
                         preferred_element_type=dtype)
        ty_w = jnp.einsum("csxy,csy->csx", tz, wy,
                          preferred_element_type=dtype)
        ty_dy = jnp.einsum("csxy,csy->csx", tz, dwy,
                           preferred_element_type=dtype)
        ty_dz = jnp.einsum("csxy,csy->csx", tdz, wy,
                           preferred_element_type=dtype)
        fx = jnp.einsum("csx,csx->cs", ty_w, dwx)
        fy = jnp.einsum("csx,csx->cs", ty_dy, wx)
        fz = jnp.einsum("csx,csx->cs", ty_dz, wx)
        F = jnp.stack([fx, fy, fz], -1) * (-wqs[..., None])
        return F  # [C, cap, 3]

    Fb = jax.lax.map(chunk_fn, (cube_all, rows_all)).reshape(
        nb_pad * cap, 3
    )[: nb_tot * cap]
    # route back to site order via the bucket builder's slot map
    F_s = Fb[slot_of] * ok_site[:, None].astype(dtype)
    return F_s, overflow


def _recip_kernel(box, grid, alpha, dtype):
    """G(k) * |b1 b2 b3|^2 on the FFT mesh (numpy, trace-time const)."""
    box = np.asarray(box, float)
    V = float(np.prod(box))
    ks = []
    for d, G in enumerate(grid):
        m = np.fft.fftfreq(G) * G  # integer frequencies, centered
        ks.append(2.0 * np.pi * m / box[d])
    KX, KY, KZ = np.meshgrid(*ks, indexing="ij")
    k2 = KX ** 2 + KY ** 2 + KZ ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        g = 4.0 * np.pi / V * np.exp(-k2 / (4.0 * alpha ** 2)) / k2
    g[0, 0, 0] = 0.0  # tinfoil boundary: drop k=0
    return g


def _full_kernel(box, grid, alpha, order, dtype):
    g = _recip_kernel(box, grid, alpha, np.float64)
    b2 = [
        _bsq(G, order, np.float64) for G in grid
    ]
    B2 = (
        b2[0][:, None, None] * b2[1][None, :, None] * b2[2][None, None, :]
    )
    return (g * B2).astype(dtype)


class PMESolver:
    """Reciprocal-space energy/forces/torques via SPME.

    Drop-in alternative to EwaldSolver: combine with the erfc-screened
    real-space pair interaction (same alpha) plus the shared self/intra
    corrections (applied here, like EwaldSolver)."""

    def __init__(self, box, params: PMEParams, dtype=jnp.float64,
                 gather_mode: str = "blocked",
                 spread_mode: str = "blocked"):
        self.params = params
        self.box = tuple(float(b) for b in np.asarray(box))
        # 'blocked' (default): block-bucketed separable spread/gather
        # -- no scatters, no data-dependent gathers in the hot loop
        # (the sorted paths' per-offset O(ngp) segment sums cost 19 s /
        # 12 s at N=1e6, G=256^3 on v5e -- PME_PHASES.json);
        # 'sorted': segment-sum spread + its transpose gather;
        # 'direct': plain [NS, p^3] mesh gather (A/B + oracle).
        # Blocked-spread overflow (a block bucket over capacity)
        # POISONS the energy with NaN so the driver watchdog aborts
        # loudly instead of silently dropping charge.
        if params.order > 8:
            gather_mode = spread_mode = "sorted"
        self.gather_mode = gather_mode
        self.spread_mode = spread_mode
        self.kern = jnp.asarray(
            _full_kernel(self.box, params.grid, params.alpha, params.order,
                         np.float64),
            dtype,
        )

    def mesh_energy_forces(self, rs, wq, psum=None, global_share=1.0):
        """(U_recip, site forces [NS,3]) from absolute charge-site
        positions rs [NS,3] and weighted charges wq [NS]."""
        p = self.params.order
        grid = self.params.grid
        dtype = rs.dtype
        giw = _grid_indices_weights(
            rs, wq, self.box, grid, p, dtype, with_derivs=True,
            products=self.gather_mode == "direct",
        )
        ng = int(np.prod(grid))
        ovf = None
        # sharded callers concentrate their local sites in ~1/ndev of
        # the volume; global_share carries ndev for bucket sizing
        cap_scale = (
            max(1, int(round(1.0 / global_share)))
            if psum is not None else 1
        )
        if self.spread_mode == "blocked":
            Q, ovf = _spread_blocked(
                giw["bw"], giw["w3"], wq, grid, p, dtype,
                cap_scale=cap_scale,
            )
        else:
            Q = _spread_sorted(giw["bw"], giw["w3"], wq, grid, p, dtype)
        if psum is not None:
            Q = psum(Q)
        Qh = jnp.fft.fftn(Q)
        conv = self.kern.astype(dtype) * Qh
        # phi must be the UNNORMALIZED inverse transform (ifftn * ng)
        # for U = 1/2 sum_mesh Q*phi to equal the Parseval k-sum
        # 1/2 sum_k kern |Qh|^2 (jnp.fft.ifftn divides by ng).
        phi = jnp.real(jnp.fft.ifftn(conv)).astype(dtype) * ng
        u = 0.5 * jnp.sum(Q * phi) * jnp.asarray(global_share, dtype)
        if ovf is not None:
            # bucket overflow would silently drop charge: poison the
            # energy so the NaN watchdog aborts with a visible failure
            u = u + jnp.where(ovf, jnp.asarray(jnp.nan, dtype),
                              jnp.asarray(0.0, dtype))
        # force: F_d = -q * sum_support dW_d * phi
        phi_flat = phi.reshape(-1)
        if self.gather_mode == "blocked":
            F, _ovf2 = _gather_blocked(
                giw["bw"], giw["w3"], giw["dw3"], giw["scale"], wq,
                phi_flat, grid, p, dtype, cap_scale=cap_scale,
            )
            return u, F
        if self.gather_mode == "sorted":
            return u, _gather_sorted(
                giw["bw"], giw["w3"], giw["dw3"], giw["scale"], wq,
                phi_flat, grid, p, dtype,
            )
        ph = phi_flat[giw["lin"]]  # [NS, p^3]
        F = jnp.stack(
            [-jnp.sum(giw["D"][d] * ph, axis=1) * wq for d in range(3)],
            axis=-1,
        )
        return u, F

    def __call__(
        self,
        mol: MoleculeState,
        pp: PairParams,
        psum=None,
        global_share: float = 1.0,
    ):
        """(U_recip + self + intra corrections, F [N,3], M [N,3]) --
        same contract as ewald.reciprocal_energy_forces."""
        dtype = mol.r.dtype
        sites = site_offsets(pp, mol.q, mol.cid)
        q_site = pp.charge_q[mol.cid]
        wq = q_site * mol.valid[:, None].astype(dtype)
        rs = mol.r[:, None, :] + sites["charge"]  # [N, NC, 3]
        n, NC, _ = rs.shape
        u, f_site = self.mesh_energy_forces(
            rs.reshape(-1, 3), wq.reshape(-1), psum=psum,
            global_share=global_share,
        )
        f_site = f_site.reshape(n, NC, 3)
        F = jnp.sum(f_site, axis=1)
        M = jnp.sum(jnp.cross(sites["charge"], f_site), axis=1)
        u_corr, F_c, M_c = self_intra_corrections(
            mol, pp, self.params.alpha, rs, wq
        )
        return u + u_corr, F + F_c, M + M_c
