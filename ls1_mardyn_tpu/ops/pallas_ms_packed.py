"""Occupancy-packed Pallas TPU kernel for rigid multi-site molecules.

The dense row kernel (ops/pallas_multisite.py) spends cap^2 pair lanes
per cell pair regardless of occupancy: at the CO2 production geometry
(cap 128, mean cell occupancy ~70) that wastes (128/70)^2 ~ 3.3x of the
VPU issue slots on empty-slot lanes, and at ~750 f32 slots per
pair-lane the multi-site kernel is squarely VPU-issue-bound
(BENCH_MS_CO2.json roofline).  This kernel removes the cap quantization
from the lane geometry entirely:

  - every (z, y) x-row of cells is COMPACTED: its valid molecules are
    packed contiguously in cell order (cell index rides along as an
    extra plane), so i-tiles are 128 dense occupied lanes instead of
    cap-padded cells;
  - the j side is the same packed row plus packed periodic-wrap halo
    sections in a fixed HEAD region (right wrap halo FIRST at
    [0, occ_first), left wrap halo right-aligned at 2*cap, then the
    packed row verbatim at [2*cap, 2*cap+cnt)), so building the j view
    costs one small [rows, cap] halo gather plus pure slices of the
    packed i rows -- the earlier layout's full-width
    take_along_axis gather ran at the TPU's ~1.8 GB/s gather rate and
    dominated the per-step build (62 ms of the 283 ms build overhead
    at CO2 N=1M, tools/probe_ms_build.py).  Right-halo-first makes the
    wrap-edge tiles' head walk a single STATIC chunk at offset 0 when
    cap <= 128, keeping every chunk offset in the main walk affine in
    the loop index (dynamic-offset variants measured +11-21% kernel
    time).  Self-pair exclusion stays one integer comparison (own row
    at fixed +2*cap);
  - each i-tile derives its covering cell range [c_lo, c_hi] from the
    (authoritative, binning-produced) cell plane via a lane min/max,
    then walks a DYNAMIC number of 128-lane j chunks covering cells
    [c_lo-1, c_hi+1] of each of the 9 (dz,dy) neighbor rows, using a
    per-row packed cell-start table passed via scalar prefetch.
    Chunk windows are 128-aligned; alignment slop lanes hold real
    molecules from cells >= 2 away, which the cutoff mask eliminates
    exactly (cell edge >= rc).

Pair-lane count drops from n_cells*cap^2*9*(tx+2) to roughly
sum_tiles 9 * 128 * (128 + 2*occ_per_cell + alignment slop) -- ~2x
fewer lanes at the CO2 geometry (the occupancy lever the round-4
verdict names as the one remaining structural lever; reference role:
/root/reference/src/particleContainer/adapter/
VectorizedCellProcessor.cpp:797 _calculatePairs).

Physics bodies are shared with the dense kernel (_pair_physics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ls1_mardyn_tpu.models.interaction import site_offsets  # noqa: F401
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles
from ls1_mardyn_tpu.ops.pallas_lj import _CENTER, _OFFS, HX
from ls1_mardyn_tpu.ops.pallas_multisite import (
    NOUT,
    _MSMeta,
    _dot,
    _pair_physics,
    plane_layout,
)
from ls1_mardyn_tpu.ops.pallas_ms_path import PallasMultiSitePath
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState

TI = 128  # i-tile lanes (one VPU lane tile)
JW = 128  # j-chunk lanes


def packed_lane_estimate(occ3, cap, sample_rows: int = 2048):
    """Pair-lane count the packed kernel will execute for the cell
    occupancies occ3 [nz, ny, nx] at binning capacity cap: per (z,y)
    row, sum over i tiles of 9 * TI * chunks(128-aligned window over
    cells [c_lo-1, c_hi+1]).  The window table mirrors the kernel's
    packed-j layout exactly.  Rows are subsampled beyond sample_rows
    (estimate scaled back up)."""
    occ3 = np.asarray(occ3)
    nz, ny, nx = occ3.shape
    rows = occ3.reshape(nz * ny, nx)
    n_rows = rows.shape[0]
    step = max(1, n_rows // sample_rows)
    lanes = 0.0
    used = 0
    for ri in range(0, n_rows, step):
        o = rows[ri]
        prefix = np.concatenate([[0], np.cumsum(o)])
        cnt = int(prefix[-1])
        if cnt == 0:
            used += 1
            continue
        # head-halo layout: tbl = [2cap-occ_last, 2cap+prefix[0..nx-1],
        # 2cap+cnt, occ_first] (right halo FIRST; see _build_views)
        start = np.concatenate(
            [[2 * cap - o[-1]], 2 * cap + prefix, [o[0]]])
        ntiles = -(-cnt // TI)
        for t in range(ntiles):
            lo = int(np.searchsorted(prefix, t * TI, "right") - 1)
            hi = int(np.searchsorted(
                prefix, min((t + 1) * TI, cnt) - 1, "right") - 1)
            sw = start[lo]
            base = (sw // JW) * JW
            if hi >= nx - 1:
                ew = 2 * cap + cnt  # mid walk stops at the row end
                nch2 = min(-(-o[0] // JW), base // JW)
            else:
                ew = start[hi + 3]
                nch2 = 0
            nch = -(-(ew - base) // JW)
            lanes += 9 * TI * JW * (nch + nch2)
        used += 1
    return lanes * (n_rows / max(used, 1))


def pick_ms_grid_packed(r, box, cutoff, cap_min: int = 16,
                        headroom: float = 1.3):
    """Grid/cap choice for the packed kernel.  Packing removes the
    tx*cap%128 lane-alignment constraint, so cap follows the measured
    max occupancy directly (8-quantized for layout), and the FINEST
    admissible grid (cell edge >= cutoff) minimizes j-window length --
    i-tile count is occupancy-driven and grid-independent.

    Returns (dims, cap, lanes_estimate) or None."""
    r = np.asarray(r, np.float64)
    box = np.asarray(box, np.float64)
    dims = tuple(int(np.floor(b / cutoff)) for b in box)
    if min(dims) < 3:  # wrap-halo correctness needs >= 3 cells per axis
        return None
    idx = tuple(
        np.minimum((r[:, a] * (dims[a] / box[a])).astype(np.int64),
                   dims[a] - 1)
        for a in range(3)
    )
    lin = (idx[2] * dims[1] + idx[1]) * dims[0] + idx[0]
    occ = np.bincount(lin, minlength=int(np.prod(dims)))
    cap = max(cap_min,
              int(-(-np.ceil(headroom * occ.max()) // 8) * 8))
    occ3 = occ.reshape(dims[2], dims[1], dims[0])
    lanes = packed_lane_estimate(occ3, cap)
    return dims, cap, lanes


def _ms_packed_kernel(
    tbl_ref,  # scalar prefetch: [nzj, ny, nx+3] int32 packed cell starts
    i_ref,
    *refs,
    tables,
    masks,
    layout,
    srep,
    szero,
    P: int,
    K: int,
    NL: int,
    NC: int,
    ND: int,
    NQ: int,
    nx: int,
    cap: int,
    ny: int,
    nz: int,
    Wp: int,
    Wjp: int,
    cell_plane: int,
    box: Tuple[float, float, float],
    rc2: float,
    rc2_lj: float,
    screen_alpha: float,
    z_halo: bool,
    interpret: bool,
    out_dtype,
):
    row_refs = refs[:9]
    f_ref = refs[9]
    _bx, by, bz = box
    n_tiles_max = Wp // TI

    pz = pl.program_id(0)
    py = pl.program_id(1)

    # identity for MXU transposes
    ii = jax.lax.broadcasted_iota(jnp.int32, (TI, TI), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (TI, TI), 1)
    ident = (ii == jj).astype(out_dtype)

    laneP = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ohc = [(laneP == c).astype(out_dtype) for c in range(P)]
    subP = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    ohr = [(subP == c).astype(out_dtype) for c in range(P)]

    ilc = jax.lax.broadcasted_iota(jnp.int32, (TI, JW), 0)
    jlc = jax.lax.broadcasted_iota(jnp.int32, (TI, JW), 1)

    lane_out = jax.lax.broadcasted_iota(jnp.int32, (1, TI), 1)
    sub_out = jax.lax.broadcasted_iota(jnp.int32, (NOUT, 1), 0)
    ohr_out = [(sub_out == c).astype(out_dtype) for c in range(NOUT)]
    lane_oh = [(lane_out == c).astype(out_dtype) for c in range(4)]

    cut2 = jnp.asarray(rc2, out_dtype)
    cut2lj = jnp.asarray(rc2_lj, out_dtype)
    same_cut = rc2 == rc2_lj
    kvals = list(range(K))

    # dead tiles are skipped, so their output lanes (incl. the scalar
    # one-hot lanes the wrapper sums) must be zero, not garbage
    f_ref[0, 0, :, :] = jnp.zeros((NOUT, Wp), out_dtype)

    # own row's molecule count: tbl[., py, nx+1] = 2*cap + row_cnt.
    # NB in z_halo mode tbl rows are halo-offset (row 0 = halo-below),
    # so THIS i row's table entry sits at pz + 1
    pz_tbl = pz + jnp.int32(1) if z_halo else pz
    row_cnt = tbl_ref[pz_tbl, py, nx + 1] - 2 * cap
    n_tiles = (row_cnt + TI - 1) // TI

    def tile(t, _):
        @pl.when(t < n_tiles)
        def _do():
            off = pl.multiple_of(t * TI, TI)
            ti = i_ref[0, 0, :, pl.ds(off, TI)]  # [P, TI]
            G = jax.lax.dot_general(
                ident, ti, (((1,), (1,)), ((), ())),
                preferred_element_type=out_dtype,
            )  # [TI, P]

            def col(c):
                return jnp.sum(G * ohc[c], axis=1, keepdims=True)  # [TI,1]

            xi, yi, zi, wi = col(0), col(1), col(2), col(3)
            if K > 1:
                cidi = col(4)
                ohi_cols = [
                    (jnp.abs(cidi - k) < 0.5).astype(out_dtype)
                    for k in kvals
                ]

            # covering cell range of this tile from the binning's own
            # cell-index plane (exact -- no float re-derivation)
            ci = col(cell_plane)
            big = jnp.asarray(float(nx + 1), out_dtype)
            c_lo = jnp.min(jnp.where(wi > 0.5, ci, big)).astype(jnp.int32)
            c_hi = jnp.max(jnp.where(wi > 0.5, ci, -1.0)).astype(jnp.int32)
            # window in packed-j index space covers cells
            # [c_lo-1, c_hi+1]; tbl[c+1] = start(c)
            lo_idx = c_lo  # tbl index of start(c_lo - 1)
            hi_idx = c_hi + 3  # tbl index of end(c_hi + 1)
            # c_hi+1 == nx is the wrap halo cell, which lives in the
            # buffer HEAD ([cap, cap+occ_first)), not after the row:
            # the contiguous walk then stops at the row end and a
            # second bounded head walk covers the halo
            wrap_hi = c_hi >= nx - 1

            L = layout
            icache = {}

            def iread(base):
                if base not in icache:
                    icache[base] = (col(base), col(base + 1), col(base + 2))
                return icache[base]

            def ikey(cat, s):
                if szero[(cat, s)]:
                    return None
                rcat, rs = srep[(cat, s)]
                return L[rcat] + 3 * rs

            def iget(cat, s):
                b = ikey(cat, s)
                return None if b is None else iread(b)

            # pre-materialize i-side reads (loop constants); planes
            # beyond P are truncated dead dip/quad blocks -- skip them
            for cat, ns in (("lj", NL), ("charge", NC), ("dip", ND),
                            ("quad", NQ)):
                for s in range(ns):
                    b = ikey(cat, s)
                    if b is not None and b + 3 <= P:
                        iread(b)
            for cat, ns in (("dip_e", ND), ("quad_e", NQ)):
                for s in range(ns):
                    b = L[cat] + 3 * s
                    if b + 3 <= P:
                        iread(b)

            def chunk(k, is_center, jb, sy, sz):
                """One [TI, JW] slab against neighbor row k at packed-j
                offset jb; returns lane-reduced cols + 3 scalars."""
                H = row_refs[k][0, 0, :, pl.ds(jb, JW)]  # [P, JW]

                def row(c):
                    return jnp.sum(H * ohr[c], axis=0, keepdims=True)

                xj = row(0)
                yj = row(1) + sy
                zj = row(2) + sz
                wj = row(3)
                if K > 1:
                    cidj = row(4)
                    ohj_rows = [
                        (jnp.abs(cidj - kk) < 0.5).astype(out_dtype)
                        for kk in kvals
                    ]

                jcache = {}

                def jread(base):
                    if base not in jcache:
                        jcache[base] = (
                            row(base), row(base + 1), row(base + 2)
                        )
                    return jcache[base]

                def jget(cat, s):
                    b = ikey(cat, s)
                    return None if b is None else jread(b)

                drm = (xi - xj, yi - yj, zi - zj)  # [TI, JW]
                com2 = _dot(drm, drm)
                ok = (wi * wj > 0.5).astype(out_dtype)
                if is_center:
                    # own row rides at +2*cap in the packed-j space
                    ok = ok * (jb + jlc != off + ilc + 2 * cap).astype(
                        out_dtype
                    )
                mlj = jnp.where(com2 < cut2lj, ok, 0.0)
                mel = mlj if same_cut else jnp.where(com2 < cut2, ok, 0.0)

                if K == 1:
                    def coupling(tbl, sa, sb):
                        return float(tbl[0, 0, sa, sb])
                else:
                    oh2 = {}

                    def coupling(tbl, sa, sb):
                        acc = None
                        for a in range(K):
                            for b in range(K):
                                cc = float(tbl[a, b, sa, sb])
                                if cc == 0.0:
                                    continue
                                if (a, b) not in oh2:
                                    oh2[(a, b)] = ohi_cols[a] * ohj_rows[b]
                                term = cc * oh2[(a, b)]
                                acc = term if acc is None else acc + term
                        if acc is None:
                            return 0.0
                        return acc

                geom = {}

                def pair_geom(cat_i, si, cat_j, sj):
                    kij = (ikey(cat_i, si), ikey(cat_j, sj))
                    if kij not in geom:
                        dia, djb = iget(cat_i, si), jget(cat_j, sj)
                        if dia is None and djb is None:
                            geom[kij] = (drm, com2)
                        else:
                            dr = drm
                            if dia is not None:
                                dr = tuple(
                                    dr[d] + dia[d] for d in range(3)
                                )
                            if djb is not None:
                                dr = tuple(
                                    dr[d] - djb[d] for d in range(3)
                                )
                            geom[kij] = (dr, _dot(dr, dr))
                    return kij, geom[kij]

                (Fx, Fy, Fz, Mx, My, Mz, Vx, Vy, Vz,
                 u6_t, uX_t, rf_t) = _pair_physics(
                    drm=drm, mlj=mlj, mel=mel, same_cut=same_cut,
                    iget=iget, iread=iread, jget=jget, jread=jread,
                    pair_geom=pair_geom, coupling=coupling,
                    tables=tables, masks=masks, L=L,
                    NL=NL, NC=NC, ND=ND, NQ=NQ,
                    screen_alpha=screen_alpha, interpret=interpret,
                )

                zero2 = jnp.zeros((TI, JW), out_dtype)

                def red(a):
                    return jnp.sum(a + zero2, axis=1, keepdims=True)

                return (
                    red(Fx), red(Fy), red(Fz), red(Mx), red(My), red(Mz),
                    red(Vx), red(Vy), red(Vz),
                    u6_t + jnp.zeros((), out_dtype),
                    uX_t + jnp.zeros((), out_dtype),
                    rf_t + jnp.zeros((), out_dtype),
                )

            zcol = jnp.zeros((TI, 1), out_dtype)
            zs = jnp.zeros((), out_dtype)
            acc = (zcol,) * 9 + (zs,) * 3
            for k, (dz, dy) in enumerate(_OFFS):
                if z_halo:
                    # explicit halo rows from the slab exchange carry
                    # any global-z periodic shift already
                    zk = pz + jnp.int32(dz + 1)
                    sz = jnp.zeros((), out_dtype)
                else:
                    zk = jax.lax.rem(pz + jnp.int32(dz + nz),
                                     jnp.int32(nz))
                    sz = jnp.where(
                        pz + dz < 0, -bz,
                        jnp.where(pz + dz >= nz, bz, 0.0)
                    ).astype(out_dtype)
                yk = jax.lax.rem(py + jnp.int32(dy + ny), jnp.int32(ny))
                sy = jnp.where(
                    py + dy < 0, -by, jnp.where(py + dy >= ny, by, 0.0)
                ).astype(out_dtype)
                start_w = tbl_ref[zk, yk, lo_idx]
                end_raw = tbl_ref[zk, yk, hi_idx]
                end_mid = tbl_ref[zk, yk, nx + 1]  # 2*cap + row cnt
                end_w = jnp.where(wrap_hi, end_mid, end_raw)
                base = (start_w // JW) * JW
                nch = (end_w - base + JW - 1) // JW

                # head trips for the wrap halo (the right halo sits
                # FIRST in the buffer, [0, occ_first), so end_raw =
                # occ_first there -- at most ONE head chunk when
                # cap <= JW).  nch2 <= base//JW keeps head chunks
                # strictly below the contiguous walk's, so no pair is
                # visited twice; head chunks the min() drops are
                # already inside [base, end_w).  ONE loop serves both
                # walks (iterations beyond nch remap to the head):
                # a second fori_loop instantiates the whole chunk
                # body twice per neighbor row, which measured +10-15%
                # kernel time at the CO2 bench geometry even with a
                # static head offset.
                nch2 = jnp.where(
                    wrap_hi,
                    jnp.minimum((end_raw + JW - 1) // JW, base // JW),
                    0,
                )

                def body(c, carry, _k=k, _base=base, _nch=nch,
                         _sy=sy, _sz=sz):
                    jb = pl.multiple_of(
                        jnp.where(c < _nch, _base + c * JW,
                                  (c - _nch) * JW),
                        JW,
                    )
                    vals = chunk(_k, _k == _CENTER, jb, _sy, _sz)
                    return tuple(a + v for a, v in zip(carry, vals))

                acc = jax.lax.fori_loop(0, nch + nch2, body, acc)

            cols = acc[:9]
            u6_t, uX_t, rf_t = acc[9], acc[10], acc[11]

            def to_lane(v):
                return jax.lax.dot_general(
                    v, ident, (((0,), (0,)), ((), ())),
                    preferred_element_type=out_dtype,
                )

            scal = (
                0.5 * u6_t * lane_oh[0]
                + 0.5 * uX_t * lane_oh[1]
                + 0.5 * rf_t * lane_oh[2]
            )
            out = scal * ohr_out[9]
            for c, v in enumerate(cols):
                out = out + ohr_out[c] * to_lane(v)
            f_ref[0, 0, :, pl.ds(off, TI)] = out

        return _

    jax.lax.fori_loop(0, n_tiles_max, tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "Wp", "Wjp", "cell_plane", "box",
        "rc2", "rc2_lj", "screen_alpha", "z_halo", "interpret", "meta",
    ),
)
def multisite_cell_forces_packed(
    tbl: jnp.ndarray,  # [nzj, ny, nx+3] int32 packed cell starts
    r_i: jnp.ndarray,  # [nz, ny, P, Wp] packed rows
    r_j: jnp.ndarray,  # [nzj, ny, P, Wjp] packed rows + wrap halos
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    Wp: int,
    Wjp: int,
    cell_plane: int,
    box,
    rc2: float,
    rc2_lj: float,
    screen_alpha: float,
    meta,
    z_halo: bool = False,
    interpret: bool = False,
):
    """z_halo=True: r_j and tbl carry nz+2 z rows (explicit halo rows
    from a slab exchange, global-z shifts pre-applied); periodic z
    wrap is disabled in-kernel."""
    P = r_i.shape[2]
    nzj = nz + 2 if z_halo else nz
    assert r_i.shape == (nz, ny, P, Wp), r_i.shape
    assert r_j.shape == (nzj, ny, P, Wjp), r_j.shape
    assert tbl.shape == (nzj, ny, nx + 3), tbl.shape
    assert Wp % TI == 0 and Wjp % JW == 0, (Wp, Wjp)
    out_dtype = r_i.dtype

    # NB index maps under PrefetchScalarGridSpec receive the scalar
    # prefetch ref(s) as trailing arguments -- absorb them
    i_spec = pl.BlockSpec(
        (1, 1, P, Wp), lambda z, y, *_: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # every program may touch all 9 neighbor rows; pass the j buffer
    # whole 9 times with per-offset wrapped index maps (same scheme as
    # the dense kernel)
    def jmap(z, y, *_, dz, dy):
        zi = (z + dz + 1) if z_halo else (z + dz) % nz
        return (zi, (y + dy) % ny, 0, 0)

    j_specs = [
        pl.BlockSpec(
            (1, 1, P, Wjp),
            functools.partial(jmap, dz=dz, dy=dy),
            memory_space=pltpu.VMEM,
        )
        for dz, dy in _OFFS
    ]
    out_spec = pl.BlockSpec(
        (1, 1, NOUT, Wp), lambda z, y, *_: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _ms_packed_kernel,
        tables=meta.tables,
        masks=meta.masks,
        layout=meta.layout,
        srep=meta.site_rep,
        szero=meta.site_zero,
        P=P,
        K=meta.K,
        NL=meta.NL,
        NC=meta.NC,
        ND=meta.ND,
        NQ=meta.NQ,
        nx=nx,
        cap=cap,
        ny=ny,
        nz=nz,
        Wp=Wp,
        Wjp=Wjp,
        cell_plane=cell_plane,
        box=box,
        rc2=rc2,
        rc2_lj=rc2_lj,
        screen_alpha=screen_alpha,
        z_halo=z_halo,
        interpret=interpret,
        out_dtype=out_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, NOUT, Wp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tbl, r_i, *([r_j] * 9))
    scal = out[:, :, 9, :].reshape(nz, ny, Wp // TI, TI)
    u6 = jnp.sum(scal[..., 0])
    uX = jnp.sum(scal[..., 1])
    my_rf = jnp.sum(scal[..., 2])
    return out, u6, uX, my_rf


def live_plane_count(meta) -> int:
    """Number of leading planes the kernel can actually read given the
    coupling masks: trailing dipole/quadrupole plane blocks are dead
    when every coupling touching them is zero (their loop bodies are
    mask-pruned at trace time, so no iread/jread ever reaches them)."""
    L = meta.layout
    m = meta.masks
    need_quad = any(np.any(m[k]) for k in ("cq", "qc", "qq", "qd", "dq"))
    need_dip = any(np.any(m[k]) for k in ("cd", "dc", "dd", "qd", "dq"))
    if need_quad:
        return 5 + 3 * (meta.NL + meta.NC) + 6 * (meta.ND + meta.NQ)
    if need_dip:
        return L["quad"]  # everything through dip_e
    return L["dip"]  # x y z w cid + lj + charge planes only


def site_planes_packed(meta, cell_plane: int, g9: jnp.ndarray):
    """Site-offset plane blocks rotated in PACKED slot order from the
    thin primary planes g9 [rows, W, 9] (x y z w cid q0..q3).  Returns
    the list of live category blocks in plane_layout order (dead
    trailing dip/quad blocks are never computed).  The rotation math
    is op-for-op identical to the per-molecule site_offsets path, so
    the produced planes are bit-identical to a dense pack+gather."""
    from ls1_mardyn_tpu.models.quaternion import qrotate

    dtype = g9.dtype
    qv = g9[..., 5:9][..., None, :]  # [rows, W, 1, 4]
    okv = g9[..., 3:4] > 0.5
    cid = g9[..., 4]
    K = meta.K
    cols = []
    p = 5
    for key, ns in (("lj_pos", meta.NL), ("charge_pos", meta.NC),
                    ("dip_pos", meta.ND), ("dip_e", meta.ND),
                    ("quad_pos", meta.NQ), ("quad_e", meta.NQ)):
        if ns == 0:
            continue
        if p >= cell_plane:
            break  # dead trailing block (live_plane_count)
        tblv = jnp.asarray(meta._geom[key], dtype)  # [K, ns, 3]
        if K == 1:
            pos = tblv[0]  # [ns, 3], broadcast over slots
        else:
            oh = jnp.stack(
                [(jnp.abs(cid - k) < 0.5).astype(dtype)
                 for k in range(K)], axis=-1)  # [rows, W, K]
            pos = jnp.einsum("rwk,ksd->rwsd", oh, tblv)
        rot = qrotate(qv, pos)  # [rows, W, ns, 3]
        rot = jnp.where(okv[..., None], rot, 0.0)
        cols.append(rot.reshape(*g9.shape[:2], 3 * ns))
        p += 3 * ns
    return cols


def pack_dense_rows(g, nx: int, cap: int, Lx: float, cell_plane: int,
                    Wp: int, Wjp: int, make_j: bool = True,
                    expand=None, Pb: int = 0):
    """Compact dense slot-layout rows into the packed kernel's layout.

    g: [R, W=nx*cap, P] dense rows (validity plane at index 3, slot
    order = cell-major).  Everything is derived from the validity
    plane, so rows received from a halo exchange pack exactly like
    local rows.  Returns (gi [R, Wp, P], gj [R, Wjp, P] or None,
    tbl [R, nx+3] int32, prefix [R, nx] int32).

    expand/Pb: THIN mode -- g carries only the 9 primary planes
    (x y z w cid q0..q3); the compaction gather moves 9 planes instead
    of Pb (TPU gathers run ~1.8 GB/s regardless of locality), then
    expand(gi9) -> site plane blocks is called on the PACKED rows and
    the full Pb-plane gi is assembled from slices (site_planes_packed
    is the expander; bit-identical to packing dense rows)."""
    R, W, P = g.shape
    dtype = g.dtype
    filled = g[:, :, 3] > 0.5
    occ = filled.reshape(R, nx, cap).sum(-1).astype(jnp.int32)
    cs = jnp.cumsum(occ, axis=1)
    prefix = cs - occ
    row_cnt = cs[:, -1]

    row_pos = jnp.arange(W, dtype=jnp.int32)
    key = jnp.where(filled, row_pos, W)
    src = jnp.sort(key, axis=-1)
    ok = src < W
    srcc = jnp.minimum(src, W - 1)
    gi = jnp.where(
        ok[..., None],
        jnp.take_along_axis(g, srcc[..., None], axis=1),
        0.0,
    )
    cellidx = jnp.where(ok, srcc // cap, 0)
    if expand is not None:
        assert P == 9 and Pb > cell_plane, (P, Pb, cell_plane)
        cols = [gi[..., :5]] + expand(gi)
        cols.append(cellidx.astype(dtype)[..., None])
        if Pb > cell_plane + 1:
            cols.append(jnp.zeros((R, W, Pb - cell_plane - 1), dtype))
        gi = jnp.concatenate(cols, axis=-1)
        P = Pb
    else:
        gi = gi.at[:, :, cell_plane].set(cellidx.astype(dtype))
    if Wp > W:
        gi = jnp.concatenate(
            [gi, jnp.zeros((R, Wp - W, P), dtype)], axis=1)

    occ_last = occ[:, -1]
    occ_first = occ[:, 0]
    # head-halo layout (see _build_views): right wrap halo FIRST at
    # [0, occ_first), left wrap halo right-aligned at 2*cap, row
    # verbatim at +2*cap; tbl[c+1] = start(c) for cells -1..nx-1,
    # then end(nx-1) and end(nx)
    tbl = jnp.concatenate(
        [
            (2 * cap - occ_last)[:, None],
            2 * cap + prefix,
            (2 * cap + row_cnt)[:, None],
            occ_first[:, None],
        ],
        axis=1,
    ).astype(jnp.int32)

    gj = None
    if make_j:
        rcb = row_cnt[:, None]
        hpos = jnp.arange(cap, dtype=jnp.int32)[None, :]
        rvalid = hpos < occ_first[:, None]
        right = jnp.where(rvalid[..., None], gi[:, :cap], 0.0)
        right = right.at[:, :, 0].add(
            jnp.where(rvalid, Lx, 0.0).astype(dtype))
        lsrc = hpos - cap + rcb
        lvalid = (hpos >= cap - occ_last[:, None]) & (lsrc >= 0)
        lsafe = jnp.clip(lsrc, 0, Wp - 1)
        left = jnp.where(
            lvalid[..., None],
            jnp.take_along_axis(
                gi, lsafe[..., None].astype(jnp.int32), axis=1),
            0.0,
        )
        left = left.at[:, :, 0].add(
            jnp.where(lvalid, -Lx, 0.0).astype(dtype))
        gj = jnp.concatenate([right, left, gi], axis=1)
        if gj.shape[1] < Wjp:
            gj = jnp.concatenate(
                [gj, jnp.zeros((R, Wjp - gj.shape[1], P), dtype)],
                axis=1)
    return gi, gj, tbl, prefix


class PallasMultiSitePackedPath(PallasMultiSitePath):
    """force_fn: the occupancy-packed variant of PallasMultiSitePath.

    Same construction interface; cap only sizes the binning slot table
    (no tx*cap%128 lane-alignment constraint -- the packed kernel's
    lane geometry is occupancy-driven).
    """

    packed = True

    def __init__(self, table, spec: CellGridSpec, tx: int = 0,
                 interpret: bool = False, screen_alpha: float = 0.0):
        super().__init__(table, spec, tx=1 if spec.dims[0] % 1 else 1,
                         interpret=interpret, screen_alpha=screen_alpha)
        # packed-plane layout: the cell-index plane rides after the
        # last LIVE plane.  Trailing dipole/quadrupole plane blocks
        # whose couplings are all zero (e.g. the CO2 model's zeroed
        # dipole+quad sites: 40 declared planes, 23 live) are
        # truncated -- the kernel's unrolled loops never read them, so
        # dropping them only shrinks the HBM buffers and the row
        # build/DMA traffic.
        p_used = live_plane_count(self.meta)
        self.cell_plane = p_used
        self.Pb = -(-(p_used + 1) // 8) * 8
        nx, ny, nz = spec.dims
        self.Wp = -(-(nx * spec.cap) // TI) * TI
        # head-halo j layout: [2*cap halo head | Wp packed row]
        self.Wjp = -(-(2 * spec.cap + self.Wp) // JW) * JW

    def _site_planes_packed(self, g9: jnp.ndarray):
        return site_planes_packed(self.meta, self.cell_plane, g9)

    def _build_views(self, mol: MoleculeState):
        """Packed kernel inputs from the molecule state: returns
        (tbl, r_i, r_j, bins, prefix) -- split out so phase profiling
        (tools/ms_phases.py) can time the build vs the kernel."""
        spec = self.spec
        nx, ny, nz = spec.dims
        cap = spec.cap
        n = mol.capacity
        dtype = mol.r.dtype
        Lx = spec.box[0]
        Pb = self.Pb
        W = nx * cap
        Wp, Wjp = self.Wp, self.Wjp

        bins = bin_particles(mol.r, mol.valid, spec)
        slots_row = bins.slots.reshape(nz * ny, W)
        filled = slots_row >= 0
        occ = filled.reshape(nz * ny, nx, cap).sum(-1).astype(jnp.int32)
        cs = jnp.cumsum(occ, axis=1)
        prefix = cs - occ  # exclusive
        row_cnt = cs[:, -1]

        # packed source positions per row: sort pushes empty slots to
        # the tail while keeping cell order (slot order within a cell)
        row_pos = jnp.arange(W, dtype=jnp.int32)
        key = jnp.where(filled, row_pos, W)
        src = jnp.sort(key, axis=-1)  # [rows, W]
        ok_p = src < W
        srcc = jnp.minimum(src, W - 1)
        msrc = jnp.take_along_axis(slots_row, srcc, axis=1)  # [rows, W]
        ok_p = ok_p & (msrc >= 0)
        msafe = jnp.clip(msrc, 0, n - 1)

        # THIN gather: only the 9 primary planes (r, valid, cid, q)
        # ride the slot gather; the site-offset planes are rotated
        # AFTER packing, in packed order.  TPU gathers run at ~1.8
        # GB/s regardless of locality, so moving 9 planes instead of
        # Pb through the gather and paying the (cheap, VPU) qrotate on
        # packed slots is a measured win (49 -> ~19 ms at CO2 N=1M,
        # tools/probe_ms_build.py); the rotation math is identical
        # op-for-op, so outputs are bit-identical to the dense build.
        thin = jnp.concatenate(
            [mol.r, mol.valid.astype(dtype)[:, None],
             mol.cid.astype(dtype)[:, None], mol.q], axis=1)  # [N, 9]
        g9 = jnp.where(ok_p[..., None], thin[msafe], 0.0)  # [rows,W,9]
        cols = [g9[..., :5]] + self._site_planes_packed(g9)
        cellidx = jnp.where(ok_p, srcc // cap, 0)
        cols.append(cellidx.astype(dtype)[..., None])
        if Pb > self.cell_plane + 1:
            cols.append(jnp.zeros(
                (g9.shape[0], W, Pb - self.cell_plane - 1), dtype))
        g = jnp.concatenate(cols, axis=-1)  # [rows, W, Pb]
        if Wp > W:
            g = jnp.concatenate(
                [g, jnp.zeros((g.shape[0], Wp - W, Pb), dtype)], axis=1)

        # packed j rows, head-halo layout: [right wrap halo at
        # [0, occ_first) | left wrap halo right-aligned at 2*cap |
        # the packed row VERBATIM at +2*cap].  Only the left halo
        # needs a (small, [rows, cap]) gather; the right halo and the
        # row itself are pure slices of g -- the full-width
        # take_along_axis this replaces ran at the TPU's ~1.8 GB/s
        # gather rate (tools/probe_ms_build.py).  Right halo FIRST so
        # the kernel's wrap-tile head walk is a single chunk at a
        # STATIC offset (occ_first <= cap <= JW).
        occ_last = occ[:, -1]
        occ_first = occ[:, 0]
        rcb = row_cnt[:, None]
        hpos = jnp.arange(cap, dtype=jnp.int32)[None, :]  # [1, cap]
        rvalid = hpos < occ_first[:, None]  # cell 0 occupants
        right = jnp.where(rvalid[..., None], g[:, :cap], 0.0)
        right = right.at[:, :, 0].add(
            jnp.where(rvalid, Lx, 0.0).astype(dtype))
        lsrc = hpos - cap + rcb  # cell nx-1 occupants, right-aligned
        lvalid = (hpos >= cap - occ_last[:, None]) & (lsrc >= 0)
        lsafe = jnp.clip(lsrc, 0, Wp - 1)
        left = jnp.where(
            lvalid[..., None],
            jnp.take_along_axis(
                g, lsafe[..., None].astype(jnp.int32), axis=1
            ),
            0.0,
        )
        left = left.at[:, :, 0].add(
            jnp.where(lvalid, -Lx, 0.0).astype(dtype))
        gj = jnp.concatenate([right, left, g], axis=1)
        if gj.shape[1] < Wjp:
            gj = jnp.concatenate(
                [gj,
                 jnp.zeros((gj.shape[0], Wjp - gj.shape[1], Pb), dtype)],
                axis=1)

        # packed cell-start table: tbl[c+1] = start(c) in j space for
        # cells -1 .. nx-1, then end(nx-1) and end(nx) (the wrap halo
        # cell nx lives FIRST in the head, [0, occ_first))
        tbl = jnp.concatenate(
            [
                (2 * cap - occ_last)[:, None],
                2 * cap + prefix,
                (2 * cap + row_cnt)[:, None],
                occ_first[:, None],
            ],
            axis=1,
        ).astype(jnp.int32)

        r_i = jnp.moveaxis(g.reshape(nz, ny, Wp, Pb), -1, 2)
        r_j = jnp.moveaxis(gj.reshape(nz, ny, Wjp, Pb), -1, 2)
        tbl = tbl.reshape(nz, ny, nx + 3)
        return tbl, r_i, r_j, bins, prefix

    def __call__(self, mol: MoleculeState):
        spec = self.spec
        nx, ny, nz = spec.dims
        cap = spec.cap
        Wp, Wjp = self.Wp, self.Wjp
        tbl, r_i, r_j, bins, prefix = self._build_views(mol)

        out, u6, uX, my_rf = multisite_cell_forces_packed(
            tbl,
            r_i,
            r_j,
            nx=nx,
            ny=ny,
            nz=nz,
            cap=cap,
            Wp=Wp,
            Wjp=Wjp,
            cell_plane=self.cell_plane,
            box=spec.box,
            rc2=self.rc2,
            rc2_lj=self.rc2_lj,
            screen_alpha=self.screen_alpha,
            meta=self.meta,
            interpret=self.interpret,
        )

        # unpack: molecule's packed position = prefix[row, x] + rank
        flat = jnp.moveaxis(out, 2, -1).reshape(-1, NOUT)  # [rows*Wp,]
        slot_of = bins.slot_of  # cell*cap + rank (dense flat)
        cell = jnp.minimum(slot_of // cap, nz * ny * nx - 1)
        rank = slot_of % cap
        rowf = cell // nx
        x = cell % nx
        ppos = prefix[jnp.clip(rowf, 0, nz * ny - 1),
                      jnp.clip(x, 0, nx - 1)] + rank
        src_out = jnp.clip(rowf * Wp + ppos, 0, flat.shape[0] - 1)
        got = jnp.where(mol.valid[:, None], flat[src_out], 0.0)
        forces = Forces(F=got[:, 0:3], M=got[:, 3:6], Vi=got[:, 6:9])
        vir = jnp.sum(out[:, :, 6:9, :])
        macro = Macroscopic(upot6lj=u6, upot_xpoles=uX, virial=vir,
                            my_rf=my_rf)
        return forces, macro, bins.overflow
