"""Pallas TPU kernel: single-site Lennard-Jones cell-pair forces.

The performance path replacing the reference's hand-vectorized AVX
kernels (VectorizedCellProcessor / VCP1CLJRMM,
/root/reference/src/particleContainer/adapter/VCP1CLJRMM.cpp and
adapter/vectorization/) with a TPU-native design:

  Layout: x-major cell rows, lane-major (slots on the 128-lane axis --
  the only layout XLA:TPU stores unpadded in HBM):
      i view  [nz, ny, 4, nx*cap]
      j view  [nz, ny, 4, (nx+2*HX)*cap]   HX(=2)-cell x halo; the
              innermost halo cell is the periodic image (pre-shifted by
              +-Lx), the outer cell is empty padding so every
              dynamic-slice lane offset is 128-aligned (Mosaic
              requirement)
  planes = (x, y, z, valid).

  Each program owns one (z, y) row and reads the 9 neighbor j-rows
  (dz, dy in {-1,0,1}) via wrapped BlockSpec index maps; periodic y/z
  image shifts are applied in-kernel from the program ids (no y/z halo
  storage at all).  An fori_loop walks x tiles of TX cells with
  TX*cap == 128 lanes.  The i tile is transposed lanes->sublanes with
  an identity matmul on the MXU (the canonical Mosaic-friendly
  transpose); the pair matrix is then the natural broadcast
  [txc, 1] - [1, win] with i on sublanes and j on lanes, so every VPU
  op runs on full (8, 128) tiles.  Forces reduce over lanes to
  [txc, 1] and are transposed back the same way for the lane-major
  output row.

  No Newton-3rd-law halving: each ordered pair is evaluated from both
  sides (recompute beats the scatter of a force back-exchange on TPU,
  SURVEY.md section 7); energies/virial are halved in-kernel.  The
  reference's colored C08 traversal disappears: colors only serialized
  OpenMP writes, and here every program writes only its own row.

  Validity is in-band (plane 3); masked pairs contribute exact zeros
  (dr2 guarded before any large intermediate is formed).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 9 neighbor rows in (dz, dy); index 4 is the center row (the i-source)
_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
_CENTER = 4
HX = 1  # x-halo cells per side in the j view
NPLANE = 4

# Sentinel scale for invalid slots (y_local = SENTINEL_SCALE*(1+slot)).
# Two invalid slots with the SAME slot index in neighboring (y,z) rows
# carry identical sentinels; their separation is exactly one cell edge
# applied as `sentinel - cell_edge` in f32.  The scale must be small
# enough that this subtraction survives rounding: at 1e6 the ulp of
# slot*scale reaches/exceeds the cell edge, the shifted sentinel rounds
# back onto its neighbor-row twin, dr2 collapses to ~0, and the kernel
# emits garbage pairs or NaNs.  At 1e3, ulp(1e3*(1+cap)) <= 0.0625 for
# cap <= 1024 -- negligible against the sentinel_eligible() margin.
SENTINEL_SCALE = 1e3


def sentinel_eligible(cell_len, rc2: float, cap: int) -> bool:
    """Sentinel mode is safe iff (a) every same-slot neighbor-row
    sentinel pair stays outside the cutoff after f32 rounding of the
    cell-edge shift (cell edge >= rc plus the rounding margin), and
    (b) the SMALLEST sentinel stays outside the cutoff of every real
    particle: a real y_local <= edge against a sentinel shifted by
    -edge demands SENTINEL_SCALE - 2*edge > rc (huge cells would
    otherwise bring sentinels inside the cutoff)."""
    import numpy as np

    edge_lo = float(min(cell_len))
    edge_hi = float(max(cell_len))
    ulp = float(np.spacing(np.float32(SENTINEL_SCALE * (1 + cap))))
    gap = SENTINEL_SCALE - 2.0 * edge_hi
    return (edge_lo - 2.0 * ulp) ** 2 >= rc2 and gap > 0 and gap ** 2 > rc2


def _lj_row_kernel(
    i_ref,
    *refs,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    z_halo: bool,
    y_halo: bool,
    compute_macro: bool,
    local_coords: bool,
    hx: int,
    jt: bool,
    sentinel: bool,
    fast_recip: bool,
    out_dtype,
):
    row_refs = refs[:9]
    f_ref = refs[9]
    _bx, by, bz = box
    txc = tx * cap
    win = (tx + 2 * hx) * cap
    n_tiles = nx // tx

    pz = pl.program_id(0)
    py = pl.program_id(1)

    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)

    # identity for MXU transposes (lanes <-> sublanes)
    ii = jax.lax.broadcasted_iota(jnp.int32, (txc, txc), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (txc, txc), 1)
    ident = (ii == jj).astype(out_dtype)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, NPLANE), 1)
    oh = [(lane4 == c).astype(out_dtype) for c in range(NPLANE)]
    sub4 = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, 1), 0)
    ohr = [(sub4 == c).astype(out_dtype) for c in range(NPLANE)]

    clx = _bx / nx
    cly = by / ny
    clz = bz / nz
    if jt:
        # j-transposed pair matrix [win, txc]: j slots on SUBLANES (pad
        # granularity 8 -> the 192-slot window wastes nothing; lane-major
        # j windows pad 192->256 lanes, a hard 33% VPU tax), i slots on
        # lanes (no MXU transpose needed on either load or store side).
        # Selector matmuls Bc broadcast plane c of H^T across the i
        # lanes on the otherwise-idle MXU.
        # F32 HAZARD ON REAL TPU HARDWARE: a default-precision f32
        # dot_general executes as a single bf16 pass, so the j
        # coordinates that ride through these selector matmuls are
        # rounded to an 8-bit mantissa -- measured 1e-2 relative force
        # error at cell edge ~2.9 (interpret-mode tests cannot see
        # this).  Use lj_cell_forces_pallas_lanej for production f32
        # runs; this path remains the f64/interpret reference and a
        # layout testbed.
        sub4c = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, txc), 0)
        Bsel = [(sub4c == c).astype(out_dtype) for c in range(NPLANE)]
        wlT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 0)
        ilT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 1)
        not_selfT = wlT != ilT + hx * cap
        if local_coords:
            xoffT = ((ilT // cap) - (wlT // cap) + hx).astype(out_dtype) * clx
    else:
        # self pair in the center row: the j window starts hx cells left
        # of the i tile -> same slot at j_local == i_local + hx*cap
        il = jax.lax.broadcasted_iota(jnp.int32, (txc, win), 0)
        jl = jax.lax.broadcasted_iota(jnp.int32, (txc, win), 1)
        not_self = jl != il + hx * cap
        if local_coords:
            # cell-local coordinate mode: slot positions are relative to
            # their own cell's origin, so f32 keeps full precision at any
            # box size, and periodicity is exact integer cell arithmetic.
            # x offset between i (cell t*tx + il//cap) and j (cell
            # t*tx + jl//cap - hx) is a trace-time constant matrix:
            xoff = ((il // cap) - (jl // cap) + hx).astype(out_dtype) * clx

    lane_txc = jax.lax.broadcasted_iota(jnp.int32, (1, txc), 1)
    lane0 = (lane_txc == 0).astype(out_dtype)
    lane1 = (lane_txc == 1).astype(out_dtype)

    def tile(t, _):
        off = pl.multiple_of(t * txc, txc)
        ti = i_ref[0, 0, :, pl.ds(off, txc)]  # [4, txc] lane-major
        u6_t = jnp.zeros((), out_dtype)
        vir_t = jnp.zeros((), out_dtype)

        if jt:
            # i planes stay lane-major [1, txc]: no transpose
            xi = jnp.sum(ti * ohr[0], axis=0, keepdims=True)
            yi = jnp.sum(ti * ohr[1], axis=0, keepdims=True)
            zi = jnp.sum(ti * ohr[2], axis=0, keepdims=True)
            if not sentinel:
                wi = jnp.sum(ti * ohr[3], axis=0, keepdims=True)
            fx = jnp.zeros((1, txc), out_dtype)
            fy = jnp.zeros((1, txc), out_dtype)
            fz = jnp.zeros((1, txc), out_dtype)
            for k, (dz, dy) in enumerate(_OFFS):
                H = row_refs[k][0, 0, :, pl.ds(off, win)]  # [4, win]
                # broadcast plane c of H^T over the i lanes on the MXU
                def jplane(c):
                    return jax.lax.dot_general(
                        H, Bsel[c], (((0,), (0,)), ((), ())),
                        preferred_element_type=out_dtype,
                    )  # [win, txc]

                Xj = jplane(0)
                Yj = jplane(1)
                Zj = jplane(2)
                Wj = None if sentinel else jplane(3)
                if local_coords:
                    yis = yi - jnp.asarray(dy * cly, out_dtype)
                    zis = zi - jnp.asarray(dz * clz, out_dtype)
                else:
                    zidx = pz + dz
                    yidx = py + dy
                    if y_halo:
                        sy = jnp.zeros((), out_dtype)
                    else:
                        sy = jnp.where(
                            yidx < 0, -by, jnp.where(yidx >= ny, by, 0.0)
                        ).astype(out_dtype)
                    if z_halo:
                        sz = jnp.zeros((), out_dtype)
                    else:
                        sz = jnp.where(
                            zidx < 0, -bz, jnp.where(zidx >= nz, bz, 0.0)
                        ).astype(out_dtype)
                    yis = yi - sy
                    zis = zi - sz
                dx = xi - Xj  # [win, txc]
                if local_coords:
                    dx = dx + xoffT
                dyv = yis - Yj
                dzv = zis - Zj
                dr2 = dx * dx + dyv * dyv + dzv * dzv
                mask = dr2 < cut2
                if not sentinel:
                    mask = mask & (Wj * wi > 0.5)
                if k == _CENTER:
                    mask = mask & not_selfT
                if fast_recip:
                    # masked pairs get dr2=1e30: inv ~ 1e-30 underflows
                    # the lj6 cube to exact 0, so no mf multiply needed;
                    # approx reciprocal + one Newton step ~ f32 rounding
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
                if compute_macro:
                    u6_t = u6_t + jnp.sum(e24 * lj12m6 + sh6 * mf)
                    vir_t = vir_t + jnp.sum(fac * dr2)
                fx = fx + jnp.sum(fac * dx, axis=0, keepdims=True)
                fy = fy + jnp.sum(fac * dyv, axis=0, keepdims=True)
                fz = fz + jnp.sum(fac * dzv, axis=0, keepdims=True)
            scal = (0.5 * u6_t) * lane0 + (0.5 * vir_t) * lane1
            out4 = ohr[0] * fx + ohr[1] * fy + ohr[2] * fz + ohr[3] * scal
            f_ref[0, 0, :, pl.ds(off, txc)] = out4
            return _

        # transpose to sublane-major [txc, 4] on the MXU
        G = jax.lax.dot_general(
            ident, ti, (((1,), (1,)), ((), ())), preferred_element_type=out_dtype
        )
        xi = jnp.sum(G * oh[0], axis=1, keepdims=True)  # [txc, 1]
        yi = jnp.sum(G * oh[1], axis=1, keepdims=True)
        zi = jnp.sum(G * oh[2], axis=1, keepdims=True)
        wi = jnp.sum(G * oh[3], axis=1, keepdims=True)

        fx = jnp.zeros((txc, 1), out_dtype)
        fy = jnp.zeros((txc, 1), out_dtype)
        fz = jnp.zeros((txc, 1), out_dtype)

        for k, (dz, dy) in enumerate(_OFFS):
            H = row_refs[k][0, 0, :, pl.ds(off, win)]  # [4, win]
            xj = jnp.sum(H * ohr[0], axis=0, keepdims=True)  # [1, win]
            yj = jnp.sum(H * ohr[1], axis=0, keepdims=True)
            zj = jnp.sum(H * ohr[2], axis=0, keepdims=True)
            wj = jnp.sum(H * ohr[3], axis=0, keepdims=True)

            if local_coords:
                # neighbor row (dy, dz) sits exactly one cell away;
                # periodic wrap is already exact via the index-map mod
                dx = xi - xj + xoff
                dyv = yi - yj - dy * cly
                dzv = zi - zj - dz * clz
            else:
                zidx = pz + dz
                yidx = py + dy
                if y_halo:
                    sy = jnp.zeros((), out_dtype)
                else:
                    sy = jnp.where(
                        yidx < 0, -by, jnp.where(yidx >= ny, by, 0.0)
                    ).astype(out_dtype)
                if z_halo:
                    # halo rows are explicit (multi-chip slab exchange
                    # has already applied any global-z periodic shift)
                    sz = jnp.zeros((), out_dtype)
                else:
                    sz = jnp.where(
                        zidx < 0, -bz, jnp.where(zidx >= nz, bz, 0.0)
                    ).astype(out_dtype)
                yj = yj + sy
                zj = zj + sz
                dx = xi - xj  # [txc, win]
                dyv = yi - yj
                dzv = zi - zj
            dr2 = dx * dx + dyv * dyv + dzv * dzv
            mask = (dr2 < cut2) & (wi * wj > 0.5)
            if k == _CENTER:
                mask = mask & not_self
            mf = mask.astype(out_dtype)
            invdr2 = mf / jnp.where(mask, dr2, 1.0)
            lj6 = s2 * invdr2
            lj6 = lj6 * lj6 * lj6
            lj12 = lj6 * lj6
            lj12m6 = lj12 - lj6
            # PotForceLJ (potforce.h:18-31): u6 = eps24*(lj12-lj6)+shift6
            fac = e24 * (lj12 + lj12m6) * invdr2
            if compute_macro:
                u6_t = u6_t + jnp.sum(e24 * lj12m6 + sh6 * mf)
                vir_t = vir_t + jnp.sum(fac * dr2)
            fx = fx + jnp.sum(fac * dx, axis=1, keepdims=True)
            fy = fy + jnp.sum(fac * dyv, axis=1, keepdims=True)
            fz = fz + jnp.sum(fac * dzv, axis=1, keepdims=True)

        # transpose force columns back to lane vectors [1, txc]
        def to_lane(v):
            return jax.lax.dot_general(
                v, ident, (((0,), (0,)), ((), ())), preferred_element_type=out_dtype
            )  # [1, txc]

        fxl, fyl, fzl = to_lane(fx), to_lane(fy), to_lane(fz)
        # scalars ride in plane 3: u6 at lane 0, virial at lane 1 of
        # each tile; halved for double-sided pair counting (virial per
        # pair = 0.5*drm.f on each molecule -> sum(fac*dr2)/2 total)
        scal = (0.5 * u6_t) * lane0 + (0.5 * vir_t) * lane1
        out4 = ohr[0] * fxl + ohr[1] * fyl + ohr[2] * fzl + ohr[3] * scal
        f_ref[0, 0, :, pl.ds(off, txc)] = out4
        return _

    jax.lax.fori_loop(0, n_tiles, tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "eps24", "sig2", "shift6", "rc2",
        "interpret", "z_halo", "y_halo", "compute_macro", "local_coords", "hx", "jt",
        "sentinel", "fast_recip",
    ),
)
def lj_cell_forces_pallas(
    r_i: jnp.ndarray,  # [nz, ny, 4, nx*cap]
    r_j: jnp.ndarray,  # [nz, ny, 4, (nx+2*hx)*cap]
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    z_halo: bool = False,
    y_halo: bool = False,
    compute_macro: bool = True,
    local_coords: bool = False,
    hx: int = HX,
    jt: bool = False,
    sentinel: bool = False,
    fast_recip: bool = False,
):
    """Returns (out [nz, ny, 4, nx*cap]: force planes 0..2, scalar plane
    3 with u6/virial one-hots per tile; u6lj scalar; virial scalar).

    z_halo=True: r_j carries two explicit z halo rows (multi-chip slab
    decomposition) -- r_j is [nz+2, ny, ...], neighbor row dz maps to
    r_j[z+dz+1], and no periodic z shift is applied in-kernel.

    jt=True: j-transposed pair matrices [win, txc] (j slots on
    sublanes, i slots on lanes).  Sublanes pad at 8, so the
    (tx+2*hx)*cap-slot j window carries no lane-padding tax (the
    lane-major layout pads 192->256, +33% VPU work), and neither the i
    load nor the force store needs an MXU transpose; the j-plane
    broadcasts ride the idle MXU via selector matmuls.

    sentinel=True (jt only, local_coords only, requires min cell edge
    >= rc): invalid slots carry y_local = SENTINEL_SCALE*(1 + slot)
    instead of 0, which the rc2 test masks out against every other
    slot, so the validity plane is never read (saves one MXU broadcast
    and the w-mask ops per neighbor row).

    fast_recip=True (jt only, f32 TPU): approx reciprocal + one Newton
    step instead of the IEEE divide; masked pairs underflow to exact
    force zeros via dr2=1e30, removing the mf multiply."""
    Wj = (nx + 2 * hx) * cap
    nzj = nz + 2 if z_halo else nz
    nyj = ny + 2 if y_halo else ny
    assert r_i.shape == (nz, ny, NPLANE, nx * cap), r_i.shape
    assert r_j.shape == (nzj, nyj, NPLANE, Wj), r_j.shape
    assert nx % tx == 0
    if not interpret:
        assert (tx * cap) % 128 == 0, (
            "compiled TPU kernel needs tx*cap to be a multiple of 128 "
            f"(got tx={tx}, cap={cap})"
        )
    if sentinel:
        assert jt and local_coords, "sentinel mode needs jt + local_coords"
        cl2 = min(box[0] / nx, box[1] / ny, box[2] / nz) ** 2
        assert cl2 >= rc2, ("sentinel mode requires cell edge >= rc", cl2, rc2)
    if fast_recip:
        assert jt, "fast_recip implemented on the jt path only"
    out_dtype = r_i.dtype

    i_spec = pl.BlockSpec(
        (1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0), memory_space=pltpu.VMEM
    )
    zmap = (lambda z, dz: z + dz + 1) if z_halo else (lambda z, dz: (z + dz) % nz)
    ymap = (lambda y, dy: y + dy + 1) if y_halo else (lambda y, dy: (y + dy) % ny)
    jmap = lambda z, y, dz, dy: (zmap(z, dz), ymap(y, dy), 0, 0)
    j_specs = [
        pl.BlockSpec(
            (1, 1, NPLANE, Wj),
            functools.partial(jmap, dz=dz, dy=dy),
            memory_space=pltpu.VMEM,
        )
        for dz, dy in _OFFS
    ]
    out_spec = pl.BlockSpec(
        (1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _lj_row_kernel,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        z_halo=z_halo,
        y_halo=y_halo,
        compute_macro=compute_macro,
        local_coords=local_coords,
        hx=hx,
        jt=jt,
        sentinel=sentinel,
        fast_recip=fast_recip,
        out_dtype=out_dtype,
    )
    win = (tx + 2 * hx) * cap
    n_pairs = nz * ny * nx * cap * 9 * win
    out = pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=26 * n_pairs,
            bytes_accessed=(9 * Wj + 2 * nx * cap) * NPLANE * nz * ny * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r_i, *([r_j] * 9))
    scal = out[:, :, 3, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    vir = jnp.sum(scal[..., 1])
    return out, u6, vir


def _lj_lanej_kernel(
    i_ref,
    *refs,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    compute_macro: bool,
    hx: int,
    sentinel: bool,
    fast_recip: bool,
    defer: bool,
    out_dtype,
):
    """Lane-major-j kernel: i slots on sublanes, j window on lanes.

    Rationale (measured on v5e, tools/ablate_kernel.py): every per-row
    mechanism that moves j planes onto sublanes is expensive -- selector
    matmuls ~73 ms/step (MXU K=4-utilization-bound), Mosaic transpose
    ~37 ms, lane broadcast ~130 ms.  With j on LANES the per-row j-plane
    extraction is three 4-sublane row sums (nearly free), and the only
    transposes are per TILE: one K=txc matmul for the i planes in and
    three [txc,1]->[1,txc] identity matmuls for the forces out.  The
    price is the 192->256 lane pad of the j window (+33% VPU) -- a good
    trade.

    defer=True additionally accumulates fac*dr per-row into [txc, win]
    accumulators and performs the cross-lane force reductions once per
    tile instead of once per row.

    PRECISION NOTE: this kernel moves coordinates between lane- and
    sublane-major with Mosaic's exact .T transpose, never with identity
    MATMULS -- on TPU a default-precision f32 dot_general executes as a
    single bf16 pass, which rounds whatever rides through it to an
    8-bit mantissa (measured 1e-2 relative force error in the selector-
    matmul jt kernel on hardware; interpret-mode golden tests cannot
    see this)."""
    row_refs = refs[:9]
    f_ref = refs[9]
    _bx, by, bz = box
    txc = tx * cap
    win = (tx + 2 * hx) * cap
    n_tiles = nx // tx

    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, NPLANE), 1)
    oh = [(lane4 == c).astype(out_dtype) for c in range(NPLANE)]
    sub4 = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, 1), 0)
    ohr = [(sub4 == c).astype(out_dtype) for c in range(NPLANE)]

    clx = _bx / nx
    cly = by / ny
    clz = bz / nz
    il = jax.lax.broadcasted_iota(jnp.int32, (txc, win), 0)
    jl = jax.lax.broadcasted_iota(jnp.int32, (txc, win), 1)
    not_self = jl != il + hx * cap
    xoff = ((il // cap) - (jl // cap) + hx).astype(out_dtype) * clx

    lane_txc = jax.lax.broadcasted_iota(jnp.int32, (1, txc), 1)
    lane0 = (lane_txc == 0).astype(out_dtype)
    lane1 = (lane_txc == 1).astype(out_dtype)

    def tile(t, _):
        off = pl.multiple_of(t * txc, txc)
        ti = i_ref[0, 0, :, pl.ds(off, txc)]  # [4, txc]
        G = ti.T  # [txc, 4] -- exact Mosaic transpose (see kernel doc)
        xi = jnp.sum(G * oh[0], axis=1, keepdims=True)  # [txc, 1]
        yi = jnp.sum(G * oh[1], axis=1, keepdims=True)
        zi = jnp.sum(G * oh[2], axis=1, keepdims=True)
        if not sentinel:
            wi = jnp.sum(G * oh[3], axis=1, keepdims=True)
        u6_t = jnp.zeros((), out_dtype)
        vir_t = jnp.zeros((), out_dtype)
        if defer:
            ax = jnp.zeros((txc, win), out_dtype)
            ay = jnp.zeros((txc, win), out_dtype)
            az = jnp.zeros((txc, win), out_dtype)
            if compute_macro:
                au = jnp.zeros((txc, win), out_dtype)
                av = jnp.zeros((txc, win), out_dtype)
        else:
            fx = jnp.zeros((txc, 1), out_dtype)
            fy = jnp.zeros((txc, 1), out_dtype)
            fz = jnp.zeros((txc, 1), out_dtype)
        for k, (dz, dy) in enumerate(_OFFS):
            H = row_refs[k][0, 0, :, pl.ds(off, win)]  # [4, win]
            xj = jnp.sum(H * ohr[0], axis=0, keepdims=True)  # [1, win]
            yj = jnp.sum(H * ohr[1], axis=0, keepdims=True)
            zj = jnp.sum(H * ohr[2], axis=0, keepdims=True)
            dx = xi - xj + xoff  # [txc, win]
            dyv = (yi - jnp.asarray(dy * cly, out_dtype)) - yj
            dzv = (zi - jnp.asarray(dz * clz, out_dtype)) - zj
            dr2 = dx * dx + dyv * dyv + dzv * dzv
            mask = dr2 < cut2
            if not sentinel:
                wj = jnp.sum(H * ohr[3], axis=0, keepdims=True)
                mask = mask & (wi * wj > 0.5)
            if k == _CENTER:
                mask = mask & not_self
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
            if defer:
                ax = ax + fac * dx
                ay = ay + fac * dyv
                az = az + fac * dzv
                if compute_macro:
                    au = au + (e24 * lj12m6 + sh6 * mf)
                    av = av + fac * dr2
            else:
                if compute_macro:
                    u6_t = u6_t + jnp.sum(e24 * lj12m6 + sh6 * mf)
                    vir_t = vir_t + jnp.sum(fac * dr2)
                fx = fx + jnp.sum(fac * dx, axis=1, keepdims=True)
                fy = fy + jnp.sum(fac * dyv, axis=1, keepdims=True)
                fz = fz + jnp.sum(fac * dzv, axis=1, keepdims=True)
        if defer:
            fx = jnp.sum(ax, axis=1, keepdims=True)
            fy = jnp.sum(ay, axis=1, keepdims=True)
            fz = jnp.sum(az, axis=1, keepdims=True)
            if compute_macro:
                u6_t = jnp.sum(au)
                vir_t = jnp.sum(av)

        # forces back to lane-major via one exact [txc,4]->[4,txc]
        # transpose (scalars ride the 4th column)
        scal_col = jnp.zeros((txc, 1), out_dtype)
        scal_col = (0.5 * u6_t) * (
            jax.lax.broadcasted_iota(jnp.int32, (txc, 1), 0) == 0
        ).astype(out_dtype) + (0.5 * vir_t) * (
            jax.lax.broadcasted_iota(jnp.int32, (txc, 1), 0) == 1
        ).astype(out_dtype)
        Fcat = jnp.concatenate([fx, fy, fz, scal_col], axis=1)  # [txc, 4]
        f_ref[0, 0, :, pl.ds(off, txc)] = Fcat.T
        return _

    jax.lax.fori_loop(0, n_tiles, tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "eps24", "sig2", "shift6",
        "rc2", "interpret", "z_halo", "compute_macro", "hx", "sentinel",
        "fast_recip", "defer",
    ),
)
def lj_cell_forces_pallas_lanej(
    r_i: jnp.ndarray,  # [nz, ny, 4, nx*cap]
    r_j: jnp.ndarray,  # [nz(+2), ny, 4, (nx+2*hx)*cap]
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    z_halo: bool = False,
    compute_macro: bool = True,
    hx: int = HX,
    sentinel: bool = False,
    fast_recip: bool = False,
    defer: bool = True,
):
    """Lane-major-j variant of lj_cell_forces_pallas (see
    _lj_lanej_kernel).  Cell-local coordinates only.  Same output
    contract as the other kernels."""
    Wj = (nx + 2 * hx) * cap
    nzj = nz + 2 if z_halo else nz
    assert r_i.shape == (nz, ny, NPLANE, nx * cap), r_i.shape
    assert r_j.shape == (nzj, ny, NPLANE, Wj), r_j.shape
    assert nx % tx == 0
    if not interpret:
        assert (tx * cap) % 128 == 0
    out_dtype = r_i.dtype

    i_spec = pl.BlockSpec(
        (1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zmap = (lambda z, dz: z + dz + 1) if z_halo else (lambda z, dz: (z + dz) % nz)
    jmap = lambda z, y, dz, dy: (zmap(z, dz), (y + dy) % ny, 0, 0)
    j_specs = [
        pl.BlockSpec(
            (1, 1, NPLANE, Wj),
            functools.partial(jmap, dz=dz, dy=dy),
            memory_space=pltpu.VMEM,
        )
        for dz, dy in _OFFS
    ]
    out_spec = pl.BlockSpec(
        (1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _lj_lanej_kernel,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        compute_macro=compute_macro,
        hx=hx,
        sentinel=sentinel,
        fast_recip=fast_recip,
        defer=defer,
        out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), out_dtype),
        interpret=interpret,
    )(r_i, *([r_j] * 9))
    scal = out[:, :, 3, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    vir = jnp.sum(scal[..., 1])
    return out, u6, vir


def _lj_n3l_kernel(
    i_ref,
    j0_ref,
    jp_ref,
    f_ref,
    jacc_ref,
    *,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    compute_macro: bool,
    hx: int,
    sentinel: bool,
    fast_recip: bool,
    pj: int,
    out_dtype,
):
    """Newton-3rd-law z-banded kernel: 5 row offsets instead of 9.

    The reference halves pair work with forward-neighbor C08 offsets +
    force exchange (C08BasedTraversals.h:122-126); round 1 recomputed
    both directions because the j-force scatter looked expensive.  This
    kernel gets N3L without any scatter: each program owns z-plane z and
    evaluates only the offsets {(dz=0,dy=0) self, (0,+1), (1,-1), (1,0),
    (1,+1)}; the j-side forces (-sum over i of the pair force) are
    accumulated into a second output `jacc` indexed by the *j* row --
    rows of plane z at slot 0, rows of plane z+1 at slot 1 -- and folded
    onto the force field afterwards by pure slicing/rolling in XLA (the
    jacc block for program z is private, so there are no cross-program
    write races; TPU grids execute sequentially anyway).

    Per-offset math is restructured around ONE selector matmul: the
    [pj, win] j tile (with the window x-origin folded into its x row) is
    contracted with a per-tile matrix Baug [pj, 4*txc] whose blocks
    produce dx, dy, dz (and the validity broadcast) directly:
      D[:, c*txc+l] = (i_c[l] - j_c[w])        for c in {x,y,z}
    using the j validity row as the carrier of the i-side constants
    (valid==1 for every real slot; invalid slots are masked anyway).
    This replaces the three per-plane broadcast matmuls AND the three
    vector subtractions of the jt kernel.  The j-side force sums ride
    one K=3*txc matmul; the [win,4] result transposes to lane-major via
    the identity-matmul trick.

    Requires nz >= 3 and ny >= 3 (with 2 planes, z+1 == z-1 and pairs
    would be double-counted).
    """
    _bx, by, bz = box
    txc = tx * cap
    win = (tx + 2 * hx) * cap
    n_tiles = nx // tx

    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)

    sub4 = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, 1), 0)
    ohr = [(sub4 == c).astype(out_dtype) for c in range(NPLANE)]

    clx = _bx / nx
    cly = by / ny
    clz = bz / nz

    # validity-row index in the j tile used to carry the i-side
    # constants into the D matmul (valid == 1 for every real slot)
    VROW = 3
    nblk = 3 if sentinel else 4
    NW = nblk * txc

    wlT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 0)
    ilT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 1)
    not_selfT = wlT != ilT + hx * cap

    # window x-origin per j slot, folded into the j x row: [pj, win]
    subP_w = jax.lax.broadcasted_iota(jnp.int32, (pj, win), 0)
    wlane = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
    xoffw = (subP_w == 0).astype(out_dtype) * (
        (wlane // cap).astype(out_dtype) * clx
    )

    # Baug scaffolding: rows 0..2 put -1 on their own coordinate block
    # (-> -j_c); row VROW carries [xi_w | yis | zis (| 1)] (-> +i_c)
    subP_N = jax.lax.broadcasted_iota(jnp.int32, (pj, NW), 0)
    laneN = jax.lax.broadcasted_iota(jnp.int32, (pj, NW), 1)
    blkN = laneN // txc
    negP = -((subP_N == blkN) & (blkN < 3)).astype(out_dtype)
    vrowN = (subP_N == VROW).astype(out_dtype)

    # i-lane window x coordinate offset [1, txc]
    lane_txc = jax.lax.broadcasted_iota(jnp.int32, (1, txc), 1)
    xoffi = ((lane_txc // cap) + hx).astype(out_dtype) * clx
    lane0 = (lane_txc == 0).astype(out_dtype)
    lane1 = (lane_txc == 1).astype(out_dtype)
    ones_i = jnp.ones((1, txc), out_dtype)

    # j-force column selector [3*txc, NPLANE] and transpose identity
    subS = jax.lax.broadcasted_iota(jnp.int32, (3 * txc, NPLANE), 0)
    laneS = jax.lax.broadcasted_iota(jnp.int32, (3 * txc, NPLANE), 1)
    Ssel = ((subS // txc) == laneS).astype(out_dtype)
    iw = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0)
    jw = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1)
    identW = (iw == jw).astype(out_dtype)

    # (dz, dy, jslot, weight, do_fj); jslot: 0 = own plane, 1 = z+1
    offsets = (
        (0, 0, 0, 0.5, False),
        (0, 1, 0, 1.0, True),
        (1, -1, 1, 1.0, True),
        (1, 0, 1, 1.0, True),
        (1, 1, 1, 1.0, True),
    )

    jacc_ref[...] = jnp.zeros(jacc_ref.shape, out_dtype)

    def yrow(y, _):
        def tile(t, __):
            off = pl.multiple_of(t * txc, txc)
            ti = i_ref[0, y, :, pl.ds(off, txc)]  # [4, txc]
            u6_t = jnp.zeros((), out_dtype)
            vir_t = jnp.zeros((), out_dtype)

            xi = jnp.sum(ti * ohr[0], axis=0, keepdims=True) + xoffi
            yi = jnp.sum(ti * ohr[1], axis=0, keepdims=True)
            zi = jnp.sum(ti * ohr[2], axis=0, keepdims=True)
            if not sentinel:
                wi = jnp.sum(ti * ohr[3], axis=0, keepdims=True)
            fx = jnp.zeros((1, txc), out_dtype)
            fy = jnp.zeros((1, txc), out_dtype)
            fz = jnp.zeros((1, txc), out_dtype)

            for dzi, dy, jslot, wgt, do_fj in offsets:
                jref = j0_ref if dzi == 0 else jp_ref
                yj = jax.lax.rem(y + dy + ny, ny)
                H = jref[0, yj, :, pl.ds(off, win)]  # [pj, win]
                Hs = H + xoffw
                yis = yi - jnp.asarray(dy * cly, out_dtype)
                zis = zi - jnp.asarray(dzi * clz, out_dtype)
                # Baug row VROW = [xi | yis | zis (| 1)] across blocks
                ivals = [xi, yis, zis]
                if not sentinel:
                    ivals.append(ones_i)
                irow = jnp.concatenate(ivals, axis=1)  # [1, NW]
                Baug = negP + vrowN * irow
                D = jax.lax.dot_general(
                    Hs, Baug, (((0,), (0,)), ((), ())),
                    preferred_element_type=out_dtype,
                )  # [win, NW]: blocks dx, dyv, dzv (, wj)
                dx = D[:, :txc]
                dyv = D[:, txc : 2 * txc]
                dzv = D[:, 2 * txc : 3 * txc]
                dr2 = dx * dx + dyv * dyv + dzv * dzv
                mask = dr2 < cut2
                if not sentinel:
                    wj = D[:, 3 * txc :]
                    mask = mask & (wj * wi > 0.5)
                if dzi == 0 and dy == 0:
                    mask = mask & not_selfT
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
                if compute_macro:
                    w_ = jnp.asarray(wgt, out_dtype)
                    u6_t = u6_t + w_ * jnp.sum(e24 * lj12m6 + sh6 * mf)
                    vir_t = vir_t + w_ * jnp.sum(fac * dr2)
                fac3 = jnp.concatenate([fac, fac, fac], axis=1)
                pf = D[:, : 3 * txc] * fac3  # [win, 3*txc]
                psum = jnp.sum(pf, axis=0, keepdims=True)  # [1, 3*txc]
                fx = fx + psum[:, :txc]
                fy = fy + psum[:, txc : 2 * txc]
                fz = fz + psum[:, 2 * txc :]
                if do_fj:
                    fjP = jax.lax.dot_general(
                        pf, Ssel, (((1,), (0,)), ((), ())),
                        preferred_element_type=out_dtype,
                    )  # [win, 4]; column 3 is zero
                    fjT = jax.lax.dot_general(
                        fjP, identW, (((0,), (0,)), ((), ())),
                        preferred_element_type=out_dtype,
                    )  # [4, win]
                    row = jslot * ny + yj
                    cur = jacc_ref[0, row, :, pl.ds(off, win)]
                    jacc_ref[0, row, :, pl.ds(off, win)] = cur - fjT

            scal = u6_t * lane0 + vir_t * lane1
            out4 = ohr[0] * fx + ohr[1] * fy + ohr[2] * fz + ohr[3] * scal
            f_ref[0, y, :, pl.ds(off, txc)] = out4
            return __

        jax.lax.fori_loop(0, n_tiles, tile, 0)
        return _

    jax.lax.fori_loop(0, ny, yrow, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "eps24", "sig2", "shift6",
        "rc2", "interpret", "compute_macro", "hx", "sentinel", "fast_recip",
    ),
)
def lj_cell_forces_pallas_n3l(
    r_i: jnp.ndarray,  # [nz, ny, 4, nx*cap]
    r_j: jnp.ndarray,  # [nz, ny, pj, Wj]: x halo only, cell-local coords
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    compute_macro: bool = True,
    hx: int = HX,
    sentinel: bool = False,
    fast_recip: bool = False,
):
    """Newton-3rd-law variant of lj_cell_forces_pallas_zb: 5 offsets
    instead of 9 (the C08 forward-pair idea, C08BasedTraversals.h:122,
    realized without scatter: j-side forces accumulate into a second
    output indexed by j row, folded here by slicing + one z roll).

    Same contract as the other kernels: returns (out [nz,ny,4,nx*cap]
    with force planes 0..2 and u6/virial one-hots in plane 3; u6; vir).
    Energies/virial are counted once per pair (not halved).  Requires
    cell-local coordinates, nz >= 3, ny >= 3."""
    Wj = (nx + 2 * hx) * cap
    pj = r_j.shape[2]
    assert r_i.shape == (nz, ny, NPLANE, nx * cap), r_i.shape
    assert r_j.shape == (nz, ny, pj, Wj) and pj >= NPLANE, r_j.shape
    assert nx % tx == 0
    assert nz >= 3 and ny >= 3, "N3L kernel needs nz>=3, ny>=3"
    assert nx >= 2 * hx
    if not interpret:
        assert (tx * cap) % 128 == 0
    out_dtype = r_i.dtype

    i_spec = pl.BlockSpec(
        (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    j_specs = [
        pl.BlockSpec(
            (1, ny, pj, Wj),
            functools.partial(lambda z, dz: ((z + dz) % nz, 0, 0, 0), dz=dz),
            memory_space=pltpu.VMEM,
        )
        for dz in (0, 1)
    ]
    out_specs = [
        pl.BlockSpec(
            (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 2 * ny, NPLANE, Wj), lambda z: (z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _lj_n3l_kernel,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        compute_macro=compute_macro,
        hx=hx,
        sentinel=sentinel,
        fast_recip=fast_recip,
        pj=pj,
        out_dtype=out_dtype,
    )
    out, jacc = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[i_spec] + j_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), out_dtype),
            jax.ShapeDtypeStruct((nz, 2 * ny, NPLANE, Wj), out_dtype),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(r_i, r_j, r_j)

    # fold the j-side accumulations back onto the force field
    jacc = jacc.reshape(nz, 2, ny, NPLANE, Wj)

    def foldx(a):
        main = a[..., hx * cap : (nx + hx) * cap]
        left = a[..., : hx * cap]
        right = a[..., (nx + hx) * cap :]
        main = main.at[..., (nx - hx) * cap :].add(left)
        main = main.at[..., : hx * cap].add(right)
        return main

    out = out + foldx(jacc[:, 0]) + jnp.roll(foldx(jacc[:, 1]), 1, axis=0)
    scal = out[:, :, 3, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    vir = jnp.sum(scal[..., 1])
    return out, u6, vir


def _lj_zb_kernel(
    i_ref,
    jm_ref,
    j0_ref,
    jp_ref,
    f_ref,
    *,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    compute_macro: bool,
    hx: int,
    sentinel: bool,
    fast_recip: bool,
    gram: bool,
    pj: int,
    out_dtype,
):
    """z-banded jt kernel: one program per z plane; the three j z-planes
    (below/own/above) live in VMEM whole, so each j row is fetched from
    HBM once per neighboring plane (3x total) instead of once per
    neighboring (z,y) row (9x).  The j view carries `pj` planes (pad to
    a full 8-sublane tile so every dynamic y-row slice is tile-aligned;
    pj=4 packs two y rows per sublane tile and odd rows pay a shift).
    Layout, masks and physics otherwise match the jt branch of
    _lj_row_kernel (cell-local coordinates; periodicity is pure index
    arithmetic).

    gram=True moves the pair-matrix distance and force reductions onto
    the (otherwise idle) MXU:
      dr2 = |ri|^2 + |rj|^2 - 2 ri.rj   with the cross term and the
      broadcast |rj|^2 as K=pj matmuls (replacing the three per-plane
      broadcasts AND the dx/dy/dz arithmetic), and
      F_i = ri * sum_j fac - sum_j fac*rj  with sum_j fac*rj as one
      K=win matmul of the j planes against fac (replacing three
      multiply+lane-reduce passes).  Coordinates are TILE-local (window
      origin) so the f32 cancellation in the Gram form stays ~1e-4 of
      dr2; sentinel mode is excluded (sentinel magnitudes would
      catastrophically cancel), so the validity plane is used."""
    _bx, by, bz = box
    txc = tx * cap
    win = (tx + 2 * hx) * cap
    n_tiles = nx // tx

    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)

    sub4 = jax.lax.broadcasted_iota(jnp.int32, (NPLANE, 1), 0)
    ohr = [(sub4 == c).astype(out_dtype) for c in range(NPLANE)]

    clx = _bx / nx
    cly = by / ny
    clz = bz / nz
    subPc = jax.lax.broadcasted_iota(jnp.int32, (pj, txc), 0)
    Bsel = [(subPc == c).astype(out_dtype) for c in range(NPLANE)]
    wlT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 0)
    ilT = jax.lax.broadcasted_iota(jnp.int32, (win, txc), 1)
    not_selfT = wlT != ilT + hx * cap
    xoffT = ((ilT // cap) - (wlT // cap) + hx).astype(out_dtype) * clx

    lane_txc = jax.lax.broadcasted_iota(jnp.int32, (1, txc), 1)
    lane0 = (lane_txc == 0).astype(out_dtype)
    lane1 = (lane_txc == 1).astype(out_dtype)

    if gram:
        # tile-window-local coordinate offsets and selector constants
        subPc1 = jax.lax.broadcasted_iota(jnp.int32, (pj, 1), 0)
        ohrP = [(subPc1 == c).astype(out_dtype) for c in range(NPLANE)]
        wlane = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
        # fold the window cell offset into the j x plane
        xoffw_p = ohrP[0] * ((wlane // cap).astype(out_dtype) * clx)
        # ones on planes 0..2 against the i lanes (|rj|^2 broadcast)
        subPcT = jax.lax.broadcasted_iota(jnp.int32, (pj, txc), 0)
        ones3P = (subPcT < 3).astype(out_dtype)
        # i-lane x offset inside the window
        xoffi = ((lane_txc // cap) + hx).astype(out_dtype) * clx

    def yrow(y, _):
        def tile(t, __):
            off = pl.multiple_of(t * txc, txc)
            ti = i_ref[0, y, :, pl.ds(off, txc)]  # [4, txc]
            u6_t = jnp.zeros((), out_dtype)
            vir_t = jnp.zeros((), out_dtype)

            xi = jnp.sum(ti * ohr[0], axis=0, keepdims=True)
            yi = jnp.sum(ti * ohr[1], axis=0, keepdims=True)
            zi = jnp.sum(ti * ohr[2], axis=0, keepdims=True)
            if not sentinel:
                wi = jnp.sum(ti * ohr[3], axis=0, keepdims=True)
            if gram:
                xi_t = xi + xoffi
            fx = jnp.zeros((1, txc), out_dtype)
            fy = jnp.zeros((1, txc), out_dtype)
            fz = jnp.zeros((1, txc), out_dtype)
            for dzi, jref in ((-1, jm_ref), (0, j0_ref), (1, jp_ref)):
                for dy in (-1, 0, 1):
                    # periodic y wrap is pure index arithmetic: values
                    # are cell-local, so no +-L shift is ever needed
                    yj_row = jax.lax.rem(y + dy + ny, ny)
                    H = jref[0, yj_row, :, pl.ds(off, win)]  # [pj, win]

                    def jplane(c):
                        return jax.lax.dot_general(
                            H, Bsel[c], (((0,), (0,)), ((), ())),
                            preferred_element_type=out_dtype,
                        )  # [win, txc]

                    yis = yi - jnp.asarray(dy * cly, out_dtype)
                    zis = zi - jnp.asarray(dzi * clz, out_dtype)
                    if gram:
                        Hs = H + xoffw_p  # window-local j coordinates
                        R = ohrP[0] * xi_t + ohrP[1] * yis + ohrP[2] * zis
                        cross = jax.lax.dot_general(
                            Hs, R, (((0,), (0,)), ((), ())),
                            preferred_element_type=out_dtype,
                        )  # [win, txc] = rj . ri
                        SJ = jax.lax.dot_general(
                            Hs * Hs, ones3P, (((0,), (0,)), ((), ())),
                            preferred_element_type=out_dtype,
                        )  # [win, txc] = |rj|^2 broadcast
                        si = xi_t * xi_t + yis * yis + zis * zis
                        dr2 = (SJ + si) - (cross + cross)
                        mask = dr2 < cut2
                        Wj = jplane(3)
                        mask = mask & (Wj * wi > 0.5)
                    else:
                        Xj = jplane(0)
                        Yj = jplane(1)
                        Zj = jplane(2)
                        Wj = None if sentinel else jplane(3)
                        dx = xi - Xj + xoffT
                        dyv = yis - Yj
                        dzv = zis - Zj
                        dr2 = dx * dx + dyv * dyv + dzv * dzv
                        mask = dr2 < cut2
                        if not sentinel:
                            mask = mask & (Wj * wi > 0.5)
                    if dzi == 0 and dy == 0:
                        mask = mask & not_selfT
                    if fast_recip:
                        den = jnp.where(
                            mask, dr2, jnp.asarray(1e30, out_dtype)
                        )
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
                    if compute_macro:
                        u6_t = u6_t + jnp.sum(e24 * lj12m6 + sh6 * mf)
                        vir_t = vir_t + jnp.sum(fac * dr2)
                    if gram:
                        # F_i = ri*sum_j fac - sum_j fac*rj; the j sums
                        # ride ONE K=win matmul (row 3 = validity gives
                        # sum fac: masked pairs have fac == 0)
                        S4 = jax.lax.dot_general(
                            Hs, fac, (((1,), (0,)), ((), ())),
                            preferred_element_type=out_dtype,
                        )  # [pj, txc]

                        def rowP(c):
                            return jnp.sum(
                                S4 * ohrP[c], axis=0, keepdims=True
                            )

                        S0 = rowP(3)
                        fx = fx + (xi_t * S0 - rowP(0))
                        fy = fy + (yis * S0 - rowP(1))
                        fz = fz + (zis * S0 - rowP(2))
                    else:
                        fx = fx + jnp.sum(fac * dx, axis=0, keepdims=True)
                        fy = fy + jnp.sum(fac * dyv, axis=0, keepdims=True)
                        fz = fz + jnp.sum(fac * dzv, axis=0, keepdims=True)
            scal = (0.5 * u6_t) * lane0 + (0.5 * vir_t) * lane1
            out4 = ohr[0] * fx + ohr[1] * fy + ohr[2] * fz + ohr[3] * scal
            f_ref[0, y, :, pl.ds(off, txc)] = out4
            return __

        jax.lax.fori_loop(0, n_tiles, tile, 0)
        return _

    jax.lax.fori_loop(0, ny, yrow, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "eps24", "sig2", "shift6",
        "rc2", "interpret", "compute_macro", "hx", "sentinel", "fast_recip",
        "gram",
    ),
)
def lj_cell_forces_pallas_zb(
    r_i: jnp.ndarray,  # [nz, ny, 4, nx*cap]
    r_j: jnp.ndarray,  # [nz, ny, 4, (nx+2*hx)*cap]: x halo only
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    compute_macro: bool = True,
    hx: int = HX,
    sentinel: bool = False,
    fast_recip: bool = False,
    gram: bool = False,
):
    """z-banded variant of lj_cell_forces_pallas (jt + local-coords
    modes only): grid over z planes, the 3 neighbor z-planes held whole
    in VMEM.  Cuts j HBM traffic from 9x the array to 3x -- the row
    kernel is DMA-bound at the ~27 GB/s throttled bandwidth, so the
    fetch reduction is the dominant lever.  Periodicity costs nothing:
    values are cell-local (no +-L shift), so the z wrap rides the
    BlockSpec index-map mod and the y wrap is a scalar index mod in the
    kernel -- no halo planes are ever materialized.

    r_j may carry MORE than 4 planes (e.g. the RMM state's full 8):
    extra planes are ignored, and a multiple-of-8 plane count makes
    every dynamic y-row slice sublane-tile aligned (pj=4 packs two y
    rows per tile; odd rows then pay a per-load shift)."""
    Wj = (nx + 2 * hx) * cap
    pj = r_j.shape[2]
    assert r_i.shape == (nz, ny, NPLANE, nx * cap), r_i.shape
    assert r_j.shape == (nz, ny, pj, Wj) and pj >= NPLANE, r_j.shape
    assert nx % tx == 0
    assert not (gram and sentinel), (
        "gram mode needs the validity plane: sentinel magnitudes "
        "catastrophically cancel in the |ri|^2+|rj|^2-2ri.rj form"
    )
    if not interpret:
        assert (tx * cap) % 128 == 0
    i_spec = pl.BlockSpec(
        (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    j_specs = [
        pl.BlockSpec(
            (1, ny, pj, Wj),
            functools.partial(
                lambda z, dz: ((z + dz) % nz, 0, 0, 0), dz=dz
            ),
            memory_space=pltpu.VMEM,
        )
        for dz in (-1, 0, 1)
    ]
    out_spec = pl.BlockSpec(
        (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _lj_zb_kernel,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        compute_macro=compute_macro,
        hx=hx,
        sentinel=sentinel,
        fast_recip=fast_recip,
        gram=gram,
        pj=pj,
        out_dtype=r_i.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), r_i.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(r_i, r_j, r_j, r_j)
    scal = out[:, :, 3, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    vir = jnp.sum(scal[..., 1])
    return out, u6, vir


def _lj_cw_kernel(
    i_ref,
    *refs,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    compute_macro: bool,
    sentinel: bool,
    fast_recip: bool,
    compute_vi: bool,
    out_dtype,
):
    """Cell-window kernel: per-i-CELL j windows instead of per-tile.

    The row/lanej kernels pair every i slot of a tx-cell tile against
    the whole (tx+2)-cell window -- at tx=4, cap=32 that is 256
    candidate lanes per i of which only the 3 cells around i's own cell
    (96 slots) can ever be inside the cutoff.  This kernel restores
    per-cell windows: the tile's i slots are processed as tx groups of
    `cap` sublanes (one cell each), and group g's pair block is
    [cap, 4*cap] against that cell's own window.  The 4th window cell
    (x-distance >= one cell edge >= rc) never passes the cutoff test --
    it is alignment padding with correct physics.  Candidate lanes per
    i drop 2x (256 -> 128 at cap=32); the group blocks are natural
    [cap, 1] x [1, 4*cap] VPU broadcasts, and no coordinate ever rides
    a matmul (exact at every precision).

    Alignment: group g's window starts g*cap lanes into the row -- a
    MISALIGNED lane slice that measured ~45% of the step when taken
    in-kernel (tools/ablate_cw.py: 213 ms vs 118 with aligned reads).
    The caller therefore pre-stacks 4 phase-shifted copies of the j row
    (phase g = the row advanced by g*cap lanes) so every in-kernel read
    is ds(t*txc, 4*cap) at a 128-multiple offset.  The copies cost one
    fused XLA shift-stack (HBM-bandwidth, ~2 ms at N=4.2M) against the
    ~95 ms of in-register shuffling they remove.

    Requires cell-local coordinates and min cell edge >= rc (both
    already required by the RMM sentinel path).
    """
    row_refs = refs[:9]
    f_ref = refs[9]
    _bx, by, bz = box
    txc = tx * cap
    gw = 4 * cap  # group window lanes
    n_tiles = nx // tx

    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, NPLANE), 1)
    oh = [(lane4 == c).astype(out_dtype) for c in range(NPLANE)]

    cly = by / ny
    clz = bz / nz
    clx = _bx / nx
    # window lane l covers cell (g-1) + l//cap relative to i's cell g
    lgw = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
    xoff = (1 - lgw // cap).astype(out_dtype) * jnp.asarray(clx, out_dtype)
    # center-row self pair: same cell (l//cap == 1), same slot
    sgw = jax.lax.broadcasted_iota(jnp.int32, (cap, gw), 0)
    not_self = (lgw // cap != 1) | (lgw % cap != sgw)

    def tile(t, _):
        off = pl.multiple_of(t * txc, txc)
        ti = i_ref[0, 0, :, pl.ds(off, txc)]  # [4, txc]
        G = ti.T  # [txc, 4] exact Mosaic transpose
        xi = jnp.sum(G * oh[0], axis=1, keepdims=True)  # [txc, 1]
        yi = jnp.sum(G * oh[1], axis=1, keepdims=True)
        zi = jnp.sum(G * oh[2], axis=1, keepdims=True)
        if not sentinel:
            wi = jnp.sum(G * oh[3], axis=1, keepdims=True)

        u6_t = jnp.zeros((), out_dtype)
        vir_t = jnp.zeros((), out_dtype)
        fcols = []
        for g in range(tx):
            s0 = g * cap
            xg = xi[s0 : s0 + cap]  # [cap, 1]
            yg = yi[s0 : s0 + cap]
            zg = zi[s0 : s0 + cap]
            if not sentinel:
                wg = wi[s0 : s0 + cap]
            ax = jnp.zeros((cap, gw), out_dtype)
            ay = jnp.zeros((cap, gw), out_dtype)
            az = jnp.zeros((cap, gw), out_dtype)
            if compute_macro:
                au = jnp.zeros((cap, gw), out_dtype)
                av = jnp.zeros((cap, gw), out_dtype)
            if compute_vi:
                # per-slot per-axis virial Vi_a = 0.5 sum f_a * dr_a
                # (FullMolecule::Vi, read by GammaWriter/pressure
                # profiles -- VectorizedCellProcessor.h:140-186)
                avx = jnp.zeros((cap, gw), out_dtype)
                avy = jnp.zeros((cap, gw), out_dtype)
                avz = jnp.zeros((cap, gw), out_dtype)
            for k, (dz, dy) in enumerate(_OFFS):
                # phase-g copy: group g's window at an aligned offset
                Hw = row_refs[k][g, 0, 0, :, pl.ds(off, gw)]  # [4, gw]
                xj = Hw[0:1]  # [1, gw] static sublane slices
                yj = Hw[1:2]
                zj = Hw[2:3]
                dx = (xg - xj) + xoff  # [cap, gw]
                dyv = (yg - jnp.asarray(dy * cly, out_dtype)) - yj
                dzv = (zg - jnp.asarray(dz * clz, out_dtype)) - zj
                dr2 = dx * dx + dyv * dyv + dzv * dzv
                mask = dr2 < cut2
                if not sentinel:
                    mask = mask & (wg * Hw[3:4] > 0.5)
                if k == _CENTER:
                    mask = mask & not_self
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
                fxc = fac * dx
                fyc = fac * dyv
                fzc = fac * dzv
                ax = ax + fxc
                ay = ay + fyc
                az = az + fzc
                if compute_vi:
                    avx = avx + fxc * dx
                    avy = avy + fyc * dyv
                    avz = avz + fzc * dzv
                if compute_macro:
                    au = au + (e24 * lj12m6 + sh6 * mf)
                    av = av + fac * dr2
            fxg = jnp.sum(ax, axis=1, keepdims=True)  # [cap, 1]
            fyg = jnp.sum(ay, axis=1, keepdims=True)
            fzg = jnp.sum(az, axis=1, keepdims=True)
            if compute_macro:
                u6_t = u6_t + jnp.sum(au)
                vir_t = vir_t + jnp.sum(av)
            cols = [fxg, fyg, fzg]
            if compute_vi:
                cols += [
                    0.5 * jnp.sum(avx, axis=1, keepdims=True),
                    0.5 * jnp.sum(avy, axis=1, keepdims=True),
                    0.5 * jnp.sum(avz, axis=1, keepdims=True),
                ]
            fcols.append(jnp.concatenate(cols, axis=1))
        Fcat = jnp.concatenate(fcols, axis=0)  # [txc, 3|6]
        scal_col = (0.5 * u6_t) * (
            jax.lax.broadcasted_iota(jnp.int32, (txc, 1), 0) == 0
        ).astype(out_dtype) + (0.5 * vir_t) * (
            jax.lax.broadcasted_iota(jnp.int32, (txc, 1), 0) == 1
        ).astype(out_dtype)
        if compute_vi:
            # plane order: fx fy fz scal vix viy viz pad
            z1 = jnp.zeros((txc, 1), out_dtype)
            Fcat = jnp.concatenate(
                [Fcat[:, :3], scal_col, Fcat[:, 3:6], z1], axis=1
            )  # [txc, 8]
        else:
            Fcat = jnp.concatenate([Fcat, scal_col], axis=1)  # [txc, 4]
        f_ref[0, 0, :, pl.ds(off, txc)] = Fcat.T
        return _

    jax.lax.fori_loop(0, n_tiles, tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "eps24", "sig2", "shift6",
        "rc2", "interpret", "z_halo", "compute_macro", "sentinel",
        "fast_recip", "compute_vi",
    ),
)
def lj_cell_forces_pallas_cw(
    r_i: jnp.ndarray,  # [nz, ny, 4, nx*cap]
    r_j: jnp.ndarray,  # [nz(+2), ny, 4, (nx+4)*cap]: 1 left + 3 right x-halo cells
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    z_halo: bool = False,
    compute_macro: bool = True,
    sentinel: bool = False,
    fast_recip: bool = False,
    compute_vi: bool = False,
):
    """Cell-window variant (see _lj_cw_kernel).  Cell-local coordinates
    only; min cell edge >= rc.  Same output contract as the other
    kernels; compute_vi=True widens the output to 8 planes
    [fx fy fz scal vix viy viz pad] carrying the per-slot per-axis
    virial (0.5 sum f_a dr_a -- the FullMolecule::Vi GammaWriter
    reads, VectorizedCellProcessor.h:140-186; +3 FMA/pair-lane, so it
    is opt-in for Vi-consuming plugins)."""
    Wj = (nx + 4) * cap
    nzj = nz + 2 if z_halo else nz
    assert r_i.shape == (nz, ny, NPLANE, nx * cap), r_i.shape
    assert r_j.shape == (nzj, ny, NPLANE, Wj), r_j.shape
    assert nx % tx == 0 and nx >= 3
    cl2 = min(box[0] / nx, box[1] / ny, box[2] / nz) ** 2
    assert cl2 >= rc2, ("cw kernel requires cell edge >= rc", cl2, rc2)
    if not interpret:
        assert (tx * cap) % 128 == 0
        assert (4 * cap) % 128 == 0, "cw kernel needs 4*cap % 128 == 0"
    out_dtype = r_i.dtype

    # phase-shifted j copies: phase g advanced by g*cap lanes so group
    # g's in-kernel window reads are 128-aligned (see kernel doc).
    # Width: the last tile's group-g window ends at
    # (nx/tx-1)*txc + 4*cap = (nx + 4 - tx)*cap lanes into the phase.
    Pw = (nx + max(0, 4 - tx)) * cap
    P = jnp.stack(
        [r_j[:, :, :, g * cap : g * cap + Pw] for g in range(tx)]
    )  # [tx, nzj, ny, 4, Pw]

    i_spec = pl.BlockSpec(
        (1, 1, NPLANE, nx * cap), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zmap = (lambda z, dz: z + dz + 1) if z_halo else (lambda z, dz: (z + dz) % nz)
    jmap = lambda z, y, dz, dy: (0, zmap(z, dz), (y + dy) % ny, 0, 0)
    j_specs = [
        pl.BlockSpec(
            (tx, 1, 1, NPLANE, Pw),
            functools.partial(jmap, dz=dz, dy=dy),
            memory_space=pltpu.VMEM,
        )
        for dz, dy in _OFFS
    ]
    nout = 8 if compute_vi else NPLANE
    out_spec = pl.BlockSpec(
        (1, 1, nout, nx * cap), lambda z, y: (z, y, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _lj_cw_kernel,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        compute_macro=compute_macro,
        sentinel=sentinel,
        fast_recip=fast_recip,
        compute_vi=compute_vi,
        out_dtype=out_dtype,
    )
    n_pairs = nz * ny * nx * cap * 9 * 4 * cap
    out = pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, nout, nx * cap), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=26 * n_pairs,
            bytes_accessed=(9 * tx + 2) * nx * cap * NPLANE * nz * ny * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(r_i, *([P] * 9))
    scal = out[:, :, 3, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    vir = jnp.sum(scal[..., 1])
    return out, u6, vir


def _lj_cwn3l_kernel(
    *refs,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    compute_macro: bool,
    sentinel: bool,
    fast_recip: bool,
    newton: bool,
    gsub: int,
    prefix: int,
    skip_tail: bool,
    pack: bool,
    ablate: str,
    Pw: int,
    out_dtype,
):
    """Newton-3rd-law cell-window kernel: 5 forward row offsets instead
    of 9 (the C08 forward-pair idea, /root/reference/src/
    particleContainer/LinkedCellTraversals/C08BasedTraversals.h:122-126)
    on the cw group geometry.

    gsub splits each [cap, gw] group block into cap/gsub-sublane
    slabs so the live set (3 force accumulators + the coordinate and
    LJ chains, ~50+ vregs at cap=32) fits the VPU register file.

    Measured dead end (2026-08-18, unthrottled chip, N=4.2M,
    interleaved A/B): offloading the force reductions to the MXU as
    fi = ri'*S - fac @ [xj;yj;zj;1]^T dots ran 118.7 ms/step vs 81.0
    for the VPU reductions -- each dot has N=4 output columns (3% MXU
    lane utilization) and exact-f32 needs 6 passes, so the ~10 VPU
    slots/pair saved cost ~90 ms of MXU time.  (The mode validated to
    4e-13 in f64 interpret before removal; see git history.)

    Each program owns z-plane z.  Row offsets: (dz=0,dy=0) forward-x +
    self-cell j>i half, (0,+1), (1,-1), (1,0), (1,+1).  The j-side
    forces (-pair force) cannot be written at the pair site without
    misaligned stores, so they accumulate into PHASE-SEPARATED VMEM
    scratch planes (sown: own z-plane targets, sup: z+1 targets), each
    [tx, ny, 4, Pw] indexed exactly like the phase-stacked j input --
    every store is an aligned ds(t*txc, 4*cap) slice of phase g.  At
    program end the phases are shifted back (static once-per-program
    lane shifts), the periodic x halo is folded, and the own-plane sum
    joins the i-side forces in this program's output block; the z+1
    plane is emitted to a second output folded by the caller with one
    z-roll.  Energies/virial are counted once per pair (not halved).

    Occupancy skipping (prefix < cap, skip_tail=True): cells are
    FRONT-PACKED (bin_by_id and the shift-merge rebin both emit valid
    slots contiguously from slot 0), so i slots >= occ(cell) are empty
    and their whole pair blocks are exact zeros.  The i slots of each
    cell are processed as a dense [prefix, gw] block plus
    (cap-prefix)/8 tail slabs of 8 sublanes, each guarded by
    pl.when(occ > slot_offset) on a scalar per-cell occupancy count
    (SMEM input).  At the bench geometry (mean occ 19.4 of cap=32,
    sub-Poissonian spread ~1.5) prefix=24 skips the 4th slab for ~99.6%
    of cells -- a ~25% cut in i-side pair lanes.  Tail-slab
    i forces ride a VMEM scratch ([8,128] aligned stores) because
    pl.when regions cannot return register values.  The reference's
    analogue is simply that its cell loops run over the actual
    molecule count (VectorizedCellProcessor.cpp:797 loops over
    soa._mol_num, not a capacity).

    MEASURED RESULT (tools/ab_skip.py, TPU v5e, 2026-08-18): SLOWER
    than dense -- 65.2 ms dense vs 73.7 ms prefix=24 vs 94.2 ms
    prefix=16 at the bench geometry.  The per-group pl.when branches
    and the scratch zero-fill + read-back cost more than the skipped
    slabs save.  Kept as a tested opt-in experiment (off by default,
    RMMSimulation.cw_skip=False); the dense kernel remains the
    production path.
    """
    if skip_tail:
        i_ref, j0_ref, jp_ref, occ_ref = refs[:4]
        f_ref, up_ref = refs[4:6]
        oi_ref, ft_ref, sown_ref, sup_ref = refs[6:]
        spk_ref = None
    elif pack:
        i_ref, j0_ref, jp_ref = refs[:3]
        f_ref, up_ref = refs[3:5]
        oi_ref, spk_ref = refs[5:]
        occ_ref = None
        ft_ref = None
        sown_ref = sup_ref = None
    else:
        i_ref, j0_ref, jp_ref = refs[:3]
        f_ref, up_ref = refs[3:5]
        oi_ref, sown_ref, sup_ref = refs[5:]
        occ_ref = None
        ft_ref = None
        spk_ref = None
    TAIL = 8
    tail_n = (cap - prefix) // TAIL
    _bx, by, bz = box
    txc = tx * cap
    gw = 4 * cap
    n_tiles = nx // tx
    Wj = (nx + 4) * cap

    e24 = jnp.asarray(eps24, out_dtype)
    s2 = jnp.asarray(sig2, out_dtype)
    sh6 = jnp.asarray(shift6, out_dtype)
    cut2 = jnp.asarray(rc2, out_dtype)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, NPLANE), 1)
    oh = [(lane4 == c).astype(out_dtype) for c in range(NPLANE)]

    cly = by / ny
    clz = bz / nz
    clx = _bx / nx
    lgw = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1)
    wcell = lgw // cap  # window cell 0..3 == i-cell offset -1..+2
    xoff = (1 - wcell).astype(out_dtype) * jnp.asarray(clx, out_dtype)
    sgw = jax.lax.broadcasted_iota(jnp.int32, (cap, gw), 0)
    # center row: forward-x half -- j in cells g+1/g+2(pad) or same
    # cell with a strictly larger slot index
    fwd_mask = (wcell > 1) | ((wcell == 1) & (lgw % cap > sgw))

    # offsets evaluated: index 0 is the center (forward-x) row
    offs = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]

    # packed-window mode: the 5 row windows hold only 14 in-cutoff
    # cells (rows 1-4 never reach their 4th window cell x+2 because the
    # cell edge >= rc, and the center row only needs {x fwd-half, x+1}).
    # Re-pack those 14 cells into 4 fully dense 128-lane chunks (2 pad
    # cells), so the pair loop runs 4x128 aligned lanes per i slot
    # instead of 5x128 -- a 20% structural cut with every inner-loop op
    # still 128-aligned.
    #
    # MEASURED RESULT (tools/ab_pack.py, TPU v5e, 2026-08-19,
    # equilibrated seed state, bench grid (56,60,60)): SLOWER than
    # dense -- 77.2 ms pack vs 59.4 ms dense, parity rel 2.8e-7.  The
    # chunks are assembled in-kernel from cap(=32)-lane slices of the
    # hoisted rows; those sub-128-lane concatenates cost more than the
    # 20% lane saving, the same alignment-tax verdict as the
    # packed-pencil and occupancy-skip campaigns.  With this, every
    # structural-pruning class (row-skip, slot-skip, repack, Verlet
    # rows (tools/ab_verlet.py: gathers 1.8 GB/s -> 24x loss), MXU
    # offload, static-row-index (ablate="staty": parity)) has been
    # measured against the dense kernel and lost; dense 5x128 at the
    # VPU issue roofline is the committed production bound (README
    # "Performance").  Kept as a tested opt-in experiment.
    if pack:
        assert cap == 32 and gw == 128 and txc == 128 and not skip_tail
        PKW = 4 * gw
        n_tiles_pk = nx // tx
        # chunk pieces: (row index k, first window cell, n cells);
        # None = 2-cell pad block (x coordinate BIGPAD -> dr2 >> rc2)
        CHD = [
            [(0, 1, 2), (1, 0, 2)],
            [(1, 2, 1), (2, 0, 3)],
            [(3, 0, 3), (4, 0, 1)],
            [(4, 1, 2), None],
        ]
        BIGPAD = 1e6
        # per-lane (wcell, dy, dz) offset values per chunk, as python
        # float lists per cap-block (pallas forbids captured constant
        # arrays, so the vectors are built from the lane iota below)
        xv = [[0.0] * 4 for _ in range(4)]
        yv = [[0.0] * 4 for _ in range(4)]
        zv = [[0.0] * 4 for _ in range(4)]
        for ci, pieces in enumerate(CHD):
            pos = 0
            for p in pieces:
                if p is None:
                    pos += 2
                    continue
                k, clo, ncl = p
                dz_k, dy_k = offs[k]
                for b in range(ncl):
                    xv[ci][pos] = (1 - (clo + b)) * clx
                    yv[ci][pos] = dy_k * cly
                    zv[ci][pos] = dz_k * clz
                    pos += 1

        def _mkvec(vals):
            v = jnp.zeros((1, gw), out_dtype)
            for b, val in enumerate(vals):
                if val:
                    v = jnp.where(
                        wcell == b, jnp.asarray(val, out_dtype), v
                    )
            return v

        xoffc = [_mkvec(xv[ci]) for ci in range(4)]
        yoffc = [_mkvec(yv[ci]) for ci in range(4)]
        zoffc = [_mkvec(zv[ci]) for ci in range(4)]
        pad_iota = jax.lax.broadcasted_iota(
            jnp.int32, (NPLANE, 2 * cap), 0
        )
        pad_blk = jnp.where(
            pad_iota == 0, jnp.asarray(BIGPAD, out_dtype),
            jnp.asarray(0.0, out_dtype),
        )
        # chunk 0's first cap lanes are the i cell itself (j slot
        # strictly greater under N3L); the rest of the chunk is plain
        fwd_pk = (wcell >= 1) | (lgw % cap > sgw)

    if "nojf" not in ablate:
        if pack:
            spk_ref[...] = jnp.zeros(
                (tx, ny, NPLANE, n_tiles_pk * PKW), out_dtype
            )
        else:
            sown_ref[...] = jnp.zeros((tx, ny, NPLANE, Pw), out_dtype)
            sup_ref[...] = jnp.zeros((tx, ny, NPLANE, Pw), out_dtype)
    oi_ref[...] = jnp.zeros((ny, NPLANE, nx * cap), out_dtype)

    def yloop(y, _):
        def tile(t, _):
            off = pl.multiple_of(t * txc, txc)
            ti = i_ref[0, y, :, pl.ds(off, txc)]  # [4, txc]
            G = ti.T
            if "noonehot" in ablate:
                # ablation: skip the one-hot plane extraction (WRONG)
                xi = G[:, 0:1]
                yi = G[:, 1:2]
                zi = G[:, 2:3]
            else:
                xi = jnp.sum(G * oh[0], axis=1, keepdims=True)
                yi = jnp.sum(G * oh[1], axis=1, keepdims=True)
                zi = jnp.sum(G * oh[2], axis=1, keepdims=True)
            if not sentinel:
                wi = jnp.sum(G * oh[3], axis=1, keepdims=True)
            u6_t = jnp.zeros((), out_dtype)
            vir_t = jnp.zeros((), out_dtype)
            if skip_tail and tail_n:
                ft_ref[...] = jnp.zeros((tx * tail_n * TAIL, 128), out_dtype)
            fcols = []
            for g in range(tx):
                s0 = g * cap
                # hoist the five j-window loads for this group; fold
                # the static window-cell x offset and the periodic
                # y/z row shifts into the j coordinates here (1 op per
                # j-lane per row, amortized over the cap i-sublanes --
                # saves one [csub, gw] op per pair block)
                if pack:
                    raw = []
                    for k, (dz, dy) in enumerate(offs):
                        jref = j0_ref if dz == 0 else jp_ref
                        yw = (y + dy) % ny
                        raw.append(jref[g, 0, yw, :, pl.ds(off, gw)])
                    rows = []
                    for ci, pieces in enumerate(CHD):
                        parts = []
                        for p in pieces:
                            if p is None:
                                parts.append(pad_blk)
                            else:
                                k, clo, ncl = p
                                parts.append(
                                    raw[k][:, clo * cap:(clo + ncl) * cap]
                                )
                        Hc = jnp.concatenate(parts, axis=1)  # [4, gw]
                        xjr = Hc[0:1] - xoffc[ci]
                        yjr = Hc[1:2] + yoffc[ci]
                        zjr = Hc[2:3] + zoffc[ci]
                        rows.append((ci, 0, 0, 0, Hc, xjr, yjr, zjr))
                else:
                    rows = []
                    for k, (dz, dy) in enumerate(offs):
                        jref = j0_ref if dz == 0 else jp_ref
                        yj_row = (y + dy) % ny
                        if "staty" in ablate:
                            # ablation: static row index (PHYSICS-WRONG);
                            # attributes the dynamic-index load cost
                            yw = k
                        else:
                            yw = yj_row
                        Hw = jref[g, 0, yw, :, pl.ds(off, gw)]  # [4, gw]
                        xjr = Hw[0:1] - xoff
                        yjr = Hw[1:2] + jnp.asarray(dy * cly, out_dtype)
                        zjr = Hw[2:3] + jnp.asarray(dz * clz, out_dtype)
                        rows.append((k, dz, dy, yw, Hw, xjr, yjr, zjr))

                def slab(a, csub, macro):
                    """Pair block for this group's i slots [a, a+csub)
                    against the 5 hoisted j rows.  j-side (-) forces
                    are stored into the phase scratch; returns the
                    i-side ([csub,1] fx, fy, fz, u6, vir)."""
                    xgs = xi[s0 + a : s0 + a + csub]
                    ygs = yi[s0 + a : s0 + a + csub]
                    zgs = zi[s0 + a : s0 + a + csub]
                    if not sentinel:
                        wgs = wi[s0 + a : s0 + a + csub]
                    fwd_s = (fwd_pk if pack else fwd_mask)[a : a + csub]
                    ax = jnp.zeros((csub, gw), out_dtype)
                    ay = jnp.zeros((csub, gw), out_dtype)
                    az = jnp.zeros((csub, gw), out_dtype)
                    if macro:
                        au = jnp.zeros((csub, gw), out_dtype)
                        av = jnp.zeros((csub, gw), out_dtype)
                    for k, dz, dy, yw, Hw, xjr, yjr, zjr in rows:
                        dx = xgs - xjr
                        dyv = ygs - yjr
                        dzv = zgs - zjr
                        dr2 = dx * dx + dyv * dyv + dzv * dzv
                        mask = dr2 < cut2
                        if not sentinel:
                            mask = mask & (wgs * Hw[3:4] > 0.5)
                        if k == 0:
                            mask = mask & fwd_s
                        if "norcp" in ablate:
                            # ablation: no masking/reciprocal (WRONG)
                            invdr2 = dr2
                            mf = mask.astype(out_dtype) if macro else None
                        elif fast_recip:
                            den = jnp.where(
                                mask, dr2, jnp.asarray(1e30, out_dtype)
                            )
                            r0 = pl.reciprocal(den, approx=True)
                            if newton:
                                invdr2 = r0 * (2.0 - den * r0)
                            else:
                                # raw VPU approx reciprocal (~1e-4
                                # rel): opt-in, see RMMSimulation
                                invdr2 = r0
                            mf = mask.astype(out_dtype) if macro else None
                        else:
                            mf = mask.astype(out_dtype)
                            invdr2 = mf / jnp.where(mask, dr2, 1.0)
                        if "nolj" in ablate:
                            # ablation: skip the LJ chain (WRONG)
                            lj12m6 = invdr2
                            fac = invdr2
                        else:
                            # fac = 24eps*(2*lj12 - lj6)*invdr2
                            #     = e24*(lj6*invdr2)*(2*lj6 - 1):
                            # one op fewer than the lj12/lj12m6 form
                            lj6 = s2 * invdr2
                            lj6 = lj6 * lj6 * lj6
                            fac = (
                                e24 * (lj6 * invdr2) * (2.0 * lj6 - 1.0)
                            )
                            if macro:
                                lj12m6 = lj6 * lj6 - lj6
                        fdx = fac * dx
                        fdy = fac * dyv
                        fdz = fac * dzv
                        ax = ax + fdx
                        ay = ay + fdy
                        az = az + fdz
                        if macro:
                            au = au + (e24 * lj12m6 + sh6 * mf)
                            av = av + fac * dr2
                        if "nojf" not in ablate:
                            # j-side forces: -colsum, into the phase-g
                            # scratch
                            jf = jnp.concatenate(
                                [
                                    -jnp.sum(fdx, axis=0, keepdims=True),
                                    -jnp.sum(fdy, axis=0, keepdims=True),
                                    -jnp.sum(fdz, axis=0, keepdims=True),
                                    jnp.zeros((1, gw), out_dtype),
                                ],
                                axis=0,
                            )  # [4, gw]
                            if pack:
                                opk = pl.multiple_of(
                                    t * PKW + k * gw, gw
                                )
                                cur = spk_ref[g, y, :, pl.ds(opk, gw)]
                                spk_ref[g, y, :, pl.ds(opk, gw)] = cur + jf
                            else:
                                sref = sown_ref if dz == 0 else sup_ref
                                cur = sref[g, yw, :, pl.ds(off, gw)]
                                sref[g, yw, :, pl.ds(off, gw)] = cur + jf
                    fxg = jnp.sum(ax, axis=1, keepdims=True)
                    fyg = jnp.sum(ay, axis=1, keepdims=True)
                    fzg = jnp.sum(az, axis=1, keepdims=True)
                    if macro:
                        return fxg, fyg, fzg, jnp.sum(au), jnp.sum(av)
                    return fxg, fyg, fzg, None, None

                # gsub > 1 processes the dense block in cap/gsub-sublane
                # slabs: the full [cap, gw] live set (3 accumulators +
                # the coordinate/LJ chain) can exceed the VPU register
                # file and spill; slabs keep it resident.
                gparts = []
                csub = prefix // gsub
                for s in range(gsub):
                    fxg, fyg, fzg, u6c, virc = slab(
                        s * csub, csub, compute_macro
                    )
                    gparts.append(jnp.concatenate([fxg, fyg, fzg], axis=1))
                    if compute_macro:
                        u6_t = u6_t + u6c
                        vir_t = vir_t + virc
                for q in range(tail_n):
                    a = prefix + q * TAIL
                    if skip_tail:
                        occ_c = occ_ref[0, y, t * tx + g]

                        @pl.when(occ_c > a)
                        def _tail(a=a, g=g, q=q):
                            fxg, fyg, fzg, _u, _v = slab(a, TAIL, False)
                            blk = jnp.concatenate(
                                [
                                    fxg,
                                    fyg,
                                    fzg,
                                    jnp.zeros((TAIL, 128 - 3), out_dtype),
                                ],
                                axis=1,
                            )
                            ft_ref[
                                pl.ds((g * tail_n + q) * TAIL, TAIL), :
                            ] = blk

                    else:
                        fxg, fyg, fzg, u6c, virc = slab(
                            a, TAIL, compute_macro
                        )
                        gparts.append(
                            jnp.concatenate([fxg, fyg, fzg], axis=1)
                        )
                        if compute_macro:
                            u6_t = u6_t + u6c
                            vir_t = vir_t + virc
                if skip_tail and tail_n:
                    tl = ft_ref[pl.ds(g * tail_n * TAIL, tail_n * TAIL), :]
                    gparts.append(tl[:, 0:3])
                fcols.append(
                    gparts[0] if len(gparts) == 1
                    else jnp.concatenate(gparts, axis=0)
                )
            Fcat = jnp.concatenate(fcols, axis=0)  # [txc, 3]
            scal_col = u6_t * (
                jax.lax.broadcasted_iota(jnp.int32, (txc, 1), 0) == 0
            ).astype(out_dtype) + vir_t * (
                jax.lax.broadcasted_iota(jnp.int32, (txc, 1), 0) == 1
            ).astype(out_dtype)
            Fcat = jnp.concatenate([Fcat, scal_col], axis=1)
            oi_ref[y, :, pl.ds(off, txc)] = Fcat.T
            return _

        jax.lax.fori_loop(0, n_tiles, tile, 0)
        return _

    jax.lax.fori_loop(0, ny, yloop, 0)

    # fold the phase scratches back to absolute lanes (static lane
    # shifts, once per program) and apply the periodic x-halo wrap.
    # Pure concat/slice arithmetic: Mosaic has no scatter-add.
    def fold(sref):
        def place(a, lo, width):
            """zero-pad a to [ny, 4, width] with `a` starting at lane lo"""
            parts = []
            if lo:
                parts.append(jnp.zeros((ny, NPLANE, lo), out_dtype))
            parts.append(a)
            hi = width - lo - a.shape[-1]
            if hi:
                parts.append(jnp.zeros((ny, NPLANE, hi), out_dtype))
            return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else a

        acc = place(sref[0], 0, Wj)
        for g in range(1, tx):
            acc = acc + place(sref[g], g * cap, Wj)
        main = acc[:, :, cap : (nx + 1) * cap]
        wrap_l = place(acc[:, :, :cap], (nx - 1) * cap, nx * cap)
        wrap_r = place(acc[:, :, (nx + 1) * cap :], 0, nx * cap)
        return main + wrap_l + wrap_r  # [ny, 4, nx*cap]

    if "nojf" in ablate:
        f_ref[0] = oi_ref[...]
        up_ref[0] = jnp.zeros((ny, NPLANE, nx * cap), out_dtype)
    elif pack:
        # unfold the packed j-side scratch: each row's packed lanes are
        # CONTIGUOUS (the chunk order is row-major), so per (group, row)
        # pad each tile's segment to txc lanes, flatten, and
        # circular-roll to the absolute lane origin -- the roll's
        # wraparound IS the periodic x halo -- then roll y by dy and
        # accumulate into the own-z / z+1 output planes.  Static ops,
        # once per program (~2-3% of the pair-loop work).
        segs = [
            (0, 0, 2 * cap, 0, 0),
            (1, 2 * cap, 3 * cap, 0, 1),
            (2, 5 * cap, 3 * cap, 1, -1),
            (3, 8 * cap, 3 * cap, 1, 0),
            (4, 11 * cap, 3 * cap, 1, 1),
        ]
        own = jnp.zeros((ny, NPLANE, nx * cap), out_dtype)
        upa = jnp.zeros((ny, NPLANE, nx * cap), out_dtype)
        for g in range(tx):
            S4 = spk_ref[g].reshape(ny, NPLANE, n_tiles_pk, PKW)
            for k, lo, w, dzr, dyr in segs:
                seg = S4[:, :, :, lo:lo + w]
                blk = jnp.concatenate(
                    [seg,
                     jnp.zeros((ny, NPLANE, n_tiles_pk, txc - w), out_dtype)],
                    axis=-1)
                # lane roll to the absolute origin, TILE-LOCALLY: a
                # flat roll by o (|o| < txc) is an intra-tile shift
                # with the carry lanes taken from the adjacent tile
                # (periodic via the tile-axis roll).  Keeps every
                # vector op at txc lanes -- the full-width
                # (n_tiles*txc-lane) roll made Mosaic's superlinear
                # compile blow up at production nx (the same width
                # pathology the rebin kernel's x-tiling fixed); the
                # tiled form compiles.
                o = (g + (0 if k == 0 else -1)) * cap
                if o > 0:
                    prev = jnp.roll(blk, 1, axis=2)
                    blk = jnp.concatenate(
                        [prev[..., txc - o:], blk[..., :txc - o]], axis=-1
                    )
                elif o < 0:
                    nxt = jnp.roll(blk, -1, axis=2)
                    blk = jnp.concatenate(
                        [blk[..., -o:], nxt[..., :-o]], axis=-1
                    )
                if dyr:
                    blk = jnp.roll(blk, dyr, axis=0)
                flat = blk.reshape(ny, NPLANE, n_tiles_pk * txc)
                if dzr == 0:
                    own = own + flat
                else:
                    upa = upa + flat
        f_ref[0] = oi_ref[...] + own
        up_ref[0] = upa
    else:
        f_ref[0] = oi_ref[...] + fold(sown_ref)
        up_ref[0] = fold(sup_ref)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "eps24", "sig2", "shift6",
        "rc2", "interpret", "compute_macro", "sentinel", "fast_recip",
        "newton", "gsub", "prefix", "skip_tail", "pack", "ablate",
    ),
)
def lj_cell_forces_pallas_cwn3l(
    r_i: jnp.ndarray,  # [nz, ny, 4, nx*cap]
    r_j: jnp.ndarray,  # [nz, ny, 4, (nx+4)*cap]
    occ: jnp.ndarray = None,  # [nz, ny, nx] int32 per-cell counts
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box: Tuple[float, float, float],
    eps24: float,
    sig2: float,
    shift6: float,
    rc2: float,
    interpret: bool = False,
    compute_macro: bool = True,
    sentinel: bool = False,
    fast_recip: bool = False,
    newton: bool = True,
    gsub: int = 1,
    prefix: int = 0,
    skip_tail: bool = False,
    pack: bool = False,
    ablate: str = "",
):
    """Newton-3rd-law cell-window variant (see _lj_cwn3l_kernel).
    Periodic single-chip only (no z_halo).  Same output contract as the
    other kernels.  gsub splits group blocks into cap/gsub-sublane
    slabs against VPU register spills.  prefix/skip_tail/occ enable
    front-packed occupancy skipping of empty tail i-slabs."""
    Wj = (nx + 4) * cap
    assert r_i.shape == (nz, ny, NPLANE, nx * cap), r_i.shape
    assert r_j.shape == (nz, ny, NPLANE, Wj), r_j.shape
    assert nx % tx == 0 and nx >= 3
    cl2 = min(box[0] / nx, box[1] / ny, box[2] / nz) ** 2
    assert cl2 >= rc2, ("cwn3l kernel requires cell edge >= rc", cl2, rc2)
    if not interpret:
        assert (tx * cap) % 128 == 0
        assert (4 * cap) % 128 == 0
    if prefix <= 0 or prefix > cap:
        prefix = cap
    assert prefix % 8 == 0 and (cap - prefix) % 8 == 0
    assert prefix % gsub == 0 and (prefix // gsub) % 8 == 0
    if skip_tail:
        assert occ is not None and occ.shape == (nz, ny, nx)
        # tail slabs run with macro=False under pl.when (no register
        # returns from a predicated region): Upot/virial would miss
        # the tail pairs
        assert not compute_macro, "skip_tail requires compute_macro=False"
        if prefix == cap:
            skip_tail = False  # nothing to skip
    if pack:
        assert cap == 32 and tx * cap == 128, (
            "pack mode needs cap=32 groups on 128-lane tiles", cap, tx)
        assert not skip_tail, "pack and skip_tail are exclusive"
        assert ablate in ("", "nojf"), ablate
    out_dtype = r_i.dtype

    Pw = (nx + max(0, 4 - tx)) * cap
    P = jnp.stack(
        [r_j[:, :, :, g * cap : g * cap + Pw] for g in range(tx)]
    )  # [tx, nz, ny, 4, Pw]

    i_spec = pl.BlockSpec(
        (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    j_specs = [
        pl.BlockSpec(
            (tx, 1, ny, NPLANE, Pw),
            functools.partial(lambda z, dz: (0, (z + dz) % nz, 0, 0, 0), dz=dz),
            memory_space=pltpu.VMEM,
        )
        for dz in (0, 1)
    ]
    out_specs = [
        pl.BlockSpec(
            (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, ny, NPLANE, nx * cap), lambda z: (z, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    kernel = functools.partial(
        _lj_cwn3l_kernel,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        eps24=eps24,
        sig2=sig2,
        shift6=shift6,
        rc2=rc2,
        compute_macro=compute_macro,
        sentinel=sentinel,
        fast_recip=fast_recip,
        newton=newton,
        gsub=gsub,
        prefix=prefix,
        skip_tail=skip_tail,
        pack=pack,
        ablate=ablate,
        Pw=Pw,
        out_dtype=out_dtype,
    )
    in_specs = [i_spec] + j_specs
    operands = [r_i, P, P]
    scratch_shapes = [pltpu.VMEM((ny, NPLANE, nx * cap), out_dtype)]
    if skip_tail:
        in_specs.append(
            pl.BlockSpec(
                (1, ny, nx), lambda z: (z, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        operands.append(occ.astype(jnp.int32))
        scratch_shapes.append(
            pltpu.VMEM((tx * (cap - prefix), 128), out_dtype)
        )
    if pack:
        # packed j-side scratch: 4 chunks of 4*cap lanes per i cell
        scratch_shapes += [
            pltpu.VMEM((tx, ny, NPLANE, (nx // tx) * 16 * cap), out_dtype),
        ]
    else:
        scratch_shapes += [
            pltpu.VMEM((tx, ny, NPLANE, Pw), out_dtype),
            pltpu.VMEM((tx, ny, NPLANE, Pw), out_dtype),
        ]
    out, up = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), out_dtype),
            jax.ShapeDtypeStruct((nz, ny, NPLANE, nx * cap), out_dtype),
        ],
        scratch_shapes=scratch_shapes,
        # pack mode's chunked j-side scratch is ~2x the dense sown+sup
        # footprint; at nx=56-60 production grids the whole program
        # needs ~109 MB scoped vmem (measured OOM at the 100 MB
        # default, 2026-08-19) -- v5e has 128 MiB, so grant pack the
        # headroom
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=(120 if pack else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    # z+1 targets: program z accumulated forces for plane z+1
    out = out + jnp.roll(up, 1, axis=0)
    scal = out[:, :, 3, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    vir = jnp.sum(scal[..., 1])
    return out, u6, vir
