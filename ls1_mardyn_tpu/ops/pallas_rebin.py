"""Fused Pallas shift-merge rebin for the RMM dense cell state.

The XLA 3-stage shift-merge rebin (ops/rmm.py:_rebin_shift) re-packs
every cell's slot row from the 3 rolled candidate rows with one
12-operand lax.sort per axis.  The sort is a ~50-stage compare-swap
network that XLA cannot keep on-chip: every stage is a full HBM pass
over all 12 operands, which is why the whole rebin measures 150 ms at
N=4.2M (the arithmetic is trivial; the memory traffic is not).

This kernel keeps each z-plane's candidate set in VMEM and replaces
the sort with a monotone concentrator (one-sided butterfly) routing,
with two structural tricks that make it cheap on TPU:

1. **Columns ride the sublane axis.**  The state is kept as an
   11-column stack [ny, 11, W] per plane (x, y, z, valid, vx, vy, vz,
   mid, fx, fy, fz).  A lane-axis roll/select of that stack moves all
   11 payload columns of a molecule in ~2 vector-register ops -- the
   XLA formulation pays 11 separate arrays per butterfly step, the
   stack pays ~2 (8 sublanes per vreg).

2. **Stable compaction instead of sort.**  Per stage, the candidates
   of a cell are the 3 rolled rows in (source row, slot) order; the
   destination slot of a kept candidate is its exclusive rank over
   "belongs here" in that order (identical to the lax.sort key
   slot_iota + cap*ri of _rebin_shift, so the packing -- and the whole
   output -- is BIT-IDENTICAL to the sort path).  Rank via segmented
   prefix-sum (log2(cap) masked shift-adds); routing via two one-sided
   butterflies (movers toward lower / higher lanes), each log2(cap)
   roll+select steps.  Monotone destinations make the route
   collision-free (classic concentrator argument); a mover's position
   never leaves its 32-lane cell segment mid-flight, so only the
   acceptance masks need segment clipping, not the payload rolls.

Reference analogue: LinkedCells::update
(/root/reference/src/particleContainer/LinkedCells.cpp:564) -- the
per-cell std::vector re-insertion, which the reference gets for free
from pointers; here it is a data-movement kernel designed for the
vector unit.  The 3-stage dimension-wise structure mirrors
IndirectNeighbourCommunicationScheme (diagonal hops ride consecutive
stages, /root/reference/src/parallel/NeighbourCommunicationScheme.h:172).

Overflow contract (same as _rebin_shift): the returned flag latches
(a) any valid molecule with |hop| > 1 (verlet-skin violated) and
(b) any candidate packed beyond cap (cell full).  On overflow the
caller discards the output and falls back to the global-sort rebin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ls1_mardyn_tpu.ops.pallas_lj import SENTINEL_SCALE

NCOL = 11  # x, y, z, valid, vx, vy, vz, mid, fx, fy, fz


def _lane_mod(shape, cap):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return lane % cap


def _seg_prefix_fill(inc, cap):
    """Segmented (per cap-lane cell segment) inclusive prefix sum and
    segment-total fill of an int32 [..., W] array: log2(cap)
    masked shift-adds each."""
    lm = _lane_mod(inc.shape, cap)
    run = inc
    b = 1
    while b < cap:
        sh = jnp.roll(run, b, axis=-1)
        run = run + jnp.where(lm >= b, sh, 0)
        b *= 2
    tot = run
    b = 1
    while b < cap:
        sh = jnp.roll(tot, -b, axis=-1)
        tot = jnp.maximum(tot, jnp.where(lm < cap - b, sh, 0))
        b *= 2
    return run, tot


def _route(acc, stack, sel, delta, cap, sign):
    """Move `stack` entries at lanes where sel (delta>0, int32 route
    distance) by `delta` lanes toward lower (sign=-1) or higher
    (sign=+1) lane indices within their cap-lane segment; add arrived
    values into acc.  One-sided ascending-bit butterfly; destinations
    are monotone in source order, so the route is collision-free and
    never leaves the segment mid-flight (acceptance masks clip the
    lane-roll wraparound)."""
    lm = _lane_mod(delta.shape, cap)
    buf = jnp.where(sel, stack, 0.0)
    dist = jnp.where(sel, delta, 0)
    # masks ride as int32 0/1: Mosaic cannot roll/bitcast i1 vregs
    alive = sel.astype(jnp.int32)
    b = 1
    while b < cap:
        move = alive * ((dist & b) != 0).astype(jnp.int32)
        if sign < 0:
            mvd = jnp.roll(move, -b, axis=-1) * (lm < cap - b).astype(
                jnp.int32
            )
        else:
            mvd = jnp.roll(move, b, axis=-1) * (lm >= b).astype(jnp.int32)
        take = mvd != 0
        drop = move != 0
        buf = jnp.where(take, jnp.roll(buf, sign * b, axis=-1),
                        jnp.where(drop, 0.0, buf))
        dist = jnp.where(take, jnp.roll(dist, sign * b, axis=-1),
                         jnp.where(drop, 0, dist))
        alive = alive * (1 - move) + mvd
        b *= 2
    return acc + buf


def _merge_stage(cands, coord_c, cla, cap, out_dtype):
    """One rebin stage on a row chunk.

    cands: list of 3 candidate stacks [(roll, A)] in (from-left, own,
    from-right) order, A = [cy, NCOL, W]; roll = the hop d a candidate
    must have to belong here (+1, 0, -1).  Returns (merged stack,
    dropped-beyond-cap flag, own |d|>1 flag)."""
    slot = None
    acc = jnp.zeros_like(cands[0][1])
    base = None
    over = jnp.zeros((), jnp.int32)
    far = jnp.zeros((), jnp.int32)
    colmask = (
        jax.lax.broadcasted_iota(
            jnp.int32, (1, NCOL, 1), 1
        ) == coord_c
    ).astype(out_dtype)
    for roll, A in cands:
        c = A[:, coord_c : coord_c + 1, :]
        v = A[:, 3:4, :] > 0.5
        d = jnp.floor(c / jnp.asarray(cla, out_dtype)).astype(jnp.int32)
        if roll == 0:
            far = jnp.max(
                (v & (jnp.abs(d) > 1)).astype(jnp.int32)
            )
        belong = v & (d == roll)
        if roll != 0:
            # hop adjusts the stage's cell-local coordinate; applied on
            # the whole stack via the column one-hot (1 fused op)
            A = A - colmask * jnp.asarray(roll * cla, out_dtype)
        inc = belong.astype(jnp.int32)
        run, tot = _seg_prefix_fill(inc, cap)
        excl = run - inc
        rank = excl if base is None else excl + base
        base = tot if base is None else base + tot
        keep = belong & (rank < cap)
        over = jnp.maximum(
            over, jnp.max((belong & (rank >= cap)).astype(jnp.int32))
        )
        if slot is None:
            slot = _lane_mod(rank.shape, cap)
        delta = jnp.where(keep, rank - slot, 0)
        acc = acc + jnp.where(keep & (delta == 0), A, 0.0)
        acc = _route(acc, A, keep & (delta < 0), -delta, cap, -1)
        acc = _route(acc, A, keep & (delta > 0), delta, cap, +1)
    return acc, over, far


def _rebin_kernel(
    *refs,
    ny: int,
    cap: int,
    cy: int,
    cell_len,
    stage: str,
    sentinel: bool,
    out_dtype,
):
    """stage 'x': refs = (left, own, right) x-tile blocks (the +-cap
    lane halo for candidate construction); stage 'y': refs = (own,);
    stage 'z': refs = (zm, z, zp).  Blocks are [1, ny, NCOL, Wt] with
    Wt a multiple of cap: the concentrator routing never crosses a
    cap-lane cell segment, so x-tiling is routing-safe and keeps every
    vector op Wt wide (Mosaic compile time is superlinear in op
    width: full-plane ops at nd=60 measured >10 min to compile, tiled
    ops compile in ~1 min)."""
    if stage == "x":
        lf_ref, z_ref, rt_ref, out_ref, ovf_ref = refs
    elif stage == "z":
        zm_ref, z_ref, zp_ref, out_ref, ovf_ref = refs
    else:
        z_ref, out_ref, ovf_ref = refs
    Wt = z_ref.shape[-1]
    clx, cly, clz = cell_len
    flags = jnp.zeros((), jnp.int32)

    n_chunks = ny // cy
    for ci in range(n_chunks):
        y0 = ci * cy
        A = z_ref[0, y0 : y0 + cy, :, :]
        if stage == "x":
            # candidate rows = global lane shifts by +-cap, assembled
            # from the neighbor tiles' edge segments (periodic wrap
            # rides the mod index maps)
            lseg = lf_ref[0, y0 : y0 + cy, :, Wt - cap :]
            rseg = rt_ref[0, y0 : y0 + cy, :, :cap]
            cands = [
                (1, jnp.concatenate([lseg, A[:, :, : Wt - cap]], axis=-1)),
                (0, A),
                (-1, jnp.concatenate([A[:, :, cap:], rseg], axis=-1)),
            ]
            merged, over, far = _merge_stage(cands, 0, clx, cap, out_dtype)
        elif stage == "y":
            rows = [(y0 + i - 1) % ny for i in range(cy + 2)]
            # contiguous middle + individually wrapped edge rows
            parts = []
            i = 0
            while i < cy + 2:
                j = i
                while (
                    j + 1 < cy + 2 and rows[j + 1] == rows[j] + 1
                ):
                    j += 1
                parts.append(z_ref[0, rows[i] : rows[j] + 1, :, :])
                i = j + 1
            ext = (
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=0)
            )
            cands = [
                (1, ext[0:cy]),       # from row y-1, hop +1
                (0, ext[1 : cy + 1]),
                (-1, ext[2 : cy + 2]),
            ]
            merged, over, far = _merge_stage(cands, 1, cly, cap, out_dtype)
        else:  # z
            cands = [
                (1, zm_ref[0, y0 : y0 + cy, :, :]),
                (0, A),
                (-1, zp_ref[0, y0 : y0 + cy, :, :]),
            ]
            merged, over, far = _merge_stage(cands, 2, clz, cap, out_dtype)
        flags = jnp.maximum(flags, jnp.maximum(over, far))
        if sentinel and stage == "z":
            # final stage: empty slots get the sentinel y-local
            valid = merged[:, 3:4, :] > 0.5
            ysent = SENTINEL_SCALE * (
                1.0 + _lane_mod((1, 1, Wt), cap).astype(out_dtype)
            )
            ycol = (
                jax.lax.broadcasted_iota(jnp.int32, (1, NCOL, 1), 1) == 1
            )
            merged = jnp.where(
                valid | ~ycol, merged, jnp.broadcast_to(ysent, merged.shape)
            )
        out_ref[0, y0 : y0 + cy, :, :] = merged
    # flag tile in VMEM (SMEM outputs of this shape are not
    # lowerable); all x-tiles of a z-plane revisit the same block --
    # initialize at t == 0, then max-accumulate
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        ovf_ref[...] = jnp.zeros((1, 8, 128), jnp.int32)

    ovf_ref[...] = jnp.maximum(ovf_ref[...], jnp.full((1, 8, 128), flags))


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "cap", "cell_len", "sentinel", "interpret", "cy", "wt",
    ),
)
def rebin_shift_pallas(
    big: jnp.ndarray,  # [nz, ny, NCOL, nx*cap]
    *,
    dims,
    cap: int,
    cell_len,
    sentinel: bool,
    interpret: bool = False,
    cy: int = 0,
    wt: int = 0,
):
    """3-stage (x, then y, then z) shift-merge rebin of the 11-column
    state stack.  Bit-identical output to ops/rmm.py:_rebin_shift.
    Returns (rebinned [nz, ny, NCOL, W], overflow flag)."""
    nx, ny, nz = dims
    W = nx * cap
    assert big.shape == (nz, ny, NCOL, W), big.shape
    assert cap & (cap - 1) == 0, "cap must be a power of two"
    if cy <= 0:
        # largest row-chunk <= 20 dividing ny: compile time scales
        # with the chunk COUNT (each chunk is an unrolled stage body),
        # VMEM with the chunk SIZE
        cy = max(c for c in range(1, min(ny, 20) + 1) if ny % c == 0)
    assert ny % cy == 0, (ny, cy)
    if wt <= 0:
        # widest x-tile <= 768 lanes that keeps tiles register- and
        # cell-aligned; Mosaic compile time grows superlinearly with
        # the op width, runtime does not care at these sizes
        align = 128 if W % 128 == 0 else cap
        cands = [w for w in range(align, W + 1, align)
                 if W % w == 0 and w % cap == 0 and w <= 768]
        wt = max(cands) if cands else W
    assert W % wt == 0 and wt % cap == 0, (W, wt, cap)
    nxt = W // wt
    if not interpret:
        assert wt % 128 == 0
    out_dtype = big.dtype
    cl = tuple(float(c) for c in cell_len)

    def tile(dz=0, dt=0):
        return pl.BlockSpec(
            (1, ny, NCOL, wt),
            lambda z, t: ((z + dz) % nz, 0, 0, (t + dt) % nxt),
        )

    ovf_spec = pl.BlockSpec((1, 8, 128), lambda z, t: (z, 0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((nz, ny, NCOL, W), out_dtype),
        jax.ShapeDtypeStruct((nz, 8, 128), jnp.int32),
    ]
    common = dict(ny=ny, cap=cap, cy=cy, cell_len=cl, out_dtype=out_dtype)
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024
    )

    def call(stage, specs, operands, sent=False):
        return pl.pallas_call(
            functools.partial(
                _rebin_kernel, stage=stage, sentinel=sent, **common
            ),
            grid=(nz, nxt),
            in_specs=specs,
            out_specs=[tile(), ovf_spec],
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(*operands)

    sx, ovx = call("x", [tile(dt=-1), tile(), tile(dt=1)], [big, big, big])
    sy, ovy = call("y", [tile()], [sx])
    sz, ovz = call(
        "z", [tile(dz=-1), tile(), tile(dz=1)], [sy, sy, sy], sent=sentinel
    )
    overflow = (
        jnp.any(ovx[:, 0, 0] > 0)
        | jnp.any(ovy[:, 0, 0] > 0)
        | jnp.any(ovz[:, 0, 0] > 0)
    )
    return sz, overflow
