"""Gather-free stream compaction / expansion along a minor axis.

TPU gathers and jax.lax.sort are the two slow primitives on this
hardware (~1 GB/s gathers; 60+ ms to sort 20M elements).  But the
data-movement patterns MD actually needs -- "pack the marked entries
to the front" (compaction) and "place the first k entries at the
marked positions" (expansion) -- are MONOTONE routings, and a monotone
routing on L lanes decomposes into log2(L) conditional shift stages
(a one-sided butterfly / concentrator network, collision-free for
monotone destinations).  Each stage is a roll + select, so the whole
permutation is elementwise VPU work that XLA fuses.

Both operations work along axis -2 (the "sublane" axis of a
[..., L, M] array, with M >= 128 riding the lanes at full width) and
move any number of payload columns through the same route.

Used by the RMM shift-merge rebin (ops/rmm.py) in place of a
12-operand lax.sort: the reference's analogue of this machinery is
the per-cell std::vector insert/erase in LinkedCells::update
(/root/reference/src/particleContainer/LinkedCells.cpp:564).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def _shift_up(a: jnp.ndarray, b: int):
    """Shift entries toward lower indices along axis -2 by b (zeros
    shifted in at the tail)."""
    pad = [(0, 0)] * a.ndim
    pad[-2] = (0, b)
    return jnp.pad(a[..., b:, :], pad)


def _shift_down(a: jnp.ndarray, b: int):
    pad = [(0, 0)] * a.ndim
    pad[-2] = (b, 0)
    return jnp.pad(a[..., :-b, :], pad)


def sublane_rank(mask: jnp.ndarray) -> jnp.ndarray:
    """Exclusive rank of each True along axis -2: rank[i] = number of
    True entries strictly before i.  log2(L) shift-adds."""
    L = mask.shape[-2]
    s = mask.astype(jnp.int32)
    b = 1
    while b < L:
        s = s + _shift_down(s, b)
        b *= 2
    return s - mask.astype(jnp.int32)  # inclusive -> exclusive


def sublane_compact(
    mask: jnp.ndarray, cols: Sequence[jnp.ndarray]
) -> List[jnp.ndarray]:
    """Stably pack entries where mask is True to the front of axis -2.

    Returns the routed columns; positions >= count hold zeros.  The
    route moves entry i up by dist = i - rank(i); processing distance
    bits ascending is collision-free because dest ranks are strictly
    increasing in i (classic concentrator argument).
    """
    L = mask.shape[-2]
    iota = jnp.arange(L, dtype=jnp.int32).reshape(
        (1,) * (mask.ndim - 2) + (L, 1)
    )
    dist = jnp.where(mask, iota - sublane_rank(mask), 0)
    alive = mask
    outs = [jnp.where(alive, c, 0) for c in cols]
    b = 1
    while b < L:
        move = alive & ((dist & b) != 0)
        mv_up = _shift_up(move, b)
        dist = jnp.where(mv_up, _shift_up(dist, b), jnp.where(move, 0, dist))
        alive = (alive & ~move) | mv_up
        outs = [
            jnp.where(mv_up, _shift_up(c, b), jnp.where(move, 0, c))
            for c in outs
        ]
        b *= 2
    return outs


def sublane_expand(
    free: jnp.ndarray, cols: Sequence[jnp.ndarray]
) -> List[jnp.ndarray]:
    """Place front-packed entries (entry k at position k) at the
    positions of the k-th True of `free`, along axis -2.

    The inverse routing of sublane_compact(free): each receiving slot
    s needs the item from position rank(s), i.e. item k moves DOWN by
    dist(s) = s - rank(s).  The per-item route distance is obtained by
    compacting the slot distances; bits are processed descending
    (reverse of the compaction network), which mirrors the
    collision-free forward route.
    """
    L = free.shape[-2]
    iota = jnp.arange(L, dtype=jnp.int32).reshape(
        (1,) * (free.ndim - 2) + (L, 1)
    )
    rank = sublane_rank(free)
    slot_dist = jnp.where(free, iota - rank, 0)
    # route distance for item k = dist of the k-th free slot
    (dist,) = sublane_compact(free, [slot_dist])
    n_items = jnp.sum(free.astype(jnp.int32), axis=-2, keepdims=True)
    alive = iota < n_items
    outs = [jnp.where(alive, c, 0) for c in cols]
    b = 1
    while b < L:
        b *= 2
    b //= 2
    while b >= 1:
        move = alive & ((dist & b) != 0)
        mv_dn = _shift_down(move, b)
        dist = jnp.where(
            mv_dn, _shift_down(dist, b) & ~b, jnp.where(move, 0, dist)
        )
        alive = (alive & ~move) | mv_dn
        outs = [
            jnp.where(mv_dn, _shift_down(c, b), jnp.where(move, 0, c))
            for c in outs
        ]
        b //= 2
    return outs
