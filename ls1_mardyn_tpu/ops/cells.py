"""Cell-grid particle container.

TPU-native replacement for LinkedCells
(/root/reference/src/particleContainer/LinkedCells.{h,cpp}): instead of
per-cell std::vectors + halo cell layers, we keep molecules in flat
fixed-capacity arrays and maintain a dense [n_cells, cap] index table
rebuilt each step by sort ("rebinning" == LinkedCells::update(),
LinkedCells.h:150-153 -- here a single lax.sort + scatter, the
TPU-friendly strategy per SURVEY.md section 7).

No halo cells on a single chip: periodicity is handled at traversal
time by wrapping neighbor-cell coordinates and shifting gathered
positions by +-L (the reference instead materializes halo copies,
DomainDecompBase::handleDomainLeavingParticles).  Multi-chip halo
exchange lives in ls1_mardyn_tpu/parallel/.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CellGridSpec:
    """Static grid geometry (hashable; passed as a static arg to jit).

    Mirrors LinkedCells' cell geometry: cell edge >= cutoff /
    cellsInCutoffRadius (LinkedCells.h:101-131); we default to one cell
    per cutoff.
    """

    dims: Tuple[int, int, int]  # cells per axis
    box: Tuple[float, float, float]
    cap: int  # max molecules per cell

    @property
    def n_cells(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]

    @property
    def cell_len(self) -> Tuple[float, float, float]:
        return tuple(b / d for b, d in zip(self.box, self.dims))

    @staticmethod
    def create(box, cutoff: float, cap: int, cells_in_cutoff: int = 1) -> "CellGridSpec":
        dims = tuple(
            max(1, int(np.floor(b * cells_in_cutoff / cutoff))) for b in box
        )
        return CellGridSpec(dims=dims, box=tuple(float(b) for b in box), cap=cap)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CellBins:
    """Result of rebinning: dense per-cell molecule index table."""

    slots: jnp.ndarray  # [n_cells, cap] int32 molecule index, -1 = empty
    counts: jnp.ndarray  # [n_cells] int32
    overflow: jnp.ndarray  # bool scalar: True if any cell exceeded cap
    cell_of: jnp.ndarray  # [N] int32 linear cell id per molecule
    slot_of: jnp.ndarray  # [N] int32 flat slot (cell*cap+rank) per molecule


def wrap_positions(r: jnp.ndarray, box) -> jnp.ndarray:
    """Periodic wraparound into [0, L); the single-chip analogue of
    DomainDecompBase::handleDomainLeavingParticles
    (DomainDecompBase.h:300-332)."""
    box = jnp.asarray(box, r.dtype)
    return r - jnp.floor(r / box) * box


def bin_particles(r: jnp.ndarray, valid: jnp.ndarray, spec: CellGridSpec) -> CellBins:
    """Rebin molecules into cells (sort-based; replaces
    LinkedCells::update).

    Scatter-free on purpose: TPU scatters serialize, so the dense slot
    table is built entirely from sorts, searchsorted, and gathers
    (SURVEY.md section 7 'scatter-heavy rebinning' hard part).
    """
    n = r.shape[0]
    dims = jnp.asarray(spec.dims, jnp.int32)
    cell_len = jnp.asarray(spec.cell_len, r.dtype)
    c3 = jnp.clip(jnp.floor(r / cell_len).astype(jnp.int32), 0, dims - 1)
    # z-major linear id (matches the Pallas kernels' [nz, ny, nx] rows)
    cell = (c3[:, 2] * dims[1] + c3[:, 1]) * dims[0] + c3[:, 0]
    return bin_by_id(cell, valid, spec)


def bin_by_id(
    cell: jnp.ndarray,
    valid: jnp.ndarray,
    spec: CellGridSpec,
    need_inverse: bool = True,
) -> CellBins:
    """Rebin from precomputed linear cell ids (used by the
    cell-local-coordinate paths, where ids come from exact integer
    cell arithmetic instead of positions).

    need_inverse=False skips the molecule->slot inverse map (a second
    full argsort) for callers that only consume the dense slot table
    (the RMM rebin)."""
    n = cell.shape[0]
    # invalid molecules go to a virtual overflow cell
    cell = jnp.where(valid, cell, spec.n_cells)

    order = jnp.argsort(cell).astype(jnp.int32)  # stable
    sorted_cell = cell[order]
    # per-cell [start, end) ranges via ONE binary search: for integer
    # keys, end(c) == start(c+1)
    cell_ids = jnp.arange(spec.n_cells + 2, dtype=jnp.int32)
    starts_all = jnp.searchsorted(sorted_cell, cell_ids, side="left").astype(
        jnp.int32
    )
    starts = starts_all[: spec.n_cells + 1]
    counts = starts_all[1:] - starts_all[:-1]  # [n_cells + 1]
    # dense slot table by gather: slots[c, k] = order[starts[c] + k]
    k = jnp.arange(spec.cap, dtype=jnp.int32)[None, :]
    src = starts[: spec.n_cells, None] + k
    filled = k < counts[: spec.n_cells, None]
    slots = jnp.where(filled, order[jnp.clip(src, 0, n - 1)], -1)
    overflow = jnp.max(counts[: spec.n_cells]) > spec.cap
    if need_inverse:
        # inverse map molecule -> flat slot, also gather-only
        inv = jnp.argsort(order).astype(jnp.int32)  # sorted pos of mol m
        rank = inv - starts[cell]
        slot_of = cell * spec.cap + jnp.clip(rank, 0, spec.cap - 1)
        slot_of = jnp.where(
            valid & (rank < spec.cap), slot_of, spec.n_cells * spec.cap
        )
    else:
        slot_of = jnp.zeros((n,), jnp.int32)
    return CellBins(
        slots=slots,
        counts=counts[: spec.n_cells],
        overflow=overflow,
        cell_of=cell,
        slot_of=slot_of,
    )


def neighbor_table(spec: CellGridSpec):
    """Precompute, for every cell, its 27 neighbor cell ids and the
    periodic position shift to apply to their contents.

    The analogue of LinkedCells' neighbor-offset precomputation
    (LinkedCells.h:302-305), with periodic wrap folded in instead of
    halo cells.  Returns numpy arrays (static data):
      nbr_ids   [n_cells, 27] int32
      nbr_shift [n_cells, 27, 3] float (multiples of box length)
    """
    nx, ny, nz = spec.dims
    bx, by, bz = spec.box
    cz, cy, cx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx), indexing="ij")
    coords = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], -1)  # [n_cells,3]
    offs = np.stack(
        np.meshgrid(*[[-1, 0, 1]] * 3, indexing="ij"), -1
    ).reshape(-1, 3)  # [27,3]
    nc = coords[:, None, :] + offs[None, :, :]  # [n_cells,27,3]
    dims = np.array([nx, ny, nz])
    wrapped = np.mod(nc, dims)
    # a neighbor whose raw coordinate wrapped must have its contents
    # translated by a whole box length so distances come out right:
    # image position = p + floor(raw/dims) * L
    shift = np.floor_divide(nc, dims).astype(np.float64) * np.array([bx, by, bz])
    ids = (wrapped[..., 2] * ny + wrapped[..., 1]) * nx + wrapped[..., 0]
    # With dims <= 2 on an axis, distinct offsets reach the same cell
    # through different periodic images (different shifts); both are
    # genuine candidates and the cutoff mask selects the right ones.
    # Requires cutoff <= box/2 (as does the reference's cell setup).
    return ids.astype(np.int32), shift
