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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CellGridSpec:
    """Static grid geometry (hashable; passed as a static arg to jit).

    Mirrors LinkedCells' cell geometry: cell edge >= cutoff /
    cellsInCutoffRadius (LinkedCells.h:101-131); we default to one cell
    per cutoff.

    z_edges (optional, len nz+1, first 0 and last box[2]) makes the z
    rows NON-uniform -- the TPU analogue of the ALL load balancer's
    tensor/staggered mesh (/root/reference/src/parallel/
    GeneralDomainDecomposition + ALLLoadBalancer).  Rows can never be
    thinner than the cutoff (the +-1 neighbor-row reach must cover
    them), so dense regions keep the uniform pitch; the win is in
    SPARSE regions, where one wide row replaces many near-empty
    cutoff-pitch rows -- the dense design's cost is cells x cap^2, so
    fewer cells at unchanged cap is a direct compute cut
    (vapor-dominated scenes: evaporation, droplets, two-phase slabs).
    Paths using absolute coordinates (general traversal, multi-site
    Pallas kernel) work unchanged; the cell-local 1CLJ paths require a
    uniform grid.
    """

    dims: Tuple[int, int, int]  # cells per axis
    box: Tuple[float, float, float]
    cap: int  # max molecules per cell
    z_edges: Optional[Tuple[float, ...]] = None

    @property
    def n_cells(self) -> int:
        return self.dims[0] * self.dims[1] * self.dims[2]

    @property
    def cell_len(self) -> Tuple[float, float, float]:
        """Cell edge per axis; for non-uniform z this is the MINIMUM
        row height (the quantity cutoff-eligibility checks need)."""
        uni = tuple(b / d for b, d in zip(self.box, self.dims))
        if self.z_edges is None:
            return uni
        e = np.asarray(self.z_edges)
        return (uni[0], uni[1], float(np.min(np.diff(e))))

    @staticmethod
    def create(box, cutoff: float, cap: int, cells_in_cutoff: int = 1) -> "CellGridSpec":
        dims = tuple(
            max(1, int(np.floor(b * cells_in_cutoff / cutoff))) for b in box
        )
        return CellGridSpec(dims=dims, box=tuple(float(b) for b in box), cap=cap)


def adaptive_z_edges(r, box, dims_xy, min_h: float, occ_limit: int):
    """Density-adaptive z rows (the ALL 'tensor mesh' one-axis
    balancing): greedily widen each row until some (x, y) CELL inside
    it would exceed `occ_limit` molecules (so dense regions keep
    ~min_h pitch, like the uniform grid, and the capacity never grows),
    never thinner than min_h.  Sparse regions collapse into few wide
    rows, shrinking the total cell count at unchanged capacity.

    r [N,3] positions; box (3,); dims_xy = (nx, ny) of the uniform
    grid's xy cells.  Returns a tuple of nz+1 edges (0 ... bz), or None
    when fewer than two rows fit."""
    r = np.asarray(r, float)
    box = np.asarray(box, float)
    bz = float(box[2])
    if bz < 2 * min_h or len(r) == 0:
        return None
    nx, ny = int(dims_xy[0]), int(dims_xy[1])
    cxy = np.clip(
        (r[:, :2] / (box[:2] / [nx, ny])).astype(int), 0, [nx - 1, ny - 1]
    )
    colid = cxy[:, 1] * nx + cxy[:, 0]
    # per-column sorted z lists (padded 2-D table + pointers)
    order = np.lexsort((r[:, 2], colid))
    col_s = colid[order]
    z_s = r[order, 2]
    ncol = nx * ny
    starts = np.searchsorted(col_s, np.arange(ncol + 1))
    counts = np.diff(starts)
    limit = max(int(occ_limit), 1)

    edges = [0.0]
    ptr = starts[:-1].copy()  # per-column index of first z above the edge
    while bz - edges[-1] >= 2 * min_h:
        # for each column, the z of its (limit+1)-th molecule above the
        # current edge: the cut must stay below the smallest of these
        idx = ptr + limit
        has = idx < starts[1:]  # column still has > limit molecules left
        if not has.any():
            break  # every column fits one wide final row
        nxt = np.min(z_s[idx[has]])
        cut = max(edges[-1] + min_h, float(nxt) - 1e-9)
        cut = min(cut, bz - min_h)
        if cut <= edges[-1] + 1e-12:
            break
        edges.append(float(cut))
        # advance pointers past the cut
        for c in np.nonzero(counts)[0]:
            ptr[c] = starts[c] + np.searchsorted(
                z_s[starts[c]:starts[c + 1]], cut
            )
    edges.append(float(bz))
    if len(edges) < 3:
        return None
    return tuple(edges)


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
    uni = tuple(b / d for b, d in zip(spec.box, spec.dims))
    cell_len = jnp.asarray(uni, r.dtype)
    c3 = jnp.clip(jnp.floor(r / cell_len).astype(jnp.int32), 0, dims - 1)
    if spec.z_edges is not None:
        # non-uniform z rows: row index by binary search over the
        # static edge table (ALL tensor-mesh analogue)
        interior = jnp.asarray(spec.z_edges[1:-1], r.dtype)
        cz = jnp.searchsorted(interior, r[:, 2], side="right").astype(
            jnp.int32
        )
        c3 = c3.at[:, 2].set(jnp.clip(cz, 0, spec.dims[2] - 1))
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
