"""Cell-list force computation (plain-JAX path).

The correctness-first replacement for the reference's traversal +
vectorized kernel stack (LinkedCells::traverseCells ->
C08CellPairTraversal -> VectorizedCellProcessor::_calculatePairs,
/root/reference/src/particleContainer/LinkedCells.cpp:564-575,
adapter/VectorizedCellProcessor.cpp:797).  Differences, by TPU design:

  - no colored traversal: colors existed to serialize OpenMP writes;
    XLA owns the schedule and each cell writes only its own molecules
  - no Newton-3rd-law halving: each ordered pair is evaluated from both
    sides (recompute beats scatter on TPU, SURVEY.md section 7)
  - periodic images via neighbor-table shifts instead of halo cells

The Pallas kernel (ops/pallas_lj.py) is the performance path; this one
is the shape-flexible general multi-site path and the golden reference
for the kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.models.interaction import PairParams, molecule_pair, site_offsets
from ls1_mardyn_tpu.ops.cells import CellBins, CellGridSpec
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState


def compute_forces_cells(
    mol: MoleculeState,
    pp: PairParams,
    spec: CellGridSpec,
    bins: CellBins,
    nbr_ids: jnp.ndarray,  # [n_cells, 27]
    nbr_shift: jnp.ndarray,  # [n_cells, 27, 3]
    cell_chunk: int = 0,
    screen_alpha: float = 0.0,
) -> Tuple[Forces, Macroscopic]:
    n = mol.capacity
    cap = spec.cap
    dtype = mol.r.dtype
    sites_all = site_offsets(pp, mol.q, mol.cid)
    fill = jnp.zeros((3,), dtype).at[0].set(3.0 * jnp.sqrt(pp.rc2) + 1.0)

    def gather(idx):
        """Gather molecule data for an int32 index array (invalid = -1)."""
        safe = jnp.clip(idx, 0, n - 1)
        ok = (idx >= 0) & mol.valid[safe]
        return dict(
            r=mol.r[safe],
            cid=mol.cid[safe],
            ok=ok,
            idx=safe,
            sites={k: a[safe] for k, a in sites_all.items()},
        )

    def one_cell(c):
        i_idx = bins.slots[c]  # [cap]
        j_cells = nbr_ids[c]  # [27]
        j_idx = bins.slots[j_cells].reshape(-1)  # [27*cap]
        j_shift = jnp.repeat(nbr_shift[c], cap, axis=0)  # [27*cap, 3]

        gi = gather(i_idx)
        gj = gather(j_idx)
        rj = gj["r"] + j_shift.astype(dtype)

        drm_raw = gi["r"][:, None, :] - rj[None, :, :]  # [cap, 27cap, 3]
        com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
        # exclude self pairs (same molecule, any image): valid because the
        # grid guarantees cutoff <= box/2, so a molecule's periodic image
        # is never inside the cutoff
        pair_ok = (
            gi["ok"][:, None]
            & gj["ok"][None, :]
            & (gi["idx"][:, None] != gj["idx"][None, :])
        )
        mask_lj = pair_ok & (com2 < pp.rc2_lj)
        mask_el = pair_ok & (com2 < pp.rc2)
        drm = jnp.where((mask_lj | mask_el)[..., None], drm_raw, fill)

        sites_i = {k: a[:, None] for k, a in gi["sites"].items()}  # [cap,1,S,3]
        sites_j = {k: a[None, :] for k, a in gj["sites"].items()}  # [1,27cap,S,3]
        out = molecule_pair(
            drm,
            sites_i,
            sites_j,
            gi["cid"][:, None],
            gj["cid"][None, :],
            pp,
            mask_lj,
            mask_el,
            screen_alpha=screen_alpha,
        )
        return dict(
            idx=i_idx,
            F=jnp.sum(out["F"], axis=1),
            M=jnp.sum(out["M"], axis=1),
            Vi=jnp.sum(out["Vi"], axis=1),
            u6lj=jnp.sum(out["u6lj"]),
            uX=jnp.sum(out["uX"]),
            my_rf=jnp.sum(out["my_rf"]),
        )

    n_cells = spec.n_cells
    cells = jnp.arange(n_cells)
    if cell_chunk and cell_chunk < n_cells:
        pad = (-n_cells) % cell_chunk
        cells_p = jnp.concatenate([cells, jnp.zeros((pad,), cells.dtype)])
        res = jax.lax.map(jax.vmap(one_cell), cells_p.reshape(-1, cell_chunk))
        res = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), res)
        # zero out duplicated pad cells
        keep = jnp.arange(n_cells + pad) < n_cells
        resF = jax.tree.map(
            lambda a: jnp.where(
                keep.reshape((-1,) + (1,) * (a.ndim - 1)), a, jnp.zeros_like(a)
            ),
            dict(F=res["F"], M=res["M"], Vi=res["Vi"]),
        )
        res.update(resF)
        scal_keep = keep[: res["u6lj"].shape[0]]
        for k in ("u6lj", "uX", "my_rf"):
            res[k] = jnp.where(scal_keep, res[k], 0.0)
        res["idx"] = jnp.where(keep[:, None], res["idx"], -1)
    else:
        res = jax.vmap(one_cell)(cells)

    # scatter per-cell-slot results back to flat molecule arrays; each
    # valid molecule occupies exactly one slot
    flat_idx = res["idx"].reshape(-1)
    ok = flat_idx >= 0
    safe = jnp.where(ok, flat_idx, 0)

    def scat(a):
        a2 = a.reshape(-1, 3)
        a2 = jnp.where(ok[:, None], a2, 0.0)
        return jnp.zeros((n, 3), dtype).at[safe].add(a2, mode="drop")

    forces = Forces(F=scat(res["F"]), M=scat(res["M"]), Vi=scat(res["Vi"]))
    macro = Macroscopic(
        upot6lj=0.5 * jnp.sum(res["u6lj"]),
        upot_xpoles=0.5 * jnp.sum(res["uX"]),
        virial=jnp.sum(jnp.where(ok[:, None], res["Vi"].reshape(-1, 3), 0.0)),
        my_rf=0.5 * jnp.sum(res["my_rf"]),
    )
    return forces, macro
