"""N^2 scalar-path force oracle.

The golden numerics reference for all fast force paths, playing the
role of the reference's LegacyCellProcessor + potforce.h
(/root/reference/src/particleContainer/adapter/LegacyCellProcessor.cpp)
in the test strategy (VectorizedCellProcessorTest.cpp:136-215 asserts
the SIMD kernel against it; our Pallas/cell paths are asserted against
this oracle the same way).

Computes all ordered pairs with minimum-image periodic boundary
conditions (valid while cutoff <= box/2, which holds for every shipped
Vectorization* test scene).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.models.interaction import PairParams, molecule_pair, site_offsets
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState


def min_image(dr: jnp.ndarray, box: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image convention for a periodic box."""
    return dr - box * jnp.round(dr / box)


def compute_forces_n2_jit(
    mol, pp, box, chunk: int = 0, images: int = 0, screen_alpha: float = 0.0
):
    """Jitted entry point (eager per-op dispatch is pathologically slow;
    everything in this framework runs under jit).

    images=0 (default) auto-selects: min-image when cutoff <= box/2,
    else the 27-image sum.  screen_alpha > 0 erfc-screens the
    charge-charge interaction (Ewald real space)."""
    if images == 0:
        import numpy as _np

        rc = float(_np.sqrt(_np.asarray(pp.rc2)))
        rc_lj = float(_np.sqrt(_np.asarray(pp.rc2_lj)))
        images = 1 if max(rc, rc_lj) <= min(_np.asarray(box)) / 2 else 27
    return _compute_forces_n2_jitted(mol, pp, box, chunk, images, screen_alpha)


def compute_forces_n2(
    mol: MoleculeState,
    pp: PairParams,
    box: jnp.ndarray,
    chunk: int = 0,
    images: int = 1,
    screen_alpha: float = 0.0,
) -> Tuple[Forces, Macroscopic]:
    """All-pairs forces/torques/virials and global energies.

    Args:
      mol: molecule state (capacity N; invalid slots masked out).
      pp: pair parameters.
      box: [3] box lengths.
      chunk: if >0, process i-molecules in chunks of this size via
        lax.map to bound memory (N^2 pair arrays).
      images: 1 => minimum-image convention (valid for cutoff <= box/2);
        27 => sum over all first-shell periodic images per pair, matching
        the reference's halo-copy semantics when cutoff > box/2 (e.g.
        VectorizationWater.inp: box 37, cutoff 35).  Self-interaction
        with one's own image is excluded either way (requires
        cutoff < box).
    """
    n = mol.capacity
    box = jnp.asarray(box, mol.r.dtype)
    sites_all = site_offsets(pp, mol.q, mol.cid)

    fill = jnp.zeros((3,), mol.r.dtype).at[0].set(3.0 * jnp.sqrt(pp.rc2) + 1.0)

    if images == 1:
        shifts = jnp.zeros((1, 3), mol.r.dtype)
    elif images == 27:
        import numpy as _np

        offs = _np.stack(
            _np.meshgrid(*[[-1.0, 0.0, 1.0]] * 3, indexing="ij"), -1
        ).reshape(-1, 3)
        shifts = jnp.asarray(offs, mol.r.dtype) * box
    else:
        raise ValueError("images must be 1 or 27")

    def row(i):
        dr0 = mol.r[i] - mol.r  # [N,3]
        if images == 1:
            drm_raw = min_image(dr0, box)[:, None, :]  # [N,1,3]
        else:
            drm_raw = dr0[:, None, :] + shifts[None, :, :]  # [N,27,3]
        com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
        valid_pair = (mol.valid[i] & mol.valid & (jnp.arange(n) != i))[:, None]
        mask_lj = valid_pair & (com2 < pp.rc2_lj)
        mask_el = valid_pair & (com2 < pp.rc2)
        any_mask = mask_lj | mask_el
        drm = jnp.where(any_mask[..., None], drm_raw, fill)
        sites_i = {k: a[i][None, None] for k, a in sites_all.items()}
        sites_j = {k: a[:, None] for k, a in sites_all.items()}
        out = molecule_pair(
            drm,
            sites_i,
            sites_j,
            mol.cid[i],
            mol.cid[:, None],
            pp,
            mask_lj,
            mask_el,
            screen_alpha=screen_alpha,
        )
        return dict(
            F=jnp.sum(out["F"], axis=(0, 1)),
            M=jnp.sum(out["M"], axis=(0, 1)),
            Vi=jnp.sum(out["Vi"], axis=(0, 1)),
            u6lj=jnp.sum(out["u6lj"]),
            uX=jnp.sum(out["uX"]),
            my_rf=jnp.sum(out["my_rf"]),
        )

    idx = jnp.arange(n)
    if chunk and chunk < n:
        res = jax.lax.map(jax.vmap(row), idx.reshape(-1, chunk))
        res = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), res)
    else:
        res = jax.vmap(row)(idx)

    forces = Forces(F=res["F"], M=res["M"], Vi=res["Vi"])
    # ordered-pair sums double-count pair energies -> halve
    # (reference counts each unordered pair once, potforce.h:282-503)
    macro = Macroscopic(
        upot6lj=0.5 * jnp.sum(res["u6lj"]),
        upot_xpoles=0.5 * jnp.sum(res["uX"]),
        # global virial = sum over molecules of sum_d Vi[d]; each ordered
        # side contributes 0.5*drm.f, summing to drm.f per unordered pair
        # exactly like Viadd on both molecules (potforce.h:498-499)
        virial=jnp.sum(res["Vi"]),
        my_rf=0.5 * jnp.sum(res["my_rf"]),
    )
    return forces, macro


_compute_forces_n2_jitted = jax.jit(
    compute_forces_n2, static_argnames=("chunk", "images", "screen_alpha")
)
