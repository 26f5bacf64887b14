"""Golden tests for the Pallas 1CLJ kernel vs the plain-JAX cell path.

The TPU analogue of VCP1CLJRMMTest (/root/reference/src/
particleContainer/adapter/tests/ — SIMD kernel vs scalar oracle); here
the Pallas kernel runs in interpret mode on CPU and must match the
already-oracle-validated cell path to f64 machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.models.components import Component
from ls1_mardyn_tpu.ops.cellforce import compute_forces_cells
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles, neighbor_table
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
from ls1_mardyn_tpu.scene import build_scene


def _run_both(n, rho, cutoff, cap, shifted=False, seed=3):
    L = (n / rho) ** (1.0 / 3.0)
    comps = None
    if shifted:
        c = Component(cid=0)
        c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.3, 0.9, cutoff, True)
        comps = [c]
    data = cubic_grid(n, [L, L, L], 1.0, components=comps, seed=seed)
    mol, pp, table, box = build_scene(data, cutoff=cutoff, dtype=jnp.float64)
    spec = CellGridSpec.create(np.asarray(box), cutoff, cap=cap)
    nbr_ids, nbr_shift = neighbor_table(spec)
    bins = bin_particles(mol.r, mol.valid, spec)
    f_ref, m_ref = jax.jit(
        lambda mol, bins: compute_forces_cells(
            mol, pp, spec, bins,
            jnp.asarray(nbr_ids), jnp.asarray(nbr_shift, mol.r.dtype),
            cell_chunk=16,
        )
    )(mol, bins)
    path = PallasLJPath(table, spec, interpret=True)
    f_pal, m_pal, _ = jax.jit(path.__call__)(mol)
    return f_ref, m_ref, f_pal, m_pal


@pytest.mark.parametrize("shifted", [False, True])
def test_pallas_lj_matches_cell_path(shifted):
    f_ref, m_ref, f_pal, m_pal = _run_both(
        500, 0.55, cutoff=2.5, cap=32, shifted=shifted
    )
    scale = np.abs(np.asarray(f_ref.F)).max()
    np.testing.assert_allclose(
        np.asarray(f_pal.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-13
    )
    np.testing.assert_allclose(
        float(m_pal.upot6lj), float(m_ref.upot6lj), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(m_pal.virial), float(m_ref.virial), rtol=1e-12
    )


def test_pallas_lj_partial_occupancy():
    """Uneven cell occupancy + invalid padding slots must contribute
    exact zeros."""
    f_ref, m_ref, f_pal, m_pal = _run_both(193, 0.2, cutoff=3.0, cap=64)
    scale = np.abs(np.asarray(f_ref.F)).max()
    np.testing.assert_allclose(
        np.asarray(f_pal.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-13
    )
    np.testing.assert_allclose(
        float(m_pal.upot6lj), float(m_ref.upot6lj), rtol=1e-12
    )
