"""Golden equivalence: lane-major multi-site path vs N^2 oracle on the
reference Vectorization* scenes (same harness as
test_cellforce_vs_oracle.py, for the TPU-fast general path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.io.ascii_reader import read_inp
from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit
from ls1_mardyn_tpu.ops.cellforce_lanes import compute_forces_cells_lanes
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles, neighbor_table
from ls1_mardyn_tpu.scene import build_scene

CUTOFF = 35.0

SCENES = [
    "VectorizationLennardJones1CLJ.inp",
    "VectorizationLennardJones.inp",
    "VectorizationCharge.inp",
    "VectorizationDipole.inp",
    "VectorizationQuadrupole.inp",
    "VectorizationChargeDipole.inp",
    "VectorizationChargeQuadrupole.inp",
    "VectorizationDipoleQuadrupole.inp",
    "VectorizationWater.inp",
    "VectorizationMultiComponentMultiPotentials_50_molecules.inp",
]


@pytest.mark.parametrize("scene", SCENES)
def test_lanes_path_matches_oracle(ref_input_dir, scene):
    data = read_inp(f"{ref_input_dir}/{scene}")
    n = min(len(data.mid), 60)
    for f in ("mid", "cid", "r", "v", "q", "L"):
        setattr(data, f, getattr(data, f)[:n])
    mol, pp, table, box = build_scene(data, cutoff=CUTOFF)

    f_ref, m_ref = compute_forces_n2_jit(mol, pp, box)

    spec = CellGridSpec.create(np.asarray(box), CUTOFF, cap=64)
    nbr_ids, nbr_shift = neighbor_table(spec)

    @jax.jit
    def run(mol):
        bins = bin_particles(mol.r, mol.valid, spec)
        return compute_forces_cells_lanes(
            mol, pp, spec, bins,
            jnp.asarray(nbr_ids), jnp.asarray(nbr_shift, mol.r.dtype),
            cell_chunk=1,
        )

    f_l, m_l = run(mol)

    scale = np.abs(np.asarray(f_ref.F)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_l.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-11
    )
    mscale = np.abs(np.asarray(f_ref.M)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_l.M) / mscale, np.asarray(f_ref.M) / mscale, atol=1e-11
    )
    np.testing.assert_allclose(
        float(m_l.upot), float(m_ref.upot), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        float(m_l.total_virial), float(m_ref.total_virial), rtol=1e-9,
        atol=1e-12,
    )
    vscale = np.abs(np.asarray(f_ref.Vi)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_l.Vi) / vscale, np.asarray(f_ref.Vi) / vscale, atol=1e-11
    )
