"""Golden tests: multi-site Pallas kernel vs N^2 oracle on the
reference Vectorization* scenes (interpret mode, f64) -- the exact
harness of VectorizedCellProcessorTest (see test_cellforce_vs_oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.io.ascii_reader import read_inp
from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.pallas_ms_path import PallasMultiSitePath
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
def test_ms_kernel_matches_oracle(ref_input_dir, scene):
    data = read_inp(f"{ref_input_dir}/{scene}")
    n = min(len(data.mid), 60)
    for f in ("mid", "cid", "r", "v", "q", "L"):
        setattr(data, f, getattr(data, f)[:n])
    mol, pp, table, box = build_scene(data, cutoff=CUTOFF)

    f_ref, m_ref = compute_forces_n2_jit(mol, pp, box)

    spec = CellGridSpec.create(np.asarray(box), CUTOFF, cap=64)
    path = PallasMultiSitePath(table, spec, interpret=True)
    f_k, m_k, _ = jax.jit(path.__call__)(mol)

    scale = np.abs(np.asarray(f_ref.F)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_k.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-11
    )
    mscale = np.abs(np.asarray(f_ref.M)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_k.M) / mscale, np.asarray(f_ref.M) / mscale, atol=1e-11
    )
    np.testing.assert_allclose(
        float(m_k.upot), float(m_ref.upot), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        float(m_k.total_virial), float(m_ref.total_virial), rtol=1e-9,
        atol=1e-12,
    )


@pytest.mark.parametrize(
    "scene", ["VectorizationWater.inp", "VectorizationLennardJones.inp"]
)
def test_ms_kernel_windowed_matches_oracle(ref_input_dir, scene):
    """cap > 128 selects the windowed kernel (j-chunk fori_loop); it
    must match the oracle exactly like the full-window pass."""
    data = read_inp(f"{ref_input_dir}/{scene}")
    n = min(len(data.mid), 60)
    for f in ("mid", "cid", "r", "v", "q", "L"):
        setattr(data, f, getattr(data, f)[:n])
    mol, pp, table, box = build_scene(data, cutoff=CUTOFF)

    f_ref, m_ref = compute_forces_n2_jit(mol, pp, box)

    spec = CellGridSpec.create(np.asarray(box), CUTOFF, cap=256)
    path = PallasMultiSitePath(table, spec, interpret=True)
    assert path.jw > 0, "cap=256 must select the windowed kernel"
    f_k, m_k, _ = jax.jit(path.__call__)(mol)

    scale = np.abs(np.asarray(f_ref.F)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_k.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-11
    )
    mscale = np.abs(np.asarray(f_ref.M)).max() + 1e-30
    np.testing.assert_allclose(
        np.asarray(f_k.M) / mscale, np.asarray(f_ref.M) / mscale, atol=1e-11
    )
    np.testing.assert_allclose(
        float(m_k.upot), float(m_ref.upot), rtol=1e-9, atol=1e-12
    )
