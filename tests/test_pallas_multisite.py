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


def test_pick_ms_grid_admissible_and_cheaper():
    """Cost-based grid/cap/tx choice (driver wiring for the compiled
    kernel): result must be admissible (cell edge >= cutoff, tx | nx,
    tx*cap % 128 == 0, cap fits measured occupancy + headroom) and at
    most the cost of the naive floor() grid at its forced alignment."""
    from ls1_mardyn_tpu.ops.pallas_ms_path import pick_ms_grid

    rng = np.random.default_rng(3)
    N, L, rc = 200_000, 63.0, 3.0
    # lattice + jitter: the equilibrated-liquid occupancy class
    side = int(round(N ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:N]
    r = (g + 0.5) * (L / side) + rng.uniform(-0.2, 0.2, (len(g), 3))
    r = r % L
    dims, cap, tx = pick_ms_grid(r, [L, L, L], rc)
    assert all(L / d >= rc for d in dims)
    assert dims[0] % tx == 0
    assert (tx * cap) % 128 == 0
    # measured occupancy fits
    idx = tuple(
        np.minimum((r[:, a] * (dims[a] / L)).astype(int), dims[a] - 1)
        for a in range(3)
    )
    lin = (idx[2] * dims[1] + idx[1]) * dims[0] + idx[0]
    occ = np.bincount(lin, minlength=int(np.prod(dims))).max()
    assert occ <= cap
    # cost no worse than the naive floor grid under tx=1 alignment
    nf = int(np.floor(L / rc))
    occ_f = occ  # same order; use measured occ as proxy
    cap_f = ((max(32, int(np.ceil(1.5 * occ_f))) + 127) // 128) * 128
    cost = np.prod(dims) * cap * cap * (tx + 2)
    cost_naive = nf ** 3 * cap_f * cap_f * 3
    assert cost <= cost_naive
