"""Non-uniform z cell rows (the ALL tensor-mesh analogue,
/root/reference/src/parallel/GeneralDomainDecomposition + ALL): thinner
rows in dense regions lower the global cell capacity, which is the cost
driver of the dense design (cells x cap^2)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.ops.cells import (
    CellGridSpec,
    adaptive_z_edges,
    bin_particles,
    neighbor_table,
)


def test_adaptive_z_edges_properties():
    rng = np.random.default_rng(0)
    # dense band in the middle fifth; near-vacuum elsewhere
    bz = 50.0
    box = np.array([5.0, 5.0, bz])
    n_dense, n_sparse = 2000, 40
    r = np.concatenate([
        np.stack([rng.uniform(0, 5, n_dense), rng.uniform(0, 5, n_dense),
                  rng.uniform(20.0, 30.0, n_dense)], -1),
        np.stack([rng.uniform(0, 5, n_sparse), rng.uniform(0, 5, n_sparse),
                  rng.uniform(0.0, bz, n_sparse)], -1),
    ])
    # uniform grid: 2x2 xy cells, 20 z rows at 2.5 pitch
    cxy = np.clip((r[:, :2] / 2.5).astype(int), 0, 1)
    cz = np.clip((r[:, 2] / 2.5).astype(int), 0, 19)
    lin = (cz * 2 + cxy[:, 1]) * 2 + cxy[:, 0]
    occ_limit = int(np.bincount(lin).max())
    e = adaptive_z_edges(r, box, (2, 2), min_h=2.5, occ_limit=occ_limit)
    assert e is not None
    e = np.asarray(e)
    assert e[0] == 0.0 and e[-1] == bz
    assert np.all(np.diff(e) >= 2.5 - 1e-9)
    # sparse regions collapse: far fewer rows than the 20 uniform ones
    assert len(e) - 1 <= 10
    # per-cell occupancy never exceeds the uniform limit except where
    # min_h forces a taller row
    cz2 = np.clip(np.searchsorted(e[1:-1], r[:, 2], side="right"),
                  0, len(e) - 2)
    lin2 = (cz2 * 2 + cxy[:, 1]) * 2 + cxy[:, 0]
    occ2 = np.bincount(lin2, minlength=4 * (len(e) - 1))
    forced = np.diff(e) <= 2.5 + 1e-9
    for row in range(len(e) - 1):
        if not forced[row]:
            assert occ2[row * 4:(row + 1) * 4].max() <= occ_limit


def test_binning_with_z_edges_matches_manual():
    rng = np.random.default_rng(1)
    box = (6.0, 6.0, 20.0)
    r = rng.uniform(0, 1, (500, 3)) * np.asarray(box)
    r[:, 2] = np.concatenate([rng.uniform(8, 12, 400), rng.uniform(0, 20, 100)])
    edges = adaptive_z_edges(r, box, (2, 2), 2.5, occ_limit=60)
    assert edges is not None
    spec = CellGridSpec(
        dims=(2, 2, len(edges) - 1), box=box, cap=256, z_edges=edges
    )
    bins = bin_particles(jnp.asarray(r), jnp.ones(len(r), bool), spec)
    cz = np.clip(
        np.searchsorted(np.asarray(edges)[1:-1], r[:, 2], side="right"),
        0, spec.dims[2] - 1,
    )
    cxy = np.clip((r[:, :2] / 3.0).astype(int), 0, 1)
    lin = (cz * 2 + cxy[:, 1]) * 2 + cxy[:, 0]
    np.testing.assert_array_equal(np.asarray(bins.cell_of), lin)
    assert not bool(bins.overflow)


def test_two_phase_forces_match_oracle_with_z_edges():
    """General cell traversal on a non-uniform z grid must equal the
    N^2 oracle (the grid only changes the search structure)."""
    from ls1_mardyn_tpu.io.generators import mktcts
    from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit
    from ls1_mardyn_tpu.ops.cellforce import compute_forces_cells
    from ls1_mardyn_tpu.scene import build_scene

    box = [7.0, 7.0, 21.0]
    data = mktcts(0.7, 0.02, box, 0.9, axis=2, seed=3)
    mol, pp, table, gbox = build_scene(data, cutoff=2.5, dtype=jnp.float64)
    f_ref, m_ref = compute_forces_n2_jit(mol, pp, gbox)

    edges = adaptive_z_edges(data.r, box, (2, 2), 2.5, occ_limit=40)
    assert edges is not None and len(edges) - 1 >= 3
    spec = CellGridSpec.create(np.asarray(box), 2.5, cap=64)
    import dataclasses
    spec = dataclasses.replace(
        spec, dims=(spec.dims[0], spec.dims[1], len(edges) - 1),
        z_edges=edges,
    )
    nbr_ids, nbr_shift = neighbor_table(spec)
    bins = bin_particles(mol.r, mol.valid, spec)
    assert not bool(bins.overflow)
    f_k, m_k = jax.jit(
        lambda mol, bins: compute_forces_cells(
            mol, pp, spec, bins,
            jnp.asarray(nbr_ids), jnp.asarray(nbr_shift, mol.r.dtype),
        )
    )(mol, bins)
    scale = np.abs(np.asarray(f_ref.F)).max()
    np.testing.assert_allclose(
        np.asarray(f_k.F) / scale, np.asarray(f_ref.F) / scale, atol=1e-11
    )
    np.testing.assert_allclose(float(m_k.upot), float(m_ref.upot), rtol=1e-10)


def test_driver_adopts_adaptive_rows_and_runs(tmp_path, monkeypatch):
    """A dense two-phase slab scene through the driver should adopt
    non-uniform rows (lower cap) and run end-to-end."""
    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.generators import mktcts
    from ls1_mardyn_tpu.io.xml_config import XMLConfig

    os.chdir(tmp_path)
    # cubic box (the lattice generator needs isotropy), thin liquid
    # slab along z -> most of the box is vapor
    box = np.array([21.0, 21.0, 21.0])
    data = mktcts(0.7, 0.001, box, 0.9, liq_fraction=0.2, axis=2, seed=5)
    cfg = XMLConfig(
        timestep=0.002, temperature=0.9, box=box,
        cutoff=2.5, lj_cutoff=2.5,
    )
    monkeypatch.setattr(
        MDSimulation, "_load_phasespace", lambda self, c: data
    )
    sim = MDSimulation(cfg, dtype=jnp.float64, force_mode="cells")
    assert sim._z_edges is not None, "inhomogeneous scene must adopt z rows"
    assert sim.engine.spec.z_edges is not None
    assert sim.engine.spec.dims[2] < 8  # wide vapor rows replaced 8
    gv = sim.run(steps=5, print_every=0)
    assert np.isfinite(float(gv.upot)) and float(gv.upot) < 0
