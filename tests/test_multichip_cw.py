"""Cell-window (cw) 1CLJ kernel on the slab decomposition: forces and
globals must match the absolute-coordinate row-kernel path on the same
sharded state (same binning, different kernel + cell-local views), and
the full sharded step must run through the cw selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.parallel.decomposition import SlabConfig, SlabSimulation
from ls1_mardyn_tpu.scene import build_scene

N_DEV = 8


@pytest.fixture(scope="module")
def slab_pair():
    if jax.device_count() < N_DEV:
        pytest.skip(f"needs {N_DEV} devices")
    n, rc = 900, 2.5
    # nx = ny = 8 cells of edge 2.6 >= rc; at n=900 the lattice
    # spacing (~2.2) is INSIDE the cutoff (a 500-molecule lattice in
    # this box has spacing 2.6 > rc: zero forces, vacuous comparison)
    L = 8 * 2.6
    data = cubic_grid(n, [L, L, L], 1.1, seed=9)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    common = dict(
        n_devices=N_DEV, nz_local=1, ny=8, nx=8, cap=32,
        box=(L, L, L), n_local_cap=2 * n // N_DEV + 128,
        migrate_cap=64, tx=4, dt=0.002, target_temperature=1.1,
        thermostat=True,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=rc * rc, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("dd",))
    sim_row = SlabSimulation(SlabConfig(**common), pp, mesh=mesh)
    sim_cw = SlabSimulation(
        SlabConfig(cw_eligible=True, **common), pp, mesh=mesh
    )
    return sim_row, sim_cw, mol


def test_cw_slab_forces_match_row(slab_pair):
    sim_row, sim_cw, mol = slab_pair
    ms = sim_row.distribute(mol)
    (F_a, _, _), u6_a, _, _, vir_a = sim_row._force_sharded(ms)
    (F_b, _, _), u6_b, _, _, vir_b = sim_cw._force_sharded(ms)
    fa, fb = np.asarray(F_a), np.asarray(F_b)
    assert np.isfinite(fa).all() and np.isfinite(fb).all()
    scale = np.abs(fa).max()
    assert scale > 0
    np.testing.assert_allclose(fb / scale, fa / scale, atol=2e-6)
    assert float(u6_a) != 0.0
    np.testing.assert_allclose(float(u6_b), float(u6_a), rtol=1e-5)
    np.testing.assert_allclose(float(vir_b), float(vir_a), rtol=1e-5)


def test_cw_compute_vi_matches_oracle(slab_pair):
    """compute_vi=True: the cw kernel's per-molecule per-axis virials
    must match the N^2 oracle (FullMolecule::Vi semantics,
    VectorizedCellProcessor.h:140-186), and their sum must equal the
    scalar virial."""
    sim_row, sim_cw, mol = slab_pair
    import dataclasses as _dc

    from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit

    sim_vi = SlabSimulation(
        _dc.replace(sim_cw.cfg, compute_vi=True), sim_cw.pp,
        mesh=sim_cw.mesh,
    )
    ms = sim_vi.distribute(mol)
    (F, _M, Vi), u6, _uX, _rf, vir = sim_vi._force_sharded(ms)
    # the oracle runs on the same sharded slot order (valid-masked N^2)
    box = jnp.asarray(sim_vi.cfg.box)
    forces_o, macro_o = compute_forces_n2_jit(ms, sim_vi.pp, box)
    vo = np.asarray(forces_o.Vi)
    vk = np.asarray(Vi)
    valid = np.asarray(ms.valid)
    scale = np.abs(vo[valid]).max()
    assert scale > 0
    np.testing.assert_allclose(
        vk[valid] / scale, vo[valid] / scale, atol=2e-6
    )
    # sum of per-molecule Vi = global scalar virial (potforce.h:498-499)
    np.testing.assert_allclose(
        float(np.sum(vk[valid])), float(vir), rtol=1e-5
    )


def test_cw_slab_step_runs_and_conserves(slab_pair):
    sim_row, sim_cw, mol = slab_pair
    ms = sim_cw.distribute(mol)
    FM = sim_cw.make_aux(sim_cw._force_sharded(ms)[0])
    gv_row = None
    ms_r = sim_row.distribute(mol)
    FM_r = sim_row.make_aux(sim_row._force_sharded(ms_r)[0])
    for _ in range(5):
        ms, FM, gv, ovf = sim_cw._step_sharded(ms, FM)
        ms_r, FM_r, gv_row, ovf_r = sim_row._step_sharded(ms_r, FM_r)
        assert not bool(ovf) and not bool(ovf_r)
    np.testing.assert_allclose(
        float(gv.upot), float(gv_row.upot), rtol=5e-5
    )
    np.testing.assert_allclose(
        float(gv.temperature), float(gv_row.temperature), rtol=5e-5
    )
