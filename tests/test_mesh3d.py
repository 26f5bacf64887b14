"""3-D Cartesian mesh decomposition tests on a 2x2x2 virtual CPU mesh.

The analogue of the reference's DomainDecompositionTest for the full
Cartesian grid (src/parallel/DomainDecomposition.h MPIGridDims +
IndirectNeighbourCommunicationScheme 3-stage exchange): the PAR run
over (2,2,2) must reproduce the SEQ single-chip run on identical
inputs (SURVEY.md section 4 cross-check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
from ls1_mardyn_tpu.parallel.mesh3d import AX, Mesh3DConfig, Mesh3DSimulation
from ls1_mardyn_tpu.scene import build_scene
from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation

GRID = (2, 2, 2)


def _scene(nx=4, ny=4, nz=4, rho=0.5, T=1.0, cell=2.6, rc=2.5, seed=11):
    box = (nx * cell, ny * cell, nz * cell)
    n = int(rho * box[0] * box[1] * box[2])
    data = cubic_grid(n, list(box), T, seed=seed)
    mol, pp, table, gbox = build_scene(data, cutoff=rc, dtype=jnp.float64)
    return mol, pp, table, box, rc, n, T


def _mesh_sim(mol, pp, table, box, rc, n, T, dims, dt=0.002):
    nx, ny, nz = dims
    gx, gy, gz = GRID
    cfg = Mesh3DConfig(
        grid=GRID,
        nxl=nx // gx,
        nyl=ny // gy,
        nzl=nz // gz,
        cap=32,
        box=box,
        n_local_cap=2 * n // 8 + 64,
        migrate_cap=64,
        tx=nx // gx,
        dt=dt,
        target_temperature=T,
        thermostat=True,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=rc * rc,
        interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(GRID), AX)
    return Mesh3DSimulation(cfg, pp, mesh=mesh)


def test_mesh3d_forces_match_single_chip():
    mol, pp, table, box, rc, n, T = _scene()
    sim = _mesh_sim(mol, pp, table, box, rc, n, T, (4, 4, 4))

    spec = CellGridSpec(dims=(4, 4, 4), box=box, cap=32)
    path = PallasLJPath(table, spec, tx=4, interpret=True)
    f_ref, m_ref, _ = jax.jit(path.__call__)(mol)

    mol_sh = sim.distribute(mol)
    (F_sh, M_sh, _Vi), packed, ovf = sim._force_sharded(mol_sh)
    assert int(np.asarray(ovf).max()) == 0
    u6, uX, rf, vir = np.asarray(packed)

    mids_sh = np.asarray(mol_sh.mid)
    valid_sh = np.asarray(mol_sh.valid)
    Fs = np.asarray(F_sh)
    F_by_id = {mids_sh[i]: Fs[i] for i in np.where(valid_sh)[0]}
    assert len(F_by_id) == n  # disjunctivity: every molecule owned once
    mids = np.asarray(mol.mid)
    F_ref = np.asarray(f_ref.F)
    scale = np.abs(F_ref).max()
    for i in range(n):
        np.testing.assert_allclose(
            F_by_id[mids[i]] / scale, F_ref[i] / scale, atol=1e-12
        )
    np.testing.assert_allclose(float(u6), float(m_ref.upot6lj), rtol=1e-12)
    np.testing.assert_allclose(float(vir), float(m_ref.virial), rtol=1e-12)


def test_mesh3d_steps_match_single_chip():
    """5 NVT steps across the 2x2x2 mesh (migration through faces,
    edges, and corners included) must reproduce the single-chip global
    observables."""
    mol, pp, table, box, rc, n, T = _scene()
    sim = _mesh_sim(mol, pp, table, box, rc, n, T, (4, 4, 4))
    mol_sh = sim.distribute(mol)
    mol_sh, gv = sim.run(mol_sh, 5, check_overflow_every=1)

    spec = CellGridSpec(dims=(4, 4, 4), box=box, cap=32)
    path = PallasLJPath(table, spec, tx=4, interpret=True)
    cfg1 = SimConfig(dt=0.002, target_temperature=T, thermostat=True)
    ssim = SingleChipSimulation(mol, pp, box, cfg1, force_fn=path)
    gv1 = ssim.run(5)

    np.testing.assert_allclose(
        float(gv.temperature), float(gv1.temperature), rtol=1e-10
    )
    np.testing.assert_allclose(float(gv.upot), float(gv1.upot), rtol=1e-9)
    assert int(float(gv.n)) == n
    # no molecule lost or duplicated across 3-stage migrations
    g = sim.gather_global(mol_sh)
    mids = np.sort(np.asarray(g.mid)[np.asarray(g.valid)])
    assert len(mids) == n and len(np.unique(mids)) == n


def test_mesh3d_pme_matches_single_chip():
    """SPME k-space on the 3-D mesh (charge mesh psummed over all
    three axes) must equal the single-chip PMESolver per molecule."""
    from ls1_mardyn_tpu.ops.pallas_ms_path import PallasMultiSitePath
    from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta
    from ls1_mardyn_tpu.ops.pme import PMEParams, PMESolver
    from test_ewald_multichip import _salt_scene, ALPHA, RC

    mol, pp, table, box, n = _salt_scene()
    dims = (2, 2, 8)
    grid = (16, 16, 64)

    spec = CellGridSpec(dims=dims, box=box, cap=32)
    path = PallasMultiSitePath(table, spec, tx=2, interpret=True,
                               screen_alpha=ALPHA)
    f_pair, m_pair, _ = jax.jit(path.__call__)(mol)
    solver = PMESolver(box, PMEParams(alpha=ALPHA, grid=grid, order=4),
                       dtype=jnp.float64)
    u_ew, F_ew, M_ew = jax.jit(solver.__call__)(mol, pp)
    F_ref = np.asarray(f_pair.F) + np.asarray(F_ew)

    cfg = Mesh3DConfig(
        grid=GRID, nxl=1, nyl=1, nzl=4, cap=32, box=box,
        n_local_cap=2 * n // 8 + 64, migrate_cap=64, tx=1, dt=0.001,
        target_temperature=0.8, thermostat=True,
        eps24=0.0, sig2=0.0, shift6=0.0,
        rc2=RC * RC, interpret=True,
        ms_meta=_MSMeta(table), rc2_lj=float(table.lj_cutoff ** 2),
        screen_alpha=ALPHA, ewald_alpha=ALPHA,
        pme_grid=grid, pme_order=4,
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(GRID), AX)
    sim = Mesh3DSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    (F_sh, M_sh, _Vi), packed, ovf = sim._force_sharded(mol_sh)
    assert int(np.asarray(ovf).max()) == 0
    u6, uX, rf, vir = np.asarray(packed)

    mids_sh = np.asarray(mol_sh.mid)
    valid_sh = np.asarray(mol_sh.valid)
    Fs = np.asarray(F_sh)
    by_id = {mids_sh[i]: Fs[i] for i in np.where(valid_sh)[0]}
    mids = np.asarray(mol.mid)
    scale = np.abs(F_ref).max()
    for i in range(n):
        np.testing.assert_allclose(
            by_id[mids[i]] / scale, F_ref[i] / scale, atol=1e-11
        )
    uX_ref = float(m_pair.upot_xpoles) + float(u_ew)
    np.testing.assert_allclose(float(uX), uX_ref, rtol=1e-10)


def test_mesh3d_migrate_overflow_is_lossless():
    """Mesh3d twin of the slab regression: when more molecules cross a
    device boundary in one step than migrate_cap can carry, the unsent
    tail must stay valid locally (overflow flagged, nothing deleted)."""
    import dataclasses

    mol, pp, table, box, rc, n, T = _scene()
    sim = _mesh_sim(mol, pp, table, box, rc, n, T, (4, 4, 4))
    cfg2 = dataclasses.replace(sim.cfg, migrate_cap=2, thermostat=False)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(GRID), AX)
    sim2 = Mesh3DSimulation(cfg2, pp, mesh=mesh)
    mol_sh = sim2.distribute(mol)
    v = np.array(mol_sh.v)
    v[:, :] = 200.0  # dz=0.4/step: ~5 crossers per face > cap 2
    mol_sh = dataclasses.replace(
        mol_sh, v=jax.device_put(jnp.asarray(v), mol_sh.v.sharding)
    )
    FM = sim2._force_sharded(mol_sh)[0]
    ids_before = set(
        np.asarray(mol_sh.mid)[np.asarray(mol_sh.valid)].tolist()
    )
    out = sim2._step_sharded(
        mol_sh, FM, jnp.asarray(1, jnp.int32), sim2._bounds_default
    )
    mol_sh, overflow = out[0], out[4]
    assert bool(np.any(np.asarray(overflow)))
    valid = np.asarray(mol_sh.valid)
    ids_after = np.asarray(mol_sh.mid)[valid]
    assert len(ids_after) == len(ids_before)
    assert set(ids_after.tolist()) == ids_before
