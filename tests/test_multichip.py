"""Multi-chip slab decomposition tests on the virtual 8-device CPU mesh.

The analogue of the reference's DomainDecompositionTest /
sequential-vs-parallel validation cross-check (SURVEY.md section 4:
compare the PAR run against the SEQ base on identical inputs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
from ls1_mardyn_tpu.parallel.decomposition import SlabConfig, SlabSimulation
from ls1_mardyn_tpu.scene import build_scene
from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation

P = 8


def _scene(nz=8, nx=4, ny=4, rho=0.5, T=1.0, cell=2.6, rc=2.5, seed=11):
    box = (nx * cell, ny * cell, nz * cell)
    n = int(rho * box[0] * box[1] * box[2])
    data = cubic_grid(n, list(box), T, seed=seed)
    mol, pp, table, gbox = build_scene(data, cutoff=rc, dtype=jnp.float64)
    return mol, pp, table, box, rc, n, T


def _slab_sim(mol, pp, table, box, rc, n, T, dims, dt=0.002, thermostat=True):
    nx, ny, nz = dims
    cfg = SlabConfig(
        n_devices=P,
        nz_local=nz // P,
        ny=ny,
        nx=nx,
        cap=32,
        box=box,
        n_local_cap=2 * n // P + 64,
        migrate_cap=64,
        tx=4,
        dt=dt,
        target_temperature=T,
        thermostat=thermostat,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=rc * rc,
        interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:P]), ("dd",))
    return SlabSimulation(cfg, pp, mesh=mesh)


def test_sharded_forces_match_single_chip():
    mol, pp, table, box, rc, n, T = _scene()
    sim = _slab_sim(mol, pp, table, box, rc, n, T, (4, 4, 8))

    # single-chip reference via the (oracle-validated) Pallas path
    spec = CellGridSpec(dims=(4, 4, 8), box=box, cap=32)
    path = PallasLJPath(table, spec, tx=4, interpret=True)
    f_ref, m_ref, _ = jax.jit(path.__call__)(mol)

    mol_sh = sim.distribute(mol)
    (F_sh, M_sh, _Vi), u6, uX, rf, vir = sim._force_sharded(mol_sh)

    # compare per molecule id
    mids_sh = np.asarray(mol_sh.mid)
    valid_sh = np.asarray(mol_sh.valid)
    F_by_id = {}
    Fs = np.asarray(F_sh)
    for i in np.where(valid_sh)[0]:
        F_by_id[mids_sh[i]] = Fs[i]
    mids = np.asarray(mol.mid)
    F_ref = np.asarray(f_ref.F)
    scale = np.abs(F_ref).max()
    for i in range(n):
        np.testing.assert_allclose(
            F_by_id[mids[i]] / scale, F_ref[i] / scale, atol=1e-12
        )
    np.testing.assert_allclose(float(u6), float(m_ref.upot6lj), rtol=1e-12)
    np.testing.assert_allclose(float(vir), float(m_ref.virial), rtol=1e-12)


def test_sharded_steps_match_single_chip():
    """Run 5 NVT steps on both paths; global T and Upot must agree
    (trajectories identical modulo summation order)."""
    mol, pp, table, box, rc, n, T = _scene()
    sim = _slab_sim(mol, pp, table, box, rc, n, T, (4, 4, 8))
    mol_sh = sim.distribute(mol)
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    for _ in range(5):
        mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)

    spec = CellGridSpec(dims=(4, 4, 8), box=box, cap=32)
    path = PallasLJPath(table, spec, tx=4, interpret=True)
    cfg1 = SimConfig(dt=0.002, target_temperature=T, thermostat=True)
    ssim = SingleChipSimulation(mol, pp, box, cfg1, force_fn=path)
    gv1 = ssim.run(5)

    np.testing.assert_allclose(
        float(gv.temperature), float(gv1.temperature), rtol=1e-10
    )
    np.testing.assert_allclose(float(gv.upot), float(gv1.upot), rtol=1e-9)
    assert int(float(gv.n)) == n


def _ms_scene(nz=8, nx=4, ny=4, cell=2.6, rc=2.5, seed=7):
    """Jittered-lattice 2CLJ+dipole fluid (nontrivial orientations and
    torques) spanning 8 z slabs."""
    from ls1_mardyn_tpu.models.components import Component, ComponentTable
    from ls1_mardyn_tpu.state import MoleculeState

    box = (nx * cell, ny * cell, nz * cell)
    gx, gy, gz = nx, ny, nz  # one molecule per cell-ish
    idx = np.stack(
        np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz), indexing="ij"),
        -1,
    ).reshape(-1, 3)
    rng = np.random.default_rng(seed)
    r = (idx + 0.5) * cell + rng.uniform(-0.3, 0.3, idx.shape)
    n = r.shape[0]
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v = rng.normal(size=(n, 3)) * 0.3
    L = rng.normal(size=(n, 3)) * 0.1

    c = Component(cid=0)
    c.add_ljcenter(0.0, 0.0, 0.5, 0.5, 1.0, 1.0, rc, True)
    c.add_ljcenter(0.0, 0.0, -0.5, 0.5, 1.0, 1.0, rc, True)
    c.add_dipole(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.5)
    table = ComponentTable([c], cutoff=rc, lj_cutoff=rc)
    from ls1_mardyn_tpu.models.interaction import PairParams

    pp = PairParams.from_table(table, dtype=jnp.float64)
    mol = MoleculeState.from_numpy(
        r=r, v=v, q=q, L=L, cid=np.zeros(n, np.int32), dtype=jnp.float64
    )
    return mol, pp, table, box, rc, n


def _ms_slab_sim(pp, table, box, rc, n, dims, dt=0.002, thermostat=True):
    from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta

    nx, ny, nz = dims
    cfg = SlabConfig(
        n_devices=P,
        nz_local=nz // P,
        ny=ny,
        nx=nx,
        cap=32,
        box=box,
        n_local_cap=2 * n // P + 64,
        migrate_cap=64,
        tx=4,
        dt=dt,
        target_temperature=1.0,
        thermostat=thermostat,
        eps24=0.0,
        sig2=0.0,
        shift6=0.0,
        rc2=rc * rc,
        interpret=True,
        ms_meta=_MSMeta(table),
        rc2_lj=float(table.lj_cutoff**2),
    )
    mesh = Mesh(np.array(jax.devices()[:P]), ("dd",))
    return SlabSimulation(cfg, pp, mesh=mesh)


def test_sharded_multisite_forces_match_single_chip():
    """Sharded multi-site (2CLJ+dipole) forces/torques == the
    oracle-validated single-chip PallasMultiSitePath, per molecule id."""
    from ls1_mardyn_tpu.ops.pallas_ms_path import PallasMultiSitePath

    mol, pp, table, box, rc, n = _ms_scene()
    sim = _ms_slab_sim(pp, table, box, rc, n, (4, 4, 8))

    spec = CellGridSpec(dims=(4, 4, 8), box=box, cap=32)
    path = PallasMultiSitePath(table, spec, tx=4, interpret=True)
    f_ref, m_ref, _ = jax.jit(path.__call__)(mol)

    mol_sh = sim.distribute(mol)
    (F_sh, M_sh, _Vi), u6, uX, rf, vir = sim._force_sharded(mol_sh)

    mids_sh = np.asarray(mol_sh.mid)
    valid_sh = np.asarray(mol_sh.valid)
    by_id = {}
    Fs, Ms = np.asarray(F_sh), np.asarray(M_sh)
    for i in np.where(valid_sh)[0]:
        by_id[mids_sh[i]] = (Fs[i], Ms[i])
    mids = np.asarray(mol.mid)
    F_ref, M_ref = np.asarray(f_ref.F), np.asarray(f_ref.M)
    fscale = np.abs(F_ref).max()
    mscale = np.abs(M_ref).max()
    for i in range(n):
        fi, mi = by_id[mids[i]]
        np.testing.assert_allclose(fi / fscale, F_ref[i] / fscale, atol=1e-12)
        np.testing.assert_allclose(mi / mscale, M_ref[i] / mscale, atol=1e-12)
    np.testing.assert_allclose(float(u6), float(m_ref.upot6lj), rtol=1e-12)
    np.testing.assert_allclose(float(uX), float(m_ref.upot_xpoles), rtol=1e-12)
    np.testing.assert_allclose(float(vir), float(m_ref.virial), rtol=1e-12)


def test_sharded_multisite_steps_run():
    """5 sharded NVT steps on the multi-site path: finite T/Upot, no
    overflow, molecule count conserved."""
    mol, pp, table, box, rc, n = _ms_scene()
    sim = _ms_slab_sim(pp, table, box, rc, n, (4, 4, 8))
    mol_sh = sim.distribute(mol)
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    for _ in range(5):
        mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)
    assert int(float(gv.n)) == n
    assert np.isfinite(float(gv.temperature)) and float(gv.temperature) > 0
    assert np.isfinite(float(gv.upot))


def test_migration_across_slabs():
    """Molecules pushed across slab boundaries (incl. the periodic z
    wrap) must arrive at the right owner with state intact."""
    mol, pp, table, box, rc, n, T = _scene()
    sim = _slab_sim(mol, pp, table, box, rc, n, T, (4, 4, 8), thermostat=False)
    mol_sh = sim.distribute(mol)
    # give every molecule a strong +z velocity so many cross upward,
    # including over the periodic wrap at the top slab
    v = np.array(mol_sh.v)
    v[:, 2] = 2.0  # dt=0.002 -> dz=0.004 per step; boundary particles cross
    mol_sh = dataclasses.replace(
        mol_sh,
        v=jax.device_put(jnp.asarray(v), mol_sh.v.sharding),
    )
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    ids_before = set(
        np.asarray(mol_sh.mid)[np.asarray(mol_sh.valid)].tolist()
    )
    total_before = len(ids_before)
    for _ in range(20):
        mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)
    valid = np.asarray(mol_sh.valid)
    ids_after = np.asarray(mol_sh.mid)[valid]
    # no molecule lost or duplicated (assertDisjunctivity analogue,
    # DomainDecompBase.h:165)
    assert len(ids_after) == total_before
    assert set(ids_after.tolist()) == ids_before
    # every molecule is inside its owner's slab
    z = np.asarray(mol_sh.r)[:, 2]
    slab_h = box[2] / P
    ncap = sim.cfg.n_local_cap
    for p in range(P):
        zs = z[p * ncap : (p + 1) * ncap][valid[p * ncap : (p + 1) * ncap]]
        assert ((zs >= p * slab_h - 1e-9) & (zs < (p + 1) * slab_h + 1e-9)).all()


def test_migration_two_devices_no_duplication():
    """With P=2 the +-1 neighbors coincide; a crossing molecule must
    arrive exactly once (regression: it used to ride both rings)."""
    mol, pp, table, box, rc, n, T = _scene(nz=8)
    cfg = SlabConfig(
        n_devices=2, nz_local=4, ny=4, nx=4, cap=32, box=box,
        n_local_cap=n + 64, migrate_cap=256, tx=4, dt=0.002,
        target_temperature=T, thermostat=False,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=rc * rc, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("dd",))
    sim = SlabSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    v = np.array(mol_sh.v)
    v[:, 2] = 3.0
    mol_sh = dataclasses.replace(
        mol_sh, v=jax.device_put(jnp.asarray(v), mol_sh.v.sharding)
    )
    ids_before = sorted(
        np.asarray(mol_sh.mid)[np.asarray(mol_sh.valid)].tolist()
    )
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    for _ in range(30):
        mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)
    valid = np.asarray(mol_sh.valid)
    ids_after = sorted(np.asarray(mol_sh.mid)[valid].tolist())
    assert ids_after == ids_before  # nothing lost, nothing duplicated


def test_single_device_slab_is_closed():
    """P=1 slab decomposition: nothing ever 'leaves' (regression: every
    molecule used to be flagged as leaving down and truncated)."""
    mol, pp, table, box, rc, n, T = _scene(nz=8)
    cfg = SlabConfig(
        n_devices=1, nz_local=8, ny=4, nx=4, cap=32, box=box,
        n_local_cap=n + 64, migrate_cap=64, tx=4, dt=0.002,
        target_temperature=T, thermostat=True,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=rc * rc, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("dd",))
    sim = SlabSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    for _ in range(5):
        mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)
    assert int(float(gv.n)) == n


def test_migrate_overflow_is_lossless():
    """When more molecules cross a slab boundary in one step than
    migrate_cap can carry (a lattice plane sitting exactly on the
    boundary can do this), the overflow TAIL must stay valid locally
    -- the step flags overflow for the driver's re-spec, but NO
    molecule may vanish (regression: the tail used to be silently
    deleted along with the sent leavers)."""
    mol, pp, table, box, rc, n, T = _scene()
    sim = _slab_sim(mol, pp, table, box, rc, n, T, (4, 4, 8),
                    thermostat=False)
    # shrink migrate_cap so a mass crossing overflows
    cfg2 = dataclasses.replace(sim.cfg, migrate_cap=2)
    sim2 = SlabSimulation(cfg2, pp, mesh=sim.mesh)
    mol_sh = sim2.distribute(mol)
    v = np.array(mol_sh.v)
    v[:, 2] = 20.0  # dz = 0.04/step: every boundary-layer molecule crosses
    mol_sh = dataclasses.replace(
        mol_sh, v=jax.device_put(jnp.asarray(v), mol_sh.v.sharding)
    )
    FM, _, _, _, _ = sim2._force_sharded(mol_sh)
    ids_before = set(
        np.asarray(mol_sh.mid)[np.asarray(mol_sh.valid)].tolist()
    )
    mol_sh, FM, gv, overflow = sim2._step_sharded(mol_sh, FM)
    assert bool(overflow)  # the cap is tiny; the flag must fire
    valid = np.asarray(mol_sh.valid)
    ids_after = np.asarray(mol_sh.mid)[valid]
    assert len(ids_after) == len(ids_before)
    assert set(ids_after.tolist()) == ids_before
