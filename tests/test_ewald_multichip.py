"""Multi-chip Ewald: slab-sharded k-space (psum of structure factors)
+ erfc-screened real space through the multi-site kernel must equal the
single-chip Ewald path per molecule id."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
from ls1_mardyn_tpu.models.components import Component
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.ewald import EwaldParams, EwaldSolver
from ls1_mardyn_tpu.ops.pallas_ms_path import PallasMultiSitePath
from ls1_mardyn_tpu.parallel.decomposition import SlabConfig, SlabSimulation
from ls1_mardyn_tpu.scene import build_scene

P = 8
ALPHA = 1.0
KMAX = 8
RC = 2.5


def _salt_scene(d=1.3):
    """Rock-salt ionic LJ lattice, 4 x 4 x 16 ions -> 8 z slabs."""
    comps = []
    for sign in (1.0, -1.0):
        c = Component(cid=len(comps))
        c.add_ljcenter(0, 0, 0, 1.0, 0.2, 1.0)
        c.add_charge(0, 0, 0, 0.0, sign)
        comps.append(c)
    gx, gy, gz = 4, 4, 16
    g = np.stack(
        np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                    indexing="ij"), -1,
    ).reshape(-1, 3)
    # jitter breaks the lattice symmetry so forces are O(1), not noise
    rng = np.random.default_rng(17)
    r = (g + 0.5) * d + rng.uniform(-0.15, 0.15, (len(g), 3))
    qsign = np.where(g.sum(1) % 2 == 0, 1.0, -1.0)
    box = np.array([gx * d, gy * d, gz * d])
    data = PhaseSpaceData(
        components=comps,
        mixing_xi=np.ones((2, 2)),
        mixing_eta=np.ones((2, 2)),
        eps_rf=1.0,
        box=box,
        temperature=0.8,
        current_time=0.0,
        mid=np.arange(1, len(r) + 1, dtype=np.int64),
        cid=np.where(qsign > 0, 0, 1).astype(np.int32),
        r=r,
        v=np.zeros_like(r),
        q=np.tile([1.0, 0, 0, 0], (len(r), 1)),
        L=np.zeros_like(r),
    )
    mol, pp, table, gbox = build_scene(data, cutoff=RC, dtype=jnp.float64)
    return mol, pp, table, tuple(float(b) for b in box), len(r)


def test_sharded_ewald_matches_single_chip():
    from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta

    mol, pp, table, box, n = _salt_scene()
    dims = (2, 2, 8)

    # single chip: screened pair kernel + reciprocal solver
    spec = CellGridSpec(dims=dims, box=box, cap=32)
    path = PallasMultiSitePath(table, spec, tx=2, interpret=True,
                               screen_alpha=ALPHA)
    f_pair, m_pair, _ = jax.jit(path.__call__)(mol)
    solver = EwaldSolver(box, EwaldParams(alpha=ALPHA, kmax=KMAX),
                         dtype=jnp.float64)
    u_ew, F_ew, M_ew = jax.jit(solver.__call__)(mol, pp)
    F_ref = np.asarray(f_pair.F) + np.asarray(F_ew)
    uX_ref = float(m_pair.upot_xpoles) + float(u_ew)

    # sharded
    cfg = SlabConfig(
        n_devices=P, nz_local=1, ny=2, nx=2, cap=32, box=box,
        n_local_cap=2 * n // P + 64, migrate_cap=64, tx=2, dt=0.001,
        target_temperature=0.8, thermostat=True,
        eps24=0.0, sig2=0.0, shift6=0.0,
        rc2=RC * RC, interpret=True,
        ms_meta=_MSMeta(table), rc2_lj=float(table.lj_cutoff**2),
        screen_alpha=ALPHA, ewald_kmax=KMAX, ewald_alpha=ALPHA,
    )
    mesh = Mesh(np.array(jax.devices()[:P]), ("dd",))
    sim = SlabSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    (F_sh, M_sh, _Vi), u6, uX, rf, vir = sim._force_sharded(mol_sh)

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
    np.testing.assert_allclose(float(uX), uX_ref, rtol=1e-10)
    np.testing.assert_allclose(float(u6), float(m_pair.upot6lj), rtol=1e-10)

    # and the full sharded NVT step runs with Ewald forces in the loop
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    mol2, FM2, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)
    assert np.isfinite(float(gv.upot)) and float(gv.upot) < 0


def test_sharded_pme_matches_single_chip():
    """SPME mesh k-space under shard_map (psum of the charge mesh) must
    equal the single-chip PMESolver per molecule id."""
    from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta
    from ls1_mardyn_tpu.ops.pme import PMEParams, PMESolver

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
    uX_ref = float(m_pair.upot_xpoles) + float(u_ew)

    cfg = SlabConfig(
        n_devices=P, nz_local=1, ny=2, nx=2, cap=32, box=box,
        n_local_cap=2 * n // P + 64, migrate_cap=64, tx=2, dt=0.001,
        target_temperature=0.8, thermostat=True,
        eps24=0.0, sig2=0.0, shift6=0.0,
        rc2=RC * RC, interpret=True,
        ms_meta=_MSMeta(table), rc2_lj=float(table.lj_cutoff**2),
        screen_alpha=ALPHA, ewald_alpha=ALPHA,
        pme_grid=grid, pme_order=4,
    )
    mesh = Mesh(np.array(jax.devices()[:P]), ("dd",))
    sim = SlabSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    (F_sh, M_sh, _Vi), u6, uX, rf, vir = sim._force_sharded(mol_sh)

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
    np.testing.assert_allclose(float(uX), uX_ref, rtol=1e-10)
