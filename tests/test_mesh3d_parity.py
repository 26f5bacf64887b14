"""mesh3d feature parity with the slab decomposition: muVT GCMC,
TemperatureControl regions, and per-molecule virials -- the reference's
decompositions are interchangeable under one interface
(/root/reference/src/parallel/DomainDecompBase.h:51), so every feature
must work under each.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ls1_mardyn_tpu.ensemble.grand_canonical import (
    ChemicalPotential,
    single_molecule_energy,
)
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.parallel.gcmc import Mesh3DGrandCanonical
from ls1_mardyn_tpu.parallel.mesh3d import AX, Mesh3DConfig, Mesh3DSimulation
from ls1_mardyn_tpu.scene import build_scene

GRID = (2, 2, 2)


def _mesh_sim(rho=0.4, T=1.2, cell=2.6, rc=2.5, seed=9, regions=(),
              extra_slots=64):
    box = (4 * cell, 4 * cell, 4 * cell)
    n = int(rho * np.prod(box))
    data = cubic_grid(n, list(box), T, seed=seed)
    mol, pp, table, _ = build_scene(data, cutoff=rc, dtype=jnp.float64)
    cfg = Mesh3DConfig(
        grid=GRID, nxl=2, nyl=2, nzl=2, cap=32, box=box,
        n_local_cap=2 * n // 8 + extra_slots, migrate_cap=64, tx=2,
        dt=0.002, target_temperature=T, thermostat=True,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=rc * rc, interpret=True,
        temp_control_regions=tuple(regions),
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(GRID), AX)
    return Mesh3DSimulation(cfg, pp, mesh=mesh), mol, pp, box, n, T


def test_mesh3d_gcmc_probe_matches_single_chip():
    sim, mol, pp, box, n, T = _mesh_sim()
    mol_sh = sim.distribute(mol)
    gc = Mesh3DGrandCanonical(sim, [ChemicalPotential(mu=0.0)], T)
    rng = np.random.default_rng(3)
    for _ in range(4):
        r = rng.uniform(0, 1, 3) * np.asarray(box)
        q = np.array([1.0, 0, 0, 0])
        e_sh = gc.probe_energy(mol_sh, r, q, 0)
        e_ref = float(
            single_molecule_energy(
                mol, pp, jnp.asarray(box, jnp.float64),
                jnp.asarray(r), jnp.asarray(q),
                jnp.asarray(0, jnp.int32), jnp.asarray(-1, jnp.int32),
            )
        )
        np.testing.assert_allclose(e_sh, e_ref, rtol=1e-10)


def test_mesh3d_gcmc_moves_with_md_steps():
    """Insertions land on their owner mesh cell (so subsequent
    migration stays consistent), deletions stay consistent, MD steps
    interleave without overflow."""
    sim, mol, pp, box, n, T = _mesh_sim()
    mol_sh = sim.distribute(mol)
    gc = Mesh3DGrandCanonical(
        sim,
        [ChemicalPotential(mu=5.0, interval=1, insertions_per_interval=4,
                           deletions_per_interval=2)],
        T, seed=7,
    )
    FM, _, _ = sim._force_sharded(mol_sh)
    cfg = sim.cfg
    lb = cfg.local_box
    for step in range(1, 5):
        mol_sh = gc.step(mol_sh, step)
        # owner-consistency: every valid molecule sits in the segment
        # of the device that owns its position
        r = np.asarray(mol_sh.r)
        valid = np.asarray(mol_sh.valid)
        seg_of = np.arange(len(valid)) // cfg.n_local_cap
        o = np.stack(
            [np.clip((r[:, d] / lb[d]).astype(int), 0, cfg.grid[d] - 1)
             for d in range(3)], axis=1,
        )
        lin = (o[:, 0] * cfg.grid[1] + o[:, 1]) * cfg.grid[2] + o[:, 2]
        assert (seg_of[valid] == lin[valid]).all()
        mol_sh, FM, gv, ovf = sim.step(mol_sh, FM, step)
        assert not bool(np.asarray(ovf))
        assert np.isfinite(float(gv.upot))
    assert gc.attempted > 0
    assert gc.accepted_ins > 0  # mu=5 drives insertions


def test_mesh3d_temperature_control_region():
    """A cold control region thermostats its molecules toward the
    region target while the global thermostat is off; mirrors the slab
    decomposition's behavior (TemperatureControl.cpp:364-430)."""
    import dataclasses as dc

    from ls1_mardyn_tpu.ops.thermostat import TemperatureControlRegion

    T_region = 0.5
    full_box = (4 * 2.6, 4 * 2.6, 4 * 2.6)
    sim, mol, pp, box, n, T = _mesh_sim(
        regions=(
            TemperatureControlRegion(
                lower=(0.0, 0.0, 0.0),
                upper=full_box,
                target_temperature=T_region,
                frequency=1,
            ),
        ),
    )
    # disable the global thermostat so only the region acts
    cfg = dc.replace(sim.cfg, thermostat=False)
    sim = Mesh3DSimulation(cfg, pp, mesh=sim.mesh)
    mol_sh = sim.distribute(mol)
    FM, _, _ = sim._force_sharded(mol_sh)
    gv = None
    for step in range(1, 30):
        mol_sh, FM, gv, ovf = sim.step(mol_sh, FM, step)
        assert not bool(np.asarray(ovf))
    t_end = float(gv.temperature)
    # the whole box is the region: global kinetic temperature must be
    # pulled well below the start temperature toward the region target
    assert t_end < 0.75 * T, (t_end, T)
    assert abs(t_end - T_region) < 0.25 * T_region + 0.15, t_end


def test_mesh3d_multisite_vi_matches_single_chip():
    """Per-molecule per-axis virials gathered from the sharded
    multi-site kernel match the single-chip general path (the
    GammaWriter input, src/io/GammaWriter.cpp)."""
    from ls1_mardyn_tpu.models.components import Component, ComponentTable
    from ls1_mardyn_tpu.models.interaction import PairParams
    from ls1_mardyn_tpu.ops.pallas_multisite import _MSMeta
    from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation
    from ls1_mardyn_tpu.state import MoleculeState

    rc, cell = 2.5, 2.6
    box = (4 * cell, 4 * cell, 4 * cell)
    c = Component(cid=0)
    c.add_ljcenter(0.0, 0.0, 0.3, 0.5, 1.0, 1.0, rc, True)
    c.add_ljcenter(0.0, 0.0, -0.3, 0.5, 1.0, 1.0, rc, True)
    table = ComponentTable([c], cutoff=rc, lj_cutoff=rc)
    pp = PairParams.from_table(table, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    gi = np.stack(
        np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1
    ).reshape(-1, 3)
    nmol = len(gi)
    r = (gi + 0.5) * cell + rng.uniform(-0.4, 0.4, (nmol, 3))
    q = rng.normal(size=(nmol, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mol = MoleculeState.from_numpy(
        r=r, v=rng.normal(0, 0.3, (nmol, 3)), q=q,
        L=np.zeros((nmol, 3)), dtype=jnp.float64,
    )
    cfg = Mesh3DConfig(
        grid=GRID, nxl=2, nyl=2, nzl=2, cap=32, box=box,
        n_local_cap=2 * nmol // 8 + 64, migrate_cap=64, tx=2,
        dt=0.002, target_temperature=1.0, thermostat=True,
        eps24=0.0, sig2=0.0, shift6=0.0, rc2=rc * rc, interpret=True,
        ms_meta=_MSMeta(table), rc2_lj=float(table.lj_cutoff ** 2),
    )
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(GRID), AX)
    sim = Mesh3DSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    (F_sh, _M, Vi_sh), _packed, ovf = sim._force_sharded(mol_sh)
    assert int(np.asarray(ovf).max()) == 0

    ref = SingleChipSimulation(
        mol, pp, box,
        SimConfig(dt=0.002, target_temperature=1.0, cell_cap=32),
    )
    ref.prepare_start()
    Vi_ref = np.asarray(ref.forces.Vi)
    mids = np.asarray(mol.mid)
    vi_by_id = {
        int(m): v for m, v, ok in zip(
            np.asarray(mol_sh.mid), np.asarray(Vi_sh),
            np.asarray(mol_sh.valid),
        ) if ok
    }
    scale = max(np.abs(Vi_ref).max(), 1e-30)
    for i in range(nmol):
        np.testing.assert_allclose(
            vi_by_id[int(mids[i])] / scale, Vi_ref[i] / scale, atol=1e-10
        )
