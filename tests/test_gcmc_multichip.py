"""Multi-chip muVT: sharded probe energy matches the single-chip probe;
GCMC moves keep the sharded state consistent through MD steps."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ls1_mardyn_tpu.ensemble.grand_canonical import (
    ChemicalPotential,
    single_molecule_energy,
)
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.parallel.decomposition import SlabConfig, SlabSimulation
from ls1_mardyn_tpu.parallel.gcmc import SlabGrandCanonical
from ls1_mardyn_tpu.scene import build_scene

P = 8


def _sim():
    box = (10.4, 10.4, 20.8)
    n = int(0.4 * np.prod(box))
    data = cubic_grid(n, list(box), 1.2, seed=9)
    mol, pp, table, _ = build_scene(data, cutoff=2.5, dtype=jnp.float64)
    cfg = SlabConfig(
        n_devices=P, nz_local=1, ny=4, nx=4, cap=32, box=box,
        n_local_cap=2 * n // P + 64, migrate_cap=64, tx=4, dt=0.002,
        target_temperature=1.2, thermostat=True,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=6.25, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:P]), ("dd",))
    return SlabSimulation(cfg, pp, mesh=mesh), mol, pp, box, n


def test_sharded_probe_matches_single_chip():
    sim, mol, pp, box, n = _sim()
    mol_sh = sim.distribute(mol)
    gc = SlabGrandCanonical(
        sim, [ChemicalPotential(mu=0.0)], temperature=1.2
    )
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
    # exclusion by id: removing molecule 5's self-energy
    mid5 = int(np.asarray(mol_sh.mid)[5])
    r5 = np.asarray(mol_sh.r)[5]
    q5 = np.asarray(mol_sh.q)[5]
    e_excl = gc.probe_energy(mol_sh, r5, q5, 0, excl_mid=mid5)
    assert np.isfinite(e_excl)


def test_gcmc_moves_with_md_steps():
    """Insert/delete cycles interleaved with sharded MD steps: counts
    stay consistent, inserted molecules land on their owner slab, no
    overflow from migration."""
    sim, mol, pp, box, n = _sim()
    mol_sh = sim.distribute(mol)
    gc = SlabGrandCanonical(
        sim,
        [ChemicalPotential(mu=5.0, interval=1, insertions_per_interval=4,
                           deletions_per_interval=2)],
        temperature=1.2,
        seed=7,
    )
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    for step in range(1, 6):
        mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
        assert not bool(overflow)
        mol_sh = gc.step(mol_sh, step)
    assert gc.attempted == 30
    assert gc.accepted_ins > 0  # mu=5 strongly favors insertion
    # every valid molecule is inside its owner's slab (insertions wrote
    # to the right segment; migration handled MD drift)
    valid = np.asarray(mol_sh.valid)
    z = np.asarray(mol_sh.r)[:, 2]
    ncap = sim.cfg.n_local_cap
    slab_h = sim.cfg.slab_h
    for p in range(P):
        seg = slice(p * ncap, (p + 1) * ncap)
        zs = z[seg][valid[seg]]
        assert ((zs >= p * slab_h - 0.02) & (zs < (p + 1) * slab_h + 0.02)).all()
    # ids unique
    mids = np.asarray(mol_sh.mid)[valid]
    assert len(set(mids.tolist())) == len(mids)
    # one more MD step still runs clean after all the mutations
    mol_sh, FM, gv, overflow = sim._step_sharded(mol_sh, FM)
    assert not bool(overflow)
    assert np.isfinite(float(gv.upot))


def test_muvt_routes_to_mesh3d_when_slab_exhausted(tmp_path):
    """muVT no longer forces the slab decomposition: with more devices
    than z cell rows the driver picks the 3-D mesh and
    Mesh3DGrandCanonical drives insertions (DomainDecompBase.h:51
    interchangeability; previously this configuration raised)."""
    import os

    from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
    from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation

    os.chdir(tmp_path)
    n, L = 120, 7.4  # 2 z cell rows at rc 2.5 << 8 devices
    cfg = XMLConfig(
        timestep=0.002, temperature=1.2,
        box=np.array([L, L, L]), cutoff=2.5, lj_cutoff=2.5,
        ensemble_type="muVT",
        generator=PluginSpec("CubicGridGenerator",
                             {"numMolecules": str(n)}),
        chemical_potentials=[PluginSpec("ChemicalPotential", {
            "mu": "0.5", "componentid": "1",
            "instances": "4", "everyNTimesteps": "1",
        })],
    )
    sim = ParallelMDSimulation(cfg, n_devices=P, dtype=jnp.float64)
    assert sim.kind == "mesh3d"
    assert sim.gc is not None
    assert type(sim.gc).__name__ == "Mesh3DGrandCanonical"
    gv = sim.run(steps=3, print_every=0)
    assert np.isfinite(float(gv.upot))
    # every step runs a cycle of 4 insertion + 4 deletion trials
    assert sim.gc.attempted == 3 * 8
    g = sim.molecules()
    assert int(np.asarray(g.valid).sum()) >= 120 - sim.gc.accepted_del
