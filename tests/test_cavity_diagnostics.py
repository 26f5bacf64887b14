"""CavityEnsemble/CavityWriter, parallel diagnostics writers, meminfo,
NaN watchdog, refresh_ids."""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _cfg(n=216, rho=0.4, T=1.0, plugins=()):
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        output_plugins=[PluginSpec(nm, dict(pr)) for nm, pr in plugins],
    )


def test_cavity_ensemble_detects_voids():
    """A dense slab occupying half the box: probes in the occupied half
    have many neighbors; probes in the empty half are cavities."""
    import jax.numpy as jnp

    from ls1_mardyn_tpu.ensemble.cavity import CavityEnsemble
    from ls1_mardyn_tpu.state import MoleculeState

    rng = np.random.default_rng(0)
    box = np.array([10.0, 10.0, 10.0])
    n = 400
    r = rng.uniform(0, 1, (n, 3)) * box
    r[:, 2] *= 0.4  # everything in z < 4
    mol = MoleculeState.from_numpy(
        r=r, v=np.zeros_like(r), dtype=jnp.float64
    )
    ce = CavityEnsemble(box, grid=(4, 4, 4), radius=1.5, max_neighbours=0)
    active, counts = ce.cavity_step(mol)
    probes_z = ce.probe_r[:, 2]
    # probes at z=6.25: > 1.5 away from the slab on both sides (the
    # z=8.75 row is within reach of z~0 molecules through the periodic
    # wrap, so it is excluded on purpose)
    mid_empty = (probes_z > 5.5) & (probes_z < 7.0)
    dense = probes_z < 4.0
    assert active[mid_empty].all()
    assert not active[dense].any()
    assert counts[dense].min() > 0


def test_cavity_writer(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(n=100, plugins=[
        ("CavityWriter", {"writefrequency": "2", "outputprefix": "cav",
                          "Nx": "3", "Ny": "3", "Nz": "3",
                          "radius": "1.2", "maxNeighbours": "0"}),
    ])
    sim = MDSimulation(cfg, force_mode="cells")
    sim.run(steps=2, print_every=0)
    lines = (tmp_path / "cav-c0-0001.cav.xyz").read_text().splitlines()
    assert int(lines[0]) == len(lines) - 2
    assert all(ln.startswith("C ") for ln in lines[2:])


def test_cavity_writer_control_volume_and_components(tmp_path):
    """ControlVolume restriction + per-component ensembles/files
    (CavityWriter.cpp:48-130, 176-229)."""
    os.chdir(tmp_path)
    cfg = _cfg(n=100, plugins=[
        ("CavityWriter", {"writefrequency": "1", "outputprefix": "cv",
                          "Nx": "4", "Ny": "4", "Nz": "4",
                          "radius": "1.0", "maxNeighbours": "0",
                          "componentid": ["0", "1"],
                          "ControlVolume": {"x0": "1.0", "x1": "4.0",
                                            "z0": "2.0", "z1": "5.0"}}),
    ])
    sim = MDSimulation(cfg, force_mode="cells")
    sim.run(steps=1, print_every=0)
    # one file per tracked component, element letters C and N
    f0 = (tmp_path / "cv-c0-0001.cav.xyz").read_text().splitlines()
    f1 = (tmp_path / "cv-c1-0001.cav.xyz").read_text().splitlines()
    assert f1[2:] == [ln.replace("C ", "N ", 1) for ln in f0[2:]] or (
        len(f0) >= 2 and len(f1) >= 2
    )
    for ln in f0[2:]:
        _e, x, y, z = ln.split()
        assert 1.0 <= float(x) <= 4.0
        assert 2.0 <= float(z) <= 5.0
    # neighbor counts wrap by the DOMAIN box, not the CV extent: a
    # probe and a molecule separated by more than the radius must not
    # alias through a CV-sized wrap
    import jax.numpy as jnp

    from ls1_mardyn_tpu.ensemble.cavity import CavityEnsemble

    L = float(sim.box[0])
    ens = CavityEnsemble((3.0, 3.0, 3.0), grid=(2, 2, 2), radius=1.0,
                         max_neighbours=0, wrap_box=(L, L, L))
    ens.probe_r = ens.probe_r + 1.0  # CV = [1, 4]^3
    mol = sim.molecules()
    _act, counts = ens.cavity_step(mol)
    # brute-force reference with the full box
    r = np.asarray(mol.r)[np.asarray(mol.valid)]
    for i, p in enumerate(ens.probe_r):
        dr = p[None, :] - r
        dr -= np.round(dr / L) * L
        ref = int((np.sum(dr * dr, axis=1) < 1.0).sum())
        assert ref == counts[i], (i, ref, counts[i])


def _slab_sim_small():
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.parallel.decomposition import SlabConfig, SlabSimulation
    from ls1_mardyn_tpu.scene import build_scene

    P = 8
    box = (10.4, 10.4, 20.8)
    n = int(0.5 * np.prod(box))
    data = cubic_grid(n, list(box), 1.0, seed=4)
    mol, pp, table, _ = build_scene(data, cutoff=2.5, dtype=jnp.float64)
    cfg = SlabConfig(
        n_devices=P, nz_local=1, ny=4, nx=4, cap=32, box=box,
        n_local_cap=2 * n // P + 64, migrate_cap=64, tx=4, dt=0.002,
        target_temperature=1.0, thermostat=True,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=6.25, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:P]), ("dd",))
    sim = SlabSimulation(cfg, pp, mesh=mesh)
    return sim, mol, n


def test_parallel_diagnostics(tmp_path):
    from ls1_mardyn_tpu.parallel import diagnostics as diag

    sim, mol, n = _slab_sim_small()
    mol_sh = sim.distribute(mol)

    rep = diag.write_loadbalance(
        sim, mol_sh, str(tmp_path / "lb.dat"), step=0
    )
    assert rep["total"] == n
    assert rep["imbalance"] >= 1.0
    assert len(rep["counts"]) == 8
    lines = (tmp_path / "lb.dat").read_text().splitlines()
    assert lines[0].startswith("# step")

    diag.write_halo_particles(sim, mol_sh, str(tmp_path / "h"), step=0)
    txt = (tmp_path / "h_rank0_step0.halo").read_text()
    assert "from_below" in txt and "from_above" in txt
    # halo symmetry: what rank p imports from below is what rank p-1
    # exports from its top row
    halos = diag.halo_particles(sim, mol_sh)
    assert len(halos) == 8

    diag.write_communication_partners(sim, str(tmp_path / "cp.dat"))
    rows = diag.communication_partners(sim)
    assert rows[0]["partners"] == [7, 1]
    assert rows[3]["partners"] == [2, 4]

    diag.write_decomposition(sim, str(tmp_path / "tree.dat"))
    tl = (tmp_path / "tree.dat").read_text().splitlines()
    assert len(tl) == 2 + 8


def test_refresh_ids():
    sim, mol, n = _slab_sim_small()
    mol_sh = sim.distribute(mol)
    mol2 = sim.refresh_ids(mol_sh)
    valid = np.asarray(mol2.valid)
    mids = np.asarray(mol2.mid)[valid]
    assert sorted(mids.tolist()) == list(range(1, n + 1))
    # invalid slots cleared
    assert (np.asarray(mol2.mid)[~valid] == 0).all()


def test_meminfo():
    from ls1_mardyn_tpu.utils.meminfo import host_rss_mib, print_meminfo

    assert host_rss_mib() > 10.0  # python + jax resident
    text = print_meminfo()
    assert "host RSS" in text


def test_nan_watchdog(tmp_path):
    """Blowing up the timestep must abort with the watchdog error, not
    silently keep simulating garbage (Simulation.cpp:1236-1239)."""
    import dataclasses

    import jax.numpy as jnp

    os.chdir(tmp_path)
    cfg = _cfg(n=64, rho=0.8)
    sim = MDSimulation(cfg, force_mode="cells")
    # corrupt one velocity -> NaN propagates into T/Upot immediately
    v = np.array(sim.engine.mol.v)
    v[0, 0] = np.nan
    sim.engine.mol = dataclasses.replace(sim.engine.mol, v=jnp.asarray(v))
    with pytest.raises(RuntimeError, match="NaN"):
        sim.run(steps=2, print_every=1)


def test_multichip_snapshot_restore_checkpoint(tmp_path):
    """ResilienceComm/InMemoryCheckpointing + MPICheckpointWriter roles:
    snapshot -> steps -> restore reproduces the exact state; the
    gathered checkpoint file restarts on a single chip."""
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.ascii_reader import read_inp
    from ls1_mardyn_tpu.scene import build_scene

    sim, mol, n = _slab_sim_small()
    mol_sh = sim.distribute(mol)
    snap = sim.snapshot(mol_sh, time=1.5)
    FM, _, _, _, _ = sim._force_sharded(mol_sh)
    mol2 = mol_sh
    for _ in range(3):
        mol2, FM, gv, ovf = sim._step_sharded(mol2, FM)
    # restore rewinds exactly
    back = sim.restore(snap)
    np.testing.assert_array_equal(np.asarray(back.r), np.asarray(mol_sh.r))
    np.testing.assert_array_equal(
        np.asarray(back.valid), np.asarray(mol_sh.valid)
    )
    # and stepping from the restored state matches stepping from the
    # original (determinism)
    FMb, _, _, _, _ = sim._force_sharded(back)
    b1, _, gvb, _ = sim._step_sharded(back, FMb)
    FMo, _, _, _, _ = sim._force_sharded(mol_sh)
    o1, _, gvo, _ = sim._step_sharded(mol_sh, FMo)
    np.testing.assert_allclose(
        float(gvb.upot), float(gvo.upot), rtol=1e-12
    )

    # gathered checkpoint restarts
    from ls1_mardyn_tpu.models.components import ComponentTable

    # rebuild the table used by _slab_sim_small
    from ls1_mardyn_tpu.io.generators import cubic_grid

    box = (10.4, 10.4, 20.8)
    data = cubic_grid(n, list(box), 1.0, seed=4)
    _, _, table, _ = build_scene(data, cutoff=2.5, dtype=jnp.float64)
    path = str(tmp_path / "par.restart.dat")
    sim.write_checkpoint(mol2, path, table, current_time=2.0)
    data2 = read_inp(path)
    assert len(data2.mid) == n
    assert data2.current_time == 2.0
    np.testing.assert_allclose(np.asarray(data2.box), box, rtol=1e-12)
