"""End-to-end Ewald electrostatics through the driver (the reference's
`electrostatic type="FastMultipoleMethod"` capability slot,
Simulation.cpp:292-302 / 1070-1073)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
from ls1_mardyn_tpu.models.components import Component


def _molten_salt_config(n_side=6, d=1.1, T=1.0):
    """Rock-salt-like ionic LJ fluid (a tiny molten-salt model)."""
    comps = []
    for sign in (1.0, -1.0):
        c = Component(cid=len(comps))
        c.add_ljcenter(0, 0, 0, 1.0, 0.2, 1.0)
        c.add_charge(0, 0, 0, 0.0, sign)
        comps.append(c)
    idx = np.arange(n_side)
    g = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), -1).reshape(-1, 3)
    r = (g + 0.5) * d
    q = np.where(g.sum(1) % 2 == 0, 1.0, -1.0)
    box = np.array([n_side * d] * 3)
    cfg = XMLConfig(
        timestep=0.001,
        temperature=T,
        box=box,
        cutoff=2.5,
        lj_cutoff=2.5,
        components=comps,
        mixing_xi=np.ones((2, 2)),
        mixing_eta=np.ones((2, 2)),
        electrostatic_solver="Ewald",
        ewald_accuracy=1e-5,
    )
    data = PhaseSpaceData(
        components=comps,
        mixing_xi=np.ones((2, 2)),
        mixing_eta=np.ones((2, 2)),
        eps_rf=1.0,
        box=box,
        temperature=T,
        current_time=0.0,
        mid=np.arange(1, len(r) + 1, dtype=np.int64),
        cid=np.where(q > 0, 0, 1).astype(np.int32),
        r=r,
        v=np.zeros_like(r),
        q=np.tile([1.0, 0, 0, 0], (len(r), 1)),
        L=np.zeros_like(r),
    )
    return cfg, data


def test_driver_runs_ewald_scene(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    cfg, data = _molten_salt_config()
    # inject the phase space directly (bypass file IO)
    monkeypatch.setattr(MDSimulation, "_load_phasespace", lambda self, c: data)
    sim = MDSimulation(cfg, dtype=jnp.float64)
    assert sim.ewald is not None
    sim.engine.prepare_start()
    u0 = float(sim.engine.macro.upot)
    assert np.isfinite(u0)
    # the ionic lattice is strongly bound: large negative electrostatic
    # energy (Madelung-like) must dominate
    assert u0 < 0
    gv = sim.run(steps=5, print_every=0)
    assert np.isfinite(float(gv.upot))
    assert np.isfinite(float(gv.temperature))


def test_driver_ewald_energy_scale(tmp_path, monkeypatch):
    """Total Coulomb lattice energy per ion should be close to the
    Madelung value -M/d (LJ adds a small repulsive core term)."""
    os.chdir(tmp_path)
    cfg, data = _molten_salt_config(n_side=6, d=1.0)
    monkeypatch.setattr(MDSimulation, "_load_phasespace", lambda self, c: data)
    cfg.lj_cutoff = 2.4
    cfg.cutoff = 2.4
    sim = MDSimulation(cfg, dtype=jnp.float64)
    sim.engine.prepare_start()
    n = 6 ** 3
    u_per_ion = float(sim.engine.macro.upot) / n
    # Madelung: -1.7476/2 = -0.874 per ion, plus the attractive LJ
    # contribution of the 12 sqrt(2)-diagonal neighbors (~ -0.6)
    assert -2.0 < u_per_ion < -0.8


def test_driver_fmm_matches_ewald(tmp_path, monkeypatch):
    """ewald_method='fmm' runs the ACTUAL solid-harmonics FMM as the
    driver's electrostatic solver (the reference's FMM mode swaps the
    cell processor to LJ-only and hands all Coulomb work to bhfmm,
    Simulation.cpp:781-797): total energy must agree with the Ewald
    route on the same scene."""
    os.chdir(tmp_path)
    u0 = {}
    for method in ("direct", "fmm"):
        cfg, data = _molten_salt_config(n_side=6, d=1.0)
        cfg.lj_cutoff = 2.4
        cfg.cutoff = 2.4
        cfg.ewald_method = method
        cfg.fmm_order = 8
        monkeypatch.setattr(
            MDSimulation, "_load_phasespace", lambda self, c: data
        )
        sim = MDSimulation(cfg, dtype=jnp.float64)
        if method == "fmm":
            from ls1_mardyn_tpu.ops.fmm import FMMElectrostatics

            assert isinstance(sim.ewald, FMMElectrostatics)
            sim.ewald.validate(sim.engine.mol, sim.pp)
            # the pair path must be charge-stripped (FMM owns Coulomb)
            assert not sim._table_pair.has_electrostatics()
        sim.engine.prepare_start()
        u0[method] = float(sim.engine.macro.upot)
        # the scene also has to STEP (FMM forces/torques inside the
        # jitted leapfrog)
        gv = sim.run(steps=2, print_every=0)
        assert np.isfinite(float(gv.upot))
    scale = abs(u0["direct"])
    assert abs(u0["fmm"] - u0["direct"]) / scale < 2e-3, u0


def test_split_kspace_matches_fused(tmp_path, monkeypatch):
    """split_kspace compiles the pair step, the k-space extra force,
    and the integrator tail as three chained programs (compile-size
    guard for Pallas kernel + big SPME mesh); the trajectory must be
    IDENTICAL to the fused step."""
    import dataclasses

    from ls1_mardyn_tpu.simulation import SingleChipSimulation

    os.chdir(tmp_path)
    cfg, data = _molten_salt_config(n_side=8, d=1.05)
    monkeypatch.setattr(
        MDSimulation, "_load_phasespace", lambda self, c: data
    )
    sim = MDSimulation(cfg, dtype=jnp.float64)
    g1 = sim.run(steps=3, print_every=0)
    eng = sim.engine
    cfg2 = dataclasses.replace(eng.config, split_kspace=True)
    eng2 = SingleChipSimulation(
        sim.mol, sim.pp, sim.box, cfg2,
        force_fn=(eng._force_fn
                  if eng._force_fn != eng._cell_forces else None),
        extra_force_fn=eng._extra_force_fn,
    )
    assert eng2._split
    eng2.prepare_start()
    gv = eng2.run(3)
    np.testing.assert_allclose(float(gv.upot), float(g1.upot), rtol=0)
    np.testing.assert_allclose(
        float(gv.temperature), float(g1.temperature), rtol=0
    )
