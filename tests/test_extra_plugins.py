"""Registry-completing plugins: Permittivity, DirectedPM, Dropaligner,
Dropaccelerator, MirrorSystem, ExamplePlugin, MmspdBinWriter,
single-chip LoadbalanceWriter, parallel-diagnostic facades."""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
from ls1_mardyn_tpu.plugins.base import PluginFactory


def _cfg(n=125, rho=0.4, T=1.0, plugins=(), output_plugins=()):
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002, temperature=T, box=np.array([L, L, L]),
        cutoff=2.5, lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        plugins=[PluginSpec(nm, dict(pr)) for nm, pr in plugins],
        output_plugins=[PluginSpec(nm, dict(pr)) for nm, pr in output_plugins],
    )


def test_registry_covers_reference_list():
    """Every plugin the reference registers by default
    (PluginFactory.cpp:79-128) resolves in our factory."""
    import ls1_mardyn_tpu.plugins  # noqa: F401

    REFERENCE_PLUGINS = [
        "COMaligner", "CavityWriter", "CheckpointWriter",
        "CommunicationPartnerWriter", "DecompWriter", "DirectedPM",
        "DistControl", "DriftCtrl", "Dropaccelerator", "Dropaligner",
        "EnergyLogWriter", "ExamplePlugin", "ExtractPhase", "FixRegion",
        "FlopRateWriter", "GammaWriter", "HaloParticleWriter",
        "InMemoryCheckpointing", "KDTreePrinter",
        "LoadImbalanceThroughSleepPlugin", "LoadbalanceWriter",
        "MPICheckpointWriter", "MaxCheck", "MaxWriter", "MettDeamon",
        "MettDeamonFeedrateDirector", "Mirror", "MirrorSystem",
        "MmpldWriter", "MmspdBinWriter", "MmspdWriter", "ODF",
        "Permittivity", "PosNegComp", "PovWriter", "RDF", "RegionSampling",
        "ResultWriter", "SpatialProfile", "SysMonOutput", "TestPlugin",
        "TimerWriter", "VISWriter", "VTKGridWriter", "VTKMoleculeWriter",
        "VectorizationTuner", "WallPotential", "XyzWriter",
    ]
    missing = [p for p in REFERENCE_PLUGINS
               if p not in PluginFactory._registry]
    assert not missing, missing


def test_extra_plugins_run(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(
        plugins=[
            ("DirectedPM", {"Component": "1", "rIncrements": "4",
                            "hIncrements": "4", "phiIncrements": "1",
                            "rohCutLiq": "0.05", "maxDeviation": "1",
                            "outputFrequency": "2"}),
            ("ExamplePlugin", {"writeposition": "endStep",
                               "message": "hi"}),
        ],
        output_plugins=[
            ("MmspdBinWriter", {"writefrequency": "2",
                                "outputprefix": "mb"}),
            ("LoadbalanceWriter", {"writefrequency": "2",
                                   "outputprefix": "lb"}),
        ],
    )
    sim = MDSimulation(cfg, force_mode="cells")
    sim.run(steps=2, print_every=0)
    ep = [p for p in sim._plugins if p.name == "ExamplePlugin"][0]
    assert ep.calls == 2
    assert (tmp_path / "mb.mmspd.bin").read_bytes().startswith(b"MMSPDb 1.0\n")
    assert "imbalance" in (tmp_path / "lb.lb.dat").read_text()
    # DirectedPM global row + 2-D profile files at the block boundary
    # (reference names, DirectedPM.cpp:363,383)
    glob = (tmp_path / "Global_output_DPM_MK.txt").read_text().splitlines()
    assert len(glob) == 1 and glob[0].startswith("2 ")
    nd = (tmp_path / "drop_MK_DirectedPM_2.NDpr").read_text().splitlines()
    assert nd[0].startswith("//Segment volume")
    assert (tmp_path / "drop_MK_DirectedPM_2.Temppr").exists()
    # density rows: header(3) + bin-size row + r-centers row + h rows
    assert len(nd) == 3 + 1 + 1 + 4


def test_mirror_system_and_drop_plugins(tmp_path):
    os.chdir(tmp_path)
    cfg = _cfg(plugins=[("MirrorSystem", {"yPos": "0.0"})])
    sim = MDSimulation(cfg, force_mode="cells")
    r0 = np.asarray(sim.engine.mol.r).copy()
    v0 = np.asarray(sim.engine.mol.v).copy()
    sim._plugins[0].before_forces(sim, 1)
    r1 = np.asarray(sim.engine.mol.r)
    v1 = np.asarray(sim.engine.mol.v)
    L = float(sim.box[1])
    np.testing.assert_allclose(r1[:, 1], (-r0[:, 1]) % L, atol=1e-5)
    np.testing.assert_allclose(v1[:, 1], -v0[:, 1])

    # Dropaccelerator: molecules inside the sphere gain +vy
    cfg2 = _cfg(plugins=[("Dropaccelerator",
                          {"xposition": "3", "yposition": "3",
                           "zposition": "3", "dropradius": "2",
                           "velocity": "1.0", "starttime": "0",
                           "steps": "1"})])
    sim2 = MDSimulation(cfg2, force_mode="cells")
    v0 = np.asarray(sim2.engine.mol.v).copy()
    r = np.asarray(sim2.engine.mol.r)
    sim2._plugins[0].before_forces(sim2, 0)
    v1 = np.asarray(sim2.engine.mol.v)
    inside = ((r - 3.0) ** 2).sum(1) < 4.0
    np.testing.assert_allclose(v1[inside, 1] - v0[inside, 1], 1.0, atol=1e-5)
    np.testing.assert_allclose(v1[~inside, 1], v0[~inside, 1])


def test_permittivity_dipolar_gas(tmp_path):
    """Ideal dipolar gas: eps - 1 ~ 4 pi rho mu^2 / (3 T) at low
    density/coupling (Debye limit)."""
    os.chdir(tmp_path)
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
    from ls1_mardyn_tpu.models.components import Component

    rng = np.random.default_rng(4)
    n, L, T, mu = 200, 20.0, 2.0, 0.5
    c = Component(cid=0)
    c.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0)
    c.add_dipole(0, 0, 0, 0, 0, 1.0, mu)
    # a point dipole at the origin has zero inertia and cannot rotate
    # (the reference requires an explicit override too, ODF.h:24-26)
    c.I_override = np.array([1.0, 1.0, 1.0])
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    data = PhaseSpaceData(
        components=[c], mixing_xi=np.ones((1, 1)),
        mixing_eta=np.ones((1, 1)), eps_rf=1e10,
        box=np.array([L, L, L]), temperature=T, current_time=0.0,
        mid=np.arange(1, n + 1, dtype=np.int64),
        cid=np.zeros(n, np.int32),
        r=rng.uniform(0, L, (n, 3)),
        v=rng.normal(0, np.sqrt(T), (n, 3)),
        q=q, L=np.zeros((n, 3)),
    )
    cfg = _cfg(plugins=[(
        "Permittivity",
        {"outputprefix": "perm", "writefrequency": "3",
         "recordingtimesteps": "1", "runningaveragestep": "2"},
    )])
    import unittest.mock as mock

    with mock.patch.object(MDSimulation, "_load_phasespace",
                           lambda self, c_: data):
        sim = MDSimulation(cfg, dtype=jnp.float64, force_mode="cells")
        sim.run(steps=7, print_every=0)
    # block table + running-average stream (reference file pair,
    # Permittivity.cpp:33,270)
    assert (tmp_path / "perm.perm").exists()
    assert (tmp_path / "perm.permRAV").exists()
    body = (tmp_path / "perm.perm").read_text().splitlines()
    assert body[0].startswith("timestep\tN_particles")
    assert any(line.startswith("epsilon_total") for line in body)
    # 7 steps / writefrequency 3 -> 2 full blocks + 1 partial
    assert len(body) == 3 + 1 + 2
    eps = [p for p in sim._plugins if p.name == "Permittivity"][0].epsilon
    assert np.isfinite(eps) and eps > 1.0
