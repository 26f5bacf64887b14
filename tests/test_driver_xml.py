"""XML config + driver + plugin integration tests.

Exercises the user-facing entry path on the reference's own shipped
example configs (the role of the reference's validation runs,
validation/validationRun.py): parse XML (with includes), build the
scene, run steps, write observables and checkpoints, restart.
"""

import os

import numpy as np
import pytest

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import read_xml_config

ARGON_CFG = "/root/reference/examples/Argon/200K_18mol_l/config.xml"


def test_parse_reference_argon_config():
    cfg = read_xml_config(ARGON_CFG)
    assert cfg.timestep == pytest.approx(0.0667516)
    assert cfg.temperature == pytest.approx(0.000633363365)
    assert cfg.box[0] == pytest.approx(108.43455)
    assert len(cfg.components) == 1
    c = cfg.components[0]
    assert len(c.ljcenters) == 1
    assert c.ljcenters[0].sigma == pytest.approx(6.4160007)
    assert cfg.lj_cutoff == pytest.approx(33.0702)
    assert cfg.eps_rf == pytest.approx(1.0e10)
    assert any(p.name == "ResultWriter" for p in cfg.output_plugins)


def test_driver_runs_argon_and_restarts(tmp_path):
    os.chdir(tmp_path)
    sim = MDSimulation.from_xml(ARGON_CFG)
    gv = sim.run(steps=5, print_every=0, final_checkpoint=str(tmp_path / "cp.dat"))
    assert np.isfinite(float(gv.upot))
    t1 = float(gv.temperature)
    assert (tmp_path / "Argon.res").exists()
    res = (tmp_path / "Argon.res").read_text()
    assert "U_pot" in res and len(res.splitlines()) >= 4

    # restart from the checkpoint: swap the phasespacepoint
    cfg2 = read_xml_config(ARGON_CFG)
    cfg2.phasespace_file = str(tmp_path / "cp.dat")
    sim2 = MDSimulation(cfg2)
    assert int(sim2.mol.num_valid()) == int(float(gv.n))
    gv2 = sim2.run(steps=1, print_every=0)
    # restarted state is the same thermodynamic state
    assert abs(float(gv2.temperature) - t1) / t1 < 0.05


def test_plugin_hook_order(tmp_path):
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.plugins.base import PluginFactory

    sim = MDSimulation.from_xml(ARGON_CFG)
    canary = PluginFactory.create("TestPlugin", {})
    canary.init(sim)
    sim._plugins.append(canary)
    sim.run(steps=2, print_every=0)
    kinds = [c[0] for c in canary.calls if c[1] == sim.step]
    assert kinds == [
        "beforeEventNewTimestep",
        "beforeForces",
        "afterForces",
        "endStep",
    ]


def test_cli_smoke(tmp_path):
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.cli import main

    rc = main([ARGON_CFG, "-N", "3", "--print-every", "0",
               "--final-checkpoint", str(tmp_path / "fin.dat")])
    assert rc == 0
    assert (tmp_path / "fin.dat").exists()


def test_cli_profile_trace(tmp_path):
    """--profile captures a jax.profiler device trace over the step
    window (the TaskTimingProfiler/PAPI role, Simulation.cpp:1249-1254);
    the window is clamped into short runs."""
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.cli import main

    trace_dir = tmp_path / "trace"
    rc = main([ARGON_CFG, "-N", "4", "--print-every", "0",
               "--profile", str(trace_dir), "--profile-steps", "2:4"])
    assert rc == 0
    traces = list(trace_dir.rglob("*.xplane.pb"))
    assert traces, list(trace_dir.rglob("*"))
