"""Undirected (directed-velocity) thermostat modes: thermostats flagged
'Undirected' subtract their mean flow before kinetic sampling and scale
only the thermal velocity component (Domain.h:307,441-444,
Domain::calculateThermostatDirectedVelocity Domain.cpp:368-408,
VelocityScalingThermostat.cpp:60-67 vsub/scale_v/vadd,
ASCIIReader.cpp:125-129 'Undirected'/'U' header token).

The physics pinned here: in a flow (NEMD) scene a plain velocity-scaling
thermostat counts the drift as heat -- it reports too-high T and decays
the flow by beta every step; an undirected thermostat preserves the
flow exactly and regulates only the thermal part.
"""

import dataclasses as dc

import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.scene import build_scene
from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation

N, RHO, T0, DRIFT = 343, 0.5, 1.0, 1.5


def _flow_sim(undirected, comp_wise=False):
    L = (N / RHO) ** (1 / 3)
    data = cubic_grid(N, [L, L, L], T0, seed=3)
    data.v = np.asarray(data.v)
    data.v[:, 0] += DRIFT  # uniform flow along x
    mol, pp, table, box = build_scene(data, cutoff=2.5, dtype=jnp.float64)
    kw = dict(dt=0.002, target_temperature=T0, thermostat=True, cell_cap=32)
    if comp_wise:
        kw.update(
            component_thermostat=(0,),
            thermostat_temps=(T0,),
            undirected_thermostats=(True,) if undirected else None,
        )
    elif undirected:
        kw.update(undirected_thermostats=(True,))
    sim = SingleChipSimulation(mol, pp, box, SimConfig(**kw))
    sim.prepare_start()
    return sim


def _mean_vx(sim):
    v = np.asarray(sim.mol.v)
    valid = np.asarray(sim.mol.valid)
    return float(v[valid, 0].mean())


@pytest.mark.parametrize("comp_wise", [False, True])
def test_undirected_preserves_flow_and_thermal_t(comp_wise):
    sim = _flow_sim(undirected=True, comp_wise=comp_wise)
    gv = sim.run(40)
    # flow preserved (momentum conservation of forces + thermal-only
    # scaling; the mean is exactly invariant under v <- vbar+b(v-vbar))
    assert _mean_vx(sim) == pytest.approx(DRIFT, abs=0.02)
    if not comp_wise:
        # reported T is the THERMAL temperature, regulated to target
        assert float(gv.temperature) == pytest.approx(T0, rel=0.12)


def test_plain_thermostat_decays_flow():
    """Contrast: the plain (directed) thermostat counts the flow as
    heat.  One-step analytic: the step scales ALL velocities by
    beta = (T_target / T_measured)^0.4 with T_measured ~ T0 +
    m*DRIFT^2/3 (the drift's kinetic energy read as temperature), so
    after one step the mean flow is ~beta * DRIFT.  (Subsequent decay
    stalls: once total T hits target, beta ~ 1 and the remaining flow
    erodes only as fast as collisions re-thermalize it -- which is
    exactly the unphysical coupling the Undirected mode removes.)"""
    sim = _flow_sim(undirected=False)
    m = float(np.asarray(sim.pp.mass)[0])
    t_meas = T0 + m * DRIFT**2 / 3.0
    beta1 = (T0 / t_meas) ** 0.4
    sim.run(1)
    vx1 = _mean_vx(sim)
    assert vx1 == pytest.approx(DRIFT * beta1, rel=0.05), (vx1, DRIFT * beta1)
    sim.run(39)
    # flow keeps eroding (vs exactly preserved in the undirected mode)
    assert _mean_vx(sim) < vx1 - 0.02


def test_reader_parses_undirected_token(tmp_path):
    from ls1_mardyn_tpu.io.ascii_reader import read_inp

    p = tmp_path / "u.inp"
    p.write_text(
        "mardyn trunk 20120726\n"
        "currentTime 0\n"
        "Temperature 1.0\n"
        "ThermostatTemperature 1 0.8\n"
        "ComponentThermostat 1 1\n"
        "Undirected 1\n"
        "Length 10 10 10\n"
        "NumberOfComponents 1\n"
        "1 0 0 0 0\n"
        "0 0 0 1 1 1 2.5 0\n"
        "0 0 0\n"
        "1e+10\n"
        "NumberOfMolecules 1\n"
        "MoleculeFormat ICRVQD\n"
        "1 1 5 5 5 0 0 0 1 0 0 0 0 0 0\n"
    )
    data = read_inp(str(p))
    assert data.undirected_thermostats == {1}
    assert data.component_thermostats == {0: 1}
