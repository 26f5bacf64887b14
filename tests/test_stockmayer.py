"""Stockmayer fluid support: the marker site type pins I=[1,1,0] and
rot_dof=2 so co-located LJ+dipole molecules rotate
(/root/reference/src/molecules/Component.cpp:64-74,145)."""

import numpy as np
import jax.numpy as jnp

from ls1_mardyn_tpu.io.xml_config import _read_component
import xml.etree.ElementTree as ET


def _stockmayer_xml():
    return ET.fromstring(
        """
<moleculetype id="1" name="StockmayerFluid">
  <site type="LJ126" id="1">
    <coords><x>0</x><y>0</y><z>0</z></coords>
    <mass>1.0</mass><epsilon>1.0</epsilon><sigma>1.0</sigma>
    <shifted>0</shifted>
  </site>
  <site type="Dipole" id="2">
    <coords><x>0</x><y>0</y><z>0</z></coords>
    <dipolemoment><x>0</x><y>0</y><z>1</z><abs>1.0</abs></dipolemoment>
  </site>
  <site type="Stockmayer" id="3"/>
</moleculetype>
"""
    )


def test_stockmayer_component_inertia():
    c = _read_component(_stockmayer_xml(), lj_cutoff=2.5)
    assert c.is_stockmayer
    np.testing.assert_allclose(c.inertia(), [1.0, 1.0, 0.0])
    assert c.rot_dof() == 2
    # without the marker, a point molecule has no inertia at all
    c2 = _read_component(_stockmayer_xml(), lj_cutoff=2.5)
    c2.is_stockmayer = False
    assert c2.rot_dof() == 0


def test_stockmayer_dipoles_rotate():
    """Two Stockmayer molecules under mutual torque must change their
    orientation (a point LJ+dipole without the marker cannot)."""
    import dataclasses

    from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
    from ls1_mardyn_tpu.scene import build_scene
    from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation

    c = _read_component(_stockmayer_xml(), lj_cutoff=2.5)
    r = np.array([[2.0, 2.0, 2.0], [3.1, 2.0, 2.0]])
    # perpendicular dipoles -> nonzero torque
    q = np.array([[1.0, 0, 0, 0], [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0]])
    data = PhaseSpaceData(
        components=[c],
        mixing_xi=np.ones((1, 1)),
        mixing_eta=np.ones((1, 1)),
        eps_rf=1e10,
        box=np.array([6.0, 6.0, 6.0]),
        temperature=0.0,
        current_time=0.0,
        mid=np.arange(1, 3, dtype=np.int64),
        cid=np.zeros(2, np.int32),
        r=r,
        v=np.zeros_like(r),
        q=q,
        L=np.zeros_like(r),
    )
    mol, pp, table, box = build_scene(data, cutoff=2.5, dtype=jnp.float64)
    assert int(table.rot_dof[0]) == 2
    cfg = SimConfig(dt=0.002, target_temperature=0.0, thermostat=False,
                    cell_cap=8)
    sim = SingleChipSimulation(mol, pp, box, cfg)
    sim.prepare_start()
    q0 = np.asarray(sim.mol.q)[:2].copy()
    sim.run(20)
    q1 = np.asarray(sim.mol.q)[:2]
    assert np.abs(q1 - q0).max() > 1e-6, "dipoles did not rotate"
