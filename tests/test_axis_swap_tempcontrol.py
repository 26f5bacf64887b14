"""Engine-frame axis swap for vacuum-dominated scenes + XML-configured
TemperatureControl regions (thermostats/TemperatureControl.{h,cpp})."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import jax.numpy as jnp

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.generators import mktcts
from ls1_mardyn_tpu.io.xml_config import XMLConfig


BOX_Z = np.array([12.0, 12.0, 36.0])


def _scene(axis):
    """Thin liquid slab normal to `axis` in an elongated vacuum box;
    built by column-swapping ONE generated scene so the physics is
    exactly identical between axes."""
    data = mktcts(0.7, 0.0, BOX_Z, 0.9, liq_fraction=0.25, axis=2, seed=9)
    if axis != 2:
        perm = [0, 1, 2]
        perm[axis], perm[2] = perm[2], perm[axis]
        data.r = data.r[:, perm]
        data.v = data.v[:, perm]
        data.L = data.L[:, perm]
        data.box = np.asarray(data.box, float)[perm]
    return data


def _cfg(axis):
    box = BOX_Z if axis == 2 else np.asarray(BOX_Z)[
        [2, 1, 0] if axis == 0 else [0, 2, 1]
    ]
    return XMLConfig(timestep=0.002, temperature=0.9, box=box,
                     cutoff=2.5, lj_cutoff=2.5)


def test_axis_swap_energy_invariant(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    results = {}
    for axis in (2, 1):
        data = _scene(axis)
        monkeypatch.setattr(
            MDSimulation, "_load_phasespace", lambda self, c, d=data: d
        )
        sim = MDSimulation(_cfg(axis), dtype=jnp.float64,
                           force_mode="cells")
        if axis == 1:
            assert sim._axis_swap == 1, "y-slab scene must swap y onto z"
        gv = sim.run(steps=3, print_every=0)
        results[axis] = float(gv.upot)
        # plugin-facing state is in the ORIGINAL frame: the dense slab
        # must still be normal to `axis`
        r = np.asarray(sim.molecules().r)
        box = np.asarray(_cfg(axis).box, float)
        spread = [np.std(np.histogram(
            r[:, a], bins=8, range=(0, box[a]))[0]) for a in range(3)]
        assert int(np.argmax(spread)) == axis
    np.testing.assert_allclose(results[1], results[2], rtol=1e-12)


def test_temperature_control_regions_from_xml(tmp_path):
    os.chdir(tmp_path)
    xml = tmp_path / "tc.xml"
    xml.write_text("""<?xml version='1.0' encoding='UTF-8'?>
<mardyn version="20100525">
 <simulation type="MD">
  <integrator type="Leapfrog"><timestep>0.002</timestep></integrator>
  <run><production><steps>5</steps></production></run>
  <ensemble type="NVT">
   <temperature>1.1</temperature>
   <domain type="box"><lx>12</lx><ly>12</ly><lz>12</lz></domain>
   <components>
    <moleculetype id="1" name="LJ">
     <site type="LJ126" id="1">
      <coords><x>0</x><y>0</y><z>0</z></coords>
      <mass>1</mass><epsilon>1</epsilon><sigma>1</sigma><shifted>1</shifted>
     </site>
    </moleculetype>
   </components>
   <phasespacepoint>
    <generator name="CubicGridGenerator">
     <numMolecules>864</numMolecules>
    </generator>
   </phasespacepoint>
  </ensemble>
  <algorithm>
   <cutoffs><radiusLJ>2.5</radiusLJ></cutoffs>
   <electrostatic type="ReactionField"><epsilon>1e10</epsilon></electrostatic>
   <thermostats>
    <thermostat type="TemperatureControl">
     <control><start>0</start><frequency>1</frequency><stop>0</stop></control>
     <regions><region>
      <coords>
       <lcx>0</lcx><lcy>0</lcy><lcz>0</lcz>
       <ucx>box</ucx><ucy>box</ucy><ucz>6.0</ucz>
      </coords>
      <target><temperature>0.5</temperature><component>0</component></target>
      <settings><numslabs>1</numslabs><exponent>0.4</exponent>
       <directions>xyz</directions></settings>
     </region></regions>
    </thermostat>
   </thermostats>
  </algorithm>
  <output></output>
 </simulation>
</mardyn>
""")
    from ls1_mardyn_tpu.io.xml_config import read_xml_config

    cfg = read_xml_config(str(xml))
    assert cfg.thermostat_type == "TemperatureControl"
    assert len(cfg.temp_control) == 1
    reg = cfg.temp_control[0]
    assert reg["upper"][0] == "box"  # marker; the driver resolves it
    assert reg["upper"][2] == 6.0
    assert reg["component"] == -1  # 0 == all components
    assert reg["target_temperature"] == 0.5

    sim = MDSimulation(cfg, dtype=jnp.float64, force_mode="cells")
    assert len(sim.engine.config.temp_control_regions) == 1
    assert not sim.engine.config.thermostat  # regions replace global
    gv = sim.run(steps=30, print_every=0)
    assert np.isfinite(float(gv.upot))
    # the lower-z half is driven toward T=0.5: its kinetic temperature
    # must end below the uncontrolled half's
    mol = sim.molecules()
    r = np.asarray(mol.r)
    v = np.asarray(mol.v)
    valid = np.asarray(mol.valid)
    lowz = valid & (r[:, 2] < 6.0)
    hiz = valid & (r[:, 2] >= 6.0)
    t_low = (v[lowz] ** 2).sum() / (3 * lowz.sum())
    t_hi = (v[hiz] ** 2).sum() / (3 * hiz.sum())
    assert t_low < t_hi
