"""SI-unit conversion (xmlfileUnits role).

Golden numbers from the reference's own example configs
(/root/reference/examples/Injection/.../config.xml: refunits length
0.1 nm / mass 1 u / energy 1 K, with the comment
'<timestep unit="reduced">0.00456</timestep>  <!-- 5 fs -->').
"""

import numpy as np
import pytest

from ls1_mardyn_tpu.io.units import AMU, KB, RefUnits, parse_si_unit
from ls1_mardyn_tpu.io.xml_config import read_xml_config

REF = RefUnits.from_config(
    {"length": ("nm", 0.1), "mass": ("u", 1.0), "energy": ("K", 1.0)}
)


def test_parse_si_unit():
    assert parse_si_unit("fs") == (1e-15, "time")
    assert parse_si_unit("nm") == (1e-9, "length")
    assert parse_si_unit("K") == (1.0, "temperature")
    assert parse_si_unit("u")[1] == "mass"
    assert parse_si_unit("kg") == (1.0, "mass")
    assert parse_si_unit("MPa") == (1e6, "pressure")
    with pytest.raises(ValueError):
        parse_si_unit("furlong")


def test_reference_quantities():
    assert REF.length_m == pytest.approx(1e-10)
    assert REF.mass_kg == pytest.approx(AMU)
    assert REF.energy_J == pytest.approx(KB)
    # t* = l* sqrt(m*/e*) ~ 1.0967e-12 s for the Angstrom/u/K system
    assert REF.time_s == pytest.approx(1.0967e-12, rel=1e-3)
    assert REF.temperature_K == pytest.approx(1.0)


def test_five_femtoseconds_is_000456():
    """The reference's example comment: 0.00456 reduced == 5 fs."""
    assert REF.convert(5.0, "fs") == pytest.approx(0.00456, rel=2e-3)


def test_lengths_and_temperature():
    assert REF.convert(1.0, "nm") == pytest.approx(10.0)  # 1 nm = 10 A
    assert REF.convert(300.0, "K") == pytest.approx(300.0)
    assert REF.convert(1.0, "m") == pytest.approx(1e10)


def test_xml_config_si_units(tmp_path):
    xml = """<?xml version="1.0"?>
<mardyn version="20100525">
  <refunits type="SI">
    <length unit="nm">0.1</length>
    <mass unit="u">1</mass>
    <energy unit="K">1</energy>
  </refunits>
  <simulation type="MD">
    <integrator type="Leapfrog"><timestep unit="fs">5</timestep></integrator>
    <run><production><steps>10</steps></production></run>
    <ensemble type="NVT">
      <temperature unit="K">150</temperature>
      <domain type="box">
        <lx unit="nm">4</lx><ly unit="nm">4</ly><lz unit="nm">4</lz>
      </domain>
    </ensemble>
    <algorithm>
      <cutoffs><radiusLJ unit="nm">1.0</radiusLJ></cutoffs>
    </algorithm>
  </simulation>
</mardyn>"""
    p = tmp_path / "si.xml"
    p.write_text(xml)
    cfg = read_xml_config(str(p))
    assert cfg.timestep == pytest.approx(0.00456, rel=2e-3)
    assert cfg.temperature == pytest.approx(150.0)
    np.testing.assert_allclose(cfg.box, [40.0, 40.0, 40.0])
    assert cfg.lj_cutoff == pytest.approx(10.0)


def test_reduced_values_untouched(tmp_path):
    xml = """<?xml version="1.0"?>
<mardyn version="20100525">
  <simulation type="MD">
    <integrator type="Leapfrog">
      <timestep unit="reduced">0.002</timestep>
    </integrator>
    <ensemble type="NVT">
      <temperature>1.1</temperature>
      <domain type="box"><lx>10</lx><ly>10</ly><lz>10</lz></domain>
    </ensemble>
    <algorithm><cutoffs><radiusLJ>2.5</radiusLJ></cutoffs></algorithm>
  </simulation>
</mardyn>"""
    p = tmp_path / "red.xml"
    p.write_text(xml)
    cfg = read_xml_config(str(p))
    assert cfg.timestep == 0.002
    assert cfg.temperature == 1.1
