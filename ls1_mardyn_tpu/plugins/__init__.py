"""Plugin system (L5).

Mirrors the reference's PluginBase hook interface and PluginFactory
registry (/root/reference/src/plugins/PluginBase.h:63-146,
PluginFactory.cpp:79-128): plugins hook into the step at
before_event_new_timestep -> before_forces -> after_forces -> end_step,
plus init/finish.  (site_wise_forces has no per-site host loop here;
plugins that need per-site access receive the jitted force arrays.)
"""

from ls1_mardyn_tpu.plugins.base import PluginBase, PluginFactory  # noqa: F401
from ls1_mardyn_tpu.plugins import writers  # noqa: F401  (registers defaults)
from ls1_mardyn_tpu.plugins import rdf  # noqa: F401
from ls1_mardyn_tpu.plugins import nemd  # noqa: F401
from ls1_mardyn_tpu.plugins import profiles  # noqa: F401
from ls1_mardyn_tpu.plugins import region_sampling  # noqa: F401
from ls1_mardyn_tpu.plugins import mettdeamon  # noqa: F401
from ls1_mardyn_tpu.plugins import writers2  # noqa: F401
from ls1_mardyn_tpu.plugins import widom  # noqa: F401
from ls1_mardyn_tpu.plugins import diagnostics  # noqa: F401
from ls1_mardyn_tpu.plugins import mmpld  # noqa: F401
from ls1_mardyn_tpu.plugins import vtk  # noqa: F401
from ls1_mardyn_tpu.plugins import odf  # noqa: F401
from ls1_mardyn_tpu.plugins import nemd2  # noqa: F401
from ls1_mardyn_tpu.ensemble import cavity  # noqa: F401  (CavityWriter)
from ls1_mardyn_tpu.plugins import extra  # noqa: F401
from ls1_mardyn_tpu.plugins import steereo  # noqa: F401

# Legacy "DomainProfiles" configs map onto the profile writer exactly
# as the reference does (PluginFactory.cpp:181 forwards it to
# DensityProfileWriter); the Adsorption example uses this name.
PluginFactory._registry.setdefault(
    "DomainProfiles", PluginFactory._registry.get("SpatialProfile")
)
