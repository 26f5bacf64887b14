"""ls1-mardyn-tpu: a TPU-native molecular dynamics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ls1-MarDyn
(reference: /root/reference, C++17/MPI/OpenMP) for rigid multi-site
molecules (LJ-12-6 centers, point charges, point dipoles, point
quadrupoles).

Architecture (TPU-first, not a translation):
  - particle state: fixed-capacity dense arrays in HBM, cell-major with
    validity masks (the LinkedCells+CellDataSoA idea mapped to XLA's
    static-shape world)
  - force path: Pallas cell-row kernels (replacing the AVX
    VectorizedCellProcessor) with a plain-JAX cell path and an N^2
    scalar oracle as golden references (replacing LegacyCellProcessor)
  - whole timestep: one jitted function (leapfrog + rigid-body
    quaternion rotation + thermostat + fused global reductions)
  - multi-chip: shard_map over a device mesh of the cell grid, halo and
    leaving-particle exchange via jax.lax.ppermute per axis, global
    values via one fused psum (replacing MPI DomainDecomposition +
    CollectiveCommunication)
"""

__version__ = "0.1.0"

from ls1_mardyn_tpu.state import MoleculeState, SimState  # noqa: F401
from ls1_mardyn_tpu.models.components import Component, ComponentTable  # noqa: F401
