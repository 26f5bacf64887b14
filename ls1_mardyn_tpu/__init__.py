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

import jax as _jax

# On TPU a default-precision f32 dot_general executes as a SINGLE bf16
# pass: every matmul that carries coordinates, forces, or interaction
# parameters (kernel tile transposes, one-hot selector/mixing-table
# lookups, Ewald phase matmuls) silently rounds its data to an 8-bit
# mantissa.  Measured on the real chip (tools/tpu_golden.py, r2): up to
# 0.43 max-relative force error on the Vectorization scenes and 0.17 on
# the 1CLJ row kernel -- invisible to interpret-mode f64 tests.  MD
# positions/forces are never bf16-tolerant, and this framework's hot
# kernels are VPU-bound (the MXU idles), so exact-f32 multi-pass
# matmuls are the correct default.  Throughput-critical matmuls that
# can genuinely tolerate bf16 must opt down per call site.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA/Mosaic compilation cache: first compiles of the force
# and rebin kernels cost seconds to minutes; every process restart
# (CLI run, bench, tools) would pay them again without this.  The
# reference has no analogue (C++ is ahead-of-time); the TPU equivalent
# of its build cache is this kernel cache.  Opt out with
# LS1_NO_COMPILE_CACHE=1 (e.g. when bisecting compiler issues).
import os as _os

if not _os.environ.get("LS1_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("LS1_COMPILE_CACHE", "/tmp/ls1_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ls1_mardyn_tpu.state import MoleculeState, SimState  # noqa: F401
from ls1_mardyn_tpu.models.components import Component, ComponentTable  # noqa: F401
