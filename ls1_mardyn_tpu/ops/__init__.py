"""Performance ops (L2/L3): cell grid, force kernels, integrator,
thermostats, global reductions.

TPU-native replacements for /root/reference/src/particleContainer/
(LinkedCells + traversals + VectorizedCellProcessor) and
src/integrators/, src/thermostats/, src/Domain.cpp.
"""
