"""Physical model layer (L1): sites, components, quaternion algebra,
pair potentials, and the scalar N^2 oracle.

Mirrors the capabilities of /root/reference/src/molecules/ (Site.h,
Component.{h,cpp}, Comp2Param.{h,cpp}, Quaternion.{h,cpp}, potforce.h,
FullMolecule.{h,cpp}) in vectorized JAX form.
"""
