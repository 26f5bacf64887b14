"""Simulation state pytrees.

TPU-native replacement for the reference's AoS FullMolecule storage
(/root/reference/src/molecules/FullMolecule.h): fixed-capacity dense
SoA arrays with a validity mask, so every step is a static-shape jitted
program.  Molecule "pointers" are indices; deleted/unfilled slots are
masked out (valid=False) and carry neutral values.

Fields mirror FullMolecule's r, v, q, D(=L, angular momentum, world
frame), F, M(torque), Vi(virial) plus component id and molecule id.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MoleculeState:
    """Dense molecule arrays; capacity N may exceed the live count."""

    r: jnp.ndarray  # [N,3] center-of-mass position (world)
    v: jnp.ndarray  # [N,3] velocity
    q: jnp.ndarray  # [N,4] orientation quaternion (w,x,y,z), body->world
    L: jnp.ndarray  # [N,3] angular momentum (world frame; ref calls it D)
    cid: jnp.ndarray  # [N] int32 component index (0-based)
    mid: jnp.ndarray  # [N] int32 molecule id
    valid: jnp.ndarray  # [N] bool

    @property
    def capacity(self) -> int:
        return self.r.shape[0]

    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def from_numpy(
        r: np.ndarray,
        v: np.ndarray,
        q: Optional[np.ndarray] = None,
        L: Optional[np.ndarray] = None,
        cid: Optional[np.ndarray] = None,
        mid: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        dtype=jnp.float32,
    ) -> "MoleculeState":
        n = r.shape[0]
        if capacity is None:
            capacity = n
        assert capacity >= n

        def padf(a):
            out = np.zeros((capacity,) + a.shape[1:], dtype=np.float64)
            out[:n] = a
            return jnp.asarray(out, dtype=dtype)

        if q is None:
            q = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
        if L is None:
            L = np.zeros((n, 3))
        if cid is None:
            cid = np.zeros((n,), np.int32)
        if mid is None:
            mid = np.arange(1, n + 1, dtype=np.int32)
        valid = np.zeros((capacity,), bool)
        valid[:n] = True
        cid_p = np.zeros((capacity,), np.int32)
        cid_p[:n] = cid
        mid_p = np.zeros((capacity,), np.int32)
        mid_p[:n] = mid
        qp = padf(q)
        # padded quaternions must stay normalized for safe math
        qp = qp.at[n:, 0].set(1.0)
        return MoleculeState(
            r=padf(r),
            v=padf(v),
            q=qp,
            L=padf(L),
            cid=jnp.asarray(cid_p),
            mid=jnp.asarray(mid_p),
            valid=jnp.asarray(valid),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Forces:
    """Per-molecule force/torque/virial produced by a force pass.

    Mirrors FullMolecule's F, M, Vi (FullMolecule.h) after calcFM
    (FullMolecule.cpp:551-620: F = sum of site forces, M = sum of
    site_d x F_site + multipole field torques, Vi = per-molecule virial).
    """

    F: jnp.ndarray  # [N,3]
    M: jnp.ndarray  # [N,3]
    Vi: jnp.ndarray  # [N,3]

    @staticmethod
    def zeros(n: int, dtype=jnp.float32) -> "Forces":
        z = jnp.zeros((n, 3), dtype)
        return Forces(z, z, z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Macroscopic:
    """Global scalars of one force evaluation.

    The reference accumulates upot6lj / upotXpoles / virial / myRF in the
    cell processor and combines them in endTraversal
    (VectorizedCellProcessor.cpp:119-156):
      U_pot  = upot6lj/6 + upotXpoles + myRF
      virial = virial + 3*myRF
    """

    upot6lj: jnp.ndarray
    upot_xpoles: jnp.ndarray
    virial: jnp.ndarray
    my_rf: jnp.ndarray

    @property
    def upot(self):
        return self.upot6lj / 6.0 + self.upot_xpoles + self.my_rf

    @property
    def total_virial(self):
        return self.virial + 3.0 * self.my_rf

    @staticmethod
    def zeros(dtype=jnp.float32) -> "Macroscopic":
        z = jnp.zeros((), dtype)
        return Macroscopic(z, z, z, z)

    def __add__(self, o: "Macroscopic") -> "Macroscopic":
        return Macroscopic(
            self.upot6lj + o.upot6lj,
            self.upot_xpoles + o.upot_xpoles,
            self.virial + o.virial,
            self.my_rf + o.my_rf,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Full per-step simulation state threaded through the jitted step."""

    mol: MoleculeState
    forces: Forces
    macro: Macroscopic
    step: jnp.ndarray  # int32 scalar
    time: jnp.ndarray  # float scalar

    @staticmethod
    def create(mol: MoleculeState, dtype=None) -> "SimState":
        if dtype is None:
            dtype = mol.r.dtype
        n = mol.capacity
        return SimState(
            mol=mol,
            forces=Forces.zeros(n, dtype),
            macro=Macroscopic.zeros(dtype),
            step=jnp.zeros((), jnp.int32),
            time=jnp.zeros((), dtype),
        )
