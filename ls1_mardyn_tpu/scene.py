"""Scene assembly: turn parsed phase-space data into device state.

Bridges I/O (PhaseSpaceData) and the compute layer (MoleculeState +
PairParams), the role Simulation::initConfigXML plays in the reference
(/root/reference/src/Simulation.cpp:675-750).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
from ls1_mardyn_tpu.models.components import ComponentTable
from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.state import MoleculeState


def build_scene(
    data: PhaseSpaceData,
    cutoff: float,
    lj_cutoff: Optional[float] = None,
    capacity: Optional[int] = None,
    dtype=jnp.float64,
) -> Tuple[MoleculeState, PairParams, ComponentTable, jnp.ndarray]:
    """Returns (state, pair_params, table, box)."""
    table = ComponentTable(
        data.components,
        mixing_xi=data.mixing_xi,
        mixing_eta=data.mixing_eta,
        eps_rf=data.eps_rf,
        cutoff=cutoff,
        lj_cutoff=lj_cutoff if lj_cutoff is not None else cutoff,
    )
    pp = PairParams.from_table(table, dtype=dtype)
    mol = MoleculeState.from_numpy(
        r=data.r,
        v=data.v,
        q=data.q,
        L=data.L,
        cid=data.cid,
        mid=data.mid.astype(np.int64),
        capacity=capacity,
        dtype=dtype,
    )
    box = jnp.asarray(data.box, dtype)
    return mol, pp, table, box
