"""Global (macroscopic) values: temperature, pressure, thermostat
scaling factors.

JAX equivalent of Domain::calculateGlobalValues
(/root/reference/src/Domain.cpp:152-262).  On multi-chip meshes the sums
arrive through a single fused psum (parallel/collectives.py), mirroring
the reference's agglomerated CollectiveCommunication
(src/parallel/CollectiveCommunication.h:14-60).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.state import Macroscopic


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GlobalValues:
    """Per-step global thermodynamic state (thermostat id 0 == whole
    system, Domain.cpp:186)."""

    n: jnp.ndarray  # number of molecules
    rot_dof: jnp.ndarray
    upot: jnp.ndarray
    virial: jnp.ndarray
    summv2: jnp.ndarray  # 2*KE_trans
    sum_iw2: jnp.ndarray  # 2*KE_rot
    temperature: jnp.ndarray
    pressure: jnp.ndarray
    beta_trans: jnp.ndarray
    beta_rot: jnp.ndarray


def calculate_global_values(
    macro: Macroscopic,
    summv2: jnp.ndarray,
    sum_iw2: jnp.ndarray,
    n: jnp.ndarray,
    rot_dof: jnp.ndarray,
    volume,
    target_temperature,
    nve: bool = False,
) -> GlobalValues:
    """Temperature / pressure / velocity-scaling betas.

    Mirrors Domain.cpp:
      T = (summv2 + sumIw2) / (3N + rotDOF)            (:236-238)
      beta_trans = (3 N T_target / summv2)^0.4          (:244)
      beta_rot   = (rotDOF T_target / sumIw2)^0.4       (:248)
      p = rho T + rho <virial>/3                        (:136-140)
    """
    dtype = summv2.dtype
    nf = n.astype(dtype)
    rdof = rot_dof.astype(dtype)
    denom = 3.0 * nf + rdof
    T = jnp.where(denom > 0, (summv2 + sum_iw2) / jnp.maximum(denom, 1.0), 0.0)
    Ti = jnp.asarray(target_temperature, dtype)
    ok = (Ti > 0) & (nf > 0) & (not nve)
    beta_trans = jnp.where(
        ok & (summv2 > 0),
        jnp.power(3.0 * nf * Ti / jnp.maximum(summv2, 1e-30), 0.4),
        1.0,
    )
    beta_rot = jnp.where(
        ok & (sum_iw2 > 0),
        jnp.power(rdof * Ti / jnp.maximum(sum_iw2, 1e-30), 0.4),
        1.0,
    )
    rho = nf / jnp.asarray(volume, dtype)
    avg_virial = jnp.where(nf > 0, macro.total_virial / jnp.maximum(nf, 1.0), 0.0)
    pressure = rho * T + rho * avg_virial / 3.0
    return GlobalValues(
        n=n,
        rot_dof=rot_dof,
        upot=macro.upot,
        virial=macro.total_virial,
        summv2=summv2,
        sum_iw2=sum_iw2,
        temperature=T,
        pressure=pressure,
        beta_trans=beta_trans,
        beta_rot=beta_rot,
    )
