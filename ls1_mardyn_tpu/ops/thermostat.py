"""Thermostats.

JAX equivalent of the reference's velocity-scaling thermostat
(/root/reference/src/thermostats/VelocityScalingThermostat.{h,cpp},
applied in the main loop at src/Simulation.cpp:1108-1140): scale
translational velocities by beta_trans and angular momenta by beta_rot
each step.  Component-wise thermostats map component -> thermostat id
(Domain.h:424-431); each thermostat id gets its own betas.

Region-based TemperatureControl (slab thermostats,
src/thermostats/TemperatureControl.{h,cpp}) is layered on top: regions
are static boxes; per-region kinetic sums are masked reductions and the
scaling is a masked multiply.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.state import MoleculeState


def apply_velocity_scaling(
    mol: MoleculeState, beta_trans, beta_rot
) -> MoleculeState:
    """Global velocity scaling (VelocityScalingThermostat::apply)."""
    v = mol.v * beta_trans
    L = mol.L * beta_rot
    return dataclasses.replace(mol, v=v, L=L)


def apply_velocity_scaling_componentwise(
    mol: MoleculeState,
    thermostat_of_component: jnp.ndarray,  # [K] int32 thermostat id
    beta_trans: jnp.ndarray,  # [T] per-thermostat
    beta_rot: jnp.ndarray,  # [T]
) -> MoleculeState:
    """Component-wise scaling (Simulation.cpp:1108-1136 with
    severalThermostats)."""
    tid = thermostat_of_component[mol.cid]
    v = mol.v * beta_trans[tid][:, None]
    L = mol.L * beta_rot[tid][:, None]
    return dataclasses.replace(mol, v=v, L=L)


@dataclasses.dataclass(frozen=True)
class TemperatureControlRegion:
    """One slab/box control region (TemperatureControl.cpp 'ControlRegion'):
    molecules inside [lower, upper) are velocity-scaled toward target_T
    every `frequency` steps."""

    lower: Tuple[float, float, float]
    upper: Tuple[float, float, float]
    target_temperature: float
    frequency: int = 1
    exponent: float = 0.4
    component: int = -1  # -1 == all components


def apply_temperature_control(
    mol: MoleculeState,
    pp: PairParams,
    regions: Tuple[TemperatureControlRegion, ...],
    step: jnp.ndarray,
) -> MoleculeState:
    """Region thermostats (src/thermostats/TemperatureControl.{h,cpp}
    DoLoopsOverMolecules: per-region kinetic sampling + scaling), as
    masked reductions + masked multiplies."""
    v = mol.v
    L = mol.L
    dtype = v.dtype
    mass = pp.mass[mol.cid]
    for reg in regions:
        lo = jnp.asarray(reg.lower, dtype)
        hi = jnp.asarray(reg.upper, dtype)
        inside = jnp.all((mol.r >= lo) & (mol.r < hi), axis=-1) & mol.valid
        if reg.component >= 0:
            inside = inside & (mol.cid == reg.component)
        active = (step % reg.frequency) == 0
        m = inside.astype(dtype)
        summv2 = jnp.sum(mass * jnp.sum(v * v, axis=-1) * m)
        nreg = jnp.sum(m)
        denom = jnp.maximum(3.0 * nreg, 1.0)
        t_reg = summv2 / denom
        # beta = (T_target / T_region)^0.4, the same damped form as the
        # global thermostat (Domain.cpp:244)
        beta = jnp.where(
            (nreg > 0) & (summv2 > 0) & active,
            jnp.power(
                jnp.asarray(reg.target_temperature, dtype)
                / jnp.maximum(t_reg, 1e-30),
                reg.exponent,
            ),
            1.0,
        )
        scale = jnp.where(inside, beta, 1.0)[:, None]
        v = v * scale
        L = L * scale
    return dataclasses.replace(mol, v=v, L=L)


def thermostat_kinetic_sums(
    mol: MoleculeState,
    pp: PairParams,
    mv2: jnp.ndarray,  # [N] per-molecule m*v^2
    iw2: jnp.ndarray,  # [N] per-molecule I*w^2
    thermostat_of_component: Optional[jnp.ndarray],
    num_thermostats: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-thermostat (summv2, sumIw2, N, rotDOF) segment sums; the local
    half of Domain::calculateGlobalValues's per-thermostat loop
    (Domain.cpp:207-235)."""
    if thermostat_of_component is None:
        tid = jnp.zeros_like(mol.cid)
    else:
        tid = thermostat_of_component[mol.cid]
    valid_f = mol.valid.astype(mv2.dtype)
    seg = lambda x: jax.ops.segment_sum(x, tid, num_segments=num_thermostats)
    summv2 = seg(mv2 * valid_f)
    sum_iw2 = seg(iw2 * valid_f)
    n = seg(valid_f)
    rdof = seg(pp.rot_dof[mol.cid].astype(mv2.dtype) * valid_f)
    return summv2, sum_iw2, n, rdof
