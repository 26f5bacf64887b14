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
    """One control region (TemperatureControl.cpp 'ControlRegionT'):
    molecules inside (lower, upper) are velocity-scaled toward the
    target every `frequency` steps, with the reference's full feature
    set: y-slab subdivision (numslabs), thermostated translational
    directions, target ramping, and the control start/stop window
    (TemperatureControl.h:41-63,155)."""

    lower: Tuple[float, float, float]
    upper: Tuple[float, float, float]
    target_temperature: float
    frequency: int = 1
    exponent: float = 0.4
    component: int = -1  # -1 == all components
    nslabs: int = 1  # region subdivided along y (TemperatureControl.cpp:386)
    directions: Tuple[int, ...] = (0, 1, 2)  # <directions>xyz</directions>
    # target ramp (Ramp struct, TemperatureControl.h:155)
    ramp_start_t: float = 0.0
    ramp_end_t: float = 0.0
    ramp_update_start: int = 0
    ramp_update_stop: int = 0
    ramp_update_freq: int = 1
    # thermostat ON/OFF window (<control><start>/<stop>); int32-safe
    # sentinel (a Python int beyond int32 silently WRAPS in the jnp
    # comparison against the int32 step counter)
    start: int = 0
    stop: int = 2**31 - 1

    def target_at(self, step: jnp.ndarray, dtype):
        """Ramped target temperature at `step` (quantized to
        ramp_update_freq, TemperatureControl.cpp:267-277)."""
        if self.ramp_update_stop <= self.ramp_update_start:
            return jnp.asarray(self.target_temperature, dtype)
        slope = (self.ramp_end_t - self.ramp_start_t) / (
            self.ramp_update_stop - self.ramp_update_start
        )
        el = jnp.clip(
            step - self.ramp_update_start,
            0,
            self.ramp_update_stop - self.ramp_update_start,
        )
        el = (el // self.ramp_update_freq) * self.ramp_update_freq
        return jnp.asarray(self.ramp_start_t, dtype) + el.astype(dtype) * slope


def apply_temperature_control(
    mol: MoleculeState,
    pp: PairParams,
    regions: Tuple[TemperatureControlRegion, ...],
    step: jnp.ndarray,
    psum=None,
) -> MoleculeState:
    """Region thermostats (src/thermostats/TemperatureControl.{h,cpp}):
    per-slab kinetic sampling (MeasureKineticEnergy + CalcGlobalValues)
    then velocity scaling by vcorr = 2 - 1/beta on the thermostated
    directions and angular-momentum scaling by Dcorr = 2 - 1/betaRot
    (ControlTemperature, TemperatureControl.cpp:364-430), as masked
    segment reductions + masked multiplies.

    psum: optional cross-device reducer (multi-chip slab path); the
    per-slab sums mirror the reference's collective
    (TemperatureControl.cpp:238-263)."""
    v = mol.v
    L = mol.L
    dtype = v.dtype
    mass = pp.mass[mol.cid]
    iw2_mol = jnp.sum(L * L * pp.inv_inertia[mol.cid], axis=-1)
    rdof_mol = pp.rot_dof[mol.cid].astype(dtype)
    for reg in regions:
        lo = jnp.asarray(reg.lower, dtype)
        hi = jnp.asarray(reg.upper, dtype)
        inside = jnp.all((mol.r > lo) & (mol.r < hi), axis=-1) & mol.valid
        if reg.component >= 0:
            inside = inside & (mol.cid == reg.component)
        active = (
            ((step % reg.frequency) == 0)
            & (step >= reg.start)
            & (step <= min(int(reg.stop), 2**31 - 1))
        )
        nsl = max(int(reg.nslabs), 1)
        slab_w = (reg.upper[1] - reg.lower[1]) / nsl
        s_idx = jnp.clip(
            jnp.floor((mol.r[:, 1] - reg.lower[1]) / slab_w).astype(
                jnp.int32
            ),
            0,
            nsl - 1,
        )
        m = inside.astype(dtype)
        dirs = tuple(reg.directions)
        v2_dirs = sum(v[:, d] * v[:, d] for d in dirs)
        seg = lambda x: jax.ops.segment_sum(
            x, s_idx, num_segments=nsl
        )
        ekin_t = seg(mass * v2_dirs * m)  # 2x E_kin,trans (chosen dirs)
        ekin_r = seg(iw2_mol * m)
        n_s = seg(m)
        rdof_s = seg(rdof_mol * m)
        if psum is not None:
            ekin_t = psum(ekin_t)
            ekin_r = psum(ekin_r)
            n_s = psum(n_s)
            rdof_s = psum(rdof_s)
        target = reg.target_at(step, dtype)
        beta_t = jnp.where(
            (n_s >= 1) & (ekin_t > 0) & active,
            jnp.power(
                len(dirs) * n_s * target / jnp.maximum(ekin_t, 1e-30),
                reg.exponent,
            ),
            1.0,
        )
        beta_r = jnp.where(
            (rdof_s >= 1) & (ekin_r > 0) & active,
            jnp.power(
                rdof_s * target / jnp.maximum(ekin_r, 1e-30),
                reg.exponent,
            ),
            1.0,
        )
        # the reference scales by 2 - 1/beta (a damped correction that
        # converges to beta for beta ~ 1, TemperatureControl.cpp:395).
        # Guard: for beta < 0.5 the raw form flips sign and AMPLIFIES
        # (runaway); clamp to a small positive quench instead (the
        # reference is only ever used in the stable regime)
        vc = jnp.maximum(2.0 - 1.0 / beta_t, 0.05)
        dc = jnp.maximum(2.0 - 1.0 / beta_r, 0.05)
        vcorr = jnp.where(inside, vc[s_idx], 1.0)
        dcorr = jnp.where(inside, dc[s_idx], 1.0)
        vnew = v
        for d in dirs:
            vnew = vnew.at[:, d].set(v[:, d] * vcorr)
        v = vnew
        L = L * dcorr[:, None]
    return dataclasses.replace(mol, v=v, L=L)


def thermostat_directed_velocity(
    mol: MoleculeState,
    thermostat_of_component: Optional[jnp.ndarray],
    num_thermostats: int,
    undirected: jnp.ndarray,  # [T] bool: thermostat is "Undirected"
    psum=None,
) -> jnp.ndarray:
    """Per-thermostat mean (directed) velocity v_bar [T, 3] -- the
    NUMBER mean over the thermostat's molecules, zero for thermostats
    without the Undirected flag (Domain::
    calculateThermostatDirectedVelocity, Domain.cpp:368-408: sum of
    velocities / N, not mass-weighted).

    Deviation noted: the reference amortizes the O(N) pass over a
    100-step cadence (Simulation.h:327-331 _collectThermostat
    DirectedVelocity); under XLA the segment sums fuse into the step
    for free, so v_bar is recomputed every step (a strictly fresher
    estimate of the same quantity)."""
    dtype = mol.v.dtype
    if thermostat_of_component is None:
        tid = jnp.zeros_like(mol.cid)
    else:
        tid = thermostat_of_component[mol.cid]
    valid_f = mol.valid.astype(dtype)
    seg = lambda x: jax.ops.segment_sum(x, tid, num_segments=num_thermostats)
    sv = seg(mol.v * valid_f[:, None])  # [T, 3]
    n = seg(valid_f)  # [T]
    if psum is not None:
        sv = psum(sv)
        n = psum(n)
    vbar = sv / jnp.maximum(n, 1.0)[:, None]
    return jnp.where(undirected[:, None], vbar, 0.0)


def directed_kinetic_correction(
    mol: MoleculeState,
    pp: PairParams,
    vbar: jnp.ndarray,  # [T, 3]
    thermostat_of_component: Optional[jnp.ndarray],
    num_thermostats: int,
) -> jnp.ndarray:
    """Per-thermostat correction c so that summv2_thermal = summv2 + c:
    sum_i m(v_i - vbar)^2 = sum m v^2 - 2 vbar . sum(m v) + |vbar|^2
    sum m (calculate_mv2_Iw2's directed overload,
    FullMolecule.h; sampling the THERMAL kinetic energy only,
    Domain.cpp:462-470)."""
    dtype = mol.v.dtype
    if thermostat_of_component is None:
        tid = jnp.zeros_like(mol.cid)
    else:
        tid = thermostat_of_component[mol.cid]
    valid_f = mol.valid.astype(dtype)
    m = pp.mass[mol.cid] * valid_f
    seg = lambda x: jax.ops.segment_sum(x, tid, num_segments=num_thermostats)
    smv = seg(mol.v * m[:, None])  # [T, 3] sum m v
    sm = seg(m)  # [T]
    return (
        -2.0 * jnp.sum(vbar * smv, axis=-1)
        + jnp.sum(vbar * vbar, axis=-1) * sm
    )


def apply_velocity_scaling_componentwise_directed(
    mol: MoleculeState,
    thermostat_of_component: jnp.ndarray,
    beta_trans: jnp.ndarray,
    beta_rot: jnp.ndarray,
    vbar: jnp.ndarray,  # [T, 3]
) -> MoleculeState:
    """v <- vbar + beta (v - vbar): scale only the thermal component,
    preserving the directed flow (VelocityScalingThermostat.cpp:60-67
    vsub/scale_v/vadd)."""
    tid = thermostat_of_component[mol.cid]
    vb = vbar[tid]
    v = vb + (mol.v - vb) * beta_trans[tid][:, None]
    L = mol.L * beta_rot[tid][:, None]
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
