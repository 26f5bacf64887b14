"""Leapfrog (velocity-Verlet) integrator with rigid-body quaternion
rotation, as one vectorized jitted transform.

Numerics match the reference's two-phase update exactly:
  - pre-force  (Leapfrog::eventNewTimestep -> FullMolecule::upd_preF,
    /root/reference/src/molecules/FullMolecule.cpp:334-364):
      v += dt/(2m) * F;  r += dt * v
      w_body = I^-1 R(q)^-1 L
      q_half = normalize(q + dt/2 * dq/dt(q, w_body))
      L += dt/2 * M
      w_half = I^-1 R(q_half)^-1 L
      q = normalize(q + dt * dq/dt(q_half, w_half))
  - post-force (Leapfrog::eventForcesCalculated -> upd_postF,
    FullMolecule.cpp:366-389):
      v += dt/(2m) * F;  L += dt/2 * M
      accumulate 2*KE_trans = sum m v^2 and 2*KE_rot = sum I w^2
    (the kinetic sums feed Domain::calculateGlobalValues,
    /root/reference/src/Domain.cpp:152-262)

Molecules without rotational DOF keep q = identity and L = 0 (the
reference's single-site path skips rotation entirely).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.models.quaternion import qdifferentiate, qnormalize, qrotate_inv
from ls1_mardyn_tpu.state import Forces, MoleculeState


def _body_omega(pp: PairParams, cid, q, L):
    """w_body = I^-1 R(q)^-1 L (FullMolecule.cpp:343-345; 'L = D = Iw')."""
    return qrotate_inv(q, L) * pp.inv_inertia[cid]


def upd_pre_force(
    mol: MoleculeState, forces: Forces, pp: PairParams, dt: float
) -> MoleculeState:
    dtype = mol.r.dtype
    dt = jnp.asarray(dt, dtype)
    half = 0.5 * dt
    mass = pp.mass[mol.cid][:, None]
    has_rot = (pp.rot_dof[mol.cid] > 0)[:, None]
    vmask = mol.valid[:, None]

    v = mol.v + jnp.where(vmask, half / mass * forces.F, 0.0)
    r = mol.r + jnp.where(vmask, dt * v, 0.0)

    # rotational half-step ladder (FullMolecule.cpp:343-362)
    w = _body_omega(pp, mol.cid, mol.q, mol.L)
    q_half = qnormalize(mol.q + half[..., None] * qdifferentiate(mol.q, w))
    L = mol.L + jnp.where(vmask & has_rot, half * forces.M, 0.0)
    w_half = _body_omega(pp, mol.cid, q_half, L)
    q_new = qnormalize(mol.q + dt[..., None] * qdifferentiate(q_half, w_half))
    rot = (vmask & has_rot)[..., :1]
    q = jnp.where(rot, q_new, mol.q)

    return MoleculeState(
        r=r, v=v, q=q, L=L, cid=mol.cid, mid=mol.mid, valid=mol.valid
    )


def _kahan(x, comp, inc):
    """Compensated accumulation x += inc (Kahan-Neumaier): returns
    (x_new, comp_new).  The f32 answer to the reference's SPDP
    mixed-precision mode (SIMD_TYPES.h:110-113: f32 compute,
    effectively-f64 accumulate)."""
    y = inc - comp
    t = x + y
    return t, (t - x) - y


def upd_pre_force_kahan(
    mol: MoleculeState,
    forces: Forces,
    pp: PairParams,
    dt: float,
    rcomp: jnp.ndarray,
    vcomp: jnp.ndarray,
):
    """upd_pre_force with compensated r/v accumulation (the multi-chip
    paths keep absolute f32 positions; without compensation the per-step
    rounding of r += dt*v at |r| >> dt*|v| injects a random heating
    kick -- the single-chip RMM path solves this with cell-local
    coordinates instead)."""
    dtype = mol.r.dtype
    dt = jnp.asarray(dt, dtype)
    half = 0.5 * dt
    mass = pp.mass[mol.cid][:, None]
    has_rot = (pp.rot_dof[mol.cid] > 0)[:, None]
    vmask = mol.valid[:, None]

    v, vcomp = _kahan(
        mol.v, vcomp, jnp.where(vmask, half / mass * forces.F, 0.0)
    )
    r, rcomp = _kahan(mol.r, rcomp, jnp.where(vmask, dt * v, 0.0))

    w = _body_omega(pp, mol.cid, mol.q, mol.L)
    q_half = qnormalize(mol.q + half[..., None] * qdifferentiate(mol.q, w))
    L = mol.L + jnp.where(vmask & has_rot, half * forces.M, 0.0)
    w_half = _body_omega(pp, mol.cid, q_half, L)
    q_new = qnormalize(mol.q + dt[..., None] * qdifferentiate(q_half, w_half))
    rot = (vmask & has_rot)[..., :1]
    q = jnp.where(rot, q_new, mol.q)

    out = MoleculeState(
        r=r, v=v, q=q, L=L, cid=mol.cid, mid=mol.mid, valid=mol.valid
    )
    return out, rcomp, vcomp


def upd_post_force_kahan(
    mol: MoleculeState,
    forces: Forces,
    pp: PairParams,
    dt: float,
    vcomp: jnp.ndarray,
):
    """upd_post_force with compensated v accumulation; returns
    (state, mv2, Iw2, vcomp)."""
    dtype = mol.r.dtype
    half = 0.5 * jnp.asarray(dt, dtype)
    mass = pp.mass[mol.cid]
    has_rot = (pp.rot_dof[mol.cid] > 0)[:, None]
    vmask = mol.valid[:, None]

    v, vcomp = _kahan(
        mol.v, vcomp,
        jnp.where(vmask, half / mass[:, None] * forces.F, 0.0),
    )
    L = mol.L + jnp.where(vmask & has_rot, half * forces.M, 0.0)

    mv2 = mass * jnp.sum(v * v, axis=-1) * mol.valid
    w = _body_omega(pp, mol.cid, mol.q, L)
    Iw2 = jnp.sum(pp.inertia[mol.cid] * w * w, axis=-1) * mol.valid

    out = MoleculeState(
        r=mol.r, v=v, q=mol.q, L=L, cid=mol.cid, mid=mol.mid, valid=mol.valid
    )
    return out, mv2, Iw2, vcomp


def upd_post_force(
    mol: MoleculeState, forces: Forces, pp: PairParams, dt: float
) -> Tuple[MoleculeState, jnp.ndarray, jnp.ndarray]:
    """Second half-kick. Returns (state, summv2_per_mol, sumIw2_per_mol);
    callers reduce the per-molecule kinetic terms into the thermostat
    sums (per thermostat region / component, Leapfrog.cpp:66-130)."""
    dtype = mol.r.dtype
    half = 0.5 * jnp.asarray(dt, dtype)
    mass = pp.mass[mol.cid]
    has_rot = (pp.rot_dof[mol.cid] > 0)[:, None]
    vmask = mol.valid[:, None]

    v = mol.v + jnp.where(vmask, half / mass[:, None] * forces.F, 0.0)
    L = mol.L + jnp.where(vmask & has_rot, half * forces.M, 0.0)

    mv2 = mass * jnp.sum(v * v, axis=-1) * mol.valid
    w = _body_omega(pp, mol.cid, mol.q, L)
    Iw2 = jnp.sum(pp.inertia[mol.cid] * w * w, axis=-1) * mol.valid

    out = MoleculeState(
        r=mol.r, v=v, q=mol.q, L=L, cid=mol.cid, mid=mol.mid, valid=mol.valid
    )
    return out, mv2, Iw2


def kinetic_sums(mol: MoleculeState, pp: PairParams):
    """2*KE sums without advancing state (Domain::calculateVelocitySums /
    FullMolecule::calculate_mv2_Iw2, FullMolecule.cpp:412-421)."""
    mass = pp.mass[mol.cid]
    mv2 = mass * jnp.sum(mol.v * mol.v, axis=-1) * mol.valid
    w = _body_omega(pp, mol.cid, mol.q, mol.L)
    Iw2 = jnp.sum(pp.inertia[mol.cid] * w * w, axis=-1) * mol.valid
    return mv2, Iw2
