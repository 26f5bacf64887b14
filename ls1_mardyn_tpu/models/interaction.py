"""Molecule-pair interaction: all site-site contributions between two
rigid multi-site molecules, vectorized over batches of ordered pairs.

This is the JAX equivalent of PotForce
(/root/reference/src/molecules/potforce.h:282-503), restructured for
double-sided evaluation: for an *ordered* pair (i, j) we compute only
what lands on molecule i (force, torque, per-molecule virial) plus the
pair energies.  Evaluating both (i, j) and (j, i) reproduces the
reference's Newton-3rd-law bookkeeping exactly (the pair formulas are
antisymmetric in the force and role-symmetric in the torques); pair
energies are double-counted and must be halved by the caller.

Padded site slots carry zero coupling constants
(ComponentTable._build_pair_tables), so they contribute exactly zero —
no extra masking needed at site level.  Callers are responsible for
feeding a 'safe' drm (no zero-length vectors) and masking whole pairs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.models import potentials as pot
from ls1_mardyn_tpu.models.quaternion import qrotate


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PairParams:
    """Device-side mirror of ComponentTable (see components.py)."""

    # geometry [K, S, ...]
    lj_pos: jnp.ndarray
    charge_pos: jnp.ndarray
    charge_q: jnp.ndarray  # [K, NC] raw site charges (Ewald k-space)
    dip_pos: jnp.ndarray
    dip_e: jnp.ndarray
    quad_pos: jnp.ndarray
    quad_e: jnp.ndarray
    # coupling tables [K, K, S_i, S_j]
    eps24: jnp.ndarray
    sig2: jnp.ndarray
    shift6: jnp.ndarray
    qq: jnp.ndarray
    qQ05: jnp.ndarray
    Qq05: jnp.ndarray
    minus_qmy: jnp.ndarray
    minus_myq: jnp.ndarray
    QQ075: jnp.ndarray
    Qmy15: jnp.ndarray
    myQ15: jnp.ndarray
    my2: jnp.ndarray
    rffac: jnp.ndarray
    # per-component scalars
    mass: jnp.ndarray
    inertia: jnp.ndarray
    inv_inertia: jnp.ndarray
    rot_dof: jnp.ndarray
    # cutoffs (static floats kept as 0-d arrays for dtype consistency)
    rc2: jnp.ndarray  # electrostatics cutoff^2 (ref _cutoffRadiusSquare)
    rc2_lj: jnp.ndarray  # LJ cutoff^2 (ref _LJCutoffRadiusSquare)

    @staticmethod
    def from_table(table, dtype=jnp.float32) -> "PairParams":
        import numpy as np

        t = table
        minus_myq = np.transpose(t.minus_qmy, (1, 0, 3, 2)).copy()
        Qq05 = np.transpose(t.qQ05, (1, 0, 3, 2)).copy()

        def a(x):
            return jnp.asarray(x, dtype=dtype)

        return PairParams(
            lj_pos=a(t.lj_pos),
            charge_pos=a(t.charge_pos),
            charge_q=a(t.charge_q),
            dip_pos=a(t.dip_pos),
            dip_e=a(t.dip_e),
            quad_pos=a(t.quad_pos),
            quad_e=a(t.quad_e),
            eps24=a(t.eps24),
            sig2=a(t.sig2),
            shift6=a(t.shift6),
            qq=a(t.qq),
            qQ05=a(t.qQ05),
            Qq05=a(Qq05),
            minus_qmy=a(t.minus_qmy),
            minus_myq=a(minus_myq),
            QQ075=a(t.QQ075),
            Qmy15=a(t.Qmy15),
            myQ15=a(t.myQ15),
            my2=a(t.my2),
            rffac=a(t.rffac),
            mass=a(t.mass),
            inertia=a(t.inertia),
            inv_inertia=a(t.inv_inertia),
            rot_dof=jnp.asarray(t.rot_dof, jnp.int32),
            rc2=a(t.cutoff ** 2),
            rc2_lj=a(t.lj_cutoff ** 2),
        )


def site_offsets(pp: PairParams, q: jnp.ndarray, cid: jnp.ndarray):
    """World-frame site offsets (relative to COM) and multipole
    orientations for molecules with quaternion q and component cid.

    Mirrors FullMolecule::computeLJcenter_d etc.
    (FullMolecule.h:217-232: site_world = q.rotate(body_site)).
    Returns dict of [..., S, 3] arrays.
    """
    qb = q[..., None, :]
    return dict(
        lj=qrotate(qb, pp.lj_pos[cid]),
        charge=qrotate(qb, pp.charge_pos[cid]),
        dip=qrotate(qb, pp.dip_pos[cid]),
        dip_e=qrotate(qb, pp.dip_e[cid]),
        quad=qrotate(qb, pp.quad_pos[cid]),
        quad_e=qrotate(qb, pp.quad_e[cid]),
    )


def _pair_expand(drm, d_i, d_j):
    """drs[..., Si, Sj, 3] = drm + d_i - d_j; plus squared length."""
    drs = (
        drm[..., None, None, :]
        + d_i[..., :, None, :]
        - d_j[..., None, :, :]
    )
    dr2 = jnp.sum(drs * drs, axis=-1)
    return drs, dr2


def molecule_pair(
    drm: jnp.ndarray,
    sites_i: dict,
    sites_j: dict,
    cid_i: jnp.ndarray,
    cid_j: jnp.ndarray,
    pp: PairParams,
    mask_lj: jnp.ndarray,
    mask_elec: jnp.ndarray,
    screen_alpha: float = 0.0,
):
    """All interactions of ordered molecule pair (i, j).

    Args:
      drm: [..., 3] COM distance r_i - r_j (minimum-image, 'safe').
      sites_i/j: outputs of :func:`site_offsets` for each side.
      mask_lj/mask_elec: [...] COM-distance cutoff masks
        (VectorizedCellProcessor.cpp:967-1024: LJ sites use the LJ
        cutoff, electrostatics the main cutoff, both COM-based).

    Returns dict with F (on i), M (torque on i), Vi (0.5*drm*F-style
    virial vector on i), u6lj, uX, my_rf (full pair energies -- halve
    when summing over ordered pairs).
    """
    dtype = drm.dtype
    batch = drm.shape[:-1]
    F = jnp.zeros(batch + (3,), dtype)
    M = jnp.zeros(batch + (3,), dtype)
    Vi = jnp.zeros(batch + (3,), dtype)
    u6lj = jnp.zeros(batch, dtype)
    uX = jnp.zeros(batch, dtype)
    my_rf = jnp.zeros(batch, dtype)

    mlj = mask_lj.astype(dtype)
    mel = mask_elec.astype(dtype)

    def add_force(f_net, d_site_i, m_extra=None):
        """Accumulate a site-level force on molecule i: translational
        force, torque via site cross product (FullMolecule.cpp:546-548),
        and virial 0.5*drm*f (potforce.h:316)."""
        nonlocal F, M, Vi
        fsum = jnp.sum(f_net, axis=(-3, -2))
        F = F + fsum
        M = M + jnp.sum(jnp.cross(d_site_i[..., :, None, :], f_net), axis=(-3, -2))
        if m_extra is not None:
            M = M + jnp.sum(m_extra, axis=(-3, -2))
        Vi = Vi + 0.5 * drm * fsum

    # --- LJ centers (potforce.h:295-319) ---------------------------------
    drs, dr2 = _pair_expand(drm, sites_i["lj"], sites_j["lj"])
    eps24 = pp.eps24[cid_i, cid_j]
    sig2 = pp.sig2[cid_i, cid_j]
    shift6 = pp.shift6[cid_i, cid_j]
    f, u6 = pot.lj(drs, dr2, eps24, sig2)
    f = f * mlj[..., None, None, None]
    u6lj = u6lj + jnp.sum(u6 + shift6, axis=(-2, -1)) * mlj
    add_force(f, sites_i["lj"])

    # --- charge_i x {charge, quadrupole, dipole}_j (potforce.h:330-381) --
    drs, dr2 = _pair_expand(drm, sites_i["charge"], sites_j["charge"])
    if screen_alpha:
        # Ewald real-space part (ops/ewald.py provides the k-space rest)
        f, u = pot.charge_charge_screened(
            drs, dr2, pp.qq[cid_i, cid_j], screen_alpha
        )
    else:
        f, u = pot.charge_charge(drs, dr2, pp.qq[cid_i, cid_j])
    f = f * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["charge"])

    drs, dr2 = _pair_expand(drm, sites_i["charge"], sites_j["quad"])
    e_j = sites_j["quad_e"][..., None, :, :]
    f, _m2, u = pot.charge_quadrupole(drs, dr2, e_j, pp.qQ05[cid_i, cid_j])
    f = f * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["charge"])

    drs, dr2 = _pair_expand(drm, sites_i["charge"], sites_j["dip"])
    e_j = sites_j["dip_e"][..., None, :, :]
    f, _m2, u = pot.charge_dipole(drs, dr2, e_j, pp.minus_qmy[cid_i, cid_j])
    f = f * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["charge"])

    # --- quadrupole_i x {charge, quadrupole, dipole}_j (potforce.h:382-439)
    # Quadrupole-Charge: drs = site_charge_j - site_quad_i
    # (minusSiteSiteDistanceAbs, potforce.h:391); f acts on the charge,
    # so molecule i receives -f; m2 (torque on the quadrupole) -> i.
    drs, dr2 = _pair_expand(-drm, sites_j["charge"], sites_i["quad"])
    drs = jnp.swapaxes(drs, -3, -2)  # -> [..., Sq_i, Sc_j, 3]
    dr2 = jnp.swapaxes(dr2, -2, -1)
    e_i = sites_i["quad_e"][..., :, None, :]
    f, m_on_i, u = pot.charge_quadrupole(drs, dr2, e_i, pp.Qq05[cid_i, cid_j])
    f = -f * mel[..., None, None, None]
    m_on_i = m_on_i * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["quad"], m_on_i)

    drs, dr2 = _pair_expand(drm, sites_i["quad"], sites_j["quad"])
    e_i = sites_i["quad_e"][..., :, None, :]
    e_j = sites_j["quad_e"][..., None, :, :]
    f, m1, _m2, u = pot.quadrupole_quadrupole(drs, dr2, e_i, e_j, pp.QQ075[cid_i, cid_j])
    f = f * mel[..., None, None, None]
    m1 = m1 * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["quad"], m1)

    # Quadrupole-Dipole: drs = site_dip_j - site_quad_i (potforce.h:427);
    # PotForceDiQuadrupole's 'dipole' role is j, 'quad' role is i; f acts
    # on the dipole -> i receives -f; the quad torque (our m2) -> i.
    drs, dr2 = _pair_expand(-drm, sites_j["dip"], sites_i["quad"])
    drs = jnp.swapaxes(drs, -3, -2)
    dr2 = jnp.swapaxes(dr2, -2, -1)
    e_dip_j = sites_j["dip_e"][..., None, :, :]
    e_quad_i = sites_i["quad_e"][..., :, None, :]
    f, _m_dip, m_quad, u = pot.dipole_quadrupole(
        drs, dr2, e_dip_j, e_quad_i, pp.Qmy15[cid_i, cid_j]
    )
    f = -f * mel[..., None, None, None]
    m_quad = m_quad * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["quad"], m_quad)

    # --- dipole_i x {charge, quadrupole, dipole}_j (potforce.h:440-496) --
    # Dipole-Charge: drs = site_charge_j - site_dip_i (potforce.h:448);
    # f acts on the charge -> i receives -f; dipole torque -> i.
    drs, dr2 = _pair_expand(-drm, sites_j["charge"], sites_i["dip"])
    drs = jnp.swapaxes(drs, -3, -2)
    dr2 = jnp.swapaxes(dr2, -2, -1)
    e_i = sites_i["dip_e"][..., :, None, :]
    f, m_on_i, u = pot.charge_dipole(drs, dr2, e_i, pp.minus_myq[cid_i, cid_j])
    f = -f * mel[..., None, None, None]
    m_on_i = m_on_i * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["dip"], m_on_i)

    # Dipole-Quadrupole: drs = site_dip_i - site_quad_j (potforce.h:465);
    # dipole role is i -> f on i, m1 on i.
    drs, dr2 = _pair_expand(drm, sites_i["dip"], sites_j["quad"])
    e_i = sites_i["dip_e"][..., :, None, :]
    e_j = sites_j["quad_e"][..., None, :, :]
    f, m1, _m2, u = pot.dipole_quadrupole(drs, dr2, e_i, e_j, pp.myQ15[cid_i, cid_j])
    f = f * mel[..., None, None, None]
    m1 = m1 * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    add_force(f, sites_i["dip"], m1)

    # Dipole-Dipole (potforce.h:477-495)
    drs, dr2 = _pair_expand(drm, sites_i["dip"], sites_j["dip"])
    e_i = sites_i["dip_e"][..., :, None, :]
    e_j = sites_j["dip_e"][..., None, :, :]
    f, m1, _m2, u, rf = pot.dipole_dipole(
        drs, dr2, e_i, e_j, pp.my2[cid_i, cid_j], pp.rffac[cid_i, cid_j]
    )
    f = f * mel[..., None, None, None]
    m1 = m1 * mel[..., None, None, None]
    uX = uX + jnp.sum(u, axis=(-2, -1)) * mel
    my_rf = my_rf + jnp.sum(rf, axis=(-2, -1)) * mel
    add_force(f, sites_i["dip"], m1)

    return dict(F=F, M=M, Vi=Vi, u6lj=u6lj, uX=uX, my_rf=my_rf)
