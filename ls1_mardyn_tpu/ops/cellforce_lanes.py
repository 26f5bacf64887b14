"""Lane-major multi-site cell-list force computation.

The TPU-fast general path: same semantics as ops/cellforce.py (which
remains the readable golden reference validated against the N^2
oracle), but every pair array is [cap_i, 27*cap_j] -- i on sublanes, j
on lanes -- with the site loops unrolled in Python and all vector
arithmetic done component-wise.  ops/cellforce.py's layout (site axes
in the middle, xyz minor) runs ~2000x below VPU peak on TPU; this
restructuring is worth ~100x on multi-site scenes and is the moral
equivalent of the reference's CellDataSoA + VectorizedCellProcessor
re-organization of the AoS legacy path
(/root/reference/src/particleContainer/adapter/CellDataSoA.h,
VectorizedCellProcessor.cpp:797 _calculatePairs).

Pair coupling constants are looked up with one-hot component matmuls
(ei @ T[:,:,sa,sb] @ ej^T on the MXU), so multi-component mixing works
without vector gathers.

Physics formulas identical to models/potentials.py (potforce.h), in
component form.  Cited line numbers refer to the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ls1_mardyn_tpu.models.interaction import PairParams, site_offsets
from ls1_mardyn_tpu.ops.cells import CellBins, CellGridSpec
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _axpy(acc, s, v):
    return tuple(acc[d] + s * v[d] for d in range(3))


def compute_forces_cells_lanes(
    mol: MoleculeState,
    pp: PairParams,
    spec: CellGridSpec,
    bins: CellBins,
    nbr_ids: jnp.ndarray,
    nbr_shift: jnp.ndarray,
    cell_chunk: int = 0,
    screen_alpha: float = 0.0,
) -> Tuple[Forces, Macroscopic]:
    n = mol.capacity
    cap = spec.cap
    dtype = mol.r.dtype
    K = pp.mass.shape[0]
    NL = pp.lj_pos.shape[1]
    NC = pp.charge_pos.shape[1]
    ND = pp.dip_pos.shape[1]
    NQ = pp.quad_pos.shape[1]
    import numpy as _np

    tnp = lambda a: _np.asarray(a)
    lj_mask = tnp(pp.eps24).any(axis=(0, 1))  # [NL,NL] which site pairs exist
    cc_mask = tnp(pp.qq).any(axis=(0, 1))
    cq_mask = tnp(pp.qQ05).any(axis=(0, 1))
    cd_mask = tnp(pp.minus_qmy).any(axis=(0, 1))
    qq_mask = tnp(pp.QQ075).any(axis=(0, 1))
    qd_mask = tnp(pp.Qmy15).any(axis=(0, 1))
    dq_mask = tnp(pp.myQ15).any(axis=(0, 1))
    dd_mask = tnp(pp.my2).any(axis=(0, 1))
    qc_mask = tnp(pp.Qq05).any(axis=(0, 1))
    dc_mask = tnp(pp.minus_myq).any(axis=(0, 1))

    sites_all = site_offsets(pp, mol.q, mol.cid)

    def one_cell(c):
        i_idx = bins.slots[c]
        j_idx = bins.slots[nbr_ids[c]].reshape(-1)
        j_shift = jnp.repeat(nbr_shift[c], cap, axis=0).astype(dtype)

        si = jnp.clip(i_idx, 0, n - 1)
        sj = jnp.clip(j_idx, 0, n - 1)
        oki = (i_idx >= 0) & mol.valid[si]
        okj = (j_idx >= 0) & mol.valid[sj]

        # COM coordinates as planes
        ri = [mol.r[si, d][:, None] for d in range(3)]  # [cap,1]
        rj = [(mol.r[sj, d] + j_shift[:, d])[None, :] for d in range(3)]
        drm = tuple(ri[d] - rj[d] for d in range(3))  # [cap, 27cap]
        com2 = _dot(drm, drm)
        pair_ok = (
            oki[:, None] & okj[None, :] & (si[:, None] != sj[None, :])
        )
        mask_lj = (pair_ok & (com2 < pp.rc2_lj)).astype(dtype)
        mask_el = (pair_ok & (com2 < pp.rc2)).astype(dtype)

        # one-hot component matrices for coupling lookups (MXU)
        ohi = (mol.cid[si][:, None] == jnp.arange(K)[None, :]).astype(dtype)
        ohj = (mol.cid[sj][:, None] == jnp.arange(K)[None, :]).astype(dtype)

        def coupling(tbl, sa, sb):
            # [cap, 27cap] = ohi @ tbl[:,:,sa,sb] @ ohj^T
            t = tbl[:, :, sa, sb].astype(dtype)
            return jax.lax.dot_general(
                jax.lax.dot_general(
                    ohi, t, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                ),
                ohj,
                (((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
            )

        # per-site world offsets as planes
        def site_planes(key, s):
            a = sites_all[key]
            return (
                [a[si, s, d][:, None] for d in range(3)],
                [a[sj, s, d][None, :] for d in range(3)],
            )

        # accumulators (start as python scalars to let XLA fuse)
        Fx = Fy = Fz = 0.0
        Mx = My = Mz = 0.0
        u6lj = uX = my_rf = 0.0

        def safe_inv(dr2, m):
            return m / jnp.where(m > 0, dr2, 1.0)

        # --- LJ site pairs (potforce.h:295-319) --------------------------
        for sa in range(NL):
            dia, _ = site_planes("lj", sa)
            for sb in range(NL):
                if not lj_mask[sa, sb]:
                    continue
                _, djb = site_planes("lj", sb)
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                dr2 = _dot(dr, dr)
                inv = safe_inv(dr2, mask_lj)
                e24 = coupling(pp.eps24, sa, sb)
                s2 = coupling(pp.sig2, sa, sb)
                sh6 = coupling(pp.shift6, sa, sb)
                lj6 = s2 * inv
                lj6 = lj6 * lj6 * lj6
                lj12 = lj6 * lj6
                lj12m6 = lj12 - lj6
                u6lj = u6lj + jnp.sum(e24 * lj12m6 + sh6 * mask_lj)
                fac = e24 * (lj12 + lj12m6) * inv
                f = tuple(fac * dr[d] for d in range(3))
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx, My, Mz = Mx + m[0], My + m[1], Mz + m[2]

        # --- charge_i x charge_j (potforce.h:330-346) --------------------
        for sa in range(NC):
            dia, _ = site_planes("charge", sa)
            for sb in range(NC):
                if not cc_mask[sa, sb]:
                    continue
                _, djb = site_planes("charge", sb)
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                dr2 = _dot(dr, dr)
                inv = safe_inv(dr2, mask_el)
                invd = jnp.sqrt(inv)
                qq = coupling(pp.qq, sa, sb)
                if screen_alpha:
                    r = dr2 * invd
                    erfc = jax.scipy.special.erfc(screen_alpha * r) * mask_el
                    u = qq * erfc * invd
                    two_a_pi = 2.0 * screen_alpha / jnp.sqrt(jnp.pi)
                    fac = (
                        u + qq * two_a_pi * jnp.exp(-screen_alpha ** 2 * dr2)
                        * mask_el
                    ) * inv
                else:
                    u = qq * invd
                    fac = u * inv
                uX = uX + jnp.sum(u)
                f = tuple(fac * dr[d] for d in range(3))
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx, My, Mz = Mx + m[0], My + m[1], Mz + m[2]

        # helper for oriented-site blocks ---------------------------------
        def orient_planes(key, s, side):
            a = sites_all[key]
            if side == "i":
                return [a[si, s, d][:, None] for d in range(3)]
            return [a[sj, s, d][None, :] for d in range(3)]

        # --- charge_i x quadrupole_j (potforce.h:347-363) ----------------
        for sa in range(NC):
            dia, _ = site_planes("charge", sa)
            for sb in range(NQ):
                if not cq_mask[sa, sb]:
                    continue
                _, djb = site_planes("quad", sb)
                ej = orient_planes("quad_e", sb, "j")
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                f, _m2, u = _charge_quad(
                    dr, ej, coupling(pp.qQ05, sa, sb), mask_el, safe_inv
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx, My, Mz = Mx + m[0], My + m[1], Mz + m[2]

        # --- charge_i x dipole_j (potforce.h:364-381) --------------------
        for sa in range(NC):
            dia, _ = site_planes("charge", sa)
            for sb in range(ND):
                if not cd_mask[sa, sb]:
                    continue
                _, djb = site_planes("dip", sb)
                ej = orient_planes("dip_e", sb, "j")
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                f, _m2, u = _charge_dip(
                    dr, ej, coupling(pp.minus_qmy, sa, sb), mask_el, safe_inv
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx, My, Mz = Mx + m[0], My + m[1], Mz + m[2]

        # --- quad_i x charge_j (potforce.h:386-401): dr = charge - quad --
        for sa in range(NQ):
            dia, _ = site_planes("quad", sa)
            ei = orient_planes("quad_e", sa, "i")
            for sb in range(NC):
                if not qc_mask[sa, sb]:
                    continue
                _, djb = site_planes("charge", sb)
                dr = tuple(-(drm[d] + dia[d] - djb[d]) for d in range(3))
                f, m_on_i, u = _charge_quad(
                    dr, ei, coupling(pp.Qq05, sa, sb), mask_el, safe_inv,
                    torque_on_quad=True,
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx - f[0], Fy - f[1], Fz - f[2]
                m = _cross(dia, tuple(-f[d] for d in range(3)))
                Mx = Mx + m[0] + m_on_i[0]
                My = My + m[1] + m_on_i[1]
                Mz = Mz + m[2] + m_on_i[2]

        # --- quad_i x quad_j (potforce.h:402-420) ------------------------
        for sa in range(NQ):
            dia, _ = site_planes("quad", sa)
            ei = orient_planes("quad_e", sa, "i")
            for sb in range(NQ):
                if not qq_mask[sa, sb]:
                    continue
                _, djb = site_planes("quad", sb)
                ej = orient_planes("quad_e", sb, "j")
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                f, m1, _m2, u = _quad_quad(
                    dr, ei, ej, coupling(pp.QQ075, sa, sb), mask_el, safe_inv
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx = Mx + m[0] + m1[0]
                My = My + m[1] + m1[1]
                Mz = Mz + m[2] + m1[2]

        # --- quad_i x dipole_j (potforce.h:421-438): dr = dip - quad -----
        for sa in range(NQ):
            dia, _ = site_planes("quad", sa)
            ei = orient_planes("quad_e", sa, "i")
            for sb in range(ND):
                if not qd_mask[sa, sb]:
                    continue
                _, djb = site_planes("dip", sb)
                ej = orient_planes("dip_e", sb, "j")
                dr = tuple(-(drm[d] + dia[d] - djb[d]) for d in range(3))
                f, _m_dip, m_quad, u = _dip_quad(
                    dr, ej, ei, coupling(pp.Qmy15, sa, sb), mask_el, safe_inv
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx - f[0], Fy - f[1], Fz - f[2]
                m = _cross(dia, tuple(-f[d] for d in range(3)))
                Mx = Mx + m[0] + m_quad[0]
                My = My + m[1] + m_quad[1]
                Mz = Mz + m[2] + m_quad[2]

        # --- dipole_i x charge_j (potforce.h:443-458): dr = charge - dip -
        for sa in range(ND):
            dia, _ = site_planes("dip", sa)
            ei = orient_planes("dip_e", sa, "i")
            for sb in range(NC):
                if not dc_mask[sa, sb]:
                    continue
                _, djb = site_planes("charge", sb)
                dr = tuple(-(drm[d] + dia[d] - djb[d]) for d in range(3))
                f, m_on_i, u = _charge_dip(
                    dr, ei, coupling(pp.minus_myq, sa, sb), mask_el, safe_inv,
                    torque_on_dip=True,
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx - f[0], Fy - f[1], Fz - f[2]
                m = _cross(dia, tuple(-f[d] for d in range(3)))
                Mx = Mx + m[0] + m_on_i[0]
                My = My + m[1] + m_on_i[1]
                Mz = Mz + m[2] + m_on_i[2]

        # --- dipole_i x quad_j (potforce.h:459-476) ----------------------
        for sa in range(ND):
            dia, _ = site_planes("dip", sa)
            ei = orient_planes("dip_e", sa, "i")
            for sb in range(NQ):
                if not dq_mask[sa, sb]:
                    continue
                _, djb = site_planes("quad", sb)
                ej = orient_planes("quad_e", sb, "j")
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                f, m1, _m2, u = _dip_quad(
                    dr, ei, ej, coupling(pp.myQ15, sa, sb), mask_el, safe_inv
                )
                uX = uX + jnp.sum(u)
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx = Mx + m[0] + m1[0]
                My = My + m[1] + m1[1]
                Mz = Mz + m[2] + m1[2]

        # --- dipole_i x dipole_j (potforce.h:477-495) --------------------
        for sa in range(ND):
            dia, _ = site_planes("dip", sa)
            ei = orient_planes("dip_e", sa, "i")
            for sb in range(ND):
                if not dd_mask[sa, sb]:
                    continue
                _, djb = site_planes("dip", sb)
                ej = orient_planes("dip_e", sb, "j")
                dr = tuple(drm[d] + dia[d] - djb[d] for d in range(3))
                f, m1, _m2, u, rf = _dip_dip(
                    dr, ei, ej,
                    coupling(pp.my2, sa, sb),
                    coupling(pp.rffac, sa, sb),
                    mask_el, safe_inv,
                )
                uX = uX + jnp.sum(u)
                my_rf = my_rf + jnp.sum(rf)
                Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
                m = _cross(dia, f)
                Mx = Mx + m[0] + m1[0]
                My = My + m[1] + m1[1]
                Mz = Mz + m[2] + m1[2]

        # per-i reductions over the lane axis
        z = jnp.zeros((cap, cap * 27), dtype)
        Fx = Fx + z
        Fy = Fy + z
        Fz = Fz + z
        Mx = Mx + z
        My = My + z
        Mz = Mz + z
        Fi = jnp.stack(
            [jnp.sum(Fx, axis=1), jnp.sum(Fy, axis=1), jnp.sum(Fz, axis=1)],
            axis=-1,
        )
        Mi = jnp.stack(
            [jnp.sum(Mx, axis=1), jnp.sum(My, axis=1), jnp.sum(Mz, axis=1)],
            axis=-1,
        )
        Vi = jnp.stack(
            [
                0.5 * jnp.sum(drm[0] * Fx, axis=1),
                0.5 * jnp.sum(drm[1] * Fy, axis=1),
                0.5 * jnp.sum(drm[2] * Fz, axis=1),
            ],
            axis=-1,
        )
        return dict(
            idx=i_idx,
            F=Fi,
            M=Mi,
            Vi=Vi,
            u6lj=jnp.asarray(u6lj, dtype),
            uX=jnp.asarray(uX, dtype),
            my_rf=jnp.asarray(my_rf, dtype),
        )

    n_cells = spec.n_cells
    cells = jnp.arange(n_cells)
    if cell_chunk and cell_chunk < n_cells:
        pad = (-n_cells) % cell_chunk
        cells_p = jnp.concatenate([cells, jnp.zeros((pad,), cells.dtype)])
        res = jax.lax.map(jax.vmap(one_cell), cells_p.reshape(-1, cell_chunk))
        res = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), res)
        keep = jnp.arange(n_cells + pad) < n_cells
        for k in ("F", "M", "Vi"):
            res[k] = jnp.where(keep[:, None, None], res[k], 0.0)
        for k in ("u6lj", "uX", "my_rf"):
            res[k] = jnp.where(keep, res[k], 0.0)
        res["idx"] = jnp.where(keep[:, None], res["idx"], -1)
    else:
        res = jax.vmap(one_cell)(cells)

    # gather back via the molecule->slot inverse map
    Ff = res["F"].reshape(-1, 3)
    Mf = res["M"].reshape(-1, 3)
    Vf = res["Vi"].reshape(-1, 3)
    src = jnp.clip(bins.slot_of, 0, Ff.shape[0] - 1)
    vmask = mol.valid[:, None]
    forces = Forces(
        F=jnp.where(vmask, Ff[src], 0.0),
        M=jnp.where(vmask, Mf[src], 0.0),
        Vi=jnp.where(vmask, Vf[src], 0.0),
    )
    macro = Macroscopic(
        upot6lj=0.5 * jnp.sum(res["u6lj"]),
        upot_xpoles=0.5 * jnp.sum(res["uX"]),
        virial=jnp.sum(res["Vi"]),
        my_rf=0.5 * jnp.sum(res["my_rf"]),
    )
    return forces, macro


# --- component-form pair physics (identical math to models/potentials.py)

def _charge_quad(dr, ej, qQ05, m, safe_inv, torque_on_quad=False, geom=None):
    if geom is None:
        dr2 = _dot(dr, dr)
        inv = safe_inv(dr2, m)
    else:
        # precomputed (dr2, inv) shared across interaction bodies with
        # co-located sites (the multi-site kernel's geometry cache);
        # dr2/inv are even under dr negation, so swapped-role bodies
        # reuse them too
        dr2, inv = geom
    invd = jnp.sqrt(inv)
    costj = _dot(ej, dr) * invd
    qQ3 = qQ05 * invd * inv
    u = qQ3 * (3.0 * costj * costj - 1.0)
    pRij = -3.0 * u * inv
    pTj = 6.0 * costj * qQ3 * invd
    fac = costj * pTj * invd - pRij
    f = tuple(fac * dr[d] - pTj * ej[d] for d in range(3))
    m2 = tuple(pTj * c for c in _cross(dr, ej))
    return f, m2, u


def _charge_dip(dr, ej, mqmy, m, safe_inv, torque_on_dip=False, geom=None):
    if geom is None:
        dr2 = _dot(dr, dr)
        inv = safe_inv(dr2, m)
    else:
        # precomputed (dr2, inv) shared across interaction bodies with
        # co-located sites (the multi-site kernel's geometry cache);
        # dr2/inv are even under dr negation, so swapped-role bodies
        # reuse them too
        dr2, inv = geom
    invd = jnp.sqrt(inv)
    costj = _dot(ej, dr) * invd
    uic = mqmy * inv
    u = uic * costj
    pTj = uic * invd
    fac = 3.0 * u * inv
    f = tuple(fac * dr[d] - pTj * ej[d] for d in range(3))
    m2 = tuple(pTj * c for c in _cross(dr, ej))
    return f, m2, u


def _dip_dip(dr, ei, ej, my2, rffac, m, safe_inv, geom=None):
    if geom is None:
        dr2 = _dot(dr, dr)
        inv = safe_inv(dr2, m)
    else:
        # precomputed (dr2, inv) shared across interaction bodies with
        # co-located sites (the multi-site kernel's geometry cache);
        # dr2/inv are even under dr negation, so swapped-role bodies
        # reuse them too
        dr2, inv = geom
    invd = jnp.sqrt(inv)
    myfac = my2 * inv * invd
    costi = _dot(ei, dr) * invd
    costj = _dot(ej, dr) * invd
    cosg = _dot(ei, ej)
    u = myfac * (cosg - 3.0 * costi * costj)
    rf = -rffac * cosg * m
    pTi = -myfac * 3.0 * costj * invd
    pTj = -myfac * 3.0 * costi * invd
    pG = myfac
    pRij = -3.0 * u * inv
    fac = -pRij + (costi * pTi + costj * pTj) * invd
    f = tuple(fac * dr[d] - pTi * ei[d] - pTj * ej[d] for d in range(3))
    exj = _cross(ei, ej)
    exr = _cross(ei, dr)
    ejr = _cross(ej, dr)
    m1 = tuple(-pTi * exr[d] + (rffac * m - pG) * exj[d] for d in range(3))
    m2 = tuple(-pTj * ejr[d] + (pG - rffac * m) * exj[d] for d in range(3))
    return f, m1, m2, u, rf


def _dip_quad(dr, ei, ej, myq15, m, safe_inv, geom=None):
    """Dipole (role i) -- quadrupole (role j); potforce.h:139-184."""
    if geom is None:
        dr2 = _dot(dr, dr)
        inv = safe_inv(dr2, m)
    else:
        # precomputed (dr2, inv) shared across interaction bodies with
        # co-located sites (the multi-site kernel's geometry cache);
        # dr2/inv are even under dr negation, so swapped-role bodies
        # reuse them too
        dr2, inv = geom
    invd = jnp.sqrt(inv)
    myqfac = myq15 * inv * inv
    costi = _dot(ei, dr) * invd
    costj = _dot(ej, dr) * invd
    cosg = _dot(ei, ej)
    cos2tj = costj * costj
    u = myqfac * (-costi * (5.0 * cos2tj - 1.0) + 2.0 * cosg * costj)
    pRij = -4.0 * u * inv
    pTi = myqfac * (-5.0 * cos2tj + 1.0) * invd
    pTj = myqfac * 2.0 * (-5.0 * costi * costj + cosg) * invd
    pG = myqfac * 2.0 * costj
    fac = -pRij + (costi * pTi + costj * pTj) * invd
    f = tuple(fac * dr[d] - pTi * ei[d] - pTj * ej[d] for d in range(3))
    exj = _cross(ei, ej)
    exr = _cross(ei, dr)
    ejr = _cross(ej, dr)
    m1 = tuple(-pTi * exr[d] - pG * exj[d] for d in range(3))
    m2 = tuple(-pTj * ejr[d] + pG * exj[d] for d in range(3))
    return f, m1, m2, u


def _quad_quad(dr, ei, ej, q2075, m, safe_inv, geom=None):
    if geom is None:
        dr2 = _dot(dr, dr)
        inv = safe_inv(dr2, m)
    else:
        # precomputed (dr2, inv) shared across interaction bodies with
        # co-located sites (the multi-site kernel's geometry cache);
        # dr2/inv are even under dr negation, so swapped-role bodies
        # reuse them too
        dr2, inv = geom
    invd = jnp.sqrt(inv)
    qfac = q2075 * inv * inv * invd
    costi = _dot(ei, dr) * invd
    costj = _dot(ej, dr) * invd
    cosg = _dot(ei, ej)
    cos2ti = costi * costi
    cos2tj = costj * costj
    term = cosg - 5.0 * costi * costj
    u = qfac * (
        1.0 - 5.0 * (cos2ti + cos2tj) - 15.0 * cos2ti * cos2tj
        + 2.0 * term * term
    )
    pRij = -5.0 * u * inv
    pTi = -qfac * 10.0 * (costi + 3.0 * costi * cos2tj + 2.0 * costj * term) * invd
    pTj = -qfac * 10.0 * (costj + 3.0 * cos2ti * costj + 2.0 * costi * term) * invd
    pG = qfac * 4.0 * term
    fac = -pRij + (costi * pTi + costj * pTj) * invd
    f = tuple(fac * dr[d] - pTi * ei[d] - pTj * ej[d] for d in range(3))
    exj = _cross(ei, ej)
    exr = _cross(ei, dr)
    ejr = _cross(ej, dr)
    m1 = tuple(-pTi * exr[d] - pG * exj[d] for d in range(3))
    m2 = tuple(-pTj * ejr[d] + pG * exj[d] for d in range(3))
    return f, m1, m2, u
