"""Pallas TPU kernel: rigid multi-site molecule cell-pair forces.

The general-molecule performance path (the role of the reference's full
VectorizedCellProcessor, /root/reference/src/particleContainer/adapter/
VectorizedCellProcessor.cpp:797 _calculatePairs with its seven
interaction loop bodies) -- same row structure as the 1CLJ kernel
(ops/pallas_lj.py): lane-major x-major cell rows, 9 wrapped neighbor
rows per program, identity-matmul transposes, 128-aligned tiles.

Additional planes per slot carry the molecule's component id and the
world-frame site OFFSETS (relative to COM, precomputed outside from the
quaternion -- SURVEY.md section 7 'recompute beats cache' applies to
the rotation, which XLA does once per step, not per pair) plus
dipole/quadrupole orientations:

  planes = [x, y, z, valid, cid,
            lj offsets   (3 per LJ site),
            charge offsets (3 per charge),
            dipole offsets + orientations (6 per dipole),
            quad offsets + orientations   (6 per quad)]

Coupling constants are resolved per site pair with one-hot component
matmuls on the MXU (ohi @ T[:,:,sa,sb] @ ohj^T), so multi-component
mixing works in-kernel.  Site-pair loops are unrolled at trace time and
pruned with the static coupling masks.

Outputs per slot: F(3), M(3), Vi(3) and the pair-energy scalars riding
as one-hot lanes in plane 9 (u6lj, upotXpoles, myRF, virial at lanes
0..3 of each tile, halved for double-sided counting).

Physics formulas: component-form transcription of potforce.h, identical
to ops/cellforce_lanes.py (validated against the N^2 oracle on all
Vectorization* scenes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ls1_mardyn_tpu.ops.cellforce_lanes import (
    _charge_dip,
    _charge_quad,
    _cross,
    _dip_dip,
    _dip_quad,
    _dot,
    _quad_quad,
)
from ls1_mardyn_tpu.ops.pallas_lj import _CENTER, _OFFS, HX

NOUT = 10  # fx fy fz mx my mz vix viy viz scalars


def _pair_physics(
    *,
    drm,
    mlj,
    mel,
    same_cut,
    iget,
    iread,
    jget,
    jread,
    pair_geom,
    coupling,
    tables,
    masks,
    L,
    NL,
    NC,
    ND,
    NQ,
    screen_alpha,
    interpret,
):
    """All seven interaction loop bodies over one pair tile.

    Shared by the dense row kernel and the packed-row kernel: given the
    COM separations `drm` ([ti, tj] per component), the cutoff masks,
    and the plane accessors, accumulates forces/torques/virials per
    i-lane pair tile plus the three energy scalars.  The physics is the
    component-form transcription of potforce.h (same as
    ops/cellforce_lanes.py).  Returns the 12-tuple
    (Fx, Fy, Fz, Mx, My, Mz, Vx, Vy, Vz, u6_t, uX_t, rf_t) where the
    first nine are [ti, tj] arrays and the last three scalars.
    """
    import numpy as np

    Fx = Fy = Fz = 0.0
    Mx = My = Mz = 0.0
    Vx = Vy = Vz = 0.0
    u6_t = uX_t = rf_t = 0.0

    def safe_inv(dr2, m):
        return m / jnp.where(m > 0, dr2, 1.0)

    invc = {}

    def inv_of(kij, dr2, lj_mask):
        mk = "lj" if (lj_mask or same_cut) else "el"
        kk = (kij, mk)
        if kk not in invc:
            invc[kk] = safe_inv(dr2, mlj if mk == "lj" else mel)
        return invc[kk]

    # LJ
    for sa in range(NL):
        if not masks["lj"][sa].any():
            continue
        dia = iget("lj", sa)
        for sb in range(NL):
            if not masks["lj"][sa, sb]:
                continue
            kij, (dr, dr2) = pair_geom("lj", sa, "lj", sb)
            inv = inv_of(kij, dr2, True)
            e24 = coupling(tables["eps24"], sa, sb)
            s2 = coupling(tables["sig2"], sa, sb)
            sh6 = coupling(tables["shift6"], sa, sb)
            lj6 = s2 * inv
            lj6 = lj6 * lj6 * lj6
            lj12 = lj6 * lj6
            lj12m6 = lj12 - lj6
            u6_t = u6_t + jnp.sum(e24 * lj12m6 + sh6 * mlj)
            fac = e24 * (lj12 + lj12m6) * inv
            f = tuple(fac * dr[d] for d in range(3))
            Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
            if dia is not None:
                m = _cross(dia, f)
                Mx, My, Mz = Mx + m[0], My + m[1], Mz + m[2]
            Vx = Vx + 0.5 * drm[0] * f[0]
            Vy = Vy + 0.5 * drm[1] * f[1]
            Vz = Vz + 0.5 * drm[2] * f[2]

    def add_block(f, m_extra, u, dia):
        nonlocal Fx, Fy, Fz, Mx, My, Mz, Vx, Vy, Vz, uX_t
        Fx, Fy, Fz = Fx + f[0], Fy + f[1], Fz + f[2]
        if dia is not None:
            m = _cross(dia, f)
            Mx, My, Mz = Mx + m[0], My + m[1], Mz + m[2]
        if m_extra is not None:
            Mx, My, Mz = Mx + m_extra[0], My + m_extra[1], Mz + m_extra[2]
        Vx = Vx + 0.5 * drm[0] * f[0]
        Vy = Vy + 0.5 * drm[1] * f[1]
        Vz = Vz + 0.5 * drm[2] * f[2]
        uX_t = uX_t + jnp.sum(u)

    # charge-charge
    for sa in range(NC):
        if not masks["cc"][sa].any():
            continue
        dia = iget("charge", sa)
        for sb in range(NC):
            if not masks["cc"][sa, sb]:
                continue
            kij, (dr, dr2) = pair_geom("charge", sa, "charge", sb)
            inv = inv_of(kij, dr2, False)
            invd = jnp.sqrt(inv)
            qq = coupling(tables["qq"], sa, sb)
            if screen_alpha:
                # exp(-(alpha r)^2) is shared between the erfc
                # approximation and the screened force term
                e = jnp.exp(-(screen_alpha * screen_alpha) * dr2)
                r = dr2 * invd
                erfc = _erfc(screen_alpha * r, interpret, e=e) * mel
                u = qq * erfc * invd
                tap = 2.0 * screen_alpha / np.sqrt(np.pi)
                fac = (u + qq * tap * e * mel) * inv
            else:
                u = qq * invd
                fac = u * inv
            f = tuple(fac * dr[d] for d in range(3))
            add_block(f, None, u, dia)

    # charge_i x quad_j
    for sa in range(NC):
        if not masks["cq"][sa].any():
            continue
        dia = iget("charge", sa)
        for sb in range(NQ):
            if not masks["cq"][sa, sb]:
                continue
            ej = jread(L["quad_e"] + 3 * sb)
            kij, (dr, dr2) = pair_geom("charge", sa, "quad", sb)
            f, _m2, u = _charge_quad(
                dr, ej, coupling(tables["qQ05"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(f, None, u, dia)

    # charge_i x dip_j
    for sa in range(NC):
        if not masks["cd"][sa].any():
            continue
        dia = iget("charge", sa)
        for sb in range(ND):
            if not masks["cd"][sa, sb]:
                continue
            ej = jread(L["dip_e"] + 3 * sb)
            kij, (dr, dr2) = pair_geom("charge", sa, "dip", sb)
            f, _m2, u = _charge_dip(
                dr, ej, coupling(tables["minus_qmy"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(f, None, u, dia)

    # quad_i x charge_j (dr = charge - quad; i gets -f + m2)
    for sa in range(NQ):
        if not masks["qc"][sa].any():
            continue
        dia = iget("quad", sa)
        ei = iread(L["quad_e"] + 3 * sa)
        for sb in range(NC):
            if not masks["qc"][sa, sb]:
                continue
            kij, (drf, dr2) = pair_geom("quad", sa, "charge", sb)
            dr = tuple(-drf[d] for d in range(3))
            f, m_i, u = _charge_quad(
                dr, ei, coupling(tables["Qq05"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(tuple(-f[d] for d in range(3)), m_i, u, dia)

    # quad_i x quad_j
    for sa in range(NQ):
        if not masks["qq"][sa].any():
            continue
        dia = iget("quad", sa)
        ei = iread(L["quad_e"] + 3 * sa)
        for sb in range(NQ):
            if not masks["qq"][sa, sb]:
                continue
            ej = jread(L["quad_e"] + 3 * sb)
            kij, (dr, dr2) = pair_geom("quad", sa, "quad", sb)
            f, m1, _m2, u = _quad_quad(
                dr, ei, ej, coupling(tables["QQ075"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(f, m1, u, dia)

    # quad_i x dip_j (dr = dip - quad; i gets -f + m_quad)
    for sa in range(NQ):
        if not masks["qd"][sa].any():
            continue
        dia = iget("quad", sa)
        ei = iread(L["quad_e"] + 3 * sa)
        for sb in range(ND):
            if not masks["qd"][sa, sb]:
                continue
            ej = jread(L["dip_e"] + 3 * sb)
            kij, (drf, dr2) = pair_geom("quad", sa, "dip", sb)
            dr = tuple(-drf[d] for d in range(3))
            f, _m_dip, m_quad, u = _dip_quad(
                dr, ej, ei, coupling(tables["Qmy15"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(tuple(-f[d] for d in range(3)), m_quad, u, dia)

    # dip_i x charge_j (dr = charge - dip; i gets -f + m_dip)
    for sa in range(ND):
        if not masks["dc"][sa].any():
            continue
        dia = iget("dip", sa)
        ei = iread(L["dip_e"] + 3 * sa)
        for sb in range(NC):
            if not masks["dc"][sa, sb]:
                continue
            kij, (drf, dr2) = pair_geom("dip", sa, "charge", sb)
            dr = tuple(-drf[d] for d in range(3))
            f, m_i, u = _charge_dip(
                dr, ei, coupling(tables["minus_myq"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(tuple(-f[d] for d in range(3)), m_i, u, dia)

    # dip_i x quad_j
    for sa in range(ND):
        if not masks["dq"][sa].any():
            continue
        dia = iget("dip", sa)
        ei = iread(L["dip_e"] + 3 * sa)
        for sb in range(NQ):
            if not masks["dq"][sa, sb]:
                continue
            ej = jread(L["quad_e"] + 3 * sb)
            kij, (dr, dr2) = pair_geom("dip", sa, "quad", sb)
            f, m1, _m2, u = _dip_quad(
                dr, ei, ej, coupling(tables["myQ15"], sa, sb), mel,
                safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            add_block(f, m1, u, dia)

    # dip_i x dip_j
    for sa in range(ND):
        if not masks["dd"][sa].any():
            continue
        dia = iget("dip", sa)
        ei = iread(L["dip_e"] + 3 * sa)
        for sb in range(ND):
            if not masks["dd"][sa, sb]:
                continue
            ej = jread(L["dip_e"] + 3 * sb)
            kij, (dr, dr2) = pair_geom("dip", sa, "dip", sb)
            f, m1, _m2, u, rf = _dip_dip(
                dr, ei, ej,
                coupling(tables["my2"], sa, sb),
                coupling(tables["rffac"], sa, sb),
                mel, safe_inv, geom=(dr2, inv_of(kij, dr2, False)),
            )
            rf_t = rf_t + jnp.sum(rf)
            add_block(f, m1, u, dia)

    return Fx, Fy, Fz, Mx, My, Mz, Vx, Vy, Vz, u6_t, uX_t, rf_t


def _erfc(x, interpret: bool, e=None):
    """erfc for the screened-Coulomb path.  Mosaic has no erfc
    primitive, so the compiled kernel uses the Abramowitz & Stegun
    7.1.26 rational approximation (|error| < 1.5e-7 -- at f32 epsilon,
    the production precision); interpret mode keeps the exact libm
    erfc for the f64 golden tests.  `e` may pass a precomputed
    exp(-x^2) (the screened force term needs the same factor, so the
    compiled kernel shares one transcendental per charge pair)."""
    if interpret:
        return jax.scipy.special.erfc(x)
    # A&S 7.1.26 (valid for x >= 0; screened distances are positive)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * (jnp.exp(-x * x) if e is None else e)


def plane_layout(NL, NC, ND, NQ):
    """Returns (n_planes, dict of plane index ranges)."""
    idx = {}
    p = 5  # x y z w cid
    idx["lj"] = p
    p += 3 * NL
    idx["charge"] = p
    p += 3 * NC
    idx["dip"] = p
    p += 3 * ND
    idx["dip_e"] = p
    p += 3 * ND
    idx["quad"] = p
    p += 3 * NQ
    idx["quad_e"] = p
    p += 3 * NQ
    # pad plane count to a multiple of 8 (sublane tile)
    P = -(-p // 8) * 8
    return P, idx


def _ms_row_kernel(
    i_ref,
    *refs,
    tables,  # dict of numpy coupling tables (trace-time constants)
    masks,  # dict of numpy site-pair masks
    layout,
    srep,  # (cat, s) -> representative (cat, s) with identical body pos
    szero,  # (cat, s) -> True if the site sits at the COM (zero offset)
    P: int,
    K: int,
    NL: int,
    NC: int,
    ND: int,
    NQ: int,
    nx: int,
    cap: int,
    tx: int,
    ny: int,
    nz: int,
    box: Tuple[float, float, float],
    rc2: float,
    rc2_lj: float,
    screen_alpha: float,
    z_halo: bool,
    y_halo: bool,
    interpret: bool,
    jw: int,
    out_dtype,
):
    row_refs = refs[:9]
    f_ref = refs[9]
    _bx, by, bz = box
    txc = tx * cap
    win = (tx + 2 * HX) * cap
    n_tiles = nx // tx
    # j-window chunking: live pair temporaries are [txc, jwc] instead of
    # [txc, win], which is what lifts the cap<=128 vmem bound
    jwc = jw if jw else win
    n_chunks = win // jwc

    pz = pl.program_id(0)
    py = pl.program_id(1)

    # identity for MXU transposes
    ii = jax.lax.broadcasted_iota(jnp.int32, (txc, txc), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (txc, txc), 1)
    ident = (ii == jj).astype(out_dtype)

    laneP = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ohc = [(laneP == c).astype(out_dtype) for c in range(P)]
    subP = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    ohr = [(subP == c).astype(out_dtype) for c in range(P)]

    ilc = jax.lax.broadcasted_iota(jnp.int32, (txc, jwc), 0)
    jlc = jax.lax.broadcasted_iota(jnp.int32, (txc, jwc), 1)

    lane_out = jax.lax.broadcasted_iota(jnp.int32, (1, txc), 1)
    sub_out = jax.lax.broadcasted_iota(jnp.int32, (NOUT, 1), 0)
    ohr_out = [(sub_out == c).astype(out_dtype) for c in range(NOUT)]
    lane_oh = [(lane_out == c).astype(out_dtype) for c in range(4)]

    cut2 = jnp.asarray(rc2, out_dtype)
    cut2lj = jnp.asarray(rc2_lj, out_dtype)

    # K one-hot comparison constants
    kvals = list(range(K))

    same_cut = rc2 == rc2_lj

    def tile(t, _):
        off = pl.multiple_of(t * txc, txc)
        ti = i_ref[0, 0, :, pl.ds(off, txc)]  # [P, txc]
        G = jax.lax.dot_general(
            ident, ti, (((1,), (1,)), ((), ())), preferred_element_type=out_dtype
        )  # [txc, P]

        def col(c):
            return jnp.sum(G * ohc[c], axis=1, keepdims=True)  # [txc,1]

        xi, yi, zi, wi = col(0), col(1), col(2), col(3)
        if K > 1:
            cidi = col(4)
            ohi_cols = [
                (jnp.abs(cidi - k) < 0.5).astype(out_dtype) for k in kvals
            ]  # each [txc, 1]

        L = layout

        # i-side plane reads are cached per tile (shared by all 9
        # neighbor rows and all j chunks).  Keys are plane bases; sites
        # with identical body positions across all components (e.g.
        # CO2's co-located LJ centers and point charges) alias to one
        # representative read, and sites at the molecular COM (zero
        # body position -> zero world offset for every quaternion)
        # resolve to None so their adds and torque cross products are
        # pruned at trace time.
        icache = {}

        def iread(base):
            if base not in icache:
                icache[base] = (col(base), col(base + 1), col(base + 2))
            return icache[base]

        def ikey(cat, s):
            if szero[(cat, s)]:
                return None
            rcat, rs = srep[(cat, s)]
            return L[rcat] + 3 * rs

        def iget(cat, s):
            b = ikey(cat, s)
            return None if b is None else iread(b)

        # materialize the i-side reads now, OUTSIDE the j-chunk
        # fori_loop, so they are loop constants rather than re-executed
        # per chunk (unused ones are dead-code-eliminated)
        for cat, ns in (("lj", NL), ("charge", NC), ("dip", ND),
                        ("quad", NQ)):
            for s in range(ns):
                iget(cat, s)
        for cat, ns in (("dip_e", ND), ("quad_e", NQ)):
            for s in range(ns):
                iread(L[cat] + 3 * s)

        def chunk(k, is_center, jbase, sy, sz):
            """One [txc, jwc] slab of the pair matrix against neighbor
            row k; returns lane-reduced ([txc,1] x 9) + 3 scalars."""
            H = row_refs[k][0, 0, :, pl.ds(off + jbase, jwc)]  # [P, jwc]

            def row(c):
                return jnp.sum(H * ohr[c], axis=0, keepdims=True)  # [1, jwc]

            xj = row(0)
            yj = row(1) + sy
            zj = row(2) + sz
            wj = row(3)
            if K > 1:
                cidj = row(4)
                ohj_rows = [
                    (jnp.abs(cidj - kk) < 0.5).astype(out_dtype)
                    for kk in kvals
                ]  # each [1, jwc]

            jcache = {}

            def jread(base):
                if base not in jcache:
                    jcache[base] = (row(base), row(base + 1), row(base + 2))
                return jcache[base]

            def jget(cat, s):
                b = ikey(cat, s)
                return None if b is None else jread(b)

            drm = (xi - xj, yi - yj, zi - zj)  # [txc, jwc]
            com2 = _dot(drm, drm)
            ok = (wi * wj > 0.5).astype(out_dtype)
            if is_center:
                # self pair: the j window starts HX*cap left of the i
                # tile, so the self slot is at global window index
                # il + HX*cap
                ok = ok * (jbase + jlc != ilc + HX * cap).astype(out_dtype)
            mlj = jnp.where(com2 < cut2lj, ok, 0.0)
            mel = mlj if same_cut else jnp.where(com2 < cut2, ok, 0.0)

            if K == 1:
                def coupling(tbl, sa, sb):
                    # single component: the pair coefficient is one
                    # trace-time Python scalar (validity rides the
                    # cutoff masks) -- no one-hot products at all
                    return float(tbl[0, 0, sa, sb])
            else:
                oh2 = {}

                def coupling(tbl, sa, sb):
                    # sum of python-scalar coefficients times component
                    # one-hot outer products (array constants cannot be
                    # captured by a Pallas kernel); zero terms pruned
                    # and the [txc,jwc] outer products memoized per
                    # component pair
                    acc = None
                    for a in range(K):
                        for b in range(K):
                            c = float(tbl[a, b, sa, sb])
                            if c == 0.0:
                                continue
                            if (a, b) not in oh2:
                                oh2[(a, b)] = ohi_cols[a] * ohj_rows[b]
                            term = c * oh2[(a, b)]
                            acc = term if acc is None else acc + term
                    if acc is None:
                        return 0.0
                    return acc

            # geometry cache: site-pair separation (dr, dr2) keyed by
            # the representative plane bases (None = COM).  Bodies over
            # co-located site sets (LJ + charges at the same atoms, the
            # CO2/ion pattern) compute each distance exactly once.
            geom = {}

            def pair_geom(cat_i, si, cat_j, sj):
                kij = (ikey(cat_i, si), ikey(cat_j, sj))
                if kij not in geom:
                    dia, djb = iget(cat_i, si), jget(cat_j, sj)
                    if dia is None and djb is None:
                        geom[kij] = (drm, com2)
                    else:
                        dr = drm
                        if dia is not None:
                            dr = tuple(dr[d] + dia[d] for d in range(3))
                        if djb is not None:
                            dr = tuple(dr[d] - djb[d] for d in range(3))
                        geom[kij] = (dr, _dot(dr, dr))
                return kij, geom[kij]

            (Fx, Fy, Fz, Mx, My, Mz, Vx, Vy, Vz,
             u6_t, uX_t, rf_t) = _pair_physics(
                drm=drm, mlj=mlj, mel=mel, same_cut=same_cut,
                iget=iget, iread=iread, jget=jget, jread=jread,
                pair_geom=pair_geom, coupling=coupling,
                tables=tables, masks=masks, L=L,
                NL=NL, NC=NC, ND=ND, NQ=NQ,
                screen_alpha=screen_alpha, interpret=interpret,
            )

            # lane-reduce this chunk's contributions
            zero2 = jnp.zeros((txc, jwc), out_dtype)

            def red(a):
                return jnp.sum(a + zero2, axis=1, keepdims=True)  # [txc,1]

            return (
                red(Fx), red(Fy), red(Fz), red(Mx), red(My), red(Mz),
                red(Vx), red(Vy), red(Vz),
                u6_t + jnp.zeros((), out_dtype),
                uX_t + jnp.zeros((), out_dtype),
                rf_t + jnp.zeros((), out_dtype),
            )

        zcol = jnp.zeros((txc, 1), out_dtype)
        zs = jnp.zeros((), out_dtype)
        acc = (zcol,) * 9 + (zs,) * 3
        for k, (dz, dy) in enumerate(_OFFS):
            zidx = pz + dz
            yidx = py + dy
            if y_halo:
                sy = jnp.zeros((), out_dtype)
            else:
                sy = jnp.where(
                    yidx < 0, -by, jnp.where(yidx >= ny, by, 0.0)
                ).astype(out_dtype)
            if z_halo:
                # explicit halo rows from the slab exchange carry any
                # global-z periodic shift already
                sz = jnp.zeros((), out_dtype)
            else:
                sz = jnp.where(
                    zidx < 0, -bz, jnp.where(zidx >= nz, bz, 0.0)
                ).astype(out_dtype)
            if n_chunks == 1:
                vals = chunk(k, k == _CENTER, 0, sy, sz)
                acc = tuple(a + v for a, v in zip(acc, vals))
            else:
                def body(c, carry, _k=k, _sy=sy, _sz=sz):
                    jb = pl.multiple_of(c * jwc, jwc)
                    vals = chunk(_k, _k == _CENTER, jb, _sy, _sz)
                    return tuple(a + v for a, v in zip(carry, vals))

                acc = jax.lax.fori_loop(0, n_chunks, body, acc)

        cols = acc[:9]
        u6_t, uX_t, rf_t = acc[9], acc[10], acc[11]

        def to_lane(v):
            return jax.lax.dot_general(
                v, ident, (((0,), (0,)), ((), ())),
                preferred_element_type=out_dtype,
            )

        scal = (
            0.5 * u6_t * lane_oh[0]
            + 0.5 * uX_t * lane_oh[1]
            + 0.5 * rf_t * lane_oh[2]
        )
        out = scal * ohr_out[9]
        for c, v in enumerate(cols):
            out = out + ohr_out[c] * to_lane(v)
        f_ref[0, 0, :, pl.ds(off, txc)] = out
        return _

    jax.lax.fori_loop(0, n_tiles, tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nx", "ny", "nz", "cap", "tx", "box", "rc2", "rc2_lj",
        "screen_alpha", "interpret", "z_halo", "y_halo", "meta", "jw",
    ),
)
def multisite_cell_forces_pallas(
    r_i: jnp.ndarray,  # [nz, ny, P, nx*cap]
    r_j: jnp.ndarray,  # [nz, ny, P, (nx+2HX)*cap]
    *,
    nx: int,
    ny: int,
    nz: int,
    cap: int,
    tx: int,
    box,
    rc2: float,
    rc2_lj: float,
    screen_alpha: float,
    meta,  # _MSMeta (hashable): K/NL/NC/ND/NQ + tables + masks
    interpret: bool = False,
    z_halo: bool = False,
    y_halo: bool = False,
    jw: int = 0,
):
    """jw > 0 chunks the j window into jw-lane slabs (an in-kernel
    fori_loop), bounding live pair temporaries at [tx*cap, jw] -- this
    is what admits cap > 128 without blowing the scoped-vmem budget.
    jw must divide (tx+2*HX)*cap and (compiled) be a multiple of 128.
    jw == 0 keeps the single full-window pass."""
    P = r_i.shape[2]
    Wj = (nx + 2 * HX) * cap
    assert r_i.shape == (nz, ny, P, nx * cap), r_i.shape
    assert r_j.shape == (
        (nz + 2 if z_halo else nz), (ny + 2 if y_halo else ny), P, Wj
    ), r_j.shape
    if jw:
        win = (tx + 2 * HX) * cap
        assert win % jw == 0, (win, jw)
        assert interpret or jw % 128 == 0, jw
    out_dtype = r_i.dtype

    i_spec = pl.BlockSpec(
        (1, 1, P, nx * cap), lambda z, y: (z, y, 0, 0), memory_space=pltpu.VMEM
    )
    zmap = (lambda z, dz: z + dz + 1) if z_halo else (lambda z, dz: (z + dz) % nz)
    ymap = (lambda y, dy: y + dy + 1) if y_halo else (lambda y, dy: (y + dy) % ny)
    jmap = lambda z, y, dz, dy: (zmap(z, dz), ymap(y, dy), 0, 0)
    j_specs = [
        pl.BlockSpec(
            (1, 1, P, Wj),
            functools.partial(jmap, dz=dz, dy=dy),
            memory_space=pltpu.VMEM,
        )
        for dz, dy in _OFFS
    ]
    out_spec = pl.BlockSpec(
        (1, 1, NOUT, nx * cap), lambda z, y: (z, y, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _ms_row_kernel,
        tables=meta.tables,
        masks=meta.masks,
        layout=meta.layout,
        srep=meta.site_rep,
        szero=meta.site_zero,
        P=P,
        K=meta.K,
        NL=meta.NL,
        NC=meta.NC,
        ND=meta.ND,
        NQ=meta.NQ,
        nx=nx,
        cap=cap,
        tx=tx,
        ny=ny,
        nz=nz,
        box=box,
        rc2=rc2,
        rc2_lj=rc2_lj,
        screen_alpha=screen_alpha,
        z_halo=z_halo,
        y_halo=y_halo,
        interpret=interpret,
        jw=jw,
        out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nz, ny),
        in_specs=[i_spec] + j_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nz, ny, NOUT, nx * cap), out_dtype),
        # the unrolled site-pair loops need a larger scoped-vmem stack
        # than the 16MB default
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(r_i, *([r_j] * 9))
    scal = out[:, :, 9, :].reshape(nz, ny, nx // tx, tx * cap)
    u6 = jnp.sum(scal[..., 0])
    uX = jnp.sum(scal[..., 1])
    my_rf = jnp.sum(scal[..., 2])
    return out, u6, uX, my_rf


class _MSMeta:
    """Hashable bundle of static kernel metadata (numpy tables become
    trace-time constants inside the kernel)."""

    def __init__(self, table):
        self.K = table.K
        self.NL, self.NC, self.ND, self.NQ = (
            table.NL, table.NC, table.ND, table.NQ,
        )
        P, layout = plane_layout(self.NL, self.NC, self.ND, self.NQ)
        self.P = P
        self.layout = layout
        import numpy as np

        minus_myq = np.transpose(table.minus_qmy, (1, 0, 3, 2)).copy()
        Qq05 = np.transpose(table.qQ05, (1, 0, 3, 2)).copy()
        self.tables = dict(
            eps24=table.eps24, sig2=table.sig2, shift6=table.shift6,
            qq=table.qq, qQ05=table.qQ05, Qq05=Qq05,
            minus_qmy=table.minus_qmy, minus_myq=minus_myq,
            QQ075=table.QQ075, Qmy15=table.Qmy15, myQ15=table.myQ15,
            my2=table.my2, rffac=table.rffac,
        )
        self.masks = dict(
            lj=table.eps24.any(axis=(0, 1)),
            cc=table.qq.any(axis=(0, 1)),
            cq=table.qQ05.any(axis=(0, 1)),
            cd=table.minus_qmy.any(axis=(0, 1)),
            qc=Qq05.any(axis=(0, 1)),
            qq=table.QQ075.any(axis=(0, 1)),
            qd=table.Qmy15.any(axis=(0, 1)),
            dc=minus_myq.any(axis=(0, 1)),
            dq=table.myQ15.any(axis=(0, 1)),
            dd=table.my2.any(axis=(0, 1)),
        )
        self._geom = dict(
            lj_pos=table.lj_pos, charge_pos=table.charge_pos,
            dip_pos=table.dip_pos, dip_e=table.dip_e,
            quad_pos=table.quad_pos, quad_e=table.quad_e,
        )
        # site geometry dedup for the kernel: two sites (possibly of
        # different categories) whose body-frame positions are
        # identical across ALL components produce identical world
        # offset planes, so the kernel computes their pair separations
        # once (CO2's LJ centers and charges are co-located; water's O
        # charge sits on the LJ center).  Sites at the origin have
        # identically-zero world offsets for every orientation.
        cats = [("lj", np.asarray(table.lj_pos), self.NL),
                ("charge", np.asarray(table.charge_pos), self.NC),
                ("dip", np.asarray(table.dip_pos), self.ND),
                ("quad", np.asarray(table.quad_pos), self.NQ)]
        reps = {}
        seen = []
        zero = {}
        for cat, pos, ns in cats:
            for s in range(ns):
                p = pos[:, s, :]
                zero[(cat, s)] = not p.any()
                for key, q in seen:
                    if np.array_equal(q, p):
                        reps[(cat, s)] = key
                        break
                else:
                    reps[(cat, s)] = (cat, s)
                    seen.append(((cat, s), p))
        self.site_rep = reps
        self.site_zero = zero
        self._key = (
            self.K, self.NL, self.NC, self.ND, self.NQ,
            table.eps24.tobytes(), table.sig2.tobytes(),
            table.shift6.tobytes(), table.qq.tobytes(),
            table.qQ05.tobytes(), table.minus_qmy.tobytes(),
            table.QQ075.tobytes(), table.Qmy15.tobytes(),
            table.myQ15.tobytes(), table.my2.tobytes(),
            table.rffac.tobytes(),
            # geometry now shapes the kernel trace (alias/zero pruning)
            np.asarray(table.lj_pos).tobytes(),
            np.asarray(table.charge_pos).tobytes(),
            np.asarray(table.dip_pos).tobytes(),
            np.asarray(table.quad_pos).tobytes(),
        )

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _MSMeta) and self._key == other._key
