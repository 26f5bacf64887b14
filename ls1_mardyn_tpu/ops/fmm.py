"""Fast Multipole Method: solid-harmonics uniform octree, TPU-native.

The reference's bhfmm subsystem (/root/reference/src/bhfmm/, ~18.6k
LoC) computes long-range Coulomb interactions with order-p solid-
harmonics expansions over a uniform octree
(FastMultipoleMethod.{h,cpp}, containers/UniformPseudoParticleContainer
.{h,cpp}, expansions/SolidHarmonicsExpansion.{h,cpp}): P2M at the
leaves, M2M up, M2L across interaction lists, L2L down, L2P + near-
field P2P (cellProcessors/VectorizedChargeP2PCellProcessor).  The
reference accelerates M2L with Wigner rotations or FFTs and distributes
the tree over MPI.

This rebuild keeps the same mathematical structure but maps it to the
TPU execution model instead of translating the C++:

  * expansions are dense coefficient VECTORS per cell, stored
    realified ([Re; Im], length 2(p+1)^2), so every translation is a
    real matrix multiply;
  * M2M / M2L / L2L operators are precomputed per level on the host
    (numpy complex128) and applied as batched einsums over all cells
    of a level at once -- the MXU does the work that rotation/FFT
    tricks do on CPUs, and there is no tree traversal control flow on
    device;
  * interaction lists on the uniform grid are the 8 child-parity
    offset sets (<= 189 offsets each), applied with padded static
    slices -- no gather;
  * L2P forces come from jax.grad of the local-expansion potential
    (exactly consistent with the evaluated energy);
  * near field P2P is the 27-neighborhood dense window over the
    cell-major slot table, like every other short-range kernel here.

Conventions (verified to machine precision in tests/test_fmm.py):
  R_n^m(r) = r^n P_n^m(cos t) e^{imp} / (n+m)!          (regular)
  S_n^m(r) = (n-m)! P_n^m(cos t) e^{imp} / r^{n+1}      (irregular)
  X_n^{-m} = (-1)^m conj(X_n^m);  no Condon-Shortley phase.
  1/|r-a|            = sum_{n,m} R_n^m(a) conj(S_n^m(r)),  |r|>|a|
  R_n^m(a+b)         = sum_{j<=n,k} R_j^k(a) R_{n-j}^{m-k}(b)
  S_n^m(t+x)         = sum_{j,k} (-1)^j conj(R_j^k(x)) S_{n+j}^{m+k}(t)

Scope: free-space AND fully periodic boundaries.  periodic=True runs
wrapped M2L interaction lists at every level plus the 3x-block lattice
recursion for the far field (validated on the NaCl Madelung constant
and cross-checked against Ewald; see tests/test_fmm.py).  Ewald / SPME
(ops/ewald.py, ops/pme.py) remain the cost-selected default for
periodic driver scenes; the FMM is a driver-selectable alternative
(<method>fmm</method>) and an independent cross-check.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FMMSolver", "direct_coulomb"]


# ---------------------------------------------------------------------------
# host-side solid harmonics (numpy, complex128)
# ---------------------------------------------------------------------------


def _sh_RS(v: np.ndarray, p: int) -> Tuple[Dict, Dict]:
    """Regular/irregular solid harmonics of a single point, as dicts
    keyed (n, m) for m = -n..n (Cartesian recursions; the S recursion
    mirrors SolidHarmonicsExpansion.cpp's evaluateLOfR/evaluateMOfR
    role)."""
    x, y, z = (float(c) for c in v)
    r2 = x * x + y * y + z * z
    R: Dict = {(0, 0): 1.0 + 0j}
    S: Dict = {(0, 0): 1.0 / np.sqrt(r2) + 0j}
    xy = x + 1j * y
    for n in range(1, p + 1):
        R[(n, n)] = R[(n - 1, n - 1)] * xy / (2 * n)
        S[(n, n)] = (2 * n - 1) * xy / r2 * S[(n - 1, n - 1)]
    for m in range(0, p + 1):
        for n in range(m + 1, p + 1):
            Rm2 = R.get((n - 2, m), 0.0)
            Sm2 = S.get((n - 2, m), 0.0)
            R[(n, m)] = ((2 * n - 1) * z * R[(n - 1, m)] - r2 * Rm2) / (
                (n + m) * (n - m)
            )
            S[(n, m)] = (
                (2 * n - 1) * z * S[(n - 1, m)] - ((n - 1) ** 2 - m * m) * Sm2
            ) / r2
    for n in range(0, p + 1):
        for m in range(1, n + 1):
            R[(n, -m)] = (-1) ** m * np.conj(R[(n, m)])
            S[(n, -m)] = (-1) ** m * np.conj(S[(n, m)])
    return R, S


def _sh_R(v: np.ndarray, p: int) -> Dict:
    """Regular harmonics only (well-defined at v = 0, where the
    irregular recursion divides by r^2 -- the lattice M2M aggregation
    includes the zero-offset center block)."""
    x, y, z = (float(c) for c in v)
    r2 = x * x + y * y + z * z
    R: Dict = {(0, 0): 1.0 + 0j}
    xy = x + 1j * y
    for n in range(1, p + 1):
        R[(n, n)] = R[(n - 1, n - 1)] * xy / (2 * n)
    for m in range(0, p + 1):
        for n in range(m + 1, p + 1):
            Rm2 = R.get((n - 2, m), 0.0)
            R[(n, m)] = ((2 * n - 1) * z * R[(n - 1, m)] - r2 * Rm2) / (
                (n + m) * (n - m)
            )
    for n in range(0, p + 1):
        for m in range(1, n + 1):
            R[(n, -m)] = (-1) ** m * np.conj(R[(n, m)])
    return R


def _idx(n: int, m: int) -> int:
    return n * n + n + m


def _m2m_matrix(t: np.ndarray, p: int) -> np.ndarray:
    """M'_n^m = sum_{j<=n,k} R_{n-j}^{m-k}(-t) M_j^k  (shift multipole
    center by t; SolidHarmonicsExpansion M2M)."""
    nc = (p + 1) ** 2
    R = _sh_R(-np.asarray(t, float), p)
    T = np.zeros((nc, nc), complex)
    for n in range(p + 1):
        for m in range(-n, n + 1):
            for j in range(n + 1):
                for k in range(-j, j + 1):
                    if abs(m - k) <= n - j:
                        T[_idx(n, m), _idx(j, k)] = R[(n - j, m - k)]
    return T


def _m2l_matrix(t: np.ndarray, p: int) -> np.ndarray:
    """L_j^k = (-1)^j sum_{n,m} conj(S_{n+j}^{m+k}(t)) M_n^m  (multipole
    at c, local about c + t; SolidHarmonicsExpansion M2L)."""
    nc = (p + 1) ** 2
    _, S = _sh_RS(np.asarray(t, float), 2 * p)
    T = np.zeros((nc, nc), complex)
    for j in range(p + 1):
        for k in range(-j, j + 1):
            for n in range(p + 1):
                for m in range(-n, n + 1):
                    T[_idx(j, k), _idx(n, m)] = (-1) ** j * np.conj(
                        S[(n + j, m + k)]
                    )
    return T


def _l2l_matrix(u: np.ndarray, p: int) -> np.ndarray:
    """L'_j'^k' = sum_{j>=j'} R_{j-j'}^{k-k'}(u) L_j^k  (shift local
    center by u; SolidHarmonicsExpansion L2L)."""
    nc = (p + 1) ** 2
    R = _sh_R(np.asarray(u, float), p)
    T = np.zeros((nc, nc), complex)
    for jp in range(p + 1):
        for kp in range(-jp, jp + 1):
            for j in range(jp, p + 1):
                for k in range(-j, j + 1):
                    if abs(k - kp) <= j - jp:
                        T[_idx(jp, kp), _idx(j, k)] = R[(j - jp, k - kp)]
    return T


def _realify(A: np.ndarray, dtype) -> np.ndarray:
    """Complex [nc, nc] operator -> real [2nc, 2nc] acting on [Re; Im]
    coefficient vectors (exact; keeps every translation a real matmul
    the MXU can run)."""
    Ar, Ai = A.real, A.imag
    return np.asarray(
        np.block([[Ar, -Ai], [Ai, Ar]]), dtype=np.dtype(dtype)
    )


# ---------------------------------------------------------------------------
# device-side solid harmonics (jnp, traced; fully unrolled in (n, m))
# ---------------------------------------------------------------------------


def _rvec_real(dr, p: int):
    """Realified regular-harmonics vector [2(p+1)^2] of displacement
    dr [3] (jnp; differentiable -- L2P forces are jax.grad of the
    potential through this)."""
    x, y, z = dr[0], dr[1], dr[2]
    r2 = x * x + y * y + z * z
    R = {(0, 0): (jnp.ones_like(x), jnp.zeros_like(x))}
    for n in range(1, p + 1):
        pr, pi = R[(n - 1, n - 1)]
        # * (x + iy) / (2n)
        R[(n, n)] = (
            (pr * x - pi * y) / (2 * n),
            (pr * y + pi * x) / (2 * n),
        )
    for m in range(0, p + 1):
        for n in range(m + 1, p + 1):
            pr, pi = R[(n - 1, m)]
            qr, qi = R.get((n - 2, m), (0.0, 0.0))
            d = (n + m) * (n - m)
            R[(n, m)] = (
                ((2 * n - 1) * z * pr - r2 * qr) / d,
                ((2 * n - 1) * z * pi - r2 * qi) / d,
            )
    re: List = []
    im: List = []
    for n in range(p + 1):
        for m in range(-n, n + 1):
            a = abs(m)
            rr, ri = R[(n, a)]
            if m < 0:
                sgn = (-1) ** a
                rr, ri = sgn * rr, -sgn * ri
            re.append(rr)
            im.append(ri)
    return jnp.stack(re + im)


# ---------------------------------------------------------------------------
# uniform octree geometry
# ---------------------------------------------------------------------------


def _parity_offsets(par: Tuple[int, int, int]) -> List[Tuple[int, int, int]]:
    """M2L interaction-list offsets for a leaf of child parity `par`:
    children of the parent's 27-neighborhood minus the cell's own
    27-neighborhood (UniformPseudoParticleContainer horizontal pass;
    <= 189 offsets)."""
    out = []
    rngs = [range(-2 - pq, 4 - pq) for pq in par]
    for ox in rngs[0]:
        for oy in rngs[1]:
            for oz in rngs[2]:
                if max(abs(ox), abs(oy), abs(oz)) <= 1:
                    continue
                out.append((ox, oy, oz))
    return out


@dataclasses.dataclass
class FMMSolver:
    """Coulomb solver: energy, potential and forces of N point charges
    by the solid-harmonics FMM; free-space or fully periodic.

    box: cubic root-cell edge (particles must lie in [0, box)^3)
    depth: octree depth D (leaf grid 2^D per axis, D >= 2)
    order: expansion order p
    cap: max charges per leaf cell (static shape)
    periodic: periodic boundary conditions (the reference bhfmm's
        _periodicBC mode).  In-box M2L runs periodic-wrapped at levels
        1..D (each interaction-list offset is a distinct physical
        image, so aliased rolls legitimately apply different
        operators to the same data), near-field P2P uses min-image
        deltas, and everything beyond the 27 nearest box images is a
        precomputed lattice recursion: 3x-coarsening blocks
        (M_{k+1} = sum of 27 shifted M2M copies) with a pre-summed
        702-offset (9^3 - 3^3) M2L far operator per scale -- the
        standard periodic-FMM doubling scheme, truncated at
        `lattice_scales` (3^K boxes).  Requires a NEUTRAL system (the
        monopole lattice sum diverges otherwise); cubic-shell
        summation order, which matches tinfoil Ewald when the net box
        dipole vanishes.
    """

    box: float
    depth: int = 3
    order: int = 8
    cap: int = 32
    dtype: jnp.dtype = jnp.float32
    periodic: bool = False
    lattice_scales: int = 10

    def __post_init__(self):
        if self.depth < 2:
            raise ValueError("FMM octree needs depth >= 2")
        p = self.order
        self.nc = (p + 1) ** 2
        self.n_leaf = 2**self.depth
        self.leaf_edge = self.box / self.n_leaf
        f = np.dtype(np.float64 if self.dtype == jnp.float64 else np.float32)
        # M2M: child (parity px,py,pz) center -> parent center, per level
        # (offset scales with the level's child edge; build per level)
        self._m2m: List[np.ndarray] = []  # [level d: [8, 2nc, 2nc]]
        self._l2l: List[np.ndarray] = []
        for d in range(self.depth, 0, -1):
            child_edge = self.box / 2**d
            mats_up = []
            mats_dn = []
            for pz in (0, 1):
                for py in (0, 1):
                    for px in (0, 1):
                        # child center relative to parent center
                        off = (
                            (np.array([px, py, pz]) - 0.5) * child_edge
                        )
                        # M2M shifts the expansion center child->parent
                        # (t = parent - child = -off); L2L shifts the
                        # local center parent->child (u = +off)
                        mats_up.append(_m2m_matrix(-off, p))
                        mats_dn.append(_l2l_matrix(off, p))
            self._m2m.append(
                np.stack([_realify(A, f) for A in mats_up])
            )
            self._l2l.append(
                np.stack([_realify(A, f) for A in mats_dn])
            )
        # M2L offset operators per level (offset in units of that
        # level's cell edge); parity lists index into a shared offset
        # table
        all_offs = sorted(
            {
                o
                for pz in (0, 1)
                for py in (0, 1)
                for px in (0, 1)
                for o in _parity_offsets((px, py, pz))
            }
        )
        self._m2l_offsets = all_offs
        self._par_lists = {}
        for pz in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    self._par_lists[(px, py, pz)] = set(
                        _parity_offsets((px, py, pz))
                    )
        self._m2l: List[np.ndarray] = []  # [level: [n_off, 2nc, 2nc]]
        # periodic boxes also run M2L at level 1 (the root's periodic
        # "neighborhood" is the 26 image boxes, so the level-1 list is
        # non-empty there; in free space it is empty and skipped)
        self._m2l_min_level = 1 if self.periodic else 2
        for d in range(self._m2l_min_level, self.depth + 1):
            edge = self.box / 2**d
            # source cell = target + o, so the translation vector is
            # t = c_target - c_source = -o * edge
            self._m2l.append(
                np.stack(
                    [
                        _realify(_m2l_matrix(-np.array(o) * edge, p), f)
                        for o in all_offs
                    ]
                )
            )
        if self.periodic:
            # lattice recursion operators: at scale k the block edge is
            # 3^k * box; A_k aggregates the 27 sub-blocks (all carry the
            # same multipole by periodicity), T_k sums the 702 far
            # offsets 2 <= |b|_inf <= 4 (the |v|_inf >= 2 image shells
            # tile exactly across scales).
            #
            # SCALED formulation: raw A_k entries grow like
            # (3^k box)^n -- they overflow float32 (inf -> NaN phi) by
            # scale ~8 on production boxes.  Work in per-scale units
            # instead: M~_k = D_k M_k with D_k = diag(s_k^-n),
            # A~_k = D_{k+1} A_k D_k^-1 (entries ~ 3^-n, O(1)) and
            # T~_k = T_k D_k^-1 (entries ~ s_k^-(j+1), which UNDERFLOW
            # harmlessly once scales stop contributing).  The host
            # builds everything in complex128, so the sandwich is
            # exact before the f32 cast.
            self._lat_m2m: List[np.ndarray] = []
            self._lat_m2l: List[np.ndarray] = []
            nc = self.nc
            degs = np.array(
                [n for n in range(p + 1) for _ in range(2 * n + 1)],
                np.float64,
            )
            for k in range(self.lattice_scales):
                s = self.box * 3.0**k
                dk_inv = np.power(s, degs)          # D_k^-1 diagonal
                dk1 = np.power(3.0 * s, -degs)      # D_{k+1} diagonal
                A = np.zeros((nc, nc), complex)
                for o in np.ndindex(3, 3, 3):
                    off = (np.array(o) - 1) * s
                    A += _m2m_matrix(-off, p)
                A = dk1[:, None] * A * dk_inv[None, :]
                self._lat_m2m.append(_realify(A, f))
                T = np.zeros((nc, nc), complex)
                for b in np.ndindex(9, 9, 9):
                    bb = np.array(b) - 4
                    if np.abs(bb).max() <= 1:
                        continue
                    T += _m2l_matrix(-bb * s, p)
                T = T * dk_inv[None, :]
                self._lat_m2l.append(_realify(T, f))
            # D_0 applied on device to the root multipole (realified:
            # the same real diagonal acts on Re and Im halves)
            self._lat_d0 = np.concatenate(
                [np.power(self.box, -degs)] * 2
            ).astype(f)
        self._jit_compute = jax.jit(self._compute)

    # -- device pipeline ----------------------------------------------------

    def _bin(self, r, valid):
        """Leaf binning into a dense [n_cells, cap] slot table (the
        same fixed-capacity cell-major layout as ops/cells.py, local
        to the solver so it stays self-contained)."""
        ncell = self.n_leaf
        ci = jnp.clip(
            jnp.floor(r / self.leaf_edge).astype(jnp.int32), 0, ncell - 1
        )
        cell = (ci[:, 0] * ncell + ci[:, 1]) * ncell + ci[:, 2]
        cell = jnp.where(valid, cell, ncell**3)  # invalid -> overflow bin
        order = jnp.argsort(cell)
        cs = cell[order]
        # slot = rank within equal cell ids
        slot = jnp.arange(cs.shape[0]) - jnp.searchsorted(
            cs, cs, side="left"
        )
        overflow = jnp.any((slot >= self.cap) & (cs < ncell**3))
        dest = jnp.where(
            (slot < self.cap) & (cs < ncell**3),
            cs * self.cap + jnp.minimum(slot, self.cap - 1),
            ncell**3 * self.cap,
        )
        slots = (
            jnp.zeros((ncell**3 * self.cap + 1,), jnp.int32)
            .at[dest]
            .set(order.astype(jnp.int32) + 1)[:-1]
            .reshape(ncell**3, self.cap)
            - 1
        )
        return slots, overflow

    def _compute(self, r, q, valid, gid):
        p = self.order
        nc2 = 2 * self.nc
        nl = self.n_leaf
        dt = self.dtype
        r = r.astype(dt)
        if self.periodic:
            r = r % self.box
        q = jnp.where(valid, q, 0.0).astype(dt)
        slots, overflow = self._bin(r, valid)
        safe = jnp.maximum(slots, 0)
        w = (slots >= 0).astype(dt)  # [cells, cap]
        rc_ = r[safe]  # [cells, cap, 3]
        qc = q[safe] * w

        # leaf centers
        ii = jnp.arange(nl)
        cx, cy, cz = jnp.meshgrid(ii, ii, ii, indexing="ij")
        centers = (
            jnp.stack([cx, cy, cz], -1).reshape(-1, 3).astype(dt) + 0.5
        ) * self.leaf_edge

        # P2M: M_leaf[c] = sum_slots q * R(r - center)
        rvec = jax.vmap(
            jax.vmap(lambda dr: _rvec_real(dr, p), in_axes=0), in_axes=0
        )
        dr = rc_ - centers[:, None, :]
        Mleaf = jnp.einsum("cs,csk->ck", qc, rvec(dr))  # [cells, 2nc]
        Lleaf = self._tree_pass(Mleaf)
        return self._finish_compute(
            r, q, Lleaf, centers, slots, rc_, qc, w, gid, overflow
        )

    def _tree_pass(self, Mleaf):
        """M2M / M2L / L2L (+ periodic lattice recursion): leaf
        multipoles [cells, 2nc] -> leaf locals [cells, 2nc].  Shared by
        the single-chip path and the multi-chip path (where Mleaf is
        the psum of per-device leaf moments -- the reference's 'global
        levels duplicated + allreduce of multipole moments' scheme,
        UniformPseudoParticleContainer.h:95-135, with the allreduce as
        one psum and the duplicated levels as replicated per-device
        compute)."""
        p = self.order
        nc2 = 2 * self.nc
        nl = self.n_leaf
        dt = self.dtype

        # upward pass (M2M): leaves -> level 1
        Ms = [Mleaf.reshape(nl, nl, nl, nc2)]
        for li, d in enumerate(range(self.depth, 0, -1)):
            T = jnp.asarray(self._m2m[li])  # [8, 2nc, 2nc]
            child = Ms[-1]
            npar = 2 ** (d - 1)
            parent = jnp.zeros((npar, npar, npar, nc2), dt)
            k = 0
            for pz in (0, 1):
                for py in (0, 1):
                    for px in (0, 1):
                        sub = child[px::2, py::2, pz::2]
                        parent = parent + jnp.einsum(
                            "xyzk,nk->xyzn", sub, T[k]
                        )
                        k += 1
            Ms.append(parent)
        # Ms[i] is the level (depth - i) multipole grid

        # horizontal pass (M2L) at levels 2..depth (1..depth when
        # periodic).  Free space shifts the zero-padded grid; periodic
        # rolls it -- aliased rolls at small grids are distinct
        # physical images and each applies its own operator.  Offsets
        # are processed in chunks as one batched einsum each, with the
        # per-offset child-parity eligibility folded in as a 0/1
        # weight grid -- a handful of large MXU contractions per level
        # instead of 189 small ones.
        CH = 27
        offs = self._m2l_offsets
        Ls = {}
        for li, d in enumerate(
            range(self._m2l_min_level, self.depth + 1)
        ):
            M = Ms[self.depth - d]  # grid at level d
            n = 2**d
            T = jnp.asarray(self._m2l[li])  # [n_off, 2nc, 2nc]
            if self.periodic:
                def shift(o, M=M, n=n):
                    return jnp.roll(
                        M, (-o[0], -o[1], -o[2]), axis=(0, 1, 2)
                    )
            else:
                Mp = jnp.pad(M, ((3, 3), (3, 3), (3, 3), (0, 0)))

                def shift(o, Mp=Mp, n=n):
                    return jax.lax.dynamic_slice(
                        Mp,
                        (3 + o[0], 3 + o[1], 3 + o[2], 0),
                        (n, n, n, nc2),
                    )

            L = jnp.zeros((n, n, n, nc2), dt)
            for c0 in range(0, len(offs), CH):
                chunk = offs[c0 : c0 + CH]
                src = jnp.stack([shift(o) for o in chunk])
                W = jnp.asarray(
                    np.stack(
                        [self._parity_weight(o, n) for o in chunk]
                    ).astype(M.dtype)
                )
                L = L + jnp.einsum(
                    "oxyzk,onk,oxyz->xyzn", src, T[c0 : c0 + CH], W
                )
            Ls[d] = L

        if self.periodic:
            # lattice far field: everything beyond the 27 box images.
            # M_k = multipole of the 3^k-box block; L_root accumulates
            # the pre-summed 702-offset far operator at every scale.
            # scaled lattice units (see __post_init__): M~_0 = D_0 M
            M_k = Ms[-1].reshape(nc2) * jnp.asarray(self._lat_d0)
            L_root = jnp.zeros((nc2,), dt)
            for k in range(self.lattice_scales):
                L_root = L_root + jnp.asarray(self._lat_m2l[k]) @ M_k
                M_k = jnp.asarray(self._lat_m2m[k]) @ M_k
            # L2L root -> level-1 children (child matrices for level 1
            # sit at self._l2l[depth-1]), added into the level-1 locals
            T0 = jnp.asarray(self._l2l[self.depth - 1])
            child = Ls[1]
            k = 0
            for pz in (0, 1):
                for py in (0, 1):
                    for px in (0, 1):
                        child = child.at[px, py, pz].add(T0[k] @ L_root)
                        k += 1
            Ls[1] = child

        # downward pass (L2L): level d -> d+1, add into Ls.  self._l2l
        # was built from depth down to 1, so child level d+1 matrices
        # sit at index depth - (d+1).
        for d in range(self._m2l_min_level, self.depth):
            T = jnp.asarray(self._l2l[self.depth - (d + 1)])
            parent = Ls[d]
            child = Ls[d + 1]
            k = 0
            for pz in (0, 1):
                for py in (0, 1):
                    for px in (0, 1):
                        add = jnp.einsum("xyzk,nk->xyzn", parent, T[k])
                        child = child.at[px::2, py::2, pz::2].add(add)
                        k += 1
            Ls[d + 1] = child

        return Ls[self.depth].reshape(-1, nc2)

    def _finish_compute(self, r, q, Lleaf, centers, slots, rc_, qc, w,
                        gid, overflow):
        p = self.order
        nl = self.n_leaf
        dt = self.dtype
        safe = jnp.maximum(slots, 0)

        # L2P potential + forces (far field), via grad for exact
        # consistency.  Phi = Re(sum_nm L_nm R_nm) = LRe.RRe - LIm.RIm
        # on the realified vectors.
        def phi_far(pos, Lc, center):
            rv = _rvec_real(pos - center, p)
            nch = self.nc
            return jnp.sum(Lc[:nch] * rv[:nch]) - jnp.sum(
                Lc[nch:] * rv[nch:]
            )

        cell_of = jnp.clip(
            jnp.floor(r / self.leaf_edge).astype(jnp.int32), 0, nl - 1
        )
        cidx = (cell_of[:, 0] * nl + cell_of[:, 1]) * nl + cell_of[:, 2]
        Li = Lleaf[cidx]
        ci_ = centers[cidx]
        phi = jax.vmap(phi_far)(r, Li, ci_)
        g = jax.vmap(jax.grad(phi_far, argnums=0))(r, Li, ci_)
        F_far = -q[:, None] * g

        # near field P2P over the 27-neighborhood (free-space clamp).
        # Pairs sharing a group id are excluded: gid defaults to the
        # particle index (self-pair only); molecule-site mode passes
        # the molecule id so intramolecular pairs never contribute
        # (they sit entirely in P2P range -- asserted at build).
        nbr = self._neighbor_table()  # [cells, 27] cell ids or -1
        nb_slots = jnp.where(
            nbr[:, :, None] >= 0,
            slots[jnp.maximum(nbr, 0)],
            -1,
        ).reshape(nl**3, -1)  # [cells, 27*cap]
        safe_j = jnp.maximum(nb_slots, 0)
        wj = (nb_slots >= 0).astype(dt)
        rj = r[safe_j]  # [cells, 27cap, 3]
        qj = q[safe_j] * wj
        gid_own = jnp.where(slots >= 0, gid[safe], -1)
        gid_nb = jnp.where(nb_slots >= 0, gid[safe_j], -2)

        def cell_near(rc_c, qc_c, w_c, rj_c, qj_c, sl_c, nsl_c):
            d = rc_c[:, None, :] - rj_c[None, :, :]
            if self.periodic:
                d = d - self.box * jnp.round(d / self.box)
            r2 = jnp.sum(d * d, -1)
            same = sl_c[:, None] == nsl_c[None, :]
            ok = (
                (w_c[:, None] > 0)
                & (qj_c[None, :] != 0.0)
                & ~same
                & (r2 > 0)
            )
            inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, r2, 1.0)), 0.0)
            phi_c = qj_c[None, :] * inv  # [cap, 27cap]
            f = (
                (qc_c[:, None] * phi_c / jnp.where(ok, r2, 1.0))[..., None]
                * d
            )
            return jnp.sum(phi_c, 1), jnp.sum(f, 1)

        # chunk the per-cell near field: a plain vmap materializes
        # [cells, cap, 27cap, 3] pair tensors -- at depth 5 / cap ~128
        # that is >100 GB and kills the TPU worker.  lax.map over cell
        # chunks bounds the live pair tensor to ~[chunk, cap, 27cap].
        ncell_t = rc_.shape[0]
        chunk = max(
            1, min(ncell_t, int(2**24 // max(self.cap * self.cap * 27, 1)))
        )
        while ncell_t % chunk:
            chunk -= 1
        phi_n_c, F_n_c = jax.lax.map(
            lambda a: jax.vmap(cell_near)(*a),
            tuple(
                a.reshape((ncell_t // chunk, chunk) + a.shape[1:])
                for a in (rc_, qc, w, rj, qj, gid_own, gid_nb)
            ),
        )
        phi_n_c = phi_n_c.reshape(ncell_t, self.cap)
        F_n_c = F_n_c.reshape(ncell_t, self.cap, 3)
        # scatter back per particle
        phi_near = jnp.zeros_like(phi)
        F_near = jnp.zeros_like(F_far)
        flat_idx = jnp.maximum(slots.reshape(-1), 0)
        wflat = (slots.reshape(-1) >= 0).astype(dt)
        phi_near = phi_near.at[flat_idx].add(
            phi_n_c.reshape(-1) * wflat
        )
        F_near = F_near.at[flat_idx].add(
            F_n_c.reshape(-1, 3) * wflat[:, None]
        )

        phi_tot = phi + phi_near
        F = F_far + F_near
        U = 0.5 * jnp.sum(q * phi_tot)
        return U, F, phi_tot, overflow

    def _parity_weight(self, o, n: int) -> np.ndarray:
        """0/1 grid [n,n,n]: which cells (by child parity) have offset
        o in their interaction list."""
        g = np.zeros((n, n, n), np.float64)
        for (px, py, pz), s in self._par_lists.items():
            if o in s:
                g[px::2, py::2, pz::2] = 1.0
        return g

    def _neighbor_table(self):
        nl = self.n_leaf
        ii = np.arange(nl)
        cx, cy, cz = np.meshgrid(ii, ii, ii, indexing="ij")
        base = np.stack([cx, cy, cz], -1).reshape(-1, 3)
        offs = np.array(
            [
                (ox, oy, oz)
                for ox in (-1, 0, 1)
                for oy in (-1, 0, 1)
                for oz in (-1, 0, 1)
            ]
        )
        nb = base[:, None, :] + offs[None, :, :]
        if self.periodic:
            nb = nb % nl
            ok = np.ones(nb.shape[:-1], bool)
        else:
            ok = ((nb >= 0) & (nb < nl)).all(-1)
        ids = (nb[..., 0] * nl + nb[..., 1]) * nl + nb[..., 2]
        return jnp.asarray(np.where(ok, ids, -1).astype(np.int32))

    def compute_sharded(self, r, q, valid, gid, axis_name, n_dev: int,
                        rank=None):
        """Multi-chip FMM evaluation -- call INSIDE a shard_map over
        `axis_name` with this device's local (padded) site arrays in
        GLOBAL coordinates.

        TPU translation of the reference's MPI-parallel tree in its
        duplicated-global-levels mode (UniformPseudoParticleContainer
        .h:95-135: global levels replicated on every rank, multipole
        moments combined by one allreduce):
          1. one collision-free psum assembles the global leaf VALUE
             table (per-cell slot offsets from an all-gather of local
             cell counts, so sites of one leaf cell coming from
             different devices never overwrite each other);
          2. P2M + M2M/M2L/L2L (+ periodic lattice recursion) run
             replicated per device on the psum'd table -- the levels
             are small (8^D x 2(p+1)^2), exactly why the reference
             duplicates them;
          3. L2P evaluates far-field phi/F for LOCAL sites only;
          4. near-field P2P is sharded by leaf-cell x-slices: each
             device computes its contiguous slice of cells against the
             global table, per-slot phi/F tables ride one psum back,
             and every device gathers its own sites' entries.
        Returns (U_local, F_local [N,3], phi_local [N], overflow);
        U_local sums to the global energy under the caller's psum.
        """
        p = self.order
        nl = self.n_leaf
        ncell = nl**3
        cap = self.cap
        dt = self.dtype
        r = jnp.asarray(r).astype(dt)
        if self.periodic:
            r = r % self.box
        valid = jnp.asarray(valid)
        q = jnp.where(valid, jnp.asarray(q), 0.0).astype(dt)
        gid = jnp.asarray(gid, jnp.int32)
        nloc = r.shape[0]

        # --- global collision-free leaf table (one psum)
        ci = jnp.clip(
            jnp.floor(r / self.leaf_edge).astype(jnp.int32), 0, nl - 1
        )
        cell = (ci[:, 0] * nl + ci[:, 1]) * nl + ci[:, 2]
        cell = jnp.where(valid, cell, ncell)
        order = jnp.argsort(cell)
        cs = cell[order]
        lslot = jnp.arange(nloc) - jnp.searchsorted(cs, cs, side="left")
        counts = (
            jnp.zeros((ncell,), jnp.int32)
            .at[jnp.minimum(cell, ncell - 1)]
            .add((cell < ncell).astype(jnp.int32))
        )
        # rank: this device's flat index matching all_gather's axis
        # flattening (callers on multi-axis meshes pass it explicitly;
        # single-axis callers can omit it)
        ax = jax.lax.axis_index(axis_name) if rank is None else rank
        counts_all = jax.lax.all_gather(counts, axis_name)  # [ndev, ncell]
        counts_all = counts_all.reshape(n_dev, -1)
        below = (jnp.arange(n_dev) < ax).astype(jnp.int32)
        off = jnp.sum(counts_all * below[:, None], axis=0)  # [ncell]
        overflow = jnp.any(jnp.sum(counts_all, axis=0) > cap)
        gslot = lslot + off[jnp.minimum(cs, ncell - 1)]
        okl = (cs < ncell) & (gslot < cap)
        dest = jnp.where(okl, cs * cap + gslot, ncell * cap)
        vals = jnp.concatenate([r[order], q[order][:, None]], axis=1)
        gtab = (
            jnp.zeros((ncell * cap + 1, 4), dt)
            .at[dest]
            .set(jnp.where(okl[:, None], vals, 0.0))[:-1]
        )
        ggid = (
            jnp.zeros((ncell * cap + 1,), jnp.int32)
            .at[dest]
            .set(jnp.where(okl, gid[order], 0))[:-1]
        )
        gtab = jax.lax.psum(gtab, axis_name)
        ggid = jax.lax.psum(ggid, axis_name)
        rg = gtab[:, :3].reshape(ncell, cap, 3)
        qg = gtab[:, 3].reshape(ncell, cap)
        gg = ggid.reshape(ncell, cap)
        wg = (qg != 0.0).astype(dt)

        # --- P2M from the global table + replicated tree pass
        ii = jnp.arange(nl)
        cx, cy, cz = jnp.meshgrid(ii, ii, ii, indexing="ij")
        centers = (
            jnp.stack([cx, cy, cz], -1).reshape(-1, 3).astype(dt) + 0.5
        ) * self.leaf_edge
        rvec = jax.vmap(
            jax.vmap(lambda d_: _rvec_real(d_, p), in_axes=0), in_axes=0
        )
        Mleaf = jnp.einsum(
            "cs,csk->ck", qg, rvec(rg - centers[:, None, :])
        )
        Lleaf = self._tree_pass(Mleaf)

        # --- L2P (far field) for local sites
        def phi_far(pos, Lc, center):
            rv = _rvec_real(pos - center, p)
            nch = self.nc
            return jnp.sum(Lc[:nch] * rv[:nch]) - jnp.sum(
                Lc[nch:] * rv[nch:]
            )

        cidx = (ci[:, 0] * nl + ci[:, 1]) * nl + ci[:, 2]
        Li = Lleaf[cidx]
        ci_ = centers[cidx]
        phi_f = jax.vmap(phi_far)(r, Li, ci_)
        gvec = jax.vmap(jax.grad(phi_far, argnums=0))(r, Li, ci_)
        phi_f = jnp.where(valid, phi_f, 0.0)
        F_far = jnp.where(valid[:, None], -q[:, None] * gvec, 0.0)

        # --- near field: x-slices of the leaf grid per device (cell
        # linearization is x-outer, so slices are contiguous rows)
        nbr = self._neighbor_table()  # [ncell, 27]
        sliced = nl % n_dev == 0
        if sliced:
            csl = (nl // n_dev) * nl * nl
            c0 = ax * csl
        else:
            # replicated fallback (device 0 contributes); only hit when
            # n_dev doesn't divide the leaf count -- caller should pick
            # depth with 2^depth % n_dev == 0 for full scaling
            csl = ncell
            c0 = 0
        z0 = jnp.zeros((), jnp.int32)
        c0 = jnp.asarray(c0, jnp.int32)
        nb_sl = jax.lax.dynamic_slice(nbr, (c0, z0), (csl, 27))
        nbc = jnp.maximum(nb_sl, 0)
        wnb = (nb_sl >= 0)[:, :, None]
        rj = rg[nbc].reshape(csl, 27 * cap, 3)
        qj = jnp.where(wnb, qg[nbc], 0.0).reshape(csl, 27 * cap)
        gj = jnp.where(wnb, gg[nbc], -2).reshape(csl, 27 * cap)
        ri_s = jax.lax.dynamic_slice(rg, (c0, z0, z0), (csl, cap, 3))
        qi_s = jax.lax.dynamic_slice(qg, (c0, z0), (csl, cap))
        gi_s = jax.lax.dynamic_slice(gg, (c0, z0), (csl, cap))
        wi_s = jax.lax.dynamic_slice(wg, (c0, z0), (csl, cap))

        def cell_near_v(rc_c, qc_c, w_c, rj_c, qj_c, gi_c, gj_c):
            d = rc_c[:, None, :] - rj_c[None, :, :]
            if self.periodic:
                d = d - self.box * jnp.round(d / self.box)
            r2 = jnp.sum(d * d, -1)
            same = gi_c[:, None] == gj_c[None, :]
            ok = (
                (w_c[:, None] > 0)
                & (qj_c[None, :] != 0.0)
                & ~same
                & (r2 > 0)
            )
            inv = jnp.where(
                ok, 1.0 / jnp.sqrt(jnp.where(ok, r2, 1.0)), 0.0
            )
            phi_c = qj_c[None, :] * inv
            f = (
                (qc_c[:, None] * phi_c / jnp.where(ok, r2, 1.0))[..., None]
                * d
            )
            return jnp.sum(phi_c, 1), jnp.sum(f, 1)

        # chunked like the single-chip near field: bound the live
        # [chunk, cap, 27cap] pair tensors (a plain vmap at depth >= 5
        # materializes 10s of GB and kills the worker)
        chnk = max(1, min(csl, int(2**24 // max(cap * cap * 27, 1))))
        while csl % chnk:
            chnk -= 1
        phi_nc, F_nc = jax.lax.map(
            lambda a: jax.vmap(cell_near_v)(*a),
            tuple(
                x.reshape((csl // chnk, chnk) + x.shape[1:])
                for x in (ri_s, qi_s, wi_s, rj, qj, gi_s, gj)
            ),
        )
        phi_nc = phi_nc.reshape(csl, cap)
        F_nc = F_nc.reshape(csl, cap, 3)
        if not sliced:
            keep = (ax == 0).astype(dt)
            phi_nc = phi_nc * keep
            F_nc = F_nc * keep
        phiT = jax.lax.dynamic_update_slice(
            jnp.zeros((ncell, cap), dt), phi_nc, (c0, z0)
        )
        FT = jax.lax.dynamic_update_slice(
            jnp.zeros((ncell, cap, 3), dt), F_nc, (c0, z0, z0)
        )
        phiT = jax.lax.psum(phiT, axis_name)
        FT = jax.lax.psum(FT, axis_name)

        # gather my sites' near-field entries back to site order
        site_dest = (
            jnp.zeros((nloc,), jnp.int32)
            .at[order]
            .set(
                jnp.where(
                    okl, jnp.minimum(dest, ncell * cap - 1), 0
                ).astype(jnp.int32)
            )
        )
        phi_n = jnp.where(valid, phiT.reshape(-1)[site_dest], 0.0)
        F_n = jnp.where(
            valid[:, None], FT.reshape(-1, 3)[site_dest], 0.0
        )

        phi_tot = phi_f + phi_n
        F = F_far + F_n
        U_loc = 0.5 * jnp.sum(q * phi_tot)
        return U_loc, F, phi_tot, overflow

    # -- public -------------------------------------------------------------

    def compute(self, r, q, valid=None, gid=None):
        """Energy U = 1/2 sum q_i phi_i, forces [N,3], potentials [N].
        gid: optional group ids -- pairs within a group are excluded
        (molecule-site mode); defaults to per-particle (self only).
        Raises on leaf-capacity overflow."""
        r = jnp.asarray(r)
        q = jnp.asarray(q)
        if valid is None:
            valid = jnp.ones((r.shape[0],), bool)
        if gid is None:
            gid = jnp.arange(r.shape[0], dtype=jnp.int32)
        U, F, phi, overflow = self._jit_compute(r, q, valid, gid)
        if bool(overflow):
            raise RuntimeError(
                "FMM leaf cell capacity exceeded; raise cap or depth"
            )
        return U, F, phi


class FMMElectrostatics:
    """Molecule-level FMM electrostatics for the MD driver: the role
    bhfmm plays when `<electrostatic type="FastMultipoleMethod">` is
    configured (/root/reference/src/Simulation.cpp:292-302; the FMM
    then owns ALL Coulomb work while the cell processor runs LJ only,
    Simulation.cpp:781-797).

    Implements the extra-force protocol `(mol, pp) -> (u, F, M)`: all
    charge sites are flattened into the periodic FMM with the molecule
    index as the exclusion group (intramolecular pairs never
    contribute; they sit entirely within near-field range, asserted at
    build), forces map back per molecule and torques from the
    world-frame site offsets.  Charges only, like the reference's
    VectorizedChargeP2PCellProcessor."""

    def __init__(self, box, table, pp, n_hint: int,
                 dtype=jnp.float32, order: int = 8, depth: int = 0,
                 cap: int = 0):
        from ls1_mardyn_tpu.models.interaction import site_offsets

        b = np.asarray(box, float)
        if not np.allclose(b, b[0], rtol=1e-6):
            raise ValueError("FMM electrostatics needs a cubic box")
        for c in table.components:
            if c.dipoles or c.quadrupoles:
                raise ValueError(
                    "FMM electrostatics handles point charges only "
                    "(the reference bhfmm constraint); use Ewald/SPME "
                    "for dipoles/quadrupoles"
                )
        self._site_offsets = site_offsets
        self.NC = int(np.asarray(pp.charge_q).shape[1])
        if depth == 0:
            # aim for ~16 occupied sites per leaf (leaf count 8^D)
            n_sites = max(n_hint, 1) * self.NC
            depth = min(6, max(2, int(round(np.log(n_sites / 16) /
                                            np.log(8)))))
        self.depth = depth
        # intramolecular exclusion correctness: all sites of one
        # molecule must stay within the 27-cell near field
        cq = np.asarray(pp.charge_pos)
        r_max = float(np.max(np.linalg.norm(cq, axis=-1))) if cq.size else 0.0
        leaf_edge = float(b[0]) / 2**depth
        if leaf_edge < 2.0 * r_max:
            raise ValueError(
                f"FMM leaf edge {leaf_edge:.3g} < 2*max site radius "
                f"{r_max:.3g}: intramolecular exclusion would leak"
            )
        if cap == 0:
            mean_occ = max(n_hint, 1) * self.NC / 8**depth
            cap = int(max(32, 4 * mean_occ))
        self.solver = FMMSolver(
            box=float(b[0]), depth=depth, order=order,
            cap=cap, dtype=dtype, periodic=True,
        )
        self._jit = jax.jit(self._call)

    def _call(self, mol, pp):
        dtype = mol.r.dtype
        n = mol.capacity
        sites = self._site_offsets(pp, mol.q, mol.cid)["charge"]
        q_site = pp.charge_q[mol.cid]  # [N, NC]
        wq = q_site * mol.valid[:, None].astype(dtype)
        rs = (mol.r[:, None, :] + sites).reshape(-1, 3)
        qs = wq.reshape(-1)
        mids = jnp.repeat(
            jnp.arange(n, dtype=jnp.int32), sites.shape[1]
        )
        valid_s = qs != 0.0  # zero-charge padding never occupies slots
        U, F_s, phi, overflow = self.solver._compute(
            rs, qs, valid_s, mids
        )
        f = F_s.reshape(n, -1, 3)
        F = jnp.sum(f, axis=1)
        M = jnp.sum(jnp.cross(sites, f), axis=1)
        return U, F, M, overflow

    def __call__(self, mol, pp):
        # traceable: runs inside the driver's jitted step like the
        # Ewald/PME extra-force hook
        u, F, M, _overflow = self._call(mol, pp)
        return u, F, M

    def sharded(self, mol, pp, axis_name, n_dev: int, rank=None):
        """Extra-force hook for the sharded drivers: call inside the
        shard_map with this device's LOCAL molecules.  The exclusion
        group is the GLOBAL molecule id (mol.mid) -- local indices
        would collide across devices and wrongly exclude boundary
        pairs.  Energy returns as the local contribution (the driver's
        fused psum of uX sums it to the global total, matching the
        reference's allreduce of UpotXpoles)."""
        dtype = mol.r.dtype
        n = mol.capacity
        sites = self._site_offsets(pp, mol.q, mol.cid)["charge"]
        q_site = pp.charge_q[mol.cid]
        wq = q_site * mol.valid[:, None].astype(dtype)
        rs = (mol.r[:, None, :] + sites).reshape(-1, 3)
        qs = wq.reshape(-1)
        mids = jnp.repeat(mol.mid.astype(jnp.int32), sites.shape[1])
        valid_s = qs != 0.0
        U, F_s, _phi, _overflow = self.solver.compute_sharded(
            rs, qs, valid_s, mids, axis_name, n_dev, rank=rank
        )
        f = F_s.reshape(n, -1, 3)
        F = jnp.sum(f, axis=1)
        M = jnp.sum(jnp.cross(sites, f), axis=1)
        return U, F, M

    def validate(self, mol, pp):
        """Host-side overflow check, once at prepare time (cap is
        sized 4x the mean leaf occupancy, so a later overflow implies
        a drastic density change -- which rebuilds solvers through the
        driver's re-spec path anyway)."""
        _u, _F, _M, overflow = self._jit(mol, pp)
        if bool(overflow):
            raise RuntimeError(
                "FMM leaf cap exceeded; raise cap or depth"
            )


def direct_coulomb(r, q):
    """O(N^2) reference: potential, forces, energy (test oracle; the
    role of LegacyCellProcessor for bhfmm scenes)."""
    r = np.asarray(r, np.float64)
    q = np.asarray(q, np.float64)
    d = r[:, None, :] - r[None, :, :]
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, 1.0)
    inv = 1.0 / np.sqrt(r2)
    np.fill_diagonal(inv, 0.0)
    phi = (q[None, :] * inv).sum(1)
    f = (q[:, None] * q[None, :] * inv / np.where(r2 > 0, r2, 1))[
        ..., None
    ] * d
    F = f.sum(1)
    U = 0.5 * float((q * phi).sum())
    return phi, F, U
