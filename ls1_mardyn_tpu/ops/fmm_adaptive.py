"""Adaptive FMM: threshold-split octree + dual-tree traversal, TPU-native.

The reference's adaptive FMM variant
(/root/reference/src/bhfmm/containers/AdaptivePseudoParticleContainer.{h,cpp},
DttNode.{h,cpp}) subdivides octree nodes until each holds at most
`threshold` particles and drives the far/near-field split with a dual
tree traversal.  It is selected by `<adaptiveContainer>1` +
`<threshold>` under `<electrostatic type="FastMultipoleMethod">`
(FastMultipoleMethod.cpp:41-43,58-66) and is a sequential beta: the
reference itself warns it "is not debugged yet and certainly delivers
WRONG results" (FastMultipoleMethod.cpp:43) and refuses MPI
(FastMultipoleMethod.cpp:112-116).

This rebuild implements the capability correctly, organized for the
TPU execution model instead of pointer-chasing trees:

  * the octree (threshold splits, empty children pruned, mixed-depth
    leaves) and the dual tree traversal run on the HOST at build time
    and emit flat padded interaction lists -- M2L pairs (node, node,
    weight) and P2P pairs (leaf, leaf, weight);
  * all structure arrays are DYNAMIC arguments of one jitted
    evaluator with bucket-padded shapes, so re-building the tree after
    particles move re-traces nothing (the same trick the short-range
    path uses for re-binning);
  * per-depth M2M/L2L operators are the 8 child-parity matrices of
    the uniform solver (ops/fmm.py), applied to every node of a depth
    as one batched matmul;
  * M2L pairs connect nodes at ARBITRARY depths and displacements, so
    per-pair operators are materialized ON DEVICE from irregular solid
    harmonics of the displacement (one [nc,nc] gather from a length
    (2p+1)^2 S-vector) and applied as chunked batched matmuls -- the
    MXU does per-pair work the reference does scalar-recursively in
    SolidHarmonicsExpansion.cpp;
  * acceptance is the multipole acceptance criterion
    (r_A + r_B) <= theta * |t|, the DttNode far-field test; theta
    defaults to sqrt(3)/2 ~ 0.866, exactly the worst-case separation
    ratio of the uniform container's interaction lists, so accuracy
    matches ops/fmm.py at equal order.

Scope: free-space boundaries, matching the adaptive container's
debugged-claims scope; periodic scenes are served by the uniform
periodic FMM / Ewald / SPME.  Unlike the reference beta, this variant
is validated against the O(N^2) direct sum (tests/test_fmm_adaptive.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.ops.fmm import (
    _idx,
    _l2l_matrix,
    _m2m_matrix,
    _realify,
    _rvec_real,
)

__all__ = ["AdaptiveFMMSolver", "TreePlan"]


def _svec_real(dr, p: int):
    """Realified irregular solid harmonics [2(p+1)^2] of displacement
    dr [3] (device; same S_n^m conventions as fmm._sh_RS, valid for
    |dr| > 0 which the MAC guarantees for every accepted pair)."""
    x, y, z = dr[0], dr[1], dr[2]
    r2 = x * x + y * y + z * z
    rinv = 1.0 / jnp.sqrt(r2)
    S = {(0, 0): (rinv, jnp.zeros_like(x))}
    for n in range(1, p + 1):
        pr, pi = S[(n - 1, n - 1)]
        c = (2 * n - 1) / r2
        # * (2n-1) (x + iy) / r^2
        S[(n, n)] = (c * (pr * x - pi * y), c * (pr * y + pi * x))
    for m in range(0, p + 1):
        for n in range(m + 1, p + 1):
            pr, pi = S[(n - 1, m)]
            qr, qi = S.get((n - 2, m), (0.0, 0.0))
            a = (n - 1) ** 2 - m * m
            S[(n, m)] = (
                ((2 * n - 1) * z * pr - a * qr) / r2,
                ((2 * n - 1) * z * pi - a * qi) / r2,
            )
    re: List = []
    im: List = []
    for n in range(p + 1):
        for m in range(-n, n + 1):
            a = abs(m)
            sr, si = S[(n, a)]
            if m < 0:
                sgn = (-1) ** a
                sr, si = sgn * sr, -sgn * si
            re.append(sr)
            im.append(si)
    return jnp.stack(re), jnp.stack(im)


class TreePlan(NamedTuple):
    """Flat padded tree structure: every field is a dynamic jit arg,
    so rebuilding after motion keeps the compiled evaluator."""

    centers: jnp.ndarray  # [Nn, 3] node centers
    depth: jnp.ndarray  # [Nn] int32 (root = 0)
    parity: jnp.ndarray  # [Nn] int32 child octant 0..7 (root: 0)
    parent: jnp.ndarray  # [Nn] int32 (root: 0)
    node_w: jnp.ndarray  # [Nn] 1.0 for real nodes, 0.0 padding
    leaf_node: jnp.ndarray  # [Nl] node id per leaf row (pad: 0)
    slots: jnp.ndarray  # [Nl, cap] particle ids (pad: -1)
    leaf_of: jnp.ndarray  # [N] leaf ROW id per particle (pad: 0)
    m2l_tgt: jnp.ndarray  # [Pm] target node ids
    m2l_src: jnp.ndarray  # [Pm] source node ids
    m2l_w: jnp.ndarray  # [Pm] pair weight (pad: 0.0)
    p2p_tgt: jnp.ndarray  # [Pp] target leaf ROW ids
    p2p_src: jnp.ndarray  # [Pp] source leaf ROW ids
    p2p_w: jnp.ndarray  # [Pp] pair weight (pad: 0.0)


def _bucket(n: int, granularity: int = 64) -> int:
    """Round a dynamic count up to a shape bucket so that small
    rebuild-to-rebuild fluctuations never retrace."""
    return max(granularity, -(-n // granularity) * granularity)


@dataclasses.dataclass
class AdaptiveFMMSolver:
    """Free-space Coulomb solver on a threshold-split adaptive octree.

    box: cubic root-cell edge; particles must lie in [0, box)^3
    order: expansion order p
    threshold: max particles per leaf before a node splits
        (AdaptivePseudoParticleContainer.h:67 `_threshold`)
    max_depth: hard subdivision floor (leaves may exceed `threshold`
        only here; the slot table capacity grows to fit)
    theta: multipole acceptance criterion (r_A+r_B <= theta*|t|)
    """

    box: float
    order: int = 8
    threshold: int = 32
    max_depth: int = 10
    theta: float = 0.866
    dtype: jnp.dtype = jnp.float32
    m2l_chunk: int = 512
    p2p_chunk: int = 1024

    def __post_init__(self):
        if self.threshold < 1:
            raise ValueError("adaptive FMM threshold must be >= 1")
        p = self.order
        self.nc = (p + 1) ** 2
        f = np.dtype(np.float64 if self.dtype == jnp.float64 else np.float32)
        # per-depth x per-parity M2M / L2L operators (depth d child
        # edge = box / 2^d; identical matrices to the uniform solver's
        # level build, fmm.FMMSolver.__post_init__)
        up: List[np.ndarray] = [np.zeros((8, 2 * self.nc, 2 * self.nc), f)]
        dn: List[np.ndarray] = [np.zeros((8, 2 * self.nc, 2 * self.nc), f)]
        for d in range(1, self.max_depth + 1):
            child_edge = self.box / 2**d
            mu, md = [], []
            for par in range(8):
                bits = np.array([par & 1, (par >> 1) & 1, (par >> 2) & 1])
                off = (bits - 0.5) * child_edge
                mu.append(_realify(_m2m_matrix(-off, p), f))
                md.append(_realify(_l2l_matrix(off, p), f))
            up.append(np.stack(mu))
            dn.append(np.stack(md))
        self._t_up = np.stack(up)  # [max_depth+1, 8, 2nc, 2nc]
        self._t_dn = np.stack(dn)
        # M2L realification index map: A[(j,k),(n,m)] = (-1)^j *
        # conj(S_{n+j}^{m+k}(t)); IDX points into the length
        # (2p+1)^2 S-vector, SGN carries (-1)^j
        idxm = np.zeros((self.nc, self.nc), np.int32)
        sgn = np.zeros((self.nc, self.nc), f)
        for j in range(p + 1):
            for k in range(-j, j + 1):
                for n in range(p + 1):
                    for m in range(-n, n + 1):
                        idxm[_idx(j, k), _idx(n, m)] = _idx(n + j, m + k)
                        sgn[_idx(j, k), _idx(n, m)] = (-1.0) ** j
        self._m2l_idx = idxm
        self._m2l_sgn = sgn
        self._eval = jax.jit(self._compute)

    # -- host: tree build + dual tree traversal -----------------------------

    def build_plan(self, r: np.ndarray, valid=None, gid=None) -> TreePlan:
        """Threshold-split octree + dual tree traversal -> TreePlan.
        Runs on the host (numpy); emits bucket-padded arrays.

        gid: optional [N] intramolecular-exclusion groups.  Same-gid
        pairs must NEVER be counted, but M2L far-field sums include
        every particle of both nodes -- so the MAC is tightened until
        no same-gid pair can straddle an accepted node pair: a pair is
        only accepted when the minimum possible inter-node particle
        distance |t| - (r_A + r_B) exceeds the largest intramolecular
        extent (2 x max site-to-centroid distance per group).  Pairs
        that fail keep subdividing and bottom out in P2P, where the
        gid mask is exact."""
        r = np.asarray(r, np.float64)
        n = r.shape[0]
        if valid is None:
            valid = np.ones((n,), bool)
        valid = np.asarray(valid, bool)
        live = np.nonzero(valid)[0]

        # largest intramolecular extent (upper bound on same-gid pair
        # distance): 2 * max distance from the group centroid
        d_gid = 0.0
        if gid is not None and live.size:
            g = np.asarray(gid)[live]
            order = np.argsort(g, kind="stable")
            gs, rs = g[order], r[live][order]
            starts = np.r_[0, 1 + np.nonzero(np.diff(gs))[0], gs.size]
            cent = np.add.reduceat(rs, starts[:-1], axis=0) / np.diff(
                starts
            )[:, None]
            spread = np.linalg.norm(
                rs - np.repeat(cent, np.diff(starts), axis=0), axis=1
            )
            d_gid = 2.0 * float(spread.max()) if spread.size else 0.0

        centers: List[np.ndarray] = []
        depths: List[int] = []
        parities: List[int] = []
        parents: List[int] = []
        leaf_rows: List[Tuple[int, np.ndarray]] = []  # (node id, particles)

        half = 0.5 * self.box
        stack = [(np.array([half, half, half]), 0, 0, 0, live)]
        while stack:
            c, d, parent, par, idx = stack.pop()
            nid = len(centers)
            centers.append(c)
            depths.append(d)
            parities.append(par)
            parents.append(parent)
            if idx.size <= self.threshold or d >= self.max_depth:
                leaf_rows.append((nid, idx))
                continue
            q = self.box / 2 ** (d + 2)  # child center offset
            code = (
                (r[idx, 0] >= c[0]).astype(np.int32)
                + 2 * (r[idx, 1] >= c[1]).astype(np.int32)
                + 4 * (r[idx, 2] >= c[2]).astype(np.int32)
            )
            for p8 in range(8):
                sub = idx[code == p8]
                if sub.size == 0:
                    continue  # empty children pruned (adaptive)
                bits = np.array([p8 & 1, (p8 >> 1) & 1, (p8 >> 2) & 1])
                cc = c + (2 * bits - 1) * q
                stack.append((cc, d + 1, nid, p8, sub))

        nn = len(centers)
        centers_a = np.stack(centers)
        depth_a = np.asarray(depths, np.int32)
        edge_a = self.box / 2.0**depth_a
        rad_a = (np.sqrt(3.0) / 2.0) * edge_a
        is_leaf = np.zeros((nn,), bool)
        for nid, _ in leaf_rows:
            is_leaf[nid] = True

        # dual tree traversal (DttNode.cpp role): ordered pairs, exact
        # cover of all (p, q) source->target interactions
        m2l: List[Tuple[int, int]] = []
        p2p: List[Tuple[int, int]] = []
        children: List[List[int]] = [[] for _ in range(nn)]
        for nid in range(1, nn):
            children[parents[nid]].append(nid)
        pair_stack: List[Tuple[int, int]] = [(0, 0)]
        while pair_stack:
            a, b = pair_stack.pop()
            if a != b:
                t = centers_a[a] - centers_a[b]
                dist = float(np.sqrt(np.dot(t, t)))
                rr = rad_a[a] + rad_a[b]
                # MAC + gid guard: far field only when no same-gid
                # (intramolecular) pair can straddle this node pair
                if rr <= self.theta * dist and dist - rr > d_gid:
                    m2l.append((a, b))
                    continue
            if is_leaf[a] and is_leaf[b]:
                p2p.append((a, b))
            elif is_leaf[b] or (not is_leaf[a] and edge_a[a] >= edge_a[b]):
                for ch in children[a]:
                    pair_stack.append((ch, b))
            else:
                for ch in children[b]:
                    pair_stack.append((a, ch))

        # leaf slot table; capacity from the actual max (threshold
        # unless max_depth clipped a dense cluster)
        cap = _bucket(
            max(1, max((idx.size for _, idx in leaf_rows), default=1)),
            granularity=8,
        )
        nl = _bucket(len(leaf_rows), 8)
        slots = np.full((nl, cap), -1, np.int64)
        leaf_node = np.zeros((nl,), np.int32)
        leaf_row_of_node = np.zeros((nn,), np.int32)
        leaf_of = np.zeros((n,), np.int32)
        for row, (nid, idx) in enumerate(leaf_rows):
            slots[row, : idx.size] = idx
            leaf_node[row] = nid
            leaf_row_of_node[nid] = row
            leaf_of[idx] = row

        def pad_pairs(pairs, np_, to_rows):
            tg = np.zeros((np_,), np.int32)
            sc = np.zeros((np_,), np.int32)
            w = np.zeros((np_,), np.float32)
            for i, (a, b) in enumerate(pairs):
                if to_rows:
                    a, b = leaf_row_of_node[a], leaf_row_of_node[b]
                tg[i], sc[i], w[i] = a, b, 1.0
            return tg, sc, w

        m2l_t, m2l_s, m2l_w = pad_pairs(
            m2l, _bucket(max(1, len(m2l)), self.m2l_chunk), False
        )
        p2p_t, p2p_s, p2p_w = pad_pairs(
            p2p, _bucket(max(1, len(p2p)), self.p2p_chunk), True
        )
        nn_pad = _bucket(nn, 64)

        def padn(a, fill=0):
            out = np.full((nn_pad,) + a.shape[1:], fill, a.dtype)
            out[:nn] = a
            return out

        f = np.float64 if self.dtype == jnp.float64 else np.float32
        return TreePlan(
            centers=jnp.asarray(padn(centers_a.astype(f))),
            depth=jnp.asarray(padn(depth_a)),
            parity=jnp.asarray(padn(np.asarray(parities, np.int32))),
            parent=jnp.asarray(padn(np.asarray(parents, np.int32))),
            node_w=jnp.asarray(
                padn(np.ones((nn,), f))
            ),
            leaf_node=jnp.asarray(leaf_node),
            slots=jnp.asarray(slots.astype(np.int32)),
            leaf_of=jnp.asarray(leaf_of),
            m2l_tgt=jnp.asarray(m2l_t),
            m2l_src=jnp.asarray(m2l_s),
            m2l_w=jnp.asarray(m2l_w.astype(f)),
            p2p_tgt=jnp.asarray(p2p_t),
            p2p_src=jnp.asarray(p2p_s),
            p2p_w=jnp.asarray(p2p_w.astype(f)),
        )

    # -- device: batched evaluation ------------------------------------------

    def _compute(self, plan: TreePlan, r, q, valid, gid):
        p = self.order
        nc = self.nc
        nc2 = 2 * nc
        dt = self.dtype
        r = r.astype(dt)
        q = jnp.where(valid, q, 0.0).astype(dt)
        nn = plan.centers.shape[0]

        # P2M at the leaves (mixed depths; each row has its own center)
        safe = jnp.maximum(plan.slots, 0)
        w = (plan.slots >= 0).astype(dt)  # [Nl, cap]
        lc = plan.centers[plan.leaf_node]  # [Nl, 3]
        dr = r[safe] - lc[:, None, :]
        rvec = jax.vmap(
            jax.vmap(lambda d: _rvec_real(d, p), in_axes=0), in_axes=0
        )
        Mleaf = jnp.einsum("cs,csk->ck", q[safe] * w, rvec(dr))
        M = jnp.zeros((nn, nc2), dt).at[plan.leaf_node].add(
            Mleaf * plan.node_w[plan.leaf_node][:, None]
        )

        # upward M2M, deepest depth first; 8 parity-masked matmuls per
        # depth (one [Nn,2nc]x[2nc,2nc] MXU contraction each, no per-
        # node operator gather)
        t_up = jnp.asarray(self._t_up)  # [D+1, 8, 2nc, 2nc]
        par_sel = [
            (plan.parity == par).astype(dt)[:, None] for par in range(8)
        ]
        for d in range(self.max_depth, 0, -1):
            mask = ((plan.depth == d) & (plan.node_w > 0)).astype(dt)
            Md = M * mask[:, None]
            contrib = jnp.zeros_like(M)
            for par in range(8):
                contrib = contrib + (Md * par_sel[par]) @ t_up[d, par].T
            M = M.at[plan.parent].add(contrib)

        # horizontal M2L over the traversal pairs: per-pair operators
        # materialized from device S-harmonics of the displacement,
        # chunked batched matmuls
        idxm = jnp.asarray(self._m2l_idx)
        sgn = jnp.asarray(self._m2l_sgn)
        svec = jax.vmap(lambda d: _svec_real(d, 2 * p))
        B = self.m2l_chunk
        nchunk = plan.m2l_tgt.shape[0] // B

        def m2l_body(L, chunk):
            tg, sc, pw = chunk
            t = plan.centers[tg] - plan.centers[sc]  # [B, 3]
            # pad pairs have t = 0; keep the S recursion finite there
            t = t + (pw == 0)[:, None].astype(dt) * self.box
            Sre, Sim = svec(t)  # [B, (2p+1)^2] each
            Ar = sgn[None] * Sre[:, idxm]  # [B, nc, nc]
            Ai = -sgn[None] * Sim[:, idxm]
            Ms = M[sc] * pw[:, None]
            Mr, Mi = Ms[:, :nc], Ms[:, nc:]
            Lr = jnp.einsum("bjn,bn->bj", Ar, Mr) - jnp.einsum(
                "bjn,bn->bj", Ai, Mi
            )
            Li = jnp.einsum("bjn,bn->bj", Ar, Mi) + jnp.einsum(
                "bjn,bn->bj", Ai, Mr
            )
            return L.at[tg].add(jnp.concatenate([Lr, Li], axis=1)), None

        L, _ = jax.lax.scan(
            m2l_body,
            jnp.zeros((nn, nc2), dt),
            (
                plan.m2l_tgt.reshape(nchunk, B),
                plan.m2l_src.reshape(nchunk, B),
                plan.m2l_w.reshape(nchunk, B),
            ),
        )

        # downward L2L, shallow depth first; same masked-matmul shape
        t_dn = jnp.asarray(self._t_dn)
        for d in range(1, self.max_depth + 1):
            mask = ((plan.depth == d) & (plan.node_w > 0)).astype(dt)
            Lp = L[plan.parent] * mask[:, None]
            add = jnp.zeros_like(L)
            for par in range(8):
                add = add + (Lp * par_sel[par]) @ t_dn[d, par].T
            L = L + add

        # L2P: potential + exact-gradient forces at the particles
        def phi_far(pos, Lc, center):
            rv = _rvec_real(pos - center, p)
            return jnp.sum(Lc[:nc] * rv[:nc]) - jnp.sum(Lc[nc:] * rv[nc:])

        lrow = plan.leaf_of
        Li_ = L[plan.leaf_node[lrow]]
        ci_ = plan.centers[plan.leaf_node[lrow]]
        vmask = valid.astype(dt)
        phi = jax.vmap(phi_far)(r, Li_, ci_) * vmask
        g = jax.vmap(jax.grad(phi_far, argnums=0))(r, Li_, ci_)
        F_far = -q[:, None] * g

        # near-field P2P over the traversal's leaf pairs
        Bp = self.p2p_chunk
        npchunk = plan.p2p_tgt.shape[0] // Bp

        def p2p_body(carry, chunk):
            phi_n, F_n = carry
            tg, sc, pw = chunk
            si = plan.slots[tg]  # [Bp, cap]
            sj = plan.slots[sc]
            safe_i = jnp.maximum(si, 0)
            safe_j = jnp.maximum(sj, 0)
            ri = r[safe_i]
            rj = r[safe_j]
            qj = q[safe_j] * (sj >= 0)
            d = ri[:, :, None, :] - rj[:, None, :, :]
            r2 = jnp.sum(d * d, -1)
            ok = (
                (si >= 0)[:, :, None]
                & (sj >= 0)[:, None, :]
                & (gid[safe_i][:, :, None] != gid[safe_j][:, None, :])
                & (r2 > 0)
                & (pw > 0)[:, None, None]
            )
            inv = jnp.where(
                ok, 1.0 / jnp.sqrt(jnp.where(ok, r2, 1.0)), 0.0
            )
            phi_p = qj[:, None, :] * inv  # [Bp, cap, cap]
            f = (
                (q[safe_i][:, :, None] * phi_p / jnp.where(ok, r2, 1.0))[
                    ..., None
                ]
                * d
            )
            wi = (si >= 0).astype(dt).reshape(-1)
            flat = safe_i.reshape(-1)
            phi_n = phi_n.at[flat].add(jnp.sum(phi_p, 2).reshape(-1) * wi)
            F_n = F_n.at[flat].add(
                jnp.sum(f, 2).reshape(-1, 3) * wi[:, None]
            )
            return (phi_n, F_n), None

        (phi_near, F_near), _ = jax.lax.scan(
            p2p_body,
            (jnp.zeros_like(phi), jnp.zeros_like(F_far)),
            (
                plan.p2p_tgt.reshape(npchunk, Bp),
                plan.p2p_src.reshape(npchunk, Bp),
                plan.p2p_w.reshape(npchunk, Bp),
            ),
        )

        phi_tot = (phi + phi_near) * vmask
        F = (F_far + F_near) * vmask[:, None]
        U = 0.5 * jnp.sum(q * phi_tot)
        return U, F, phi_tot

    # -- public ---------------------------------------------------------------

    def compute(self, r, q, valid=None, gid=None, plan: TreePlan = None):
        """Energy U = 1/2 sum q_i phi_i, forces [N,3], potentials [N].
        Builds the tree from the current positions unless a reusable
        `plan` (from build_plan) is passed; identical padded shapes
        re-enter the same compiled evaluator."""
        r = jnp.asarray(r)
        q = jnp.asarray(q)
        if valid is None:
            valid = jnp.ones((r.shape[0],), bool)
        if gid is None:
            gid = jnp.arange(r.shape[0], dtype=jnp.int32)
        if plan is None:
            plan = self.build_plan(
                np.asarray(r), np.asarray(valid), gid=np.asarray(gid)
            )
        return self._eval(plan, r, q, jnp.asarray(valid), jnp.asarray(gid))
