"""Multi-chip grand-canonical (muVT) ensemble.

The reference runs GCMC on top of its MPI decomposition: every rank
evaluates insertions/deletions against its local + halo molecules with
rank-synchronized RNGs (/root/reference/src/ensemble/
GrandCanonicalEnsemble.cpp:92-137, ChemicalPotential.cpp
grandcanonicalStep; ParticleContainer::getEnergy supplies the probe
energy).

TPU-native: the whole muVT cycle of an interval (nd deletions + ni
insertions) is ONE jitted lax.scan over the GLOBAL view of the sharded
state -- XLA's SPMD partitioner turns the O(N) min-image probe row
into per-device partials + a psum, candidate selection is a sharded
cumsum, and insertions dynamic-update the OWNER device's segment so
the next migration pass sees a consistent assignment.  The host reads
back two counters per interval; nothing per-trial crosses the tunnel
(the batching twin of the single-chip GrandCanonicalEnsemble._cycle).
`probe_energy` (a shard_map psum of per-device partials) remains for
diagnostics and tests.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.ensemble.grand_canonical import ChemicalPotential
from ls1_mardyn_tpu.models.interaction import (
    PairParams,
    molecule_pair,
    site_offsets,
)
from ls1_mardyn_tpu.models.oracle import min_image
from ls1_mardyn_tpu.parallel.decomposition import AXIS, SlabSimulation
from ls1_mardyn_tpu.state import MoleculeState


def _probe_energy_local(mol, pp, box, r_probe, q_probe, cid_probe, excl_mid):
    """Per-device partial probe energy (exclusion by molecule id, since
    indices are device-local)."""
    dtype = mol.r.dtype
    drm_raw = min_image(r_probe[None, :] - mol.r, box)
    com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
    ok = mol.valid & (mol.mid != excl_mid)
    mask_lj = ok & (com2 < pp.rc2_lj)
    mask_el = ok & (com2 < pp.rc2)
    fill = jnp.zeros((3,), dtype).at[0].set(3.0 * jnp.sqrt(pp.rc2) + 1.0)
    drm = jnp.where((mask_lj | mask_el)[:, None], drm_raw, fill)
    sites_all = site_offsets(pp, mol.q, mol.cid)
    sites_p = site_offsets(pp, q_probe[None], cid_probe[None])
    out = molecule_pair(
        drm, sites_p, sites_all, cid_probe, mol.cid, pp, mask_lj, mask_el
    )
    return (
        jnp.sum(out["u6lj"]) / 6.0
        + jnp.sum(out["uX"])
        + jnp.sum(out["my_rf"])
    )


class SlabGrandCanonical:
    """GCMC moves over a SlabSimulation's sharded state."""

    def __init__(
        self,
        sim: SlabSimulation,
        chem_pots: List[ChemicalPotential],
        temperature: float,
        seed: int = 1234,
    ):
        self.sim = sim
        self.chem_pots = list(chem_pots)
        self.T = float(temperature)
        self.box = np.asarray(sim.cfg.box, float)
        self.volume = float(np.prod(self.box))
        self.key = jax.random.PRNGKey(seed)
        self.attempted = 0
        self.accepted_ins = 0
        self.accepted_del = 0
        # slab boundaries for insertion-owner routing; the driver
        # updates this under load-balanced (non-uniform) slabs
        cfg = sim.cfg
        self.owner_bounds = np.linspace(
            0.0, cfg.box[2], cfg.n_devices + 1
        )

        self.rebind()

    def rebind(self):
        """(Re)build the sharded probe against the current sim (called
        after a capacity re-spec rebuilds the decomposition).  Works
        over ANY device mesh: the psum runs over all mesh axes and the
        molecule arrays use the sim's own input sharding, so the slab
        and 3-D mesh cases differ only in owner routing (see
        Mesh3DGrandCanonical)."""
        self._cycles = {}  # jitted cycles close over pp/capacities
        pp = self.sim.pp
        axes = tuple(self.sim.mesh.axis_names)

        def probe(mol, r, q, cid, excl_mid):
            e = _probe_energy_local(
                mol, pp, jnp.asarray(self.box, mol.r.dtype), r, q, cid,
                excl_mid,
            )
            for a in axes:
                e = jax.lax.psum(e, a)
            return e

        from jax.sharding import PartitionSpec as P

        in_spec = getattr(self.sim, "_in_spec", P(AXIS))
        self._probe = jax.jit(
            jax.shard_map(
                probe,
                mesh=self.sim.mesh,
                in_specs=(in_spec, P(), P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            )
        )

    def probe_energy(self, mol, r, q, cid, excl_mid=-1):
        return float(
            self._probe(
                mol,
                jnp.asarray(r, mol.r.dtype),
                jnp.asarray(q, mol.r.dtype),
                jnp.asarray(cid, jnp.int32),
                jnp.asarray(excl_mid, jnp.int32),
            )
        )

    def step(self, mol: MoleculeState, step: int) -> MoleculeState:
        for ci, cp in enumerate(self.chem_pots):
            if step % cp.interval:
                continue
            nd = cp.deletions_per_interval
            ni = cp.insertions_per_interval
            self.key, k = jax.random.split(self.key)
            mol, a_del, a_ins = self._cycle_fn(ci)(
                mol, self._owner_dynamic_arg(), k
            )
            self.attempted += nd + ni
            self.accepted_del += int(a_del)
            self.accepted_ins += int(a_ins)
        return mol

    # -- batched on-device cycle ----------------------------------------
    def _owner_dynamic_arg(self):
        """Dynamic owner-routing data (slab: z slab boundaries, updated
        by the load balancer through self.owner_bounds)."""
        return jnp.asarray(np.asarray(self.owner_bounds, float))

    def _owner_idx(self, r_new, owner_arg):
        """Traceable linear device index owning position r_new (slab:
        z interval of the dynamic boundaries)."""
        P = self.sim.cfg.n_devices
        return jnp.clip(
            jnp.searchsorted(
                owner_arg[1:-1], r_new[2].astype(owner_arg.dtype),
                side="right",
            ),
            0, P - 1,
        ).astype(jnp.int32)

    def _cycle_fn(self, ci):
        """Build (and cache) the jitted interval cycle for chem-pot ci:
        lax.scan over nd deletion + ni insertion trials on the global
        sharded state (one dispatch, two scalar readbacks)."""
        cached = getattr(self, "_cycles", None)
        if cached is None:
            cached = self._cycles = {}
        if ci in cached:
            return cached[ci]
        cp = self.chem_pots[ci]
        pp = self.sim.pp
        ncap = self.sim.cfg.n_local_cap
        comp = cp.component
        nd, ni = cp.deletions_per_interval, cp.insertions_per_interval
        T, mu, V = self.T, cp.mu, self.volume
        lo_np = (cp.control_lower if cp.control_lower is not None
                 else np.zeros(3))
        hi_np = (cp.control_upper if cp.control_upper is not None
                 else self.box)
        mass = float(np.asarray(pp.mass)[comp])

        def cycle(mol, owner_arg, key):
            dtype = mol.r.dtype
            boxj = jnp.asarray(self.box, dtype)
            lo = jnp.asarray(lo_np, dtype)
            hi = jnp.asarray(hi_np, dtype)
            n_cap = mol.capacity
            # the scans carry ONLY [N] booleans + tiny per-trial
            # records: carrying the [N,3]/[N,4] state arrays makes
            # XLA compress-remat them in (8,128) tiling (a 42x padding
            # expansion that OOMs at N=10M).  Probes read the
            # closed-over constant arrays + the accepted-insertion
            # deltas, exactly like the single-chip cell-probe design;
            # accepted insertions scatter once after the scan.
            r0, q0 = mol.r, mol.q
            cid0, mid0 = mol.cid, mol.mid

            def probe_const(valid, r_p, q_p, cid_p, excl_mid):
                m = dataclasses.replace(mol, valid=valid)
                return _probe_energy_local(
                    m, pp, boxj, r_p, q_p, cid_p, excl_mid
                )

            def deltas_energy(ins_r, ins_q, ins_ok, r_p, q_p, cid_p):
                # probe vs the insertions accepted so far this interval
                drm_raw = min_image(r_p[None, :] - ins_r, boxj)
                com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
                mask_lj = ins_ok & (com2 < pp.rc2_lj)
                mask_el = ins_ok & (com2 < pp.rc2)
                fill = jnp.zeros((3,), dtype).at[0].set(
                    3.0 * jnp.sqrt(pp.rc2) + 1.0
                )
                drm = jnp.where(
                    (mask_lj | mask_el)[:, None], drm_raw, fill
                )
                cids = jnp.full((ins_r.shape[0],), comp, jnp.int32)
                out = molecule_pair(
                    drm,
                    site_offsets(pp, q_p[None], cid_p[None]),
                    site_offsets(pp, ins_q, cids),
                    cid_p, cids, pp, mask_lj, mask_el,
                )
                return (
                    jnp.sum(out["u6lj"]) / 6.0
                    + jnp.sum(out["uX"])
                    + jnp.sum(out["my_rf"])
                )

            keys = jax.random.split(key, nd + ni)

            # -- deletions (carry: valid [N] bool + counter) ----------
            def del_body(carry, kk):
                valid, a = carry
                k1, k2 = jax.random.split(kk)
                in_cv = jnp.all((r0 >= lo) & (r0 < hi), axis=-1)
                cand = valid & (cid0 == comp) & in_cv
                total = jnp.sum(cand.astype(jnp.int32))
                cnt = jnp.cumsum(cand.astype(jnp.int32))
                pick = jax.random.randint(
                    k1, (), 0, jnp.maximum(total, 1)
                )
                idx = jnp.clip(
                    jnp.searchsorted(cnt, pick, side="right"),
                    0, n_cap - 1,
                ).astype(jnp.int32)
                e_mol = probe_const(
                    valid, r0[idx], q0[idx], cid0[idx], mid0[idx]
                )
                n = jnp.sum(valid).astype(dtype)
                acc = jnp.minimum(
                    1.0, n / V * jnp.exp((-mu + e_mol) / T)
                )
                do = (
                    (jax.random.uniform(k2, (), dtype) < acc)
                    & (total > 0)
                )
                valid = valid.at[idx].set(
                    jnp.where(do, False, valid[idx])
                )
                return (valid, a + do.astype(jnp.int32)), None

            valid1, a_del = mol.valid, jnp.int32(0)
            if nd:
                (valid1, a_del), _ = jax.lax.scan(
                    del_body, (valid1, jnp.int32(0)), keys[:nd]
                )

            # -- insertions (carry: occupancy [N] bool + [ni] records)
            n1 = jnp.sum(valid1).astype(dtype)
            mid_max0 = jnp.max(
                jnp.where(mol.valid, mol.mid, 0)
            ).astype(mol.mid.dtype)

            def ins_body(carry, kk):
                (occ, ins_idx, ins_r, ins_v, ins_q, ins_mid, ins_ok,
                 mid_max, a, j) = carry
                k1, k2, k3, k4 = jax.random.split(kk, 4)
                r_new = jax.random.uniform(k1, (3,), dtype, lo, hi)
                qv = jax.random.normal(k2, (4,), dtype)
                q_new = qv / jnp.linalg.norm(qv)
                compj = jnp.asarray(comp, jnp.int32)
                du = probe_const(
                    valid1, r_new, q_new, compj,
                    jnp.asarray(-1, jnp.int32),
                ) + deltas_energy(
                    ins_r, ins_q, ins_ok, r_new, q_new, compj
                )
                n = n1 + a.astype(dtype)
                acc = jnp.minimum(
                    1.0, V / (n + 1.0) * jnp.exp((mu - du) / T)
                )
                owner = self._owner_idx(r_new, owner_arg)
                seg_free = jax.lax.dynamic_slice(
                    ~occ, (owner * ncap,), (ncap,)
                )
                has_free = jnp.any(seg_free)
                idx = owner * ncap + jnp.argmax(seg_free).astype(
                    jnp.int32
                )
                do = (
                    (jax.random.uniform(k3, (), dtype) < acc)
                    & has_free
                )
                v_new = jax.random.normal(k4, (3,), dtype) * np.sqrt(
                    T / mass
                )
                occ = occ.at[idx].set(jnp.where(do, True, occ[idx]))
                # rejected trials park at n_cap (dropped by the
                # post-scan scatter) so duplicate slot indices from
                # rejected trials cannot race an accepted write
                ins_idx = ins_idx.at[j].set(
                    jnp.where(do, idx, n_cap)
                )
                ins_r = ins_r.at[j].set(r_new)
                ins_v = ins_v.at[j].set(v_new)
                ins_q = ins_q.at[j].set(q_new)
                ins_mid = ins_mid.at[j].set(mid_max + 1)
                ins_ok = ins_ok.at[j].set(do)
                return (
                    occ, ins_idx, ins_r, ins_v, ins_q, ins_mid,
                    ins_ok,
                    jnp.where(do, mid_max + 1, mid_max),
                    a + do.astype(jnp.int32),
                    j + 1,
                ), None

            a_ins = jnp.int32(0)
            mol_out = dataclasses.replace(mol, valid=valid1)
            if ni:
                far = jnp.zeros((ni, 3), dtype).at[:, 0].set(
                    3.0 * jnp.sqrt(pp.rc2) + 1e6
                )
                carry0 = (
                    valid1,
                    jnp.full((ni,), n_cap, jnp.int32),
                    far,
                    jnp.zeros((ni, 3), dtype),
                    jnp.zeros((ni, 4), dtype).at[:, 0].set(1.0),
                    jnp.zeros((ni,), mol.mid.dtype),
                    jnp.zeros((ni,), bool),
                    mid_max0,
                    jnp.int32(0),
                    jnp.int32(0),
                )
                (occ, ins_idx, ins_r, ins_v, ins_q, ins_mid, ins_ok,
                 _, a_ins, _), _ = jax.lax.scan(
                    ins_body, carry0, keys[nd:]
                )
                drop = dict(mode="drop")
                mol_out = dataclasses.replace(
                    mol_out,
                    r=mol_out.r.at[ins_idx].set(ins_r, **drop),
                    v=mol_out.v.at[ins_idx].set(ins_v, **drop),
                    q=mol_out.q.at[ins_idx].set(ins_q, **drop),
                    L=mol_out.L.at[ins_idx].set(
                        jnp.zeros((ni, 3), dtype), **drop
                    ),
                    cid=mol_out.cid.at[ins_idx].set(
                        jnp.full((ni,), comp, jnp.int32), **drop
                    ),
                    mid=mol_out.mid.at[ins_idx].set(ins_mid, **drop),
                    valid=mol_out.valid.at[ins_idx].set(
                        jnp.ones((ni,), bool), **drop
                    ),
                )
            return mol_out, a_del, a_ins

        fn = jax.jit(cycle)
        cached[ci] = fn
        return fn


class Mesh3DGrandCanonical(SlabGrandCanonical):
    """GCMC moves over a Mesh3DSimulation's sharded state.

    Identical Metropolis machinery (the probe shard_map generalizes via
    the base class's axis introspection); only the insertion-owner
    routing differs: the owner is the 3-D mesh cell of the trial
    position, linearized in the same x-major order Mesh3DSimulation
    .distribute uses (the reference's decompositions are
    interchangeable under one interface, DomainDecompBase.h:51)."""

    def _owner_dynamic_arg(self):
        # per-axis device bounds follow the CURRENT load-balanced
        # tensor edges (mesh3d x/y/z balancing); stacked [3, max_P+1]
        # (padded with +inf so searchsorted ignores the tail)
        cfg = self.sim.cfg
        w = max(cfg.grid) + 1
        rows = []
        for h, Pd in zip(
            (self.sim.xb_host, self.sim.yb_host, self.sim.zb_host),
            cfg.grid,
        ):
            row = np.full((w,), np.inf)
            row[: Pd + 1] = np.asarray(h, float)
            rows.append(row)
        return jnp.asarray(np.stack(rows))

    def _owner_idx(self, r_new, owner_arg):
        cfg = self.sim.cfg
        gx, gy, gz = cfg.grid

        def ax_owner(d, Pd):
            return jnp.clip(
                jnp.searchsorted(
                    owner_arg[d, 1:-1],
                    r_new[d].astype(owner_arg.dtype),
                    side="right",
                ),
                0, Pd - 1,
            ).astype(jnp.int32)

        ox, oy, oz = ax_owner(0, gx), ax_owner(1, gy), ax_owner(2, gz)
        return (ox * gy + oy) * gz + oz
