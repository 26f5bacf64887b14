"""Multi-chip grand-canonical (muVT) ensemble.

The reference runs GCMC on top of its MPI decomposition: every rank
evaluates insertions/deletions against its local + halo molecules with
rank-synchronized RNGs (/root/reference/src/ensemble/
GrandCanonicalEnsemble.cpp:92-137, ChemicalPotential.cpp
grandcanonicalStep; ParticleContainer::getEnergy supplies the probe
energy).

TPU-native: the probe energy is ONE jitted shard_map -- every device
computes the probe's interaction with its local molecules (min-image
O(N/P) row) and a psum reduces the scalar.  Moves are host-orchestrated
(they happen every `interval` steps, not per step); insertions write
into a free slot of the OWNER device's segment so the next migration
pass sees a consistent slab assignment.
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

    def _next(self):
        self.key, k = jax.random.split(self.key)
        return k

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

    def _owner_of(self, r_new) -> int:
        """Linear device index owning position r_new.  Slab: z interval
        of owner_bounds (non-uniform under load balancing)."""
        return min(
            int(np.searchsorted(self.owner_bounds[1:-1], r_new[2],
                                side="right")),
            self.sim.cfg.n_devices - 1,
        )

    def step(self, mol: MoleculeState, step: int) -> MoleculeState:
        for cp in self.chem_pots:
            if step % cp.interval:
                continue
            for _ in range(cp.deletions_per_interval):
                mol = self._try_deletion(mol, cp)
            for _ in range(cp.insertions_per_interval):
                mol = self._try_insertion(mol, cp)
        return mol

    # -- moves ---------------------------------------------------------
    def _try_deletion(self, mol, cp):
        valid = np.asarray(mol.valid)
        cid = np.asarray(mol.cid)
        cands = np.where(valid & (cid == cp.component))[0]
        if len(cands) == 0:
            return mol
        pick = int(jax.random.randint(self._next(), (), 0, len(cands)))
        idx = int(cands[pick])
        mid = int(np.asarray(mol.mid)[idx])
        e_mol = self.probe_energy(
            mol, np.asarray(mol.r)[idx], np.asarray(mol.q)[idx],
            int(cid[idx]), excl_mid=mid,
        )
        n = int(valid.sum())
        acc = min(1.0, n / self.volume * np.exp((-cp.mu + e_mol) / self.T))
        self.attempted += 1
        if float(jax.random.uniform(self._next(), ())) < acc:
            self.accepted_del += 1
            mol = dataclasses.replace(mol, valid=mol.valid.at[idx].set(False))
        return mol

    def _try_insertion(self, mol, cp):
        cfg = self.sim.cfg
        lo = cp.control_lower if cp.control_lower is not None else np.zeros(3)
        hi = cp.control_upper if cp.control_upper is not None else self.box
        r_new = np.asarray(
            jax.random.uniform(
                self._next(), (3,),
                minval=jnp.asarray(lo), maxval=jnp.asarray(hi),
            )
        )
        qv = np.asarray(jax.random.normal(self._next(), (4,)))
        q_new = qv / np.linalg.norm(qv)
        du = self.probe_energy(mol, r_new, q_new, cp.component)
        valid = np.asarray(mol.valid)
        n = int(valid.sum())
        acc = min(1.0, self.volume / (n + 1) * np.exp((cp.mu - du) / self.T))
        self.attempted += 1
        if float(jax.random.uniform(self._next(), ())) >= acc:
            return mol
        # the OWNER device must store the molecule (migration only
        # handles +-1 hops); owner routing is the only decomposition-
        # specific part of GCMC (see _owner_of)
        owner = self._owner_of(r_new)
        seg = slice(owner * cfg.n_local_cap, (owner + 1) * cfg.n_local_cap)
        free = np.where(~valid[seg])[0]
        if len(free) == 0:
            raise RuntimeError(
                f"device {owner}: no free slots for muVT insertion"
            )
        idx = owner * cfg.n_local_cap + int(free[0])
        self.accepted_ins += 1
        mass = float(np.asarray(self.sim.pp.mass)[cp.component])
        v_new = np.asarray(
            jax.random.normal(self._next(), (3,))
        ) * np.sqrt(self.T / mass)
        mid_new = int(np.asarray(mol.mid).max()) + 1
        dtype = mol.r.dtype
        return dataclasses.replace(
            mol,
            r=mol.r.at[idx].set(jnp.asarray(r_new, dtype)),
            v=mol.v.at[idx].set(jnp.asarray(v_new, dtype)),
            q=mol.q.at[idx].set(jnp.asarray(q_new, dtype)),
            L=mol.L.at[idx].set(jnp.zeros(3, dtype)),
            cid=mol.cid.at[idx].set(cp.component),
            mid=mol.mid.at[idx].set(mid_new),
            valid=mol.valid.at[idx].set(True),
        )


class Mesh3DGrandCanonical(SlabGrandCanonical):
    """GCMC moves over a Mesh3DSimulation's sharded state.

    Identical Metropolis machinery (the probe shard_map generalizes via
    the base class's axis introspection); only the insertion-owner
    routing differs: the owner is the 3-D mesh cell of the trial
    position, linearized in the same x-major order Mesh3DSimulation
    .distribute uses (the reference's decompositions are
    interchangeable under one interface, DomainDecompBase.h:51)."""

    def _owner_of(self, r_new) -> int:
        cfg = self.sim.cfg
        o = self.sim._owner3(np.asarray(r_new, float)[None, :])[0]
        return int((o[0] * cfg.grid[1] + o[1]) * cfg.grid[2] + o[2])
