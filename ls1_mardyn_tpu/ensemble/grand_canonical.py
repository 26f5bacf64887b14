"""Grand-canonical (muVT) ensemble: Metropolis insertions/deletions.

The capability of the reference's GrandCanonicalEnsemble +
ChemicalPotential (/root/reference/src/ensemble/
GrandCanonicalEnsemble.cpp:92-137 afterForces hook,
ChemicalPotential.{h,cpp}: getDeletion/getInsertion + grandcanonicalStep
+ decideDeletion/decideInsertion): every `interval` steps, attempt
particle deletions and insertions in a control volume with Metropolis
acceptance at chemical potential mu.

Acceptance (standard GCMC, reduced units, Lambda == 1):
  insert:  acc = min(1, V/(N+1) * exp((mu - dU)/T))
  delete:  acc = min(1, N/V * exp((-mu + E_mol)/T))
with dU the insertion energy and E_mol the deleted molecule's
interaction energy.  NOTE: the reference's decideDeletion
(ChemicalPotential.cpp:294) uses exp(+mu/T + E/T); we use the
detailed-balance-consistent sign and document the divergence.

TPU shape discipline: the molecule array has fixed capacity with a
validity mask, so insertion = activating a free slot, deletion =
clearing the mask -- no reallocation, exactly the reserve-slot design
SURVEY.md section 7 calls for.  The single-molecule energy probe is a
jitted minimum-image O(N) row (the LinkedCells::getEnergy analogue);
swap in a cell-based probe for N >> 1e5.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import (
    PairParams,
    molecule_pair,
    site_offsets,
)
from ls1_mardyn_tpu.models.oracle import min_image
from ls1_mardyn_tpu.state import MoleculeState


@functools.partial(jax.jit, static_argnames=())
def single_molecule_energy(
    mol: MoleculeState,
    pp: PairParams,
    box: jnp.ndarray,
    r_probe: jnp.ndarray,  # [3]
    q_probe: jnp.ndarray,  # [4]
    cid_probe: jnp.ndarray,  # int32
    exclude_idx: jnp.ndarray,  # int32; -1 = none (pure test particle)
):
    """Interaction energy of one (possibly virtual) molecule with the
    whole system (FluidPot sum, potforce.h:506-651; used by
    ChemicalPotential via ParticleContainer::getEnergy)."""
    n = mol.capacity
    dtype = mol.r.dtype
    drm_raw = min_image(r_probe[None, :] - mol.r, box)
    com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
    ok = mol.valid & (jnp.arange(n) != exclude_idx)
    mask_lj = ok & (com2 < pp.rc2_lj)
    mask_el = ok & (com2 < pp.rc2)
    fill = jnp.zeros((3,), dtype).at[0].set(3.0 * jnp.sqrt(pp.rc2) + 1.0)
    drm = jnp.where((mask_lj | mask_el)[:, None], drm_raw, fill)
    sites_all = site_offsets(pp, mol.q, mol.cid)
    sites_p = site_offsets(pp, q_probe[None], cid_probe[None])
    out = molecule_pair(
        drm,
        {k: a for k, a in sites_p.items()},
        sites_all,
        cid_probe,
        mol.cid,
        pp,
        mask_lj,
        mask_el,
    )
    # single-sided sum counts each probe-j pair once
    return (
        jnp.sum(out["u6lj"]) / 6.0
        + jnp.sum(out["uX"])
        + jnp.sum(out["my_rf"])
    )


@dataclasses.dataclass
class ChemicalPotential:
    """Per-component muVT control (ChemicalPotential.h)."""

    mu: float
    component: int = 0
    interval: int = 100
    insertions_per_interval: int = 1
    deletions_per_interval: int = 1
    control_lower: Optional[np.ndarray] = None  # default: whole box
    control_upper: Optional[np.ndarray] = None


class GrandCanonicalEnsemble:
    """Host-orchestrated GCMC moves on top of the jitted MD engine.

    Moves run in the afterForces slot of the step loop
    (GrandCanonicalEnsemble.cpp:92-137).  The RNG is a single
    jax.random key chain, so runs are reproducible (the reference
    demands rank-synchronized RNGs,
    GrandCanonicalEnsemble.cpp:115-118 assertSynchronization).
    """

    def __init__(self, chem_pots, temperature: float, box, seed: int = 1234):
        self.chem_pots = list(chem_pots)
        self.T = float(temperature)
        self.box = np.asarray(box, float)
        self.volume = float(np.prod(self.box))
        self.key = jax.random.PRNGKey(seed)
        self.attempted = 0
        self.accepted_ins = 0
        self.accepted_del = 0

    def _next(self):
        self.key, k = jax.random.split(self.key)
        return k

    def step(self, mol: MoleculeState, pp: PairParams, step: int) -> MoleculeState:
        for cp in self.chem_pots:
            if step % cp.interval:
                continue
            for _ in range(cp.deletions_per_interval):
                mol = self._try_deletion(mol, pp, cp)
            for _ in range(cp.insertions_per_interval):
                mol = self._try_insertion(mol, pp, cp)
        return mol

    # -- moves -------------------------------------------------------------
    def _try_deletion(self, mol, pp, cp):
        valid = np.asarray(mol.valid)
        cid = np.asarray(mol.cid)
        cands = np.where(valid & (cid == cp.component))[0]
        if len(cands) == 0:
            return mol
        k = self._next()
        pick = int(jax.random.randint(k, (), 0, len(cands)))
        idx = int(cands[pick])
        e_mol = float(
            single_molecule_energy(
                mol, pp, jnp.asarray(self.box, mol.r.dtype),
                mol.r[idx], mol.q[idx], mol.cid[idx],
                jnp.asarray(idx, jnp.int32),
            )
        )
        n = int(valid.sum())
        acc = min(1.0, n / self.volume * np.exp((-cp.mu + e_mol) / self.T))
        self.attempted += 1
        if float(jax.random.uniform(self._next(), ())) < acc:
            self.accepted_del += 1
            mol = dataclasses.replace(mol, valid=mol.valid.at[idx].set(False))
        return mol

    def _try_insertion(self, mol, pp, cp):
        valid = np.asarray(mol.valid)
        free = np.where(~valid)[0]
        if len(free) == 0:
            raise RuntimeError(
                "no free molecule slots for muVT insertion; raise capacity"
            )
        idx = int(free[0])
        lo = cp.control_lower if cp.control_lower is not None else np.zeros(3)
        hi = cp.control_upper if cp.control_upper is not None else self.box
        k = self._next()
        r_new = jax.random.uniform(
            k, (3,), minval=jnp.asarray(lo, mol.r.dtype),
            maxval=jnp.asarray(hi, mol.r.dtype),
        )
        # random orientation quaternion (uniform on S3)
        qv = jax.random.normal(self._next(), (4,), dtype=mol.r.dtype)
        q_new = qv / jnp.linalg.norm(qv)
        du = float(
            single_molecule_energy(
                mol, pp, jnp.asarray(self.box, mol.r.dtype),
                r_new, q_new, jnp.asarray(cp.component, jnp.int32),
                jnp.asarray(-1, jnp.int32),
            )
        )
        n = int(valid.sum())
        acc = min(1.0, self.volume / (n + 1) * np.exp((cp.mu - du) / self.T))
        self.attempted += 1
        if float(jax.random.uniform(self._next(), ())) < acc:
            self.accepted_ins += 1
            # Maxwell velocity at T
            mass = float(np.asarray(pp.mass)[cp.component])
            v_new = (
                jax.random.normal(self._next(), (3,), dtype=mol.r.dtype)
                * np.sqrt(self.T / mass)
            )
            mid_new = int(np.asarray(mol.mid).max()) + 1
            mol = dataclasses.replace(
                mol,
                r=mol.r.at[idx].set(r_new),
                v=mol.v.at[idx].set(v_new),
                q=mol.q.at[idx].set(q_new),
                L=mol.L.at[idx].set(jnp.zeros(3, mol.r.dtype)),
                cid=mol.cid.at[idx].set(cp.component),
                mid=mol.mid.at[idx].set(mid_new),
                valid=mol.valid.at[idx].set(True),
            )
        return mol
