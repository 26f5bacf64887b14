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
SURVEY.md section 7 calls for.  Probes: small scenes use a jitted
minimum-image O(N) row; above CELL_PROBE_MIN_N the cycle bins once
into a cell table and each trial reads only the 27-cell neighborhood
(cell_probe_energy -- the LinkedCells::getEnergy analogue; trial cost
independent of N).
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


_OFFS27 = np.array(
    [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
     for dx in (-1, 0, 1)],
    np.int32,
)


def cell_probe_energy(
    mol: MoleculeState,
    pp: PairParams,
    box: jnp.ndarray,
    slots: jnp.ndarray,  # [n_cells, cap] int32 molecule index, -1 empty
    dims,  # static (nx, ny, nz)
    r_probe: jnp.ndarray,
    q_probe: jnp.ndarray,
    cid_probe: jnp.ndarray,
    exclude_idx: jnp.ndarray,
    freed=None,
):
    """Probe energy against the 27-cell neighborhood of r_probe instead
    of the full molecule array (LinkedCells::getEnergy,
    /root/reference/src/particleContainer/LinkedCells.cpp: the
    reference probe is cell-local too).  Requires cell edge >= cutoff.
    Cost per trial is O(27*cap), independent of N.

    freed: optional [capacity] bool — slots whose table entry is STALE
    because a same-cycle deletion freed them.  A freed slot's table
    row must be masked even if the slot is live again: a same-cycle
    insertion that reused it lives at a NEW position (possibly a
    different cell) and is accounted by the caller's delta list;
    reading the stale row as well would double-count the molecule."""
    dtype = mol.r.dtype
    nx, ny, nz = dims
    dims_a = jnp.asarray((nx, ny, nz), jnp.int32)
    cl = box / dims_a.astype(dtype)
    c3 = jnp.clip(
        jnp.floor(r_probe / cl).astype(jnp.int32), 0, dims_a - 1
    )
    nb = jnp.mod(c3[None, :] + jnp.asarray(_OFFS27), dims_a)  # [27, 3]
    lin = (nb[:, 2] * ny + nb[:, 1]) * nx + nb[:, 0]
    cand = slots[lin].reshape(-1)  # [27*cap]
    safe = jnp.clip(cand, 0, mol.capacity - 1)
    drm_raw = min_image(r_probe[None, :] - mol.r[safe], box)
    com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
    ok = (cand >= 0) & mol.valid[safe] & (cand != exclude_idx)
    if freed is not None:
        ok = ok & ~freed[safe]
    mask_lj = ok & (com2 < pp.rc2_lj)
    mask_el = ok & (com2 < pp.rc2)
    fill = jnp.zeros((3,), dtype).at[0].set(3.0 * jnp.sqrt(pp.rc2) + 1.0)
    drm = jnp.where((mask_lj | mask_el)[:, None], drm_raw, fill)
    sites_all = site_offsets(pp, mol.q[safe], mol.cid[safe])
    sites_p = site_offsets(pp, q_probe[None], cid_probe[None])
    out = molecule_pair(
        drm, sites_p, sites_all, cid_probe, mol.cid[safe], pp,
        mask_lj, mask_el,
    )
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
    """GCMC moves on top of the jitted MD engine.

    Moves run in the afterForces slot of the step loop
    (GrandCanonicalEnsemble.cpp:92-137).  The RNG is a single
    jax.random key chain, so runs are reproducible (the reference
    demands rank-synchronized RNGs,
    GrandCanonicalEnsemble.cpp:115-118 assertSynchronization).

    The whole per-interval cycle -- `deletions_per_interval` deletions
    followed by `insertions_per_interval` insertions, SEQUENTIAL like
    the reference's _instances loop (ChemicalPotential.h:23,101) -- is
    ONE jitted lax.scan on device: candidate picks, probe energies,
    Metropolis decisions and slot writes never round-trip to the host
    (VERDICT r1 item 6: the per-move host syncs were the muVT scaling
    bottleneck).  The host reads back 3 counters per interval.  The
    O(N) min-image probe row is VPU-trivial even at N=1e6 x 20 trials
    (~1e9 flops); a cell-based probe would only save dispatch-width,
    not wall time."""

    # molecule capacities above this use the cell-table probe; below,
    # the O(N) row is cheaper than building the table
    CELL_PROBE_MIN_N = 16384

    def __init__(self, chem_pots, temperature: float, box, seed: int = 1234):
        self.chem_pots = list(chem_pots)
        self.T = float(temperature)
        self.box = np.asarray(box, float)
        self.volume = float(np.prod(self.box))
        self.key = jax.random.PRNGKey(seed)
        self.attempted = 0
        self.accepted_ins = 0
        self.accepted_del = 0
        self._cycle_jit = {}
        self._probe_caps = {}

    def _next(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _probe_geometry(self, mol, pp):
        """Cell-probe eligibility + (dims, cap) for the probe table:
        edge >= cutoff, >= 3 cells per axis (the 27-stencil would
        double-count under periodic wrap otherwise), capacity from the
        mean density with 2x headroom (doubled on measured overflow)."""
        rc = float(np.sqrt(max(float(pp.rc2), float(pp.rc2_lj))))
        dims = tuple(max(1, int(np.floor(b / rc))) for b in self.box)
        if mol.capacity < self.CELL_PROBE_MIN_N or min(dims) < 3:
            return None
        edge_vol = float(np.prod(self.box / np.asarray(dims)))
        rho = mol.capacity / self.volume  # upper bound on density
        cap = int(2 ** np.ceil(np.log2(max(2.0 * rho * edge_vol, 8))))
        return dims, cap

    def step(self, mol: MoleculeState, pp: PairParams, step: int) -> MoleculeState:
        for icp, cp in enumerate(self.chem_pots):
            if step % cp.interval:
                continue
            if icp not in self._probe_caps:
                self._probe_caps[icp] = self._probe_geometry(mol, pp)
            key = self._next()
            while True:
                geom = self._probe_caps[icp]
                ck = (icp, geom)
                fn = self._cycle_jit.get(ck)
                if fn is None:
                    fn = jax.jit(
                        functools.partial(self._cycle, cp=cp, probe=geom)
                    )
                    self._cycle_jit[ck] = fn
                mol2, n_att, n_del, n_ins, ovf = fn(mol, pp, key)
                if geom is None or not bool(ovf):
                    mol = mol2
                    break
                # probe-table overflow: the cycle returned the input
                # state untouched; double the table capacity and retry
                self._probe_caps[icp] = (geom[0], 2 * geom[1])
            self.attempted += int(n_att)
            self.accepted_del += int(n_del)
            self.accepted_ins += int(n_ins)
        return mol

    def _cycle(self, mol: MoleculeState, pp: PairParams, key, *, cp,
               probe=None):
        """One grand-canonical cycle, fully on device.

        probe=(dims, cap) selects the cell-table probe: molecules are
        binned ONCE per cycle (O(N), amortized over all trials) and
        each trial's energy reads only the 27-cell neighborhood
        (cell_probe_energy) -- the trial cost is independent of N
        (LinkedCells::getEnergy is cell-local in the reference too).
        Deletions need no table maintenance (the table stores INDICES;
        validity and positions are read live from the evolving mol),
        and same-cycle insertions are corrected by a small delta list
        of pair energies."""
        dtype = mol.r.dtype
        box = jnp.asarray(self.box, dtype)
        T = self.T
        V = self.volume
        lo = jnp.asarray(
            cp.control_lower if cp.control_lower is not None
            else np.zeros(3), dtype,
        )
        hi = jnp.asarray(
            cp.control_upper if cp.control_upper is not None
            else self.box, dtype,
        )
        comp = jnp.asarray(cp.component, jnp.int32)
        n_cap = mol.capacity
        nd = int(cp.deletions_per_interval)
        ni = int(cp.insertions_per_interval)

        table = None
        table_ovf = jnp.zeros((), bool)
        if probe is not None:
            from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles

            pdims, pcap = probe
            pspec = CellGridSpec(
                dims=pdims, box=tuple(float(b) for b in self.box), cap=pcap
            )
            bins = bin_particles(mol.r, mol.valid, pspec)
            table = bins.slots
            table_ovf = bins.overflow

        def probe_e(mol, r_p, q_p, cid_p, excl, deltas, freed=None):
            if probe is None:
                return single_molecule_energy(
                    mol, pp, box, r_p, q_p, cid_p, excl
                )
            e = cell_probe_energy(
                mol, pp, box, table, probe[0], r_p, q_p, cid_p, excl,
                freed=freed,
            )
            if ni == 0:
                return e
            # same-cycle insertions are absent from the table: add
            # their pair energies (validity read LIVE so an insertion
            # deleted later in the cycle cancels itself)
            d_r, d_q, d_idx = deltas
            dsafe = jnp.clip(d_idx, 0, n_cap - 1)
            drm_raw = min_image(r_p[None, :] - d_r, box)
            com2 = jnp.sum(drm_raw * drm_raw, axis=-1)
            okd = (d_idx >= 0) & mol.valid[dsafe] & (d_idx != excl)
            mask_lj = okd & (com2 < pp.rc2_lj)
            mask_el = okd & (com2 < pp.rc2)
            fill = jnp.zeros((3,), dtype).at[0].set(
                3.0 * jnp.sqrt(pp.rc2) + 1.0
            )
            drm = jnp.where((mask_lj | mask_el)[:, None], drm_raw, fill)
            sites_d = site_offsets(pp, d_q, mol.cid[dsafe])
            sites_p = site_offsets(pp, q_p[None], cid_p[None])
            out = molecule_pair(
                drm, sites_p, sites_d, cid_p, mol.cid[dsafe], pp,
                mask_lj, mask_el,
            )
            return e + (
                jnp.sum(out["u6lj"]) / 6.0
                + jnp.sum(out["uX"])
                + jnp.sum(out["my_rf"])
            )

        def try_delete(mol, deltas, freed, k):
            k1, k2 = jax.random.split(k)
            in_cv = jnp.all((mol.r >= lo) & (mol.r < hi), axis=-1)
            cand = mol.valid & (mol.cid == comp) & in_cv
            cnt = jnp.cumsum(cand.astype(jnp.int32))
            total = cnt[-1]
            pick = jax.random.randint(
                k1, (), 1, jnp.maximum(total, 1) + 1
            )
            idx = jnp.searchsorted(cnt, pick).astype(jnp.int32)
            idx = jnp.clip(idx, 0, n_cap - 1)
            e_mol = probe_e(
                mol, mol.r[idx], mol.q[idx], mol.cid[idx], idx, deltas,
                freed,
            )
            n = jnp.sum(mol.valid).astype(dtype)
            acc = jnp.minimum(
                1.0, n / V * jnp.exp((-cp.mu + e_mol) / T)
            )
            do = (
                (total > 0)
                & (jax.random.uniform(k2, (), dtype) < acc)
            )
            valid = mol.valid.at[idx].set(
                jnp.where(do, False, mol.valid[idx])
            )
            if freed is not None:
                # the slot's table entry is stale from here on
                freed = freed.at[idx].set(
                    jnp.where(do, True, freed[idx])
                )
            return dataclasses.replace(mol, valid=valid), freed, do

        def try_insert(mol, deltas, freed, ins_i, k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            free = ~mol.valid
            has_free = jnp.any(free)
            if freed is not None:
                # prefer slots that were NOT freed this cycle: a
                # reused freed slot's stale table row is masked (see
                # cell_probe_energy freed), so this is a table-hit
                # optimization, not a correctness condition
                fresh = free & ~freed
                idx = jnp.where(
                    jnp.any(fresh), jnp.argmax(fresh), jnp.argmax(free)
                ).astype(jnp.int32)
            else:
                idx = jnp.argmax(free).astype(jnp.int32)  # first free
            r_new = jax.random.uniform(k1, (3,), dtype, lo, hi)
            qv = jax.random.normal(k2, (4,), dtype)
            q_new = qv / jnp.linalg.norm(qv)
            du = probe_e(
                mol, r_new, q_new, comp, jnp.asarray(-1, jnp.int32),
                deltas, freed,
            )
            n = jnp.sum(mol.valid).astype(dtype)
            acc = jnp.minimum(
                1.0, V / (n + 1.0) * jnp.exp((cp.mu - du) / T)
            )
            do = has_free & (jax.random.uniform(k3, (), dtype) < acc)
            mass = pp.mass[comp]
            v_new = jax.random.normal(k4, (3,), dtype) * jnp.sqrt(
                jnp.asarray(T, dtype) / mass
            )
            mid_new = jnp.max(mol.mid) + 1

            def w(a, val):
                return a.at[idx].set(jnp.where(do, val, a[idx]))

            if deltas is not None:
                d_r, d_q, d_idx = deltas
                deltas = (
                    d_r.at[ins_i].set(jnp.where(do, r_new, d_r[ins_i])),
                    d_q.at[ins_i].set(jnp.where(do, q_new, d_q[ins_i])),
                    d_idx.at[ins_i].set(jnp.where(do, idx, d_idx[ins_i])),
                )
            return (
                dataclasses.replace(
                    mol,
                    r=w(mol.r, r_new),
                    v=w(mol.v, v_new),
                    q=w(mol.q, q_new),
                    L=w(mol.L, jnp.zeros(3, dtype)),
                    cid=w(mol.cid, comp),
                    mid=w(mol.mid, mid_new),
                    valid=w(mol.valid, True),
                ),
                deltas,
                do,
            )

        keys = jax.random.split(key, nd + ni)
        deltas0 = None
        if probe is not None and ni > 0:
            deltas0 = (
                jnp.zeros((ni, 3), dtype),
                jnp.zeros((ni, 4), dtype),
                jnp.full((ni,), -1, jnp.int32),
            )

        freed0 = (
            jnp.zeros((n_cap,), bool) if probe is not None else None
        )

        # two plain scans (deletions then insertions, the reference's
        # order) instead of one scan with a lax.cond over the full
        # state: on TPU the cond makes XLA spill (8,128)-tiled remat
        # copies of the [N,3] carries (42x padding), which OOMs at
        # N=10M.  The key split keys[:nd]/keys[nd:] preserves the
        # exact RNG stream of the former fused scan.
        def del_body(carry, kk):
            m, d, fr, a = carry
            m2, fr2, do = try_delete(m, d, fr, kk)
            return (m2, d, fr2, a + do.astype(jnp.int32)), None

        def ins_body(carry, kk):
            m, d, fr, a, j = carry
            m2, d2, do = try_insert(m, d, fr, j, kk)
            return (m2, d2, fr, a + do.astype(jnp.int32), j + 1), None

        mol_out, deltas_c, freed_c = mol, deltas0, freed0
        a_del = a_ins = jnp.int32(0)
        if nd:
            (mol_out, deltas_c, freed_c, a_del), _ = jax.lax.scan(
                del_body, (mol_out, deltas_c, freed_c, jnp.int32(0)),
                keys[:nd],
            )
        if ni:
            (mol_out, deltas_c, freed_c, a_ins, _), _ = jax.lax.scan(
                ins_body,
                (mol_out, deltas_c, freed_c, jnp.int32(0),
                 jnp.int32(0)),
                keys[nd:],
            )
        # probe-table overflow: results are untrustworthy -- return the
        # INPUT state so the host can rebuild with a larger table and
        # rerun the cycle
        if probe is not None:
            mol_out = jax.tree.map(
                lambda a, b: jnp.where(table_ovf, a, b), mol, mol_out
            )
            a_del = jnp.where(table_ovf, 0, a_del)
            a_ins = jnp.where(table_ovf, 0, a_ins)
        return mol_out, jnp.int32(nd + ni), a_del, a_ins, table_ovf

def _build_chemical_potentials(specs, box):
    """XML <chemicalpotential> blocks -> ChemicalPotential list with
    the reference's full semantics: per-component mu, cycle interval,
    trial-instance counts (ChemicalPotential.h:23,101 _instances) and
    an optional restricted control volume (setControlVolume role,
    ChemicalPotential.cpp; nested <control><lower>/<upper> x/y/z)."""
    import numpy as _np

    from ls1_mardyn_tpu.ensemble.grand_canonical import ChemicalPotential

    cps = []
    for spec_ in specs:
        p_ = spec_.params
        inst = int(float(p_.get("instances", 1)))
        lo = hi = None
        ctl = p_.get("control")
        if isinstance(ctl, dict):
            low, up = ctl.get("lower"), ctl.get("upper")
            if isinstance(low, dict):
                lo = _np.array([float(low.get(a, 0.0)) for a in "xyz"])
            if isinstance(up, dict):
                hi = _np.array(
                    [float(up.get(a, b)) for a, b in zip("xyz", box)]
                )
        cps.append(
            ChemicalPotential(
                mu=float(p_.get("mu", 0.0)),
                component=int(p_.get("cid", p_.get("componentid", 1))) - 1,
                # "everyNTimesteps" is the spelling some legacy-style
                # configs use for ChemicalPotential::setInterval
                interval=int(float(
                    p_.get("interval", p_.get("everyNTimesteps", 100))
                )),
                insertions_per_interval=int(
                    float(p_.get("insertions", inst))
                ),
                deletions_per_interval=int(
                    float(p_.get("deletions", inst))
                ),
                control_lower=lo,
                control_upper=hi,
            )
        )
    return cps
