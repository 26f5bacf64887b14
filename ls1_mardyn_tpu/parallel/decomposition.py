"""Slab domain decomposition over a 1-D device mesh.

The TPU-native equivalent of the reference's MPI spatial decomposition
stack (/root/reference/src/parallel/DomainDecomposition.{h,cpp} +
DomainDecompMPIBase::exchangeMoleculesMPI +
IndirectNeighbourCommunicationScheme + CommunicationPartner):

  - the z axis of the cell grid is split into P contiguous slabs, one
    per device; each device owns a fixed-capacity local molecule array
    (capacity + validity masks replace the reference's dynamic
    std::vectors and byte-packed CommunicationBuffers)
  - LEAVING molecules (MessageType LEAVING_ONLY,
    CommunicationPartner.h:16-21): after the drift, molecules whose
    wrapped z falls in a neighbor slab are compacted into fixed-size
    padded payloads and exchanged with jax.lax.ppermute (+1 and -1
    rings); merge = concat + validity sort (no scatters)
  - HALO copies (MessageType HALO_COPIES): the dense boundary cell rows
    of the Pallas views are ppermuted to the neighbors, pre-shifted by
    +-Lz on the global boundary, giving the force kernel explicit z
    halo rows (z_halo mode); y/x periodicity stays in-kernel
  - global values: one fused psum of
    (u6lj, virial, summv2, sumIw2, N, rotDOF) -- exactly the
    agglomerated CollectiveCommunication pattern
    (src/parallel/CollectiveCommunication.h:14-60)
  - force back-exchange is unnecessary: each ordered pair is computed
    on the owner of molecule i (full-shell zonal method, no
    requiresForceExchange -- ZonalMethods/FullShell.h)

The whole multi-chip step is ONE jitted shard_map program; XLA
schedules the ppermutes on ICI and overlaps them with local compute
(the role of NonBlockingMPIMultiStepHandler falls out for free).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.globals import calculate_global_values
from ls1_mardyn_tpu.ops.integrator import (
    upd_post_force,
    upd_post_force_kahan,
    upd_pre_force,
    upd_pre_force_kahan,
)
from ls1_mardyn_tpu.ops.pallas_lj import (
    HX,
    lj_cell_forces_pallas,
    lj_cell_forces_pallas_cw,
)
from ls1_mardyn_tpu.ops.thermostat import apply_velocity_scaling
from ls1_mardyn_tpu.state import Macroscopic, MoleculeState

AXIS = "dd"  # domain-decomposition mesh axis


@dataclasses.dataclass(frozen=True)
class SlabConfig:
    """Static multi-chip configuration."""

    n_devices: int
    nz_local: int  # z cell rows per device
    ny: int
    nx: int
    cap: int
    box: Tuple[float, float, float]
    n_local_cap: int  # molecule capacity per device
    migrate_cap: int  # max molecules leaving through one face per step
    tx: int
    dt: float
    target_temperature: float
    thermostat: bool
    eps24: float
    sig2: float
    shift6: float
    rc2: float
    interpret: bool = False
    upot_corr: float = 0.0
    virial_corr: float = 0.0
    # cell-window kernel for the 1CLJ path (lj_cell_forces_pallas_cw,
    # cell-LOCAL coordinates): per-cell 4-cell j windows with no
    # coordinate matmuls -- measured ~4x faster than the row kernel on
    # TPU under the package-wide exact-f32 matmul setting, and exact
    # halo arithmetic (no +-L shifts: cell-local periodicity is integer
    # cell math).  Requires UNIFORM z rows (the load-balanced
    # non-uniform-edge mode falls back to the row kernel), nx % tx == 0,
    # nx >= 4, ny >= 3, (4*cap) % 128 == 0, cell edges >= rc.
    cw_eligible: bool = False
    # per-molecule per-axis virials in the 1CLJ cw kernel (opt-in:
    # +3 FMA/pair-lane; enabled by the driver when a Vi-consuming
    # plugin -- GammaWriter, DirectedPM, virial profiles -- is present)
    compute_vi: bool = False
    # multi-site mode: hashable kernel metadata (ops/pallas_multisite
    # _MSMeta); None selects the 1CLJ kernel
    ms_meta: object = None
    # occupancy-packed multi-site kernel (ops/pallas_ms_packed) instead
    # of the dense row kernel: rows compacted after the halo exchange,
    # dynamic 128-aligned j windows (2x on the CO2 class single-chip)
    ms_packed: bool = False
    rc2_lj: float = 0.0
    screen_alpha: float = 0.0
    # Ewald k-space (sharded over molecules, psum of structure factors);
    # kmax 0 disables.  screen_alpha must be set to the same alpha so
    # the pair kernel computes the erfc-screened real-space part.
    ewald_kmax: int = 0
    ewald_alpha: float = 0.0
    # SPME mesh k-space instead of the direct sum: non-empty grid
    # enables it (each device spreads its local molecules, one psum
    # merges the global charge mesh -- the analogue of the reference's
    # allreduce of global multipole levels,
    # UniformPseudoParticleContainer.h:95-135)
    pme_grid: Tuple[int, ...] = ()
    pme_order: int = 4
    # TemperatureControl regions (ops/thermostat); per-slab sums ride a
    # psum exactly like the reference's collective
    # (TemperatureControl.cpp:238-263)
    temp_control_regions: Tuple = ()

    @property
    def slab_h(self) -> float:
        return self.box[2] / self.n_devices

    @property
    def local_spec(self) -> CellGridSpec:
        return CellGridSpec(
            dims=(self.nx, self.ny, self.nz_local),
            box=(self.box[0], self.box[1], self.slab_h),
            cap=self.cap,
        )


def balanced_z_edges(z, nz: int, Lz: float, min_h: float) -> np.ndarray:
    """Equal-count z row edges with a minimum row height (the
    load-balancing objective of KDDecomposition/ALL restricted to slab
    splits: each of the nz rows holds ~N/nz molecules, every row >= the
    cutoff so the +-1-row halo stays valid).

    Host-side; returns [nz+1] float32 edges with e[0]=0, e[nz]=Lz."""
    z = np.sort(np.asarray(z, np.float64))
    n = len(z)
    if n == 0 or nz * min_h > Lz:
        return np.linspace(0.0, Lz, nz + 1).astype(np.float32)
    q = np.interp(
        np.arange(1, nz) / nz * n, np.arange(n) + 0.5, z
    )
    e = np.concatenate([[0.0], q, [Lz]])
    # enforce the min height: forward sweep pushes edges up, backward
    # sweep pulls them down below Lz - remaining min heights; feasible
    # because nz*min_h <= Lz
    for i in range(1, nz + 1):
        e[i] = max(e[i], e[i - 1] + min_h)
    e[nz] = Lz
    for i in range(nz, 0, -1):
        e[i - 1] = min(e[i - 1], e[i] - min_h)
    e[0] = 0.0
    assert (np.diff(e) >= min_h * (1 - 1e-9)).all(), e
    return e.astype(np.float32)


def _pack_payload(mol: MoleculeState, sel_idx: jnp.ndarray, ok: jnp.ndarray,
                  rcomp=None, vcomp=None):
    """Gather molecules into a fixed-size padded payload (the ppermute
    replacement for CommunicationBuffer's byte packing -- dense f32,
    ids ride as float (exact below 2^24); the Kahan compensation
    columns travel with their molecules so compensated integration
    survives migration."""
    i = jnp.clip(sel_idx, 0, mol.capacity - 1)
    dtype = mol.r.dtype
    zero3 = jnp.zeros_like(mol.r)
    rc = zero3 if rcomp is None else rcomp
    vc = zero3 if vcomp is None else vcomp
    cols = jnp.concatenate(
        [
            mol.r[i],
            mol.v[i],
            mol.q[i],
            mol.L[i],
            mol.cid[i].astype(dtype)[:, None],
            mol.mid[i].astype(dtype)[:, None],
            ok.astype(dtype)[:, None],
            rc[i],
            vc[i],
        ],
        axis=1,
    )  # [mig_cap, 22]
    return jnp.where(ok[:, None], cols, 0.0)


def _unpack_payload(buf: jnp.ndarray):
    r = buf[:, 0:3]
    v = buf[:, 3:6]
    q = buf[:, 6:10]
    L = buf[:, 10:13]
    cid = buf[:, 13].astype(jnp.int32)
    mid = buf[:, 14].astype(jnp.int32)
    valid = buf[:, 15] > 0.5
    rc = buf[:, 16:19]
    vc = buf[:, 19:22]
    q = jnp.where(valid[:, None], q, jnp.zeros_like(q).at[:, 0].set(1.0))
    return r, v, q, L, cid, mid, valid, rc, vc


class SlabSimulation:
    """Multi-chip driver: same API shape as SingleChipSimulation but the
    step is a shard_map over a 1-D mesh (the 'dd' axis)."""

    def __init__(
        self,
        cfg: SlabConfig,
        pp: PairParams,
        mesh: Optional[Mesh] = None,
        extra_force_fns: Tuple = (),
        fmm=None,
    ):
        self.cfg = cfg
        self.pp = pp
        # sharded solid-harmonics FMM (ops/fmm.FMMElectrostatics):
        # owns ALL Coulomb work when set (the pair kernel then runs
        # LJ-only); evaluated inside the shard_map via its psum'd
        # global-leaf-table scheme
        self._fmm = fmm
        # siteWiseForces plugin contributions (pure (mol, pp) ->
        # (u, F, M)), evaluated per device on local molecules; their
        # energies ride the uX psum
        self.extra_force_fns = tuple(extra_force_fns)
        if mesh is None:
            devs = np.array(jax.devices()[: cfg.n_devices])
            mesh = Mesh(devs, (AXIS,))
        assert mesh.shape[AXIS] == cfg.n_devices
        self.mesh = mesh
        self.volume = float(np.prod(cfg.box))
        self._ewald_k = None
        self._pme = None
        if cfg.pme_grid:
            from ls1_mardyn_tpu.ops.pme import PMEParams, PMESolver

            self._pme = PMESolver(
                cfg.box,
                PMEParams(
                    alpha=cfg.ewald_alpha,
                    grid=tuple(cfg.pme_grid),
                    order=cfg.pme_order,
                ),
            )
        elif cfg.ewald_kmax > 0:
            from ls1_mardyn_tpu.ops.ewald import make_kvectors

            k, c = make_kvectors(
                np.asarray(cfg.box), cfg.ewald_kmax, cfg.ewald_alpha
            )
            self._ewald_k = (jnp.asarray(k), jnp.asarray(c))
        # z row edges are a DYNAMIC (replicated) argument, so slab
        # rebalancing (KDDecomposition.h:21-55 / ALLLoadBalancer.h:12
        # role) never recompiles: dense regions get thin rows, sparse
        # regions thick ones, every row >= rc.  Uniform edges are the
        # default.
        nz_glob = cfg.n_devices * cfg.nz_local
        self.uniform_edges = np.linspace(
            0.0, cfg.box[2], nz_glob + 1
        ).astype(np.float32)
        self._edges_default = jnp.asarray(self.uniform_edges)
        self._step_sharded_lb = jax.jit(
            jax.shard_map(
                self._device_step,
                mesh=self.mesh,
                in_specs=(P(AXIS), P(AXIS), P(), P()),
                out_specs=(P(AXIS), P(AXIS), P(), P(), P(), P(AXIS)),
                check_vma=False,
            )
        )
        self._force_sharded_lb = jax.jit(
            jax.shard_map(
                self._device_forces_entry,
                mesh=self.mesh,
                in_specs=(P(AXIS), P()),
                out_specs=(P(AXIS), P(), P(), P(), P()),
                check_vma=False,
            )
        )
        if cfg.cw_eligible:
            # cell-window variants (uniform z rows only; selected by
            # _step_sharded/_force_sharded when no explicit non-uniform
            # edge table is in play)
            self._step_sharded_cw = jax.jit(
                jax.shard_map(
                    functools.partial(self._device_step, use_cw=True),
                    mesh=self.mesh,
                    in_specs=(P(AXIS), P(AXIS), P(), P()),
                    out_specs=(P(AXIS), P(AXIS), P(), P(), P(), P(AXIS)),
                    check_vma=False,
                )
            )
            self._force_sharded_cw = jax.jit(
                jax.shard_map(
                    functools.partial(
                        self._device_forces_entry, use_cw=True
                    ),
                    mesh=self.mesh,
                    in_specs=(P(AXIS), P()),
                    out_specs=(P(AXIS), P(), P(), P(), P()),
                    check_vma=False,
                )
            )

    # compat wrappers (the 4-/5-tuple API predates load balancing)
    def make_aux(self, FM):
        """(F, M[, Vi]) or aux-dict -> full aux with zeroed
        compensation."""
        if isinstance(FM, dict):
            if "Vi" not in FM:
                FM = dict(FM, Vi=jnp.zeros_like(FM["F"]))
            return FM
        if len(FM) == 3:
            F, M, Vi = FM
        else:
            F, M = FM
            Vi = jnp.zeros_like(F)
        z = jnp.zeros_like(F)
        return dict(F=F, M=M, Vi=Vi, rcomp=z, vcomp=z)

    def _step_sharded(self, mol, FM, z_edges=None, step=0):
        if z_edges is None and self.cfg.cw_eligible:
            mol, aux, gv, _macro, ovf, _n = self._step_sharded_cw(
                mol, self.make_aux(FM), self._edges_default,
                jnp.asarray(step, jnp.int32),
            )
            return mol, aux, gv, ovf
        e = self._edges_default if z_edges is None else z_edges
        mol, aux, gv, _macro, ovf, _nloc = self._step_sharded_lb(
            mol, self.make_aux(FM), e, jnp.asarray(step, jnp.int32)
        )
        return mol, (aux["F"], aux["M"]), gv, ovf

    def _force_sharded(self, mol, z_edges=None):
        if z_edges is None and self.cfg.cw_eligible:
            return self._force_sharded_cw(mol, self._edges_default)
        e = self._edges_default if z_edges is None else z_edges
        return self._force_sharded_lb(mol, e)

    # -- scene distribution (host side) -----------------------------------
    def distribute(self, mol_global: MoleculeState, extras=None,
                   z_edges=None):
        """Split a global molecule state into per-device slabs, stacked
        on a leading axis of size P * n_local_cap and sharded over the
        mesh (the role of initial readPhaseSpace partitioning,
        Simulation.cpp:732-736).

        extras: optional tuple of [capacity, ...] arrays (e.g. forces)
        permuted identically and returned alongside (so plugin-side
        state edits need no force recomputation).
        z_edges: optional [nz_global+1] non-uniform row edges (load
        balancing); owner slabs follow every nz_local-th edge."""
        cfg = self.cfg
        P_ = cfg.n_devices
        z = np.asarray(mol_global.r)[:, 2]
        if z_edges is None:
            owner = np.clip((z / cfg.slab_h).astype(int), 0, P_ - 1)
        else:
            bounds = np.asarray(z_edges)[:: cfg.nz_local]
            assert len(bounds) == P_ + 1
            owner = np.clip(
                np.searchsorted(bounds[1:-1], z, side="right"), 0, P_ - 1
            )
        parts = []
        extra_parts = [[] for _ in (extras or ())]
        for p in range(P_):
            sel = np.where((owner == p) & np.asarray(mol_global.valid))[0]
            if len(sel) > cfg.n_local_cap:
                raise ValueError(
                    f"device {p}: {len(sel)} molecules > capacity {cfg.n_local_cap}"
                )
            pad = cfg.n_local_cap - len(sel)
            take = lambda a: np.concatenate(
                [np.asarray(a)[sel], np.zeros((pad,) + a.shape[1:], np.asarray(a).dtype)]
            )
            q = take(mol_global.q)
            q[len(sel):, 0] = 1.0
            parts.append(
                dict(
                    r=take(mol_global.r),
                    v=take(mol_global.v),
                    q=q,
                    L=take(mol_global.L),
                    cid=take(mol_global.cid),
                    mid=take(mol_global.mid),
                    valid=np.concatenate([np.ones(len(sel), bool), np.zeros(pad, bool)]),
                )
            )
            for i, e in enumerate(extras or ()):
                extra_parts[i].append(take(e))
        stacked = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        dtype = mol_global.r.dtype
        sh = NamedSharding(self.mesh, P(AXIS))
        dev = lambda a, dt: jax.device_put(jnp.asarray(a, dt), sh)
        mol = MoleculeState(
            r=dev(stacked["r"], dtype),
            v=dev(stacked["v"], dtype),
            q=dev(stacked["q"], dtype),
            L=dev(stacked["L"], dtype),
            cid=dev(stacked["cid"], jnp.int32),
            mid=dev(stacked["mid"], jnp.int32),
            valid=dev(stacked["valid"], jnp.bool_),
        )
        if extras is None:
            return mol
        return mol, tuple(
            dev(np.concatenate(ep), dtype) for ep in extra_parts
        )

    def gather_global(self, mol: MoleculeState) -> MoleculeState:
        """All-device view back on host (diagnostics/checkpointing)."""
        return jax.tree.map(lambda a: np.asarray(a), mol)

    def snapshot(self, mol: MoleculeState, time: float = 0.0) -> dict:
        """In-memory snapshot of the full sharded state (the
        ResilienceComm + InMemoryCheckpointing capability,
        src/parallel/ResilienceComm.{h:34,cpp} +
        src/plugins/InMemoryCheckpointing.h:18-70: per-rank redundancy
        snapshots; here one host-RAM copy covers all devices)."""
        return {
            "mol": jax.tree.map(lambda a: np.array(a), mol),
            "time": float(time),
        }

    def restore(self, snap: dict) -> MoleculeState:
        """Re-shard a snapshot back onto the mesh."""
        sh = NamedSharding(self.mesh, P(AXIS))
        return jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), sh), snap["mol"]
        )

    def write_checkpoint(
        self,
        mol: MoleculeState,
        path: str,
        table,
        current_time: float = 0.0,
        binary: bool = False,
    ):
        """Gather + write a restart file in the reference formats (the
        MPICheckpointWriter / MPI_IOCheckpointWriter capability: every
        rank contributes its slab; here a host gather feeds the same
        ASCII/binary writers the single-chip path uses)."""
        from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData, write_inp

        g = self.gather_global(mol)
        valid = g.valid
        data = PhaseSpaceData(
            components=table.components,
            mixing_xi=table.mixing_xi,
            mixing_eta=table.mixing_eta,
            eps_rf=table.eps_rf,
            box=np.asarray(self.cfg.box),
            temperature=self.cfg.target_temperature,
            current_time=current_time,
            mid=g.mid[valid].astype(np.int64),
            cid=g.cid[valid],
            r=g.r[valid],
            v=g.v[valid],
            q=g.q[valid],
            L=g.L[valid],
        )
        if binary:
            from ls1_mardyn_tpu.io.binary_io import write_binary_checkpoint

            write_binary_checkpoint(path, path + ".header.xml", data)
        else:
            write_inp(path, data)

    def refresh_ids(self, mol: MoleculeState) -> MoleculeState:
        """Reassign contiguous global molecule ids 1..N in device order
        (the refreshIDs option, Simulation.cpp:1408-1419: MPI_Exscan of
        local counts -> per-rank id offsets)."""
        cfg = self.cfg
        ncap = cfg.n_local_cap
        valid = np.asarray(mol.valid)
        mid = np.array(mol.mid)
        offset = 0
        for p in range(cfg.n_devices):
            seg = slice(p * ncap, (p + 1) * ncap)
            sel = np.where(valid[seg])[0]
            mid[seg][sel] = 0  # clear then assign (views don't chain)
            new = np.zeros(ncap, mid.dtype)
            new[sel] = offset + 1 + np.arange(len(sel), dtype=mid.dtype)
            mid[seg] = np.where(valid[seg], new, 0)
            offset += len(sel)
        out = jax.device_put(jnp.asarray(mid), mol.mid.sharding)
        return dataclasses.replace(mol, mid=out)

    # -- per-device step bodies (run inside shard_map) ---------------------
    def _rank(self):
        return jax.lax.axis_index(AXIS)

    def _migrate(
        self, mol: MoleculeState, dev_bounds: jnp.ndarray,
        rcomp: jnp.ndarray, vcomp: jnp.ndarray,
    ):
        """Exchange molecules that left the local slab with the +-1
        neighbors (LEAVING_ONLY exchange).  Assumes dt is small enough
        that nobody crosses more than one slab per step (the reference
        makes the same assumption per cell, LinkedCells.h).

        dev_bounds: [P+1] slab boundary z values (non-uniform under
        load balancing)."""
        cfg = self.cfg
        rank = self._rank()
        Pn = cfg.n_devices
        # owner slab from the (already wrapped) z coordinate; +-1 ring
        # distance handles the periodic wrap at rank 0 / P-1
        owner = jnp.clip(
            jnp.searchsorted(
                dev_bounds[1:-1], mol.r[:, 2], side="right"
            ).astype(jnp.int32),
            0, Pn - 1,
        )
        d = jnp.mod(owner - rank, Pn)
        if Pn == 1:
            # single device owns the whole box: nothing ever leaves
            go_up = jnp.zeros_like(mol.valid)
            go_down = jnp.zeros_like(mol.valid)
        else:
            go_up = mol.valid & (d == 1)
            # with Pn == 2 the +-1 neighbors coincide (d == 1 == Pn-1);
            # route through the up ring only, else the molecule would
            # be sent twice and duplicated
            go_down = mol.valid & (d == Pn - 1) & ~go_up
        too_far = mol.valid & (d != 0) & ~go_up & ~go_down

        def pick(leave):
            # compact leaver indices to the front via argsort on ~leave
            ordr = jnp.argsort(~leave)[: cfg.migrate_cap].astype(jnp.int32)
            ok = leave[ordr]
            return ordr, ok

        up_idx, up_ok = pick(go_up)
        dn_idx, dn_ok = pick(go_down)
        overflow = (
            (jnp.sum(go_up) > cfg.migrate_cap)
            | (jnp.sum(go_down) > cfg.migrate_cap)
            | jnp.any(too_far)
        )
        buf_up = _pack_payload(mol, up_idx, up_ok, rcomp, vcomp)
        buf_dn = _pack_payload(mol, dn_idx, dn_ok, rcomp, vcomp)
        perm_up = [(i, (i + 1) % Pn) for i in range(Pn)]
        perm_dn = [(i, (i - 1) % Pn) for i in range(Pn)]
        recv_from_below = jax.lax.ppermute(buf_up, AXIS, perm_up)
        recv_from_above = jax.lax.ppermute(buf_dn, AXIS, perm_dn)

        # drop exactly the SENT leavers locally.  Leavers beyond
        # migrate_cap were NOT packed into the payload -- they must
        # stay valid here (binned into the nearest edge row, so their
        # forces are near-correct for the one window until the
        # overflow flag triggers the driver's lossless re-spec) rather
        # than vanish: a whole lattice plane sitting exactly on a slab
        # boundary can legitimately cross in one step, and dropping
        # the overflow tail silently deleted molecules.
        sent = jnp.zeros(mol.valid.shape, bool)
        sent = sent.at[up_idx].max(up_ok)
        sent = sent.at[dn_idx].max(dn_ok)
        keep = mol.valid & ~sent
        # merge: concat local + received, validity-sort, truncate
        rr, rv, rq, rL, rcid, rmid, rvalid, rrc, rvc = _unpack_payload(
            jnp.concatenate([recv_from_below, recv_from_above], axis=0)
        )
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        r = cat(mol.r, rr)
        v = cat(mol.v, rv)
        q = cat(mol.q, rq)
        L = cat(mol.L, rL)
        cid = cat(mol.cid, rcid)
        mid = cat(mol.mid, rmid)
        valid = cat(keep, rvalid)
        rc = cat(rcomp, rrc)
        vc = cat(vcomp, rvc)
        # valid first (stable), then truncate to capacity
        ordr = jnp.argsort(~valid)[: cfg.n_local_cap]
        overflow = overflow | (jnp.sum(valid) > cfg.n_local_cap)
        sel = lambda a: a[ordr]
        out = MoleculeState(
            r=sel(r), v=sel(v), q=sel(q), L=sel(L),
            cid=sel(cid), mid=sel(mid), valid=sel(valid),
        )
        return out, overflow, sel(rc), sel(vc)

    def _pack_planes(self, mol: MoleculeState) -> jnp.ndarray:
        """Per-molecule kernel planes: LJ mode [x,y,z,valid]; multi-site
        mode [x,y,z,valid,cid,site offsets,orientations] (padded)."""
        dtype = mol.r.dtype
        if self.cfg.ms_meta is None:
            return jnp.concatenate(
                [mol.r, mol.valid.astype(dtype)[:, None]], axis=1
            )
        from ls1_mardyn_tpu.ops.pallas_ms_path import site_offsets_pp

        meta = self.cfg.ms_meta
        sites = site_offsets_pp(meta, mol)
        cols = [
            mol.r,
            mol.valid.astype(dtype)[:, None],
            mol.cid.astype(dtype)[:, None],
        ]
        n = mol.capacity
        for key in ("lj", "charge", "dip", "dip_e", "quad", "quad_e"):
            cols.append(sites[key].reshape(n, -1))
        packed = jnp.concatenate(cols, axis=1)
        pad = meta.P - packed.shape[1]
        if pad:
            packed = jnp.concatenate([packed, jnp.zeros((n, pad), dtype)], axis=1)
        return packed

    def _local_views(self, mol: MoleculeState, z_edges: jnp.ndarray):
        """Bin locally and build the kernel views with explicit z halo
        rows ppermuted from the neighbors (HALO_COPIES exchange).

        z_edges: [nz_global+1] row edges (dynamic; non-uniform rows are
        the load-balanced mode -- the force kernel is agnostic, it
        computes dz from absolute coordinates)."""
        cfg = self.cfg
        spec = cfg.local_spec
        rank = self._rank()
        Pn = cfg.n_devices
        dtype = mol.r.dtype
        nx, ny, nzl, cap = cfg.nx, cfg.ny, cfg.nz_local, cfg.cap
        # x/y rows are uniform; the z row comes from a binary search
        # over this device's slice of the edge table
        local_edges = jax.lax.dynamic_slice(
            z_edges, (rank * nzl,), (nzl + 1,)
        ).astype(dtype)
        clx = jnp.asarray(cfg.box[0] / nx, dtype)
        cly = jnp.asarray(cfg.box[1] / ny, dtype)
        cx = jnp.clip(
            jnp.floor(mol.r[:, 0] / clx).astype(jnp.int32), 0, nx - 1
        )
        cy = jnp.clip(
            jnp.floor(mol.r[:, 1] / cly).astype(jnp.int32), 0, ny - 1
        )
        cz = jnp.clip(
            jnp.searchsorted(
                local_edges[1:-1], mol.r[:, 2], side="right"
            ).astype(jnp.int32),
            0, nzl - 1,
        )
        from ls1_mardyn_tpu.ops.cells import bin_by_id

        cell = (cz * ny + cy) * nx + cx
        bins = bin_by_id(cell, mol.valid, spec)
        idx = bins.slots.reshape(nzl, ny, nx * cap)
        safe = jnp.clip(idx, 0, mol.capacity - 1)
        ok = (idx >= 0) & mol.valid[safe]
        pack = self._pack_planes(mol)
        P = pack.shape[1]
        g = jnp.where(ok[..., None], pack[safe], 0.0)  # [nzl, ny, nx*cap, P]

        Lx = cfg.box[0]
        shift_vec = jnp.zeros((P,), dtype).at[0].set(Lx)

        def with_xhalo(a):
            pad = jnp.zeros(a.shape[:2] + ((HX - 1) * cap, P), a.dtype)
            left = a[:, :, (nx - 1) * cap :, :] - shift_vec
            right = a[:, :, :cap, :] + shift_vec
            parts = [left, a, right]
            if HX > 1:
                parts = [pad] + parts + [pad]
            return jnp.concatenate(parts, axis=2)

        gj = with_xhalo(g)  # [nzl, ny, Wj_lanes, 4]
        # z halo: send top row up, bottom row down; apply the global
        # periodic z shift on the wrapping link
        Lz = cfg.box[2]
        zshift = jnp.zeros((P,), dtype).at[2].set(Lz)
        perm_up = [(i, (i + 1) % Pn) for i in range(Pn)]
        perm_dn = [(i, (i - 1) % Pn) for i in range(Pn)]
        halo_below = jax.lax.ppermute(gj[-1:], AXIS, perm_up)  # from rank-1
        halo_above = jax.lax.ppermute(gj[:1], AXIS, perm_dn)  # from rank+1
        halo_below = jnp.where(
            (rank == 0) & (halo_below[..., 3:4] > 0.5), halo_below - zshift, halo_below
        )
        halo_above = jnp.where(
            (rank == Pn - 1) & (halo_above[..., 3:4] > 0.5),
            halo_above + zshift,
            halo_above,
        )
        r_j = jnp.moveaxis(
            jnp.concatenate([halo_below, gj, halo_above], axis=0), -1, 2
        )  # [nzl+2, ny, 4, Wj]
        r_i = jnp.moveaxis(g, -1, 2)
        return r_i, r_j, bins

    def _local_views_ms_packed(self, mol: MoleculeState,
                               z_edges: jnp.ndarray):
        """Packed-row kernel views for the multi-site slab path: bin
        locally, ppermute RAW dense z rows (global-z shift applied on
        the wrapping link), then compact every row -- local and halo
        alike -- with pack_dense_rows (the packing derives from the
        validity plane, so exchanged rows pack exactly like local
        ones)."""
        from ls1_mardyn_tpu.ops.pallas_ms_packed import (
            JW,
            TI,
            pack_dense_rows,
        )

        cfg = self.cfg
        spec = cfg.local_spec
        rank = self._rank()
        Pn = cfg.n_devices
        dtype = mol.r.dtype
        nx, ny, nzl, cap = cfg.nx, cfg.ny, cfg.nz_local, cfg.cap
        local_edges = jax.lax.dynamic_slice(
            z_edges, (rank * nzl,), (nzl + 1,)
        ).astype(dtype)
        clx = jnp.asarray(cfg.box[0] / nx, dtype)
        cly = jnp.asarray(cfg.box[1] / ny, dtype)
        cx = jnp.clip(
            jnp.floor(mol.r[:, 0] / clx).astype(jnp.int32), 0, nx - 1
        )
        cy = jnp.clip(
            jnp.floor(mol.r[:, 1] / cly).astype(jnp.int32), 0, ny - 1
        )
        cz = jnp.clip(
            jnp.searchsorted(
                local_edges[1:-1], mol.r[:, 2], side="right"
            ).astype(jnp.int32),
            0, nzl - 1,
        )
        from ls1_mardyn_tpu.ops.cells import bin_by_id

        cell = (cz * ny + cy) * nx + cx
        bins = bin_by_id(cell, mol.valid, spec)
        W = nx * cap
        idx = bins.slots.reshape(nzl, ny, W)
        safe = jnp.clip(idx, 0, mol.capacity - 1)
        ok = (idx >= 0) & mol.valid[safe]
        # THIN primary planes only (r, valid, cid, q) ride the slot
        # gather and the halo exchange; site-offset planes are rotated
        # after compaction in packed order (site_planes_packed --
        # bit-identical math, ~2.7x less gather+ppermute traffic).
        # One spare plane carries the packed kernel's cell index;
        # trailing dead dipole/quad plane blocks are truncated
        # (live_plane_count).
        from ls1_mardyn_tpu.ops.pallas_ms_packed import live_plane_count

        meta = cfg.ms_meta
        p_used = live_plane_count(meta)
        Pb = -(-(p_used + 1) // 8) * 8
        thin = jnp.concatenate(
            [mol.r, mol.valid.astype(dtype)[:, None],
             mol.cid.astype(dtype)[:, None], mol.q], axis=1)  # [N, 9]
        g = jnp.where(ok[..., None], thin[safe], 0.0)  # [nzl,ny,W,9]

        # raw z-halo rows (global periodic shift on the wrapping link)
        Lz = cfg.box[2]
        zshift = jnp.zeros((9,), dtype).at[2].set(Lz)
        perm_up = [(i, (i + 1) % Pn) for i in range(Pn)]
        perm_dn = [(i, (i - 1) % Pn) for i in range(Pn)]
        halo_below = jax.lax.ppermute(g[-1:], AXIS, perm_up)
        halo_above = jax.lax.ppermute(g[:1], AXIS, perm_dn)
        halo_below = jnp.where(
            (rank == 0) & (halo_below[..., 3:4] > 0.5),
            halo_below - zshift, halo_below,
        )
        halo_above = jnp.where(
            (rank == Pn - 1) & (halo_above[..., 3:4] > 0.5),
            halo_above + zshift, halo_above,
        )
        g_all = jnp.concatenate([halo_below, g, halo_above], axis=0)

        Wp = -(-W // TI) * TI
        # head-halo j layout: [2*cap halo head | Wp packed row]
        Wjp = -(-(2 * cap + Wp) // JW) * JW
        R = (nzl + 2) * ny
        from functools import partial

        from ls1_mardyn_tpu.ops.pallas_ms_packed import (
            site_planes_packed,
        )

        gi_all, gj_all, tbl, prefix = pack_dense_rows(
            g_all.reshape(R, W, 9), nx, cap, float(cfg.box[0]),
            p_used, Wp, Wjp,
            expand=partial(site_planes_packed, meta, p_used), Pb=Pb,
        )
        r_i = jnp.moveaxis(
            gi_all.reshape(nzl + 2, ny, Wp, Pb)[1:-1], -1, 2)
        r_j = jnp.moveaxis(gj_all.reshape(nzl + 2, ny, Wjp, Pb), -1, 2)
        tbl = tbl.reshape(nzl + 2, ny, nx + 3)
        prefix_local = prefix.reshape(nzl + 2, ny, nx)[1:-1]
        return r_i, r_j, tbl, prefix_local, Wp, p_used, bins

    def _local_views_cw(self, mol: MoleculeState, z_edges: jnp.ndarray):
        """Cell-LOCAL kernel views for the cell-window 1CLJ path.

        Same binning as _local_views, but coordinates are stored
        relative to their cell's origin: the f32 representation keeps
        ~1e-7 absolute precision regardless of box size, and ALL halo
        copies (x wrap and the ppermuted z boundary planes, including
        the periodic z link) are plain copies -- cell-local
        periodicity is exact integer cell arithmetic, so the +-L
        shifts of the absolute-coordinate path (and their f32
        rounding) disappear.  Requires uniform z rows (the kernel's
        fixed clz offsets); the caller guarantees that by only
        selecting this path when no non-uniform edge table is in
        play."""
        cfg = self.cfg
        spec = cfg.local_spec
        rank = self._rank()
        Pn = cfg.n_devices
        dtype = mol.r.dtype
        nx, ny, nzl, cap = cfg.nx, cfg.ny, cfg.nz_local, cfg.cap
        clx = jnp.asarray(cfg.box[0] / nx, dtype)
        cly = jnp.asarray(cfg.box[1] / ny, dtype)
        clz = jnp.asarray(cfg.box[2] / (Pn * nzl), dtype)
        cx = jnp.clip(
            jnp.floor(mol.r[:, 0] / clx).astype(jnp.int32), 0, nx - 1
        )
        cy = jnp.clip(
            jnp.floor(mol.r[:, 1] / cly).astype(jnp.int32), 0, ny - 1
        )
        # uniform rows: the device's z origin is rank * nzl * clz
        z0 = rank.astype(dtype) * nzl * clz
        cz = jnp.clip(
            jnp.floor((mol.r[:, 2] - z0) / clz).astype(jnp.int32),
            0, nzl - 1,
        )
        from ls1_mardyn_tpu.ops.cells import bin_by_id

        cell = (cz * ny + cy) * nx + cx
        bins = bin_by_id(cell, mol.valid, spec)
        idx = bins.slots.reshape(nzl, ny, nx * cap)
        safe = jnp.clip(idx, 0, mol.capacity - 1)
        ok = (idx >= 0) & mol.valid[safe]
        pack = self._pack_planes(mol)
        P4 = pack.shape[1]
        g = jnp.where(ok[..., None], pack[safe], 0.0)
        # absolute -> cell-local: subtract each slot's cell origin
        # (invalid slots keep garbage locals; the kernel masks them via
        # the validity plane)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (nx * cap,), 0)
        ox = (lanes // cap).astype(dtype) * clx          # [lanes]
        oy = jnp.arange(ny, dtype=dtype) * cly           # [ny]
        oz = z0 + jnp.arange(nzl, dtype=dtype) * clz     # [nzl]
        origin = (
            jnp.zeros((nzl, ny, nx * cap, P4), dtype)
            .at[:, :, :, 0].set(ox[None, None, :])
            .at[:, :, :, 1].set(oy[None, :, None])
            .at[:, :, :, 2].set(oz[:, None, None])
        )
        g = g - jnp.where(ok[..., None], origin, 0.0)

        # x halo: 1 left + 3 right periodic cells, PLAIN copies
        gj = jnp.concatenate(
            [g[:, :, (nx - 1) * cap :, :], g, g[:, :, : 3 * cap, :]],
            axis=2,
        )
        # z halo: plain copies from the neighbors (no periodic shift)
        perm_up = [(i, (i + 1) % Pn) for i in range(Pn)]
        perm_dn = [(i, (i - 1) % Pn) for i in range(Pn)]
        halo_below = jax.lax.ppermute(gj[-1:], AXIS, perm_up)
        halo_above = jax.lax.ppermute(gj[:1], AXIS, perm_dn)
        r_j = jnp.moveaxis(
            jnp.concatenate([halo_below, gj, halo_above], axis=0), -1, 2
        )  # [nzl+2, ny, 4, (nx+4)*cap]
        r_i = jnp.moveaxis(g, -1, 2)
        return r_i, r_j, bins

    def _device_forces(
        self, mol: MoleculeState, z_edges: jnp.ndarray, use_cw=False
    ):
        """Returns (F, M, macro_partials(u6, uX, myRF, vir), overflow)."""
        cfg = self.cfg
        dtype = mol.r.dtype
        zero = jnp.zeros((), dtype)
        if cfg.ms_meta is None and use_cw:
            r_i, r_j, bins = self._local_views_cw(mol, z_edges)
            f, u6, vir = lj_cell_forces_pallas_cw(
                r_i,
                r_j,
                nx=cfg.nx,
                ny=cfg.ny,
                nz=cfg.nz_local,
                cap=cfg.cap,
                tx=cfg.tx,
                # the kernel derives cell edges from box/dims: pass the
                # LOCAL slab height so clz is the global cell height
                box=(cfg.box[0], cfg.box[1], cfg.box[2] / cfg.n_devices),
                eps24=cfg.eps24,
                sig2=cfg.sig2,
                shift6=cfg.shift6,
                rc2=cfg.rc2,
                interpret=cfg.interpret,
                z_halo=True,
                compute_macro=True,
                sentinel=False,
                fast_recip=not cfg.interpret,
                compute_vi=cfg.compute_vi,
            )
            fxyz = jnp.moveaxis(f[:, :, :3, :], 2, -1).reshape(-1, 3)
            src = jnp.clip(bins.slot_of, 0, fxyz.shape[0] - 1)
            F = jnp.where(mol.valid[:, None], fxyz[src], 0.0)
            if cfg.compute_vi:
                # planes 4:7 carry per-slot Vi (see _lj_cw_kernel)
                vxyz = jnp.moveaxis(f[:, :, 4:7, :], 2, -1).reshape(-1, 3)
                Vi = jnp.where(mol.valid[:, None], vxyz[src], 0.0)
            else:
                # scalar virial only (the default: Vi costs +3
                # FMA/pair-lane); Vi-consuming plugins flip
                # cfg.compute_vi at construction, anything else is
                # warned by the driver facade
                Vi = jnp.zeros_like(F)
            M = jnp.zeros_like(F)
            uX = zero
            for fn in self.extra_force_fns:
                u_x, F_x, M_x = fn(mol, self.pp)
                F = F + F_x
                M = M + M_x
                uX = uX + u_x
            return F, M, Vi, (u6, uX, zero, vir), bins.overflow
        if cfg.ms_meta is not None and cfg.ms_packed:
            return self._forces_ms_packed(mol, z_edges, zero)
        r_i, r_j, bins = self._local_views(mol, z_edges)
        if cfg.ms_meta is None:
            f, u6, vir = lj_cell_forces_pallas(
                r_i,
                r_j,
                nx=cfg.nx,
                ny=cfg.ny,
                nz=cfg.nz_local,
                cap=cfg.cap,
                tx=cfg.tx,
                box=cfg.box,
                eps24=cfg.eps24,
                sig2=cfg.sig2,
                shift6=cfg.shift6,
                rc2=cfg.rc2,
                interpret=cfg.interpret,
                z_halo=True,
                jt=True,
            )
            fxyz = jnp.moveaxis(f[:, :, :3, :], 2, -1).reshape(-1, 3)
            src = jnp.clip(bins.slot_of, 0, fxyz.shape[0] - 1)
            F = jnp.where(mol.valid[:, None], fxyz[src], 0.0)
            M = jnp.zeros_like(F)
            uX = zero
            for fn in self.extra_force_fns:
                u_x, F_x, M_x = fn(mol, self.pp)
                F = F + F_x
                M = M + M_x
                uX = uX + u_x
            return F, M, jnp.zeros_like(F), (u6, uX, zero, vir), bins.overflow
        from ls1_mardyn_tpu.ops.pallas_multisite import (
            multisite_cell_forces_pallas,
        )

        out, u6, uX, my_rf = multisite_cell_forces_pallas(
            r_i,
            r_j,
            nx=cfg.nx,
            ny=cfg.ny,
            nz=cfg.nz_local,
            cap=cfg.cap,
            tx=cfg.tx,
            box=cfg.box,
            rc2=cfg.rc2,
            rc2_lj=cfg.rc2_lj or cfg.rc2,
            screen_alpha=cfg.screen_alpha,
            meta=cfg.ms_meta,
            interpret=cfg.interpret,
            z_halo=True,
        )
        flat = jnp.moveaxis(out, 2, -1).reshape(-1, out.shape[2])
        src = jnp.clip(bins.slot_of, 0, flat.shape[0] - 1)
        got = jnp.where(mol.valid[:, None], flat[src], 0.0)
        vir = jnp.sum(out[:, :, 6:9, :])
        F, M = got[:, 0:3], got[:, 3:6]
        # per-molecule per-axis virial (FullMolecule::Vi): the kernel
        # already accumulates it in planes 6:9; gathering it out makes
        # GammaWriter/pressure-profile plugins exact under --parallel
        # (src/io/GammaWriter.cpp reads _Vi per molecule)
        Vi = got[:, 6:9]
        if self._fmm is not None:
            u_f, F_f, M_f = self._fmm.sharded(
                mol, self.pp, AXIS, cfg.n_devices
            )
            F = F + F_f
            M = M + M_f
            uX = uX + u_f
        elif self._pme is not None:
            u_ew, F_ew, M_ew = self._pme(
                mol,
                self.pp,
                psum=lambda t: jax.lax.psum(t, AXIS),
                global_share=1.0 / cfg.n_devices,
            )
            F = F + F_ew
            M = M + M_ew
            uX = uX + u_ew
        elif self._ewald_k is not None:
            from ls1_mardyn_tpu.ops.ewald import reciprocal_energy_forces

            kvec, coeff = self._ewald_k
            u_ew, F_ew, M_ew = reciprocal_energy_forces(
                mol,
                self.pp,
                kvec.astype(dtype),
                coeff.astype(dtype),
                cfg.ewald_alpha,
                psum=lambda t: jax.lax.psum(t, AXIS),
                global_share=1.0 / cfg.n_devices,
            )
            F = F + F_ew
            M = M + M_ew
            uX = uX + u_ew
        for fn in self.extra_force_fns:
            u_x, F_x, M_x = fn(mol, self.pp)
            F = F + F_x
            M = M + M_x
            uX = uX + u_x
        return F, M, Vi, (u6, uX, my_rf, vir), bins.overflow

    def _forces_ms_packed(self, mol: MoleculeState, z_edges, zero):
        """Multi-site pair forces through the occupancy-packed kernel
        (ops/pallas_ms_packed, z_halo mode) -- the sharded twin of the
        single-chip PallasMultiSitePackedPath, 2x the dense row kernel
        on the CO2 class."""
        from ls1_mardyn_tpu.ops.pallas_ms_packed import (
            multisite_cell_forces_packed,
        )

        cfg = self.cfg
        dtype = mol.r.dtype
        nx, ny, nzl, cap = cfg.nx, cfg.ny, cfg.nz_local, cfg.cap
        (r_i, r_j, tbl, prefix_local, Wp, cell_plane,
         bins) = self._local_views_ms_packed(mol, z_edges)
        Wjp = r_j.shape[-1]
        out, u6, uX, my_rf = multisite_cell_forces_packed(
            tbl,
            r_i,
            r_j,
            nx=nx,
            ny=ny,
            nz=nzl,
            cap=cap,
            Wp=Wp,
            Wjp=Wjp,
            cell_plane=cell_plane,
            box=cfg.box,
            rc2=cfg.rc2,
            rc2_lj=cfg.rc2_lj or cfg.rc2,
            screen_alpha=cfg.screen_alpha,
            meta=cfg.ms_meta,
            z_halo=True,
            interpret=cfg.interpret,
        )
        # unpack: molecule's packed position = prefix[row, x] + rank
        flat = jnp.moveaxis(out, 2, -1).reshape(-1, out.shape[2])
        slot_of = bins.slot_of
        cell = jnp.minimum(slot_of // cap, nzl * ny * nx - 1)
        rank = slot_of % cap
        rowf = cell // nx
        x = cell % nx
        ppos = prefix_local.reshape(-1, nx)[
            jnp.clip(rowf, 0, nzl * ny - 1),
            jnp.clip(x, 0, nx - 1),
        ] + rank
        src = jnp.clip(rowf * Wp + ppos, 0, flat.shape[0] - 1)
        got = jnp.where(mol.valid[:, None], flat[src], 0.0)
        vir = jnp.sum(out[:, :, 6:9, :])
        F, M, Vi = got[:, 0:3], got[:, 3:6], got[:, 6:9]
        if self._fmm is not None:
            u_f, F_f, M_f = self._fmm.sharded(
                mol, self.pp, AXIS, cfg.n_devices
            )
            F = F + F_f
            M = M + M_f
            uX = uX + u_f
        elif self._pme is not None:
            u_ew, F_ew, M_ew = self._pme(
                mol,
                self.pp,
                psum=lambda t: jax.lax.psum(t, AXIS),
                global_share=1.0 / cfg.n_devices,
            )
            F = F + F_ew
            M = M + M_ew
            uX = uX + u_ew
        elif self._ewald_k is not None:
            from ls1_mardyn_tpu.ops.ewald import reciprocal_energy_forces

            kvec, coeff = self._ewald_k
            u_ew, F_ew, M_ew = reciprocal_energy_forces(
                mol,
                self.pp,
                kvec.astype(dtype),
                coeff.astype(dtype),
                cfg.ewald_alpha,
                psum=lambda t: jax.lax.psum(t, AXIS),
                global_share=1.0 / cfg.n_devices,
            )
            F = F + F_ew
            M = M + M_ew
            uX = uX + u_ew
        for fn in self.extra_force_fns:
            u_x, F_x, M_x = fn(mol, self.pp)
            F = F + F_x
            M = M + M_x
            uX = uX + u_x
        return F, M, Vi, (u6, uX, my_rf, vir), bins.overflow

    def _device_forces_entry(
        self, mol: MoleculeState, z_edges: jnp.ndarray, use_cw=False
    ):
        F, M, Vi, (u6, uX, my_rf, vir), _ovf = self._device_forces(
            mol, z_edges, use_cw=use_cw
        )
        u6g, uXg, rfg, virg = jax.lax.psum(
            jnp.stack([u6, uX, my_rf, vir]), AXIS
        )
        return (F, M, Vi), u6g, uXg, rfg, virg

    def _device_step(
        self, mol: MoleculeState, aux,
        z_edges: jnp.ndarray, step: jnp.ndarray, use_cw=False
    ):
        """aux: dict(F, M, rcomp, vcomp) -- previous forces plus the
        Kahan compensation state of the compensated f32 integration
        (the multi-chip answer to the reference's SPDP mixed-precision
        mode, SIMD_TYPES.h:110-113; the single-chip RMM path uses
        cell-local coordinates instead)."""
        cfg = self.cfg
        from ls1_mardyn_tpu.state import Forces
        from ls1_mardyn_tpu.ops.cells import wrap_positions

        dtype = mol.r.dtype
        nzl = cfg.nz_local
        dev_bounds = z_edges[
            jnp.arange(cfg.n_devices + 1, dtype=jnp.int32) * nzl
        ]
        F_prev, M_prev = aux["F"], aux["M"]
        rcomp, vcomp = aux["rcomp"], aux["vcomp"]
        zeros3 = jnp.zeros_like(F_prev)
        forces_prev = Forces(F=F_prev, M=M_prev, Vi=zeros3)
        mol, rcomp, vcomp = upd_pre_force_kahan(
            mol, forces_prev, self.pp, cfg.dt, rcomp, vcomp
        )
        wrapped = wrap_positions(mol.r, cfg.box)
        # a periodic wrap shifts r by ~L; the compensation no longer
        # matches the new representation -- reset it there (rare event
        # per molecule, ulp-level effect)
        rcomp = jnp.where(wrapped == mol.r, rcomp, 0.0)
        mol = dataclasses.replace(mol, r=wrapped)
        mol, mig_overflow, rcomp, vcomp = self._migrate(
            mol, dev_bounds, rcomp, vcomp
        )
        F, M, Vi, (u6, uX, my_rf, vir), bin_overflow = self._device_forces(
            mol, z_edges, use_cw=use_cw
        )
        forces = Forces(F=F, M=M, Vi=zeros3)
        mol, mv2, iw2, vcomp = upd_post_force_kahan(
            mol, forces, self.pp, cfg.dt, vcomp
        )

        # one fused psum: (u6, vir, summv2, sumIw2, N, rotDOF) --
        # the agglomerated CollectiveCommunication analogue
        nloc = jnp.sum(mol.valid).astype(dtype)
        rdof = jnp.sum(
            jnp.where(mol.valid, self.pp.rot_dof[mol.cid], 0)
        ).astype(dtype)
        packed = jnp.stack(
            [u6, uX, my_rf, vir, jnp.sum(mv2), jnp.sum(iw2), nloc, rdof]
        )
        u6g, uXg, rfg, virg, summv2, sumiw2, ng, rdofg = jax.lax.psum(
            packed, AXIS
        )

        # replicated global macro -- returned to the driver so
        # engine.macro has single-chip parity under --parallel
        macro_g = Macroscopic(
            upot6lj=u6g,
            upot_xpoles=uXg + cfg.upot_corr,
            virial=virg + cfg.virial_corr,
            my_rf=rfg,
        )
        gv = calculate_global_values(
            macro_g,
            summv2,
            sumiw2,
            ng,
            rdofg,
            self.volume,
            cfg.target_temperature,
            nve=not cfg.thermostat,
        )
        if cfg.thermostat and cfg.target_temperature > 0:
            mol = apply_velocity_scaling(mol, gv.beta_trans, gv.beta_rot)
            vcomp = vcomp * gv.beta_trans
        if cfg.temp_control_regions:
            from ls1_mardyn_tpu.ops.thermostat import (
                apply_temperature_control,
            )

            mol = apply_temperature_control(
                mol, self.pp, cfg.temp_control_regions, step,
                psum=lambda t: jax.lax.psum(t, AXIS),
            )
        overflow = (
            jax.lax.psum(
                (mig_overflow | bin_overflow).astype(jnp.int32), AXIS
            )
            > 0
        )
        # per-device molecule count rides out sharded ([P] globally):
        # the driver's load balancer reads it with the other globals
        # (the MeasureLoad signal, src/parallel/LoadCalc.h:227)
        aux_out = dict(F=F, M=M, Vi=Vi, rcomp=rcomp, vcomp=vcomp)
        return mol, aux_out, gv, macro_g, overflow, nloc.reshape(1)
