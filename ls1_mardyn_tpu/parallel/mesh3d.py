"""3-D Cartesian domain decomposition over a (Px, Py, Pz) device mesh.

The TPU-native equivalent of the reference's static Cartesian process
grid (/root/reference/src/parallel/DomainDecomposition.{h,cpp}:
MPIGridDims + MPI_Cart coordinates) combined with the 3-stage
dimension-wise exchange of IndirectNeighbourCommunicationScheme
(src/parallel/NeighbourCommunicationScheme.h:172: exchange x, then y,
then z; diagonal movers ride consecutive stages, so only 6 neighbor
links are needed instead of 26 -- exactly 3 ppermute rings on the ICI
mesh axes).

Per device: a local cell block [nxl, nyl, nzl] of the global cell grid.
  - LEAVING molecules: three sequential ppermute stages (x, y, z); each
    stage routes by the owner coordinate in that dimension only.
  - HALO copies: x halo cells are lanes of the j view -> edge cell
    columns are ppermuted along the x axis; y and z halos are explicit
    rows ppermuted along their axes (y_halo/z_halo kernel modes).  The
    y/z halo rows are exchanged AFTER the x halo is attached, so the
    corner/edge cells arrive transitively (the reference's "diagonal
    forwarding" in the indirect scheme).
  - global values: one fused psum over all three axes (agglomerated
    CollectiveCommunication, src/parallel/CollectiveCommunication.h).

Full-shell zonal method (ZonalMethods/FullShell.h): every pair is
computed on the owner of i, no force back-exchange.
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
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles, wrap_positions
from ls1_mardyn_tpu.ops.globals import calculate_global_values
from ls1_mardyn_tpu.ops.integrator import upd_post_force, upd_pre_force
from ls1_mardyn_tpu.ops.pallas_lj import HX, lj_cell_forces_pallas
from ls1_mardyn_tpu.ops.thermostat import apply_velocity_scaling
from ls1_mardyn_tpu.parallel.decomposition import (
    _pack_payload,
    _unpack_payload,
)
from ls1_mardyn_tpu.state import Macroscopic, MoleculeState

AX = ("ddx", "ddy", "ddz")


@dataclasses.dataclass(frozen=True)
class Mesh3DConfig:
    """Static 3-D decomposition configuration.

    grid: (Px, Py, Pz) device grid (MPIGridDims analogue).
    local cells: (nxl, nyl, nzl) per device; global cell grid is
    (Px*nxl, Py*nyl, Pz*nzl)."""

    grid: Tuple[int, int, int]
    nxl: int
    nyl: int
    nzl: int
    cap: int
    box: Tuple[float, float, float]
    n_local_cap: int
    migrate_cap: int
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
    ms_meta: object = None
    rc2_lj: float = 0.0
    screen_alpha: float = 0.0
    # long-range electrostatics k-space (sharded over molecules; the
    # structure factor / charge mesh merges with one psum over all
    # three mesh axes).  pme_grid non-empty selects SPME; otherwise
    # ewald_kmax > 0 selects the direct sum.
    ewald_kmax: int = 0
    ewald_alpha: float = 0.0
    pme_grid: Tuple[int, ...] = ()
    pme_order: int = 4
    # region thermostats (src/thermostats/TemperatureControl.{h,cpp});
    # applied with a psum over all three mesh axes -- region bounds are
    # GLOBAL coordinates, decomposition-independent
    # (DomainDecompBase.h:51 interchangeability)
    temp_control_regions: Tuple = ()

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.grid))

    @property
    def local_box(self) -> Tuple[float, float, float]:
        return (
            self.box[0] / self.grid[0],
            self.box[1] / self.grid[1],
            self.box[2] / self.grid[2],
        )

    @property
    def local_spec(self) -> CellGridSpec:
        return CellGridSpec(
            dims=(self.nxl, self.nyl, self.nzl),
            box=self.local_box,
            cap=self.cap,
        )


class Mesh3DSimulation:
    """Multi-chip driver over a 3-D mesh; same API as SlabSimulation."""

    def __init__(
        self,
        cfg: Mesh3DConfig,
        pp: PairParams,
        mesh: Optional[Mesh] = None,
        extra_force_fns: Tuple = (),
        fmm=None,
    ):
        self.cfg = cfg
        self.pp = pp
        # siteWiseForces plugin contributions, per device on local
        # molecules (see SlabSimulation)
        self.extra_force_fns = tuple(extra_force_fns)
        # sharded solid-harmonics FMM (owns ALL Coulomb when set; the
        # pair kernel then runs LJ-only on the charge-stripped table)
        self._fmm = fmm
        if mesh is None:
            devs = np.array(jax.devices()[: cfg.n_devices]).reshape(cfg.grid)
            mesh = Mesh(devs, AX)
        for a, g in zip(AX, cfg.grid):
            assert mesh.shape[a] == g, (mesh.shape, cfg.grid)
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
        flat = P((AX[0], AX[1], AX[2]))
        self._in_spec = flat
        # dynamic per-axis device bounds (the KDDecomposition /
        # GeneralDomainDecomposition+ALL "TENSOR" role at DEVICE
        # granularity: the device layer k along axis d owns coordinates
        # in [b_d[k], b_d[k+1]); cells inside a layer stay uniform with
        # pitch (b[k+1]-b[k])/n?l >= rc so the +-1-row halo remains
        # valid; the kernel computes pair distances from absolute
        # coordinates, so non-uniform pitch is physically exact).
        # All three bounds arrays are replicated DYNAMIC step
        # arguments -- moving any edge never recompiles.
        self.xb_host = np.linspace(
            0.0, cfg.box[0], cfg.grid[0] + 1
        ).astype(np.float32)
        self.yb_host = np.linspace(
            0.0, cfg.box[1], cfg.grid[1] + 1
        ).astype(np.float32)
        self.zb_host = np.linspace(
            0.0, cfg.box[2], cfg.grid[2] + 1
        ).astype(np.float32)
        self._step_sharded = jax.jit(
            jax.shard_map(
                self._device_step,
                mesh=self.mesh,
                in_specs=(flat, flat, P(), (P(), P(), P())),
                out_specs=(flat, flat, P(), P(), P(), flat),
                check_vma=False,
            )
        )
        self._force_sharded_b = jax.jit(
            jax.shard_map(
                self._device_forces_entry,
                mesh=self.mesh,
                in_specs=(flat, (P(), P(), P())),
                out_specs=(flat, P(), P()),
                check_vma=False,
            )
        )

    @property
    def _bounds_default(self):
        return (
            jnp.asarray(self.xb_host),
            jnp.asarray(self.yb_host),
            jnp.asarray(self.zb_host),
        )

    # kept for callers that adjust z bounds only (z-layer balancing
    # tests / older call sites)
    @property
    def _zb_default(self):
        return jnp.asarray(self.zb_host)

    def _as_bounds(self, b):
        """Accept None, a bare zb array (legacy), or an (xb, yb, zb)
        tuple."""
        if b is None:
            return self._bounds_default
        if isinstance(b, tuple):
            return b
        return (
            jnp.asarray(self.xb_host), jnp.asarray(self.yb_host),
            jnp.asarray(b),
        )

    def _force_sharded(self, mol, bounds=None):
        return self._force_sharded_b(mol, self._as_bounds(bounds))

    # -- host-side scene distribution --------------------------------------
    def _owner3(self, r: np.ndarray) -> np.ndarray:
        """Device-layer ownership follows the CURRENT dynamic per-axis
        bounds."""
        cfg = self.cfg
        hosts = (self.xb_host, self.yb_host, self.zb_host)
        return np.stack(
            [
                np.clip(
                    np.searchsorted(hosts[d][1:-1], r[:, d], side="right"),
                    0, cfg.grid[d] - 1,
                )
                for d in range(3)
            ],
            axis=1,
        )

    def distribute(self, mol_global: MoleculeState, extras=None):
        """Split a global state into per-device blocks stacked on the
        leading axis in mesh-linear order (x-major to match the device
        mesh reshape).

        extras: optional tuple of [capacity, ...] arrays (e.g. forces)
        permuted identically and returned alongside."""
        cfg = self.cfg
        o = self._owner3(np.asarray(mol_global.r))
        lin = (o[:, 0] * cfg.grid[1] + o[:, 1]) * cfg.grid[2] + o[:, 2]
        valid = np.asarray(mol_global.valid)
        parts = []
        extra_parts = [[] for _ in (extras or ())]
        for p in range(cfg.n_devices):
            sel = np.where((lin == p) & valid)[0]
            if len(sel) > cfg.n_local_cap:
                raise ValueError(
                    f"device {p}: {len(sel)} molecules > capacity"
                    f" {cfg.n_local_cap}"
                )
            pad = cfg.n_local_cap - len(sel)
            take = lambda a: np.concatenate(
                [
                    np.asarray(a)[sel],
                    np.zeros((pad,) + np.asarray(a).shape[1:],
                             np.asarray(a).dtype),
                ]
            )
            q = take(mol_global.q)
            q[len(sel):, 0] = 1.0
            parts.append(
                dict(
                    r=take(mol_global.r), v=take(mol_global.v), q=q,
                    L=take(mol_global.L), cid=take(mol_global.cid),
                    mid=take(mol_global.mid),
                    valid=np.concatenate(
                        [np.ones(len(sel), bool), np.zeros(pad, bool)]
                    ),
                )
            )
            for i, e in enumerate(extras or ()):
                extra_parts[i].append(take(e))
        stacked = {k: np.concatenate([pt[k] for pt in parts]) for k in parts[0]}
        dtype = mol_global.r.dtype
        sh = NamedSharding(self.mesh, self._in_spec)
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
        return jax.tree.map(lambda a: np.asarray(a), mol)

    def snapshot(self, mol: MoleculeState, time: float = 0.0) -> dict:
        """In-memory snapshot (InMemoryCheckpointing/ResilienceComm
        capability; same contract as SlabSimulation.snapshot)."""
        return {
            "mol": jax.tree.map(lambda a: np.array(a), mol),
            "time": float(time),
        }

    def restore(self, snap: dict) -> MoleculeState:
        sh = NamedSharding(self.mesh, self._in_spec)
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
        MPICheckpointWriter capability; same as SlabSimulation)."""
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

    # -- per-device bodies --------------------------------------------------
    def _coords(self):
        return tuple(jax.lax.axis_index(a) for a in AX)

    def _migrate(self, mol: MoleculeState, bounds):
        """Three sequential dimension-wise leaving-molecule exchanges
        (IndirectNeighbourCommunicationScheme: x, then y, then z).
        Ownership along every axis follows its dynamic layer bounds."""
        cfg = self.cfg
        overflow = jnp.zeros((), jnp.bool_)
        for d, axname in enumerate(AX):
            Pn = cfg.grid[d]
            if Pn == 1:
                continue
            me = jax.lax.axis_index(axname)
            owner = jnp.clip(
                jnp.searchsorted(
                    bounds[d][1:-1].astype(mol.r.dtype), mol.r[:, d],
                    side="right",
                ).astype(jnp.int32),
                0, Pn - 1,
            )
            dd = jnp.mod(owner - me, Pn)
            go_up = mol.valid & (dd == 1)
            go_down = mol.valid & (dd == Pn - 1) & ~go_up
            too_far = mol.valid & (dd != 0) & ~go_up & ~go_down

            def pick(leave):
                ordr = jnp.argsort(~leave)[: cfg.migrate_cap].astype(jnp.int32)
                return ordr, leave[ordr]

            up_idx, up_ok = pick(go_up)
            dn_idx, dn_ok = pick(go_down)
            overflow = overflow | (
                (jnp.sum(go_up) > cfg.migrate_cap)
                | (jnp.sum(go_down) > cfg.migrate_cap)
                | jnp.any(too_far)
            )
            buf_up = _pack_payload(mol, up_idx, up_ok)
            buf_dn = _pack_payload(mol, dn_idx, dn_ok)
            perm_up = [(i, (i + 1) % Pn) for i in range(Pn)]
            perm_dn = [(i, (i - 1) % Pn) for i in range(Pn)]
            rx_below = jax.lax.ppermute(buf_up, axname, perm_up)
            rx_above = jax.lax.ppermute(buf_dn, axname, perm_dn)
            # drop only SENT leavers: the overflow tail beyond
            # migrate_cap stays valid locally until the driver's
            # lossless re-spec (same fix as the slab _migrate -- a
            # boundary-aligned plane crossing in one step must not
            # silently delete molecules)
            sent = jnp.zeros(mol.valid.shape, bool)
            sent = sent.at[up_idx].max(up_ok)
            sent = sent.at[dn_idx].max(dn_ok)
            keep = mol.valid & ~sent
            rr, rv, rq, rL, rcid, rmid, rvalid, _rc, _vc = _unpack_payload(
                jnp.concatenate([rx_below, rx_above], axis=0)
            )
            cat = lambda a, b: jnp.concatenate([a, b], axis=0)
            r = cat(mol.r, rr)
            v = cat(mol.v, rv)
            q = cat(mol.q, rq)
            L = cat(mol.L, rL)
            cid = cat(mol.cid, rcid)
            mid = cat(mol.mid, rmid)
            valid = cat(keep, rvalid)
            ordr = jnp.argsort(~valid)[: cfg.n_local_cap]
            overflow = overflow | (jnp.sum(valid) > cfg.n_local_cap)
            sel = lambda a: a[ordr]
            mol = MoleculeState(
                r=sel(r), v=sel(v), q=sel(q), L=sel(L),
                cid=sel(cid), mid=sel(mid), valid=sel(valid),
            )
        return mol, overflow

    def _pack_planes(self, mol: MoleculeState) -> jnp.ndarray:
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
            packed = jnp.concatenate(
                [packed, jnp.zeros((n, pad), dtype)], axis=1
            )
        return packed

    def _local_views(self, mol: MoleculeState, bounds):
        """Bin into the local cell block; attach x halo lanes (ppermute
        along ddx), then y halo rows, then z halo rows.  Because y rows
        are exchanged after x lanes are attached (and z after y), the
        edge/corner halos arrive transitively -- the indirect scheme's
        diagonal forwarding.

        ALL axes are DYNAMIC: this device's extent along axis d is
        [b_d[c_d], b_d[c_d+1]) divided into n?l uniform rows (pitch >=
        rc is enforced by the min-extent constraint on the balanced
        bounds), so a tensor-mesh rebalance along any axis never
        recompiles."""
        cfg = self.cfg
        spec = cfg.local_spec
        cx, cy, cz = self._coords()
        gx, gy, gz = cfg.grid
        dtype = mol.r.dtype
        nxl, nyl, nzl, cap = cfg.nxl, cfg.nyl, cfg.nzl, cfg.cap

        def lo_pitch(d, c, nl):
            bd = bounds[d].astype(dtype)
            lo = jax.lax.dynamic_index_in_dim(bd, c, keepdims=False)
            hi = jax.lax.dynamic_index_in_dim(bd, c + 1, keepdims=False)
            return lo, (hi - lo) / nl

        x_lo, pitch_x = lo_pitch(0, cx, nxl)
        y_lo, pitch_y = lo_pitch(1, cy, nyl)
        z_lo, pitch_z = lo_pitch(2, cz, nzl)
        from ls1_mardyn_tpu.ops.cells import bin_by_id

        cxg = jnp.clip(
            jnp.floor((mol.r[:, 0] - x_lo) / pitch_x).astype(jnp.int32),
            0, nxl - 1,
        )
        cyg = jnp.clip(
            jnp.floor((mol.r[:, 1] - y_lo) / pitch_y).astype(jnp.int32),
            0, nyl - 1,
        )
        czg = jnp.clip(
            jnp.floor((mol.r[:, 2] - z_lo) / pitch_z).astype(jnp.int32),
            0, nzl - 1,
        )
        cell = (czg * nyl + cyg) * nxl + cxg
        bins = bin_by_id(cell, mol.valid, spec)
        idx = bins.slots.reshape(nzl, nyl, nxl * cap)
        safe = jnp.clip(idx, 0, mol.capacity - 1)
        ok = (idx >= 0) & mol.valid[safe]
        pack = self._pack_planes(mol)
        Pn = pack.shape[1]
        g = jnp.where(ok[..., None], pack[safe], 0.0)  # [nzl, nyl, W, P]

        # x halo lanes: ppermute edge cell columns along ddx (or local
        # wrap when gx == 1)
        sx = jnp.zeros((Pn,), dtype).at[0].set(cfg.box[0])
        left_src = g[:, :, (nxl - 1) * cap:, :]   # my rightmost cell
        right_src = g[:, :, :cap, :]              # my leftmost cell
        if gx > 1:
            perm_up = [(i, (i + 1) % gx) for i in range(gx)]
            perm_dn = [(i, (i - 1) % gx) for i in range(gx)]
            left = jax.lax.ppermute(left_src, AX[0], perm_up)
            right = jax.lax.ppermute(right_src, AX[0], perm_dn)
            wl = left[..., 3:4] > 0.5
            wr = right[..., 3:4] > 0.5
            left = jnp.where((cx == 0) & wl, left - sx, left)
            right = jnp.where((cx == gx - 1) & wr, right + sx, right)
        else:
            left = left_src - sx
            right = right_src + sx
        pad = jnp.zeros(g.shape[:2] + ((HX - 1) * cap, Pn), dtype)
        parts = [left, g, right]
        if HX > 1:
            parts = [pad] + parts + [pad]
        gj = jnp.concatenate(parts, axis=2)  # [nzl, nyl, Wj, P]

        # y halo rows (after x: the x-halo lanes ride along)
        sy = jnp.zeros((Pn,), dtype).at[1].set(cfg.box[1])
        lo_src = gj[:, -1:, :, :]
        hi_src = gj[:, :1, :, :]
        if gy > 1:
            perm_up = [(i, (i + 1) % gy) for i in range(gy)]
            perm_dn = [(i, (i - 1) % gy) for i in range(gy)]
            below = jax.lax.ppermute(lo_src, AX[1], perm_up)
            above = jax.lax.ppermute(hi_src, AX[1], perm_dn)
            wb = below[..., 3:4] > 0.5
            wa = above[..., 3:4] > 0.5
            below = jnp.where((cy == 0) & wb, below - sy, below)
            above = jnp.where((cy == gy - 1) & wa, above + sy, above)
        else:
            below = lo_src - sy
            above = hi_src + sy
        gj = jnp.concatenate([below, gj, above], axis=1)  # [nzl, nyl+2, ...]

        # z halo rows (after y: corner cells ride along)
        sz = jnp.zeros((Pn,), dtype).at[2].set(cfg.box[2])
        lo_src = gj[-1:, :, :, :]
        hi_src = gj[:1, :, :, :]
        if gz > 1:
            perm_up = [(i, (i + 1) % gz) for i in range(gz)]
            perm_dn = [(i, (i - 1) % gz) for i in range(gz)]
            below = jax.lax.ppermute(lo_src, AX[2], perm_up)
            above = jax.lax.ppermute(hi_src, AX[2], perm_dn)
            wb = below[..., 3:4] > 0.5
            wa = above[..., 3:4] > 0.5
            below = jnp.where((cz == 0) & wb, below - sz, below)
            above = jnp.where((cz == gz - 1) & wa, above + sz, above)
        else:
            below = lo_src - sz
            above = hi_src + sz
        gj = jnp.concatenate([below, gj, above], axis=0)  # [nzl+2, nyl+2, ..]

        r_i = jnp.moveaxis(g, -1, 2)
        r_j = jnp.moveaxis(gj, -1, 2)
        return r_i, r_j, bins

    def _device_forces(self, mol: MoleculeState, bounds):
        cfg = self.cfg
        r_i, r_j, bins = self._local_views(mol, bounds)
        dtype = mol.r.dtype
        zero = jnp.zeros((), dtype)
        if cfg.ms_meta is None:
            f, u6, vir = lj_cell_forces_pallas(
                r_i,
                r_j,
                nx=cfg.nxl,
                ny=cfg.nyl,
                nz=cfg.nzl,
                cap=cfg.cap,
                tx=cfg.tx,
                box=cfg.box,
                eps24=cfg.eps24,
                sig2=cfg.sig2,
                shift6=cfg.shift6,
                rc2=cfg.rc2,
                interpret=cfg.interpret,
                z_halo=True,
                y_halo=True,
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
            nx=cfg.nxl,
            ny=cfg.nyl,
            nz=cfg.nzl,
            cap=cfg.cap,
            tx=cfg.tx,
            box=cfg.box,
            rc2=cfg.rc2,
            rc2_lj=cfg.rc2_lj or cfg.rc2,
            screen_alpha=cfg.screen_alpha,
            meta=cfg.ms_meta,
            interpret=cfg.interpret,
            z_halo=True,
            y_halo=True,
        )
        flat = jnp.moveaxis(out, 2, -1).reshape(-1, out.shape[2])
        src = jnp.clip(bins.slot_of, 0, flat.shape[0] - 1)
        got = jnp.where(mol.valid[:, None], flat[src], 0.0)
        vir = jnp.sum(out[:, :, 6:9, :])
        F, M = got[:, 0:3], got[:, 3:6]
        # per-molecule per-axis virial (see SlabSimulation._device_forces)
        Vi = got[:, 6:9]
        if self._fmm is not None:
            ix, iy, iz = (jax.lax.axis_index(a) for a in AX)
            gx, gy, gz = cfg.grid
            rank = (ix * gy + iy) * gz + iz
            u_f, F_f, M_f = self._fmm.sharded(
                mol, self.pp, AX, cfg.n_devices, rank=rank
            )
            F = F + F_f
            M = M + M_f
            uX = uX + u_f
        elif self._pme is not None:
            u_ew, F_ew, M_ew = self._pme(
                mol,
                self.pp,
                psum=self._psum_all,
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
                psum=self._psum_all,
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

    def _psum_all(self, t):
        for a in AX:
            t = jax.lax.psum(t, a)
        return t

    def _device_forces_entry(self, mol: MoleculeState, bounds):
        F, M, Vi, (u6, uX, my_rf, vir), _ovf = self._device_forces(mol, bounds)
        packed = self._psum_all(jnp.stack([u6, uX, my_rf, vir]))
        ovf = self._psum_all(_ovf.astype(jnp.int32))
        return (F, M, Vi), packed, ovf

    def _device_step(self, mol: MoleculeState, F_prev, step, bounds):
        cfg = self.cfg
        from ls1_mardyn_tpu.state import Forces

        dtype = mol.r.dtype
        if len(F_prev) == 3:
            F_prev, M_prev, _Vi_prev = F_prev
        else:
            F_prev, M_prev = F_prev
        zeros3 = jnp.zeros_like(F_prev)
        forces_prev = Forces(F=F_prev, M=M_prev, Vi=zeros3)
        mol = upd_pre_force(mol, forces_prev, self.pp, cfg.dt)
        mol = dataclasses.replace(mol, r=wrap_positions(mol.r, cfg.box))
        mol, mig_overflow = self._migrate(mol, bounds)
        F, M, Vi, (u6, uX, my_rf, vir), bin_overflow = self._device_forces(mol, bounds)
        forces = Forces(F=F, M=M, Vi=zeros3)
        mol, mv2, iw2 = upd_post_force(mol, forces, self.pp, cfg.dt)

        nloc = jnp.sum(mol.valid).astype(dtype)
        rdof = jnp.sum(
            jnp.where(mol.valid, self.pp.rot_dof[mol.cid], 0)
        ).astype(dtype)
        packed = jnp.stack(
            [u6, uX, my_rf, vir, jnp.sum(mv2), jnp.sum(iw2), nloc, rdof]
        )
        u6g, uXg, rfg, virg, summv2, sumiw2, ng, rdofg = self._psum_all(packed)

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
        if cfg.temp_control_regions:
            from ls1_mardyn_tpu.ops.thermostat import (
                apply_temperature_control,
            )

            mol = apply_temperature_control(
                mol, self.pp, cfg.temp_control_regions, step,
                psum=self._psum_all,
            )
        overflow = (
            self._psum_all(
                (mig_overflow | bin_overflow).astype(jnp.int32)
            )
            > 0
        )
        # per-device molecule count: the measured load that drives
        # z-layer rebalancing (LoadCalc role)
        nloc_dev = jnp.sum(mol.valid).astype(jnp.int32).reshape(1)
        return mol, (F, M, Vi), gv, macro_g, overflow, nloc_dev

    # -- host API -----------------------------------------------------------
    def compute_forces(self, mol: MoleculeState, bounds=None):
        (F, M, _Vi), packed, ovf = self._force_sharded(mol, bounds)
        return F, M, packed, ovf

    def step(self, mol: MoleculeState, FM, step: int = 0, bounds=None):
        mol, FM, gv, _macro, ovf, _nloc = self._step_sharded(
            mol, FM, jnp.asarray(step, jnp.int32),
            self._as_bounds(bounds),
        )
        return mol, FM, gv, ovf

    def run(self, mol: MoleculeState, steps: int, check_overflow_every: int = 0,
            bounds=None):
        bounds = self._as_bounds(bounds)
        FM, _, ovf = self._force_sharded(mol, bounds)
        gv = None
        for i in range(steps):
            mol, FM, gv, _macro, overflow, _nloc = self._step_sharded(
                mol, FM, jnp.asarray(i + 1, jnp.int32), bounds
            )
            if check_overflow_every and (i % check_overflow_every == 0):
                if bool(np.asarray(overflow)):
                    raise RuntimeError(
                        "mesh3d: migration or cell-capacity overflow"
                    )
        return mol, gv
