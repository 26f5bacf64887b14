"""Force-path adapter for the multi-site Pallas kernel.

The fast general-molecule pipeline (full VectorizedCellProcessor role):
flat molecule arrays -> per-molecule world site offsets (quaternion
rotation, plain XLA) -> packed plane gather into the kernel's cell-row
layout -> multi-site kernel -> gather-back of F/M/Vi.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import PairParams, site_offsets
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles
from ls1_mardyn_tpu.ops.pallas_lj import HX
from ls1_mardyn_tpu.ops.pallas_multisite import (
    _MSMeta,
    multisite_cell_forces_pallas,
)
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState


def pick_ms_grid(r, box, cutoff, cap_min: int = 32, headroom: float = 1.5,
                 span: int = 4):
    """Cost-based grid/cap/tx choice for the multi-site kernel (the
    TraversalTuner::findOptimalTraversal role, /root/reference/src/
    particleContainer/TraversalTuner.h:135, for this kernel family).

    The dense kernel's pair-lane count is
        n_cells * cap^2 * 9 * (tx + 2*HX)
    and the compiled kernel needs tx*cap % 128 == 0 with tx | nx, so an
    odd nx forces cap up to a 128-multiple even when occupancy only
    needs 32 -- up to 4x lane waste (e.g. a 35^3 grid at true occupancy
    35 pays cap 128 where a 34-wide x axis runs tx=2 cap 64).  Search
    the admissible grids near floor(box/cutoff) (cell edge >= cutoff on
    every axis), size cap from the measured max cell occupancy plus
    drift headroom, and take the minimum-cost combination.

    Returns (dims, cap, tx) or None when no admissible grid exists.
    """
    r = np.asarray(r, np.float64)
    box = np.asarray(box, np.float64)
    lo = [int(np.floor(b / cutoff)) for b in box]
    if min(lo) < 1:
        return None

    def cands(nmax):
        return list(range(nmax, max(nmax - span, 1) - 1, -1))

    def cap_tx(nx, max_occ):
        need = max(cap_min, int(np.ceil(headroom * max(max_occ, 1))))
        best = None
        for tx in (1, 2, 4, 8):
            if nx % tx:
                continue
            unit = 128 // tx  # tx*cap % 128 == 0
            cap = ((need + unit - 1) // unit) * unit
            if tx * cap > 1024:  # VMEM: bound the i-tile row block
                continue
            if cap > 128:
                # windowed kernel: a 128-multiple j chunk must divide
                # the window (PallasMultiSitePath picks jw there)
                win = (tx + 2 * HX) * cap
                if not any(win % j == 0 for j in (128, 256, 384, 512)):
                    continue
            cost = cap * cap * (tx + 2 * HX)
            if best is None or cost < best[0]:
                best = (cost, cap, tx)
        return best

    # per-axis cell index tables for each candidate count (reused
    # across combinations; bincount per combination is the only O(N)
    # work and span^3 stays small)
    axis_idx = []
    for a in range(3):
        tbl = {}
        for n in cands(lo[a]):
            tbl[n] = np.minimum((r[:, a] * (n / box[a])).astype(np.int64),
                                n - 1)
        axis_idx.append(tbl)

    best = None
    for nx in cands(lo[0]):
        for ny in cands(lo[1]):
            for nz in cands(lo[2]):
                cells = nx * ny * nz
                if best is not None and \
                        cells * (cap_min ** 2) * 3 >= best[0]:
                    continue
                lin = (axis_idx[2][nz] * ny + axis_idx[1][ny]) * nx \
                    + axis_idx[0][nx]
                occ = int(np.bincount(lin, minlength=cells).max())
                ct = cap_tx(nx, occ)
                if ct is None:
                    continue
                cost = cells * ct[0]
                if best is None or cost < best[0]:
                    best = (cost, (nx, ny, nz), ct[1], ct[2])
    if best is None:
        return None
    return best[1], best[2], best[3]


class PallasMultiSitePath:
    """force_fn for SingleChipSimulation: rigid multi-site molecules of
    any component mix (LJ + charges + dipoles + quadrupoles)."""

    def __init__(
        self,
        table,
        spec: CellGridSpec,
        tx: int = 0,
        interpret: bool = False,
        screen_alpha: float = 0.0,
    ):
        self.spec = spec
        nx = spec.dims[0]
        if tx <= 0:
            pref = max(1, 128 // spec.cap)
            tx = pref if nx % pref == 0 else next(
                t for t in (4, 2, 1) if nx % t == 0
            )
        assert nx % tx == 0, (nx, tx)
        # vmem control: the kernel's pair tiles are [tx*cap, window]
        # with many live temporaries per site-pair term.  cap <= 128
        # runs the full (tx+2)*cap window in one pass; larger caps
        # (small grids with huge cutoffs, e.g. CO2 3x3x3 @ cap 256)
        # switch to the windowed kernel: 128-lane j chunks bound the
        # live temporaries regardless of cap.
        self.jw = 0
        if spec.cap > 128:
            win = (tx + 2 * HX) * spec.cap
            if interpret:
                self.jw = spec.cap  # always divides win
            else:
                # compiled chunks must be a multiple of 128 AND divide
                # the window; no such chunk (e.g. cap=160, win=960) =>
                # AssertionError here so the driver falls back to the
                # general traversal instead of crashing at trace time
                self.jw = next(
                    (j for j in (128, 256, 384, 512)
                     if win % j == 0), 0,
                )
                assert self.jw, (
                    f"multi-site Pallas kernel: no 128-multiple j chunk "
                    f"divides window {win} (cap={spec.cap}, tx={tx}); "
                    "use the general traversal"
                )
            assert spec.cap <= 1024, (
                f"multi-site Pallas kernel: cap={spec.cap} row blocks "
                "exceed vmem; use the general traversal"
            )
        self.tx = tx
        self.interpret = interpret
        self.screen_alpha = float(screen_alpha)
        self.meta = _MSMeta(table)
        self.rc2 = float(table.cutoff ** 2)
        self.rc2_lj = float(table.lj_cutoff ** 2)

    def _pack_planes(self, mol: MoleculeState) -> jnp.ndarray:
        """[N, P]: x y z valid cid | site offsets | orientations."""
        dtype = mol.r.dtype
        sites = site_offsets_pp(self.meta, mol)
        cols = [
            mol.r,
            mol.valid.astype(dtype)[:, None],
            mol.cid.astype(dtype)[:, None],
        ]
        n = mol.capacity
        for key in ("lj", "charge", "dip", "dip_e", "quad", "quad_e"):
            cols.append(sites[key].reshape(n, -1))
        packed = jnp.concatenate(cols, axis=1)
        pad = self.meta.P - packed.shape[1]
        if pad:
            packed = jnp.concatenate(
                [packed, jnp.zeros((n, pad), dtype)], axis=1
            )
        return packed

    def __call__(self, mol: MoleculeState) -> Tuple[Forces, Macroscopic, jnp.ndarray]:
        spec = self.spec
        nx, ny, nz = spec.dims
        cap = spec.cap
        n = mol.capacity
        dtype = mol.r.dtype
        Lx = spec.box[0]
        P = self.meta.P

        bins = bin_particles(mol.r, mol.valid, spec)
        idx = bins.slots.reshape(nz, ny, nx * cap)
        safe = jnp.clip(idx, 0, n - 1)
        ok = (idx >= 0) & mol.valid[safe]
        packed = self._pack_planes(mol)
        g = jnp.where(ok[..., None], packed[safe], 0.0)  # [nz,ny,W,P]

        shift_vec = jnp.zeros((P,), dtype).at[0].set(Lx)

        def with_halo(a):
            pad = jnp.zeros(a.shape[:2] + ((HX - 1) * cap, P), a.dtype)
            left = a[:, :, (nx - 1) * cap :, :] - shift_vec
            right = a[:, :, :cap, :] + shift_vec
            parts = [left, a, right]
            if HX > 1:
                parts = [pad] + parts + [pad]
            return jnp.concatenate(parts, axis=2)

        r_i = jnp.moveaxis(g, -1, 2)  # [nz, ny, P, nx*cap]
        r_j = jnp.moveaxis(with_halo(g), -1, 2)

        out, u6, uX, my_rf = multisite_cell_forces_pallas(
            r_i,
            r_j,
            nx=nx,
            ny=ny,
            nz=nz,
            cap=cap,
            tx=self.tx,
            box=spec.box,
            rc2=self.rc2,
            rc2_lj=self.rc2_lj,
            screen_alpha=self.screen_alpha,
            meta=self.meta,
            interpret=self.interpret,
            jw=self.jw,
        )
        flat = jnp.moveaxis(out, 2, -1).reshape(-1, out.shape[2])  # [slots, NOUT]
        src = jnp.clip(bins.slot_of, 0, flat.shape[0] - 1)
        got = jnp.where(mol.valid[:, None], flat[src], 0.0)
        forces = Forces(F=got[:, 0:3], M=got[:, 3:6], Vi=got[:, 6:9])
        vir = jnp.sum(out[:, :, 6:9, :])
        macro = Macroscopic(upot6lj=u6, upot_xpoles=uX, virial=vir, my_rf=my_rf)
        return forces, macro, bins.overflow


def site_offsets_pp(meta: _MSMeta, mol: MoleculeState):
    """site_offsets against the meta's geometry (kept separate so the
    path needs only the numpy ComponentTable, not PairParams)."""
    from ls1_mardyn_tpu.models.quaternion import qrotate

    dtype = mol.r.dtype
    qb = mol.q[..., None, :]
    g = meta._geom
    cid = mol.cid
    return dict(
        lj=qrotate(qb, jnp.asarray(g["lj_pos"], dtype)[cid]),
        charge=qrotate(qb, jnp.asarray(g["charge_pos"], dtype)[cid]),
        dip=qrotate(qb, jnp.asarray(g["dip_pos"], dtype)[cid]),
        dip_e=qrotate(qb, jnp.asarray(g["dip_e"], dtype)[cid]),
        quad=qrotate(qb, jnp.asarray(g["quad_pos"], dtype)[cid]),
        quad_e=qrotate(qb, jnp.asarray(g["quad_e"], dtype)[cid]),
    )
