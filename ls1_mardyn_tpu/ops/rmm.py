"""Reduced-memory-mode (RMM) dense-state simulation for 1CLJ fluids.

The TPU re-design of the reference's reduced memory mode
(/root/reference/src/molecules/MoleculeRMM.h + LeapfrogRMM +
VCP1CLJRMM: single-site LJ, position+velocity only, integration fused
into cell-processor sweeps, src/Simulation.cpp:819-854):

Here the PRIMARY state lives directly in the kernel's dense cell layout
  planes [nz, ny, 8, nx*cap]  =  (x, y, z, valid, vx, vy, vz, mid)
so the per-step pipeline is pure elementwise plane math + the Pallas
cell kernel -- no gather/scatter, no sort.  Rebinning (the reference's
LinkedCells::update) runs only every `rebin_every` steps: the cell edge
exceeds the cutoff by a skin, and with MD displacements of ~1e-3 sigma
per step the cell assignment stays valid for many steps (verlet-skin
argument; LinkedCells.h:150-153 'skipParticleUpdate' plays the same
trick).

Positions are CELL-LOCAL: each slot stores coordinates relative to its
own cell's origin, so f32 keeps ~1e-7 absolute precision regardless of
box size, and periodicity is exact integer cell arithmetic (index-map
mod in the kernel + cell-difference offsets).  Without this, f32
absolute positions at box ~100 sigma inject O(4e-6 sigma) rounding
kicks per step that heat the system measurably (the reference's answer
is the SPDP mixed-precision mode, SIMD_TYPES.h:110-113; cell-local
storage achieves the same in pure f32).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles, wrap_positions
from ls1_mardyn_tpu.ops.globals import GlobalValues, calculate_global_values
from ls1_mardyn_tpu.ops.pallas_lj import (
    HX,
    SENTINEL_SCALE,
    lj_cell_forces_pallas,
    sentinel_eligible,
)
from ls1_mardyn_tpu.state import MoleculeState

NP_RMM = 8  # planes: x, y, z, valid, vx, vy, vz, mid


class CellCapacityError(RuntimeError):
    """Cell occupancy exceeds the grid capacity.  Distinct from plain
    RuntimeError so capacity-escalation retry loops don't silently
    swallow unrelated failures (e.g. a Mosaic compile crash surfacing
    as XlaRuntimeError, which also subclasses RuntimeError)."""


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RMMState:
    planes: jnp.ndarray  # [nz, ny, 8, nx*cap]
    forces: jnp.ndarray  # [nz, ny, 3, nx*cap] from the previous evaluation
    # Kahan compensation planes for velocity and position accumulation
    # (the f32 answer to the reference's SPDP mixed-precision mode,
    # SIMD_TYPES.h:110-113: f32 compute, effectively-f64 accumulate)
    vcomp: jnp.ndarray  # [nz, ny, 3, nx*cap]
    rcomp: jnp.ndarray  # [nz, ny, 3, nx*cap]
    u6: jnp.ndarray
    vir: jnp.ndarray


class RMMSimulation:
    """Single-chip dense-state 1CLJ NVT/NVE driver (flagship bench)."""

    def __init__(
        self,
        table,
        pp: PairParams,
        box,
        spec: CellGridSpec,
        dt: float,
        target_temperature: float = 0.0,
        thermostat: bool = True,
        tx: int = 4,
        rebin_every: int = 8,
        sample_every: int = 8,
        interpret: bool = False,
        upot_corr: float = 0.0,
        virial_corr: float = 0.0,
    ):
        assert table.K == 1 and len(table.components[0].ljcenters) == 1
        self.spec = spec
        self.box = tuple(float(b) for b in np.asarray(box))
        self.dt = float(dt)
        self.volume = float(np.prod(self.box))
        self.mass = float(table.mass[0])
        self.target_temperature = float(target_temperature)
        self.thermostat = thermostat
        self.tx = tx
        self.rebin_every = rebin_every
        self.sample_every = sample_every
        self.interpret = interpret
        self.upot_corr = float(upot_corr)
        self.virial_corr = float(virial_corr)
        self.eps24 = float(table.eps24[0, 0, 0, 0])
        self.sig2 = float(table.sig2[0, 0, 0, 0])
        self.shift6 = float(table.shift6[0, 0, 0, 0])
        self.rc2 = float(table.lj_cutoff ** 2)
        # j-transposed kernel mode: j window on sublanes (no lane-pad
        # tax, no MXU transposes) -- see pallas_lj
        self.jt = True
        self.hx = HX
        assert spec.z_edges is None, "RMM local-coords path needs a uniform grid"
        # sentinel invalid slots (y_local = SENTINEL_SCALE*(1+slot)):
        # the kernel never reads the validity plane; needs cell edge
        # >= rc plus the f32 rounding margin (see sentinel_eligible)
        self.sentinel = sentinel_eligible(spec.cell_len, self.rc2, spec.cap)
        # z-banded kernel (lj_cell_forces_pallas_zb): 3 whole z-planes
        # per program in VMEM -> j rows fetched from HBM 3x instead of
        # 9x.  Measured at parity with the row kernel in an interleaved
        # A/B (the step is compute-bound); kept as an option.
        self.zb = False
        # gram mode (zb only): distance + force reductions on the MXU;
        # excludes sentinel (uses the validity plane instead).
        # Measured 1.7x SLOWER on this environment's ~6x-throttled MXU
        # (177 vs 102 ms/step at N=4.2M): the f32 matmuls cost more
        # than the ~10 VPU ops/pair they remove.  On unthrottled
        # hardware the MXU:VPU ratio is 6x higher -- re-measure there.
        self.zb_gram = False
        # Newton-3rd-law kernel (lj_cell_forces_pallas_n3l): 5 forward
        # offsets instead of 9 rows (C08BasedTraversals.h:122-126
        # forward-pair idea); j-side forces ride a second output folded
        # back in XLA.  Needs nz >= 3, ny >= 3.
        nx, ny, nz = spec.dims
        self.n3l = False
        # lane-major-j kernel (lj_cell_forces_pallas_lanej): avoids the
        # per-row j->sublane move cost class entirely (see kernel doc)
        # and sidesteps the row kernel's selector-matmul bf16 rounding
        # of j coordinates.  Measured 2026-08-18 (unthrottled session,
        # tools/ab_kernels.py, N=4.2M): lanej 171 ms/step vs row 407 --
        # the row kernel's selector matmuls run 6-pass under the
        # package-wide exact-f32 matmul setting.
        self.lanej = False
        self.lanej_defer = True
        # cell-window kernel (lj_cell_forces_pallas_cw): per-i-CELL
        # 4-cell j windows as static lane sub-slices of one aligned
        # tile load -- 2x fewer candidate lanes than the per-tile
        # window kernels (128 vs 256 per i at cap=32), no coordinate
        # matmuls.  The production default where its group geometry
        # fits (4*cap lanes per group window must be register-aligned).
        self.cw = (
            (4 * spec.cap) % 128 == 0
            and spec.dims[0] >= 3
            and float(min(spec.cell_len)) ** 2 >= self.rc2
        )
        # Newton-3rd-law cell-window kernel: 5 forward rows instead of
        # 9, j-side forces via phase-separated VMEM scratch (see
        # _lj_cwn3l_kernel)
        self.cwn3l = self.cw
        # group-block sublane split against VPU register spills (see
        # _lj_cwn3l_kernel gsub)
        self.cw_gsub = 1
        # packed-window mode: re-pack the 14 in-cutoff window cells of
        # the 5 rows into 4 dense 128-lane chunks (a 20% structural
        # pair-lane cut, every inner-loop op 128-aligned; see
        # _lj_cwn3l_kernel pack).  Eligible at the production group
        # geometry only (cap=32, 128-lane group rows).  NB the packed
        # j-side scratch [tx, ny, 4, (nx/tx)*16*cap] is ~2x the dense
        # sown+sup footprint (29.5 vs 14.7 MB f32 at the nd=60 bench
        # grid), so pack is additionally gated on an estimated VMEM
        # budget: grids that compiled dense near the ceiling must not
        # fail Mosaic allocation when pack doubles the scratch.
        nxd_, nyd_, nzd_ = spec.dims
        cap_ = spec.cap
        # OFF by default: pack never compiled at production geometry --
        # the Mosaic compile of the packed kernel crashes the TPU
        # compile helper at (56-60)^3-class grids (measured 2026-08-19,
        # remote_compile HTTP 500 after ~130-330 s; the packed j-side
        # scratch is ~2x the dense sown+sup footprint, 29.5 vs 14.7 MB
        # at nd=60, and the 4-chunk unfold multiplies program size).
        # Correctness is CI-covered at small grids
        # (tests/test_pallas_lj.py pack cases incl. multi-tile); opt in
        # via `sim.cw_pack = True` + tools/ab_pack.py where it compiles.
        self.cw_pack = False
        # occupancy skipping: cells are front-packed, so i slots past
        # the per-cell count are empty -- the kernel processes a dense
        # [cw_prefix, gw] block plus pl.when-guarded 8-sublane tail
        # slabs.  cw_prefix chosen from the measured occupancy
        # histogram at init (0 = dense, no skipping); applied on the
        # macro-free fast steps only.  Measured SLOWER at the bench
        # geometry (tools/ab_skip.py, 2026-08-18: dense 65.2 ms,
        # prefix=24 73.7 ms, prefix=16 94.2 ms at occ frac>24 = 0.004)
        # -- the pl.when branches + the [8,128] scratch stores cost
        # more than the skipped slabs save, the same alignment-tax
        # class as the packed-pencil experiment.  Kept as a tested
        # opt-in (correctness: tests/test_pallas_lj.py).
        self.cw_skip = False
        self.cw_prefix = 0
        # approx-reciprocal + Newton instead of IEEE divide (f32 TPU)
        self.fast_recip = not interpret
        # drop the Newton refinement too (raw ~1e-4-rel VPU reciprocal,
        # cwn3l only): saves ~3 of ~27 VPU slots/pair.  Off by default
        # pending an NVE-drift qualification (tools/ab_recip.py)
        self.recip_newton = True
        self._step_jit = jax.jit(functools.partial(self._step, compute_macro=True))
        # fast step: skips the Upot/virial reduction passes in the kernel
        # (20%); the thermostat needs only kinetic energy
        self._step_fast_jit = jax.jit(
            functools.partial(self._step, compute_macro=False)
        )
        self._rebin_jit = jax.jit(self._rebin)
        self._rebin_shift_jit = jax.jit(self._rebin_shift)
        self._rebin_shift_pl_jit = jax.jit(self._rebin_shift_pl)
        # the Pallas concentrator rebin needs power-of-2 cap and
        # 128-aligned lane rows (interpret mode keeps the lax.sort
        # variant: per-op interpretation of the butterfly is slow on
        # CPU and both paths are bit-identical anyway)
        nxd, nyd, nzd = spec.dims
        self.rebin_pl = (
            not interpret
            and spec.cap & (spec.cap - 1) == 0
            and (nxd * spec.cap) % 128 == 0
            # a decent row chunk must exist: tiny divisors of ny
            # degenerate the rebin kernel's unrolled chunk loop and
            # explode Mosaic compile time
            and max(c for c in range(1, min(nyd, 20) + 1)
                    if nyd % c == 0) >= 4
        )
        self._forces_jit = jax.jit(self._forces)
        self.state: RMMState = None
        self._k = 0

    # -- layout helpers ---------------------------------------------------
    def _kernel(self, planes, compute_macro=True):
        nx, ny, nz = self.spec.dims
        cap = self.spec.cap
        dtype = planes.dtype
        r_i = planes[:, :, :4, :]
        if self.zb or self.n3l or self.lanej:
            # lab-notebook variants: measured 4-8x slower than cw/cwn3l
            # under the package-wide exact-f32 matmul default (README
            # "superseded kernel experiments"); kept for A/B
            # reproducibility, not production
            import warnings

            warnings.warn(
                "RMMSimulation: superseded kernel variant selected "
                "(zb=%s n3l=%s lanej=%s) -- these measured 4-8x slower "
                "than the cw/cwn3l production kernels (tools/"
                "ab_kernels.py); use them only for A/B reproduction"
                % (self.zb, self.n3l, self.lanej),
                stacklevel=2,
            )
        # x halo: plain copies -- cell-local coordinates need no +-L
        # shift (the kernel's cell-difference offsets are exact)
        hx = self.hx
        if self.cw:
            from ls1_mardyn_tpu.ops.pallas_lj import (
                lj_cell_forces_pallas_cw,
                lj_cell_forces_pallas_cwn3l,
            )

            # cw halo: 1 left + 3 right periodic cells (the 3rd right
            # cell only feeds the alignment-pad 4th window cell, whose
            # pairs sit >= one cell edge >= rc away)
            left = r_i[:, :, :, (nx - 1) * cap :]
            right3 = r_i[:, :, :, : 3 * cap]
            r_j = jnp.concatenate([left, r_i, right3], axis=3)
            fn = (
                lj_cell_forces_pallas_cwn3l
                if self.cwn3l
                else lj_cell_forces_pallas_cw
            )
            extra = {"gsub": self.cw_gsub} if self.cwn3l else {}
            args = ()
            if self.cwn3l:
                extra["newton"] = self.recip_newton
                skip = (
                    self.cw_skip
                    and not compute_macro
                    and 0 < self.cw_prefix < cap
                )
                extra["prefix"] = self.cw_prefix if skip else 0
                extra["skip_tail"] = skip
                extra["pack"] = self.cw_pack and not skip
                if skip:
                    # per-cell occupancy from the validity plane (one
                    # fused reduce; validity only changes at rebin, but
                    # recomputing is cheaper than carrying state)
                    w = planes[:, :, 3, :].reshape(nz, ny, nx, cap)
                    args = (jnp.sum(w, axis=-1).astype(jnp.int32),)
            return fn(
                r_i,
                r_j,
                *args,
                **extra,
                nx=nx,
                ny=ny,
                nz=nz,
                cap=cap,
                tx=self.tx,
                box=self.box,
                eps24=self.eps24,
                sig2=self.sig2,
                shift6=self.shift6,
                rc2=self.rc2,
                interpret=self.interpret,
                compute_macro=compute_macro,
                sentinel=self.sentinel,
                fast_recip=self.fast_recip,
            )
        pad = jnp.zeros((nz, ny, 4, (hx - 1) * cap), dtype)
        left = r_i[:, :, :, (nx - 1) * cap :]
        right = r_i[:, :, :, :cap]
        parts = [left, r_i, right]
        if hx > 1:
            parts = [pad, left, r_i, right, pad]
        r_j = jnp.concatenate(parts, axis=3)
        if self.lanej:
            from ls1_mardyn_tpu.ops.pallas_lj import lj_cell_forces_pallas_lanej

            return lj_cell_forces_pallas_lanej(
                r_i,
                r_j,
                nx=nx,
                ny=ny,
                nz=nz,
                cap=cap,
                tx=self.tx,
                box=self.box,
                eps24=self.eps24,
                sig2=self.sig2,
                shift6=self.shift6,
                rc2=self.rc2,
                interpret=self.interpret,
                compute_macro=compute_macro,
                hx=hx,
                sentinel=self.sentinel,
                fast_recip=self.fast_recip,
                defer=self.lanej_defer,
            )
        if self.n3l:
            from ls1_mardyn_tpu.ops.pallas_lj import lj_cell_forces_pallas_n3l

            return lj_cell_forces_pallas_n3l(
                r_i,
                r_j,
                nx=nx,
                ny=ny,
                nz=nz,
                cap=cap,
                tx=self.tx,
                box=self.box,
                eps24=self.eps24,
                sig2=self.sig2,
                shift6=self.shift6,
                rc2=self.rc2,
                interpret=self.interpret,
                compute_macro=compute_macro,
                hx=hx,
                sentinel=self.sentinel,
                fast_recip=self.fast_recip,
            )
        if self.zb:
            from ls1_mardyn_tpu.ops.pallas_lj import lj_cell_forces_pallas_zb

            # full 8-plane j view (x,y,z,w,vx,vy,vz,_): the extra
            # planes are ignored by the kernel but make every dynamic
            # y-row slice sublane-tile aligned (8 = one sublane tile)
            pad8 = jnp.zeros((nz, ny, planes.shape[2], (hx - 1) * cap), dtype)
            left8 = planes[:, :, :, (nx - 1) * cap :]
            right8 = planes[:, :, :, :cap]
            parts8 = [left8, planes, right8]
            if hx > 1:
                parts8 = [pad8, left8, planes, right8, pad8]
            r_j8 = jnp.concatenate(parts8, axis=3)
            return lj_cell_forces_pallas_zb(
                r_i,
                r_j8,
                nx=nx,
                ny=ny,
                nz=nz,
                cap=cap,
                tx=self.tx,
                box=self.box,
                eps24=self.eps24,
                sig2=self.sig2,
                shift6=self.shift6,
                rc2=self.rc2,
                interpret=self.interpret,
                compute_macro=compute_macro,
                hx=hx,
                sentinel=self.sentinel and not self.zb_gram,
                fast_recip=self.fast_recip,
                gram=self.zb_gram,
            )
        return lj_cell_forces_pallas(
            r_i,
            r_j,
            nx=nx,
            ny=ny,
            nz=nz,
            cap=cap,
            tx=self.tx,
            box=self.box,
            eps24=self.eps24,
            sig2=self.sig2,
            shift6=self.shift6,
            rc2=self.rc2,
            interpret=self.interpret,
            compute_macro=compute_macro,
            local_coords=True,
            hx=hx,
            jt=self.jt,
            sentinel=self.sentinel,
            fast_recip=self.fast_recip,
        )

    def _forces(self, planes):
        f, u6, vir = self._kernel(planes)
        return f[:, :, :3, :], u6, vir

    # -- jitted step ------------------------------------------------------
    @staticmethod
    def _kahan(x, comp, inc):
        """Compensated accumulation x += inc (Kahan-Neumaier)."""
        y = inc - comp
        t = x + y
        comp_new = (t - x) - y
        return t, comp_new

    def _step(self, st: RMMState, compute_macro=True) -> Tuple[RMMState, GlobalValues]:
        dt = self.dt
        inv2m = 0.5 * dt / self.mass
        p = st.planes
        w = p[:, :, 3:4, :]
        v, vc = self._kahan(p[:, :, 4:7, :], st.vcomp, inv2m * st.forces * w)
        r, rc_ = self._kahan(p[:, :, 0:3, :], st.rcomp, dt * v * w)
        planes = jnp.concatenate([r, p[:, :, 3:4, :], v, p[:, :, 7:8, :]], axis=2)

        fout, u6, vir = self._kernel(planes, compute_macro)
        f = fout[:, :, :3, :]

        v, vc = self._kahan(v, vc, inv2m * f * w)
        planes = jnp.concatenate([r, p[:, :, 3:4, :], v, p[:, :, 7:8, :]], axis=2)

        from ls1_mardyn_tpu.state import Macroscopic

        dtype = p.dtype
        summv2 = self.mass * jnp.sum(v * v * w)
        nmol = jnp.sum(w)
        zero = jnp.zeros((), dtype)
        macro = Macroscopic(
            upot6lj=u6,
            upot_xpoles=zero + self.upot_corr,
            virial=vir + self.virial_corr,
            my_rf=zero,
        )
        gv = calculate_global_values(
            macro,
            summv2,
            zero,
            nmol,
            zero,
            self.volume,
            self.target_temperature,
            nve=not self.thermostat,
        )
        if self.thermostat and self.target_temperature > 0:
            v = v * gv.beta_trans
            vc = vc * gv.beta_trans
            planes = jnp.concatenate(
                [r, p[:, :, 3:4, :], v, p[:, :, 7:8, :]], axis=2
            )
        return (
            RMMState(planes=planes, forces=f, vcomp=vc, rcomp=rc_,
                     u6=u6, vir=vir),
            gv,
        )

    def _empty_fill(self, ncols, dtype):
        """Fill row for empty slots: zeros, or the sentinel y_local =
        SENTINEL_SCALE*(1 + slot_in_cell) that keeps every empty slot
        outside the cutoff of everything (the kernel then never reads
        validity).  Generated from iotas -- XLA fuses it, nothing is
        materialized."""
        if not self.sentinel:
            return jnp.zeros((), dtype)
        nx, ny, nz = self.spec.dims
        cap = self.spec.cap
        tot = nz * ny * nx * cap
        slot = jax.lax.broadcasted_iota(jnp.int32, (tot, 1), 0) % cap
        ycol = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) == 1
        return jnp.where(
            ycol, SENTINEL_SCALE * (1.0 + slot.astype(dtype)), 0.0
        )

    def _slot_cells(self):
        """Static per-slot cell coordinates [slots, 3] (z-major rows,
        x-cell = lane // cap)."""
        nx, ny, nz = self.spec.dims
        cap = self.spec.cap
        z = np.repeat(np.arange(nz), ny * nx * cap)
        y = np.tile(np.repeat(np.arange(ny), nx * cap), nz)
        x = np.tile(np.repeat(np.arange(nx), cap), nz * ny)
        return jnp.asarray(np.stack([x, y, z], -1), jnp.int32)

    # -- rebin (every k steps) --------------------------------------------
    def _rebin_shift(self, st: RMMState):
        """3-stage dimension-wise shift-merge rebin.

        The full rebin (below) is a global sort + [slots, 11] row
        gather: measured 330-480 ms at N=4.2M (TPU gathers run at
        ~1 GB/s, and every op on [slots, 11] wastes 117 of 128 lanes).
        But between rebins molecules drift at most one cell (verlet
        skin), so rebinning is a NEAREST-NEIGHBOR exchange -- the
        single-chip analogue of the reference's 3-stage indirect
        scheme (/root/reference/src/parallel/
        NeighbourCommunicationScheme.h:172: exchange dimension-wise,
        diagonal hops ride consecutive stages).

        Per stage (x, then y, then z): every cell's slot row is
        re-packed from the 3 candidate rows (left neighbor, own, right
        neighbor, via jnp.roll) with one 3*cap-wide axis sort keyed by
        "belongs to this cell after the hop" -- candidates that belong
        get their stable slot-order iota, everything else BIG, and the
        first cap sorted entries are the new row.  All 11 payload
        columns ride the sort as operands: no gathers, no global sort.
        Measured 150 ms/rebin at N=4.2M vs 467 for the full rebin
        (60-88 ms/stage is lax.sort itself; a gather-free butterfly
        routing via ops/sublane measured SLOWER in XLA, 187 ms,
        because un-fused shift stages each pay a full memory pass --
        it needs a fused Pallas kernel to win).  Returns (state,
        overflow) where overflow also latches |hop| > 1 (skin
        violated) and cell-full -- the caller falls back to the full
        rebin.
        """
        nx, ny, nz = self.spec.dims
        cap = self.spec.cap
        p = st.planes
        dtype = p.dtype
        BIG = jnp.asarray(np.iinfo(np.int32).max, jnp.int32)
        # fold Kahan compensators into the primaries (restarted below)
        r = p[:, :, 0:3, :] + st.rcomp
        v = p[:, :, 4:7, :] + st.vcomp
        # 11 payload columns as [nz, ny, nx, cap]
        def grid4(a):
            return a.reshape(nz, ny, nx, cap)

        cols = (
            [grid4(r[:, :, c, :]) for c in range(3)]
            + [grid4(p[:, :, 3, :])]
            + [grid4(v[:, :, c, :]) for c in range(3)]
            + [grid4(p[:, :, 7, :])]
            + [grid4(st.forces[:, :, c, :]) for c in range(3)]
        )
        cl = [float(c) for c in self.spec.cell_len]
        overflow = jnp.zeros((), jnp.bool_)
        # stage axes: coordinate column, cell length, roll axis
        for coord_c, cl_a, axis in ((0, cl[0], 2), (1, cl[1], 1), (2, cl[2], 0)):
            cla = jnp.asarray(cl_a, dtype)
            valid = cols[3] > 0.5
            d = jnp.floor(cols[coord_c] / cla).astype(jnp.int32)
            overflow = overflow | jnp.any(valid & (jnp.abs(d) > 1))
            keys = []
            payload = [[] for _ in cols]
            slot_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nz, ny, nx, cap), 3
            )
            for ri, roll in enumerate((1, 0, -1)):
                # roll=+1 presents cell c-1's row to cell c: those
                # molecules belong here iff their hop d == +1
                dr = jnp.roll(d, roll, axis=axis) if roll else d
                vr = jnp.roll(valid, roll, axis=axis) if roll else valid
                belong = vr & (dr == roll)
                keys.append(
                    jnp.where(belong, slot_iota + cap * ri, BIG)
                )
                for ci, a in enumerate(cols):
                    ar = jnp.roll(a, roll, axis=axis) if roll else a
                    if ci == coord_c:
                        # hop adjusts the cell-local coordinate
                        ar = ar - jnp.asarray(roll, dtype) * cla
                    payload[ci].append(ar)
            key = jnp.concatenate(keys, axis=-1)  # [nz, ny, nx, 3cap]
            ops = [jnp.concatenate(pc, axis=-1) for pc in payload]
            sorted_all = jax.lax.sort([key] + ops, num_keys=1)
            key_s = sorted_all[0]
            # molecules beyond cap have nowhere to go: cell overflow
            overflow = overflow | jnp.any(key_s[..., cap:] < BIG)
            placed = key_s[..., :cap] < BIG
            cols = [a[..., :cap] for a in sorted_all[1:]]
            # clear dropped/empty slots (validity column drives the
            # rest; coordinate columns re-filled after the last stage)
            cols[3] = jnp.where(placed, cols[3], 0.0)
        valid = cols[3] > 0.5
        if self.sentinel:
            slot = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx, cap), 3)
            ysent = SENTINEL_SCALE * (1.0 + slot.astype(dtype))
            cols[1] = jnp.where(valid, cols[1], ysent)
            cols[0] = jnp.where(valid, cols[0], 0.0)
            cols[2] = jnp.where(valid, cols[2], 0.0)
        else:
            for c in (0, 1, 2):
                cols[c] = jnp.where(valid, cols[c], 0.0)
        for c in (4, 5, 6, 7, 8, 9, 10):
            cols[c] = jnp.where(valid, cols[c], 0.0)

        def flat4(a):
            return a.reshape(nz, ny, 1, nx * cap)

        planes = jnp.concatenate(
            [flat4(cols[c]) for c in (0, 1, 2, 3, 4, 5, 6, 7)], axis=2
        )
        forces = jnp.concatenate([flat4(cols[c]) for c in (8, 9, 10)], axis=2)
        zero3 = jnp.zeros_like(forces)
        return (
            RMMState(
                planes=planes,
                forces=forces,
                vcomp=zero3,
                rcomp=zero3,
                u6=st.u6,
                vir=st.vir,
            ),
            overflow,
        )

    def _rebin_shift_pl(self, st: RMMState):
        """Pallas shift-merge rebin (ops/pallas_rebin.py): the same
        3-stage x/y/z nearest-neighbor re-pack as _rebin_shift with
        bit-identical output, but the candidate merge runs as a
        segmented-concentrator routing in VMEM instead of a 12-operand
        lax.sort (whose ~50 compare-swap stages each pay a full HBM
        pass).  Same (state, overflow) contract."""
        from ls1_mardyn_tpu.ops.pallas_rebin import rebin_shift_pallas

        nx, ny, nz = self.spec.dims
        p = st.planes
        r = p[:, :, 0:3, :] + st.rcomp
        v = p[:, :, 4:7, :] + st.vcomp
        big = jnp.concatenate(
            [r, p[:, :, 3:4, :], v, p[:, :, 7:8, :], st.forces], axis=2
        )
        out, overflow = rebin_shift_pallas(
            big,
            dims=self.spec.dims,
            cap=self.spec.cap,
            cell_len=tuple(float(c) for c in self.spec.cell_len),
            sentinel=self.sentinel,
            interpret=self.interpret,
        )
        planes = out[:, :, 0:NP_RMM, :]
        forces = out[:, :, NP_RMM:, :]
        zero3 = jnp.zeros_like(forces)
        return (
            RMMState(
                planes=planes,
                forces=forces,
                vcomp=zero3,
                rcomp=zero3,
                u6=st.u6,
                vir=st.vir,
            ),
            overflow,
        )

    def _rebin(self, st: RMMState):
        nx, ny, nz = self.spec.dims
        cap = self.spec.cap
        p = st.planes
        dtype = p.dtype
        # Fold the Kahan compensation planes into their primaries and
        # restart the compensators: one fused [slots, 11] gather moves
        # everything (positions, validity, velocities, ids, forces) in
        # a single pass -- the four separate gathers + transposes were
        # the dominant rebin cost on TPU (HBM-bound).
        r = p[:, :, 0:3, :] + st.rcomp
        v = p[:, :, 4:7, :] + st.vcomp
        big = jnp.concatenate(
            [r, p[:, :, 3:4, :], v, p[:, :, 7:8, :], st.forces], axis=2
        )  # [nz, ny, NP_RMM+3, W]
        NPX = NP_RMM + 3
        flat = big.transpose(0, 1, 3, 2).reshape(-1, NPX)  # [slots, 11]
        valid = flat[:, 3] > 0.5
        cl = jnp.asarray(self.spec.cell_len, dtype)
        dims = jnp.asarray(self.spec.dims, jnp.int32)
        local = flat[:, 0:3]
        # exact cell hop: delta = floor(local / cell_len); new local
        # coordinate never round-trips through an absolute position
        delta = jnp.floor(local / cl).astype(jnp.int32)
        new_local = local - delta.astype(dtype) * cl
        c3 = jnp.mod(self._slot_cells() + delta, dims)
        cell = (c3[:, 2] * dims[1] + c3[:, 1]) * dims[0] + c3[:, 0]
        from ls1_mardyn_tpu.ops.cells import bin_by_id

        flat = jnp.concatenate([new_local, flat[:, 3:]], axis=1)
        bins = bin_by_id(cell, valid, self.spec, need_inverse=False)
        idx = bins.slots.reshape(-1)
        safe = jnp.clip(idx, 0, flat.shape[0] - 1)
        ok = (idx >= 0) & valid[safe]
        g = jnp.where(ok[:, None], flat[safe], self._empty_fill(NPX, dtype))
        gre = g.reshape(nz, ny, nx * cap, NPX).transpose(0, 1, 3, 2)
        planes = gre[:, :, :NP_RMM, :]
        forces = gre[:, :, NP_RMM:, :]
        zero3 = jnp.zeros_like(forces)
        return (
            RMMState(
                planes=planes,
                forces=forces,
                vcomp=zero3,
                rcomp=zero3,
                u6=st.u6,
                vir=st.vir,
            ),
            bins.overflow,
        )

    # -- host API ---------------------------------------------------------
    def init_from_molecules(self, mol: MoleculeState):
        spec = self.spec
        nx, ny, nz = spec.dims
        cap = spec.cap
        dtype = mol.r.dtype
        # absolute -> (cell, local) split in f64 on the host so the
        # one-time conversion adds no rounding noise
        r64 = np.asarray(mol.r, np.float64)
        cl = np.asarray(spec.cell_len, np.float64)
        c3 = np.clip(np.floor(r64 / cl).astype(np.int64), 0,
                     np.asarray(spec.dims) - 1)
        local = (r64 - c3 * cl).astype(np.float64)
        # bin by the SAME host-f64 cell assignment that defined the
        # locals: an independent f32 device binning can disagree on
        # boundary-exact coordinates (lattice scenes put thousands of
        # molecules exactly on cell planes), and a slot whose local is
        # relative to a different cell's origin is displaced by a whole
        # cell edge -- garbage forces
        from ls1_mardyn_tpu.ops.cells import bin_by_id

        cell_host = (
            (c3[:, 2] * spec.dims[1] + c3[:, 1]) * spec.dims[0] + c3[:, 0]
        ).astype(np.int32)
        bins = bin_by_id(jnp.asarray(cell_host), mol.valid, spec)
        idx = bins.slots.reshape(-1)
        safe = jnp.clip(idx, 0, mol.capacity - 1)
        ok = (idx >= 0) & mol.valid[safe]
        packed = jnp.concatenate(
            [
                jnp.asarray(local, dtype),
                mol.valid.astype(dtype)[:, None],
                mol.v,
                mol.mid.astype(dtype)[:, None],
            ],
            axis=1,
        )
        g = jnp.where(ok[:, None], packed[safe], self._empty_fill(NP_RMM, dtype))
        planes = g.reshape(nz, ny, nx * cap, NP_RMM).transpose(0, 1, 3, 2)
        if bool(bins.overflow):
            raise CellCapacityError("cell capacity exceeded at init")
        # pick the occupancy-skip dense prefix from the measured
        # occupancy histogram: cost(P) ~ P/8 dense slabs + 1.3 slab
        # equivalents per pl.when tail activation (the 1.3 covers the
        # branch + the extra per-slab j-scratch read-modify-write)
        if self.cwn3l and self.cw_skip:
            nvalid = np.asarray(mol.valid).astype(np.int64)
            occ = np.bincount(
                np.asarray(cell_host)[nvalid > 0], minlength=nx * ny * nz
            )
            cands = range(8, cap + 1, 8)
            cost = {
                P: P / 8.0
                + sum(
                    1.3 * float(np.mean(occ > a))
                    for a in range(P, cap, 8)
                )
                for P in cands
            }
            self.cw_prefix = min(cost, key=cost.get)
        f, u6, vir = self._forces_jit(planes)
        z3 = jnp.zeros_like(f)
        self.state = RMMState(planes=planes, forces=f, vcomp=z3, rcomp=z3,
                              u6=u6, vir=vir)
        self._k = 0

    def run(self, steps: int, callback=None):
        gv = None
        last_full = None
        for i in range(steps):
            if self._k and (self._k % self.rebin_every == 0):
                # shift-merge rebin (3-stage nearest-neighbor): the
                # Pallas concentrator kernel where the layout admits it
                # (bit-identical to the lax.sort variant, measured 72
                # vs 104 ms at N=4.2M, tools/ab_rebin.py); the rare
                # overflow (cell full / skin violated) falls back to
                # the general global-sort rebin on the SAME state
                shift_fn = (
                    self._rebin_shift_pl_jit
                    if self.rebin_pl
                    else self._rebin_shift_jit
                )
                st2, ovf = shift_fn(self.state)
                if bool(ovf):
                    st2, ovf = self._rebin_jit(self.state)
                self.state = st2
            full = (self._k % self.sample_every == 0) or (i == steps - 1)
            step_fn = self._step_jit if full else self._step_fast_jit
            self.state, gv = step_fn(self.state)
            if full:
                last_full = gv
            self._k += 1
            if callback is not None:
                callback(self._k, self.state, gv)
        return last_full if last_full is not None else gv

    def to_molecules(self) -> MoleculeState:
        """Flatten dense state back to molecule arrays (checkpointing)."""
        p = np.asarray(self.state.planes)
        nz, ny, C, W = p.shape
        flat = p.transpose(0, 1, 3, 2).reshape(-1, C)
        valid = flat[:, 3] > 0.5
        cells = np.asarray(self._slot_cells())
        cl = np.asarray(self.spec.cell_len, np.float64)
        r_abs = cells.astype(np.float64) * cl + flat[:, 0:3].astype(np.float64)
        r = r_abs[valid]
        v = flat[valid, 4:7]
        mid = flat[valid, 7].astype(np.int64)
        n = len(r)
        return MoleculeState.from_numpy(
            r=np.asarray(wrap_positions(jnp.asarray(r), self.box)),
            v=v,
            mid=mid.astype(np.int32),
            dtype=self.state.planes.dtype,
        )
