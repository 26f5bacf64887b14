"""Force-path adapter for the Pallas 1CLJ kernel.

Replaces the reference's reduced-memory-mode pipeline
(VCP1CLJRMM + ParticleCellRMM, /root/reference/src/particleContainer/
adapter/VCP1CLJRMM.cpp): flat molecule arrays are gathered into the
kernel's row-major cell layout each step (the rebinning the reference
does in LinkedCells::update + updateMoleculeCaches), the kernel runs,
and forces scatter back by the same index table.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import PairParams
from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles
from ls1_mardyn_tpu.ops.pallas_lj import SENTINEL_SCALE, lj_cell_forces_pallas
from ls1_mardyn_tpu.state import Forces, Macroscopic, MoleculeState


class PallasLJPath:
    """force_fn for SingleChipSimulation; single-component single-LJ-site
    molecules only (the reference's RMM restriction, MoleculeRMM.h:13)."""

    def __init__(self, table, spec: CellGridSpec, tx: int = 0, interpret: bool = False):
        assert table.K == 1 and len(table.components[0].ljcenters) == 1, (
            "PallasLJPath requires a single 1CLJ component (RMM mode)"
        )
        assert not table.has_electrostatics()
        self.spec = spec
        nx = spec.dims[0]
        if tx <= 0:
            # prefer tx*cap == 128 (required for the compiled TPU
            # kernel's lane alignment); interpret mode takes anything
            pref = max(1, 128 // spec.cap)
            tx = pref if nx % pref == 0 else next(
                t for t in (4, 2, 1) if nx % t == 0
            )
        assert nx % tx == 0, (nx, tx)
        self.tx = tx
        self.interpret = interpret
        self.eps24 = float(table.eps24[0, 0, 0, 0])
        self.sig2 = float(table.sig2[0, 0, 0, 0])
        self.shift6 = float(table.shift6[0, 0, 0, 0])
        self.rc2 = float(table.lj_cutoff ** 2)
        # j-transposed kernel mode: j window on sublanes (no lane-pad
        # tax, no MXU transposes) -- see pallas_lj
        self.jt = True
        self.hx = 1
        from ls1_mardyn_tpu.ops.pallas_lj import sentinel_eligible

        # cell-local coordinates require a uniform grid (origins are
        # exact integer cell arithmetic); non-uniform z rows use the
        # absolute-coordinate multi-site kernel or general traversal
        assert spec.z_edges is None, "1CLJ local-coords path needs a uniform grid"
        self.sentinel = sentinel_eligible(spec.cell_len, self.rc2, spec.cap)
        self.fast_recip = not interpret
        # cell-window kernel: per-i-cell j windows, 2x fewer candidate
        # lanes (see pallas_lj._lj_cw_kernel); needs register-aligned
        # group windows and >= 3 x-cells for its 3-cell right halo
        self.cw = (
            (4 * spec.cap) % 128 == 0
            and nx >= 3
            and float(min(spec.cell_len)) ** 2 >= self.rc2
        )

    def __call__(self, mol: MoleculeState) -> Tuple[Forces, Macroscopic, jnp.ndarray]:
        spec = self.spec
        nx, ny, nz = spec.dims
        cap = spec.cap
        n = mol.capacity
        dtype = mol.r.dtype
        Lx = spec.box[0]

        bins = bin_particles(mol.r, mol.valid, spec)
        idx = bins.slots.reshape(nz, ny, nx * cap)
        safe = jnp.clip(idx, 0, n - 1)
        ok = (idx >= 0) & mol.valid[safe]
        # one packed row-gather (TPU gathers like contiguous rows; three
        # strided column gathers measured 6x slower)
        pack = jnp.concatenate(
            [mol.r, mol.valid.astype(dtype)[:, None]], axis=1
        )  # [N, 4]
        # cell-local coordinates (full f32 precision at any box size;
        # periodicity becomes exact cell arithmetic in the kernel) --
        # origins and the sentinel fill come from iotas, XLA fuses them
        lane = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx * cap), 2)
        zc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx * cap), 0)
        yc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx * cap), 1)
        cl = spec.cell_len
        origin = jnp.stack(
            [
                (lane // cap).astype(dtype) * jnp.asarray(cl[0], dtype),
                yc.astype(dtype) * jnp.asarray(cl[1], dtype),
                zc.astype(dtype) * jnp.asarray(cl[2], dtype),
                jnp.zeros((nz, ny, nx * cap), dtype),
            ],
            axis=-1,
        )
        if self.sentinel:
            slot = (lane % cap).astype(dtype)
            fill = jnp.stack(
                [
                    jnp.zeros((nz, ny, nx * cap), dtype),
                    SENTINEL_SCALE * (1.0 + slot),
                    jnp.zeros((nz, ny, nx * cap), dtype),
                    jnp.zeros((nz, ny, nx * cap), dtype),
                ],
                axis=-1,
            )
        else:
            fill = jnp.zeros((), dtype)
        g = jnp.where(ok[..., None], pack[safe] - origin, fill)

        hx = self.hx

        def with_halo(a):
            """x halo of hx cells per side: plain copies -- cell-local
            coordinates need no +-Lx shift (the kernel's cell-difference
            offsets are exact)."""
            pad = jnp.zeros(a.shape[:2] + ((hx - 1) * cap, 4), a.dtype)
            left = a[:, :, (nx - 1) * cap :, :]
            right = a[:, :, :cap, :]
            parts = [left, a, right]
            if hx > 1:
                parts = [pad] + parts + [pad]
            return jnp.concatenate(parts, axis=2)

        r_i = jnp.moveaxis(g, -1, 2)  # [nz, ny, 4, nx*cap]
        kw = dict(
            nx=nx,
            ny=ny,
            nz=nz,
            cap=cap,
            tx=self.tx,
            box=spec.box,
            eps24=self.eps24,
            sig2=self.sig2,
            shift6=self.shift6,
            rc2=self.rc2,
            interpret=self.interpret,
            sentinel=self.sentinel,
            fast_recip=self.fast_recip,
        )
        if self.cw:
            from ls1_mardyn_tpu.ops.pallas_lj import lj_cell_forces_pallas_cw

            gj = jnp.concatenate(
                [g[:, :, (nx - 1) * cap :], g, g[:, :, : 3 * cap]], axis=2
            )
            f, u6, vir = lj_cell_forces_pallas_cw(
                r_i, jnp.moveaxis(gj, -1, 2), **kw
            )
        else:
            r_j = jnp.moveaxis(with_halo(g), -1, 2)
            f, u6, vir = lj_cell_forces_pallas(
                r_i, r_j, local_coords=True, hx=hx, jt=self.jt, **kw
            )
        # gather back to flat arrays via the inverse slot map (each
        # valid molecule occupies exactly one slot; gathers beat TPU
        # scatters by a wide margin)
        fxyz = jnp.moveaxis(f[:, :, :3, :], 2, -1).reshape(-1, 3)
        src = jnp.clip(bins.slot_of, 0, fxyz.shape[0] - 1)
        F = jnp.where(mol.valid[:, None], fxyz[src], 0.0)
        zeros = jnp.zeros((n, 3), dtype)
        forces = Forces(F=F, M=zeros, Vi=zeros)
        zero = jnp.zeros((), dtype)
        macro = Macroscopic(upot6lj=u6, upot_xpoles=zero, virial=vir, my_rf=zero)
        return forces, macro, bins.overflow
