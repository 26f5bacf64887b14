"""RMM dense-state simulation vs the general single-chip path.

The analogue of the reference's RMM validation (VCP1CLJRMMTest +
LeapfrogRMM equivalence): same scene, same steps, energies and
temperature must match the general path.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
from ls1_mardyn_tpu.ops.pallas_lj import SENTINEL_SCALE
from ls1_mardyn_tpu.ops.rmm import RMMSimulation
from ls1_mardyn_tpu.scene import build_scene
from ls1_mardyn_tpu.simulation import SimConfig, SingleChipSimulation


def test_rmm_matches_general_path():
    n, rho, T, rc = 500, 0.55, 1.0, 2.5
    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], T, seed=3)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float64)
    nd = int(np.floor(L / rc))
    spec = CellGridSpec(
        dims=(nd, nd, nd), box=tuple(float(b) for b in np.asarray(box)), cap=64
    )

    rmm = RMMSimulation(
        table, pp, box, spec, dt=0.002, target_temperature=T,
        thermostat=True, tx=0 if nd % 4 else 1, rebin_every=4, interpret=True,
    )
    # tx auto-pick analogue: choose a divisor of nd
    rmm.tx = next(t for t in (4, 2, 1) if nd % t == 0)
    rmm.init_from_molecules(mol)
    gv = rmm.run(10)

    path = PallasLJPath(table, spec, interpret=True)
    cfg = SimConfig(dt=0.002, target_temperature=T, thermostat=True)
    sim = SingleChipSimulation(mol, pp, box, cfg, force_fn=path)
    gv1 = sim.run(10)

    np.testing.assert_allclose(
        float(gv.temperature), float(gv1.temperature), rtol=1e-10
    )
    np.testing.assert_allclose(float(gv.upot), float(gv1.upot), rtol=1e-9)
    np.testing.assert_allclose(
        float(gv.pressure), float(gv1.pressure), rtol=1e-9
    )

    # roundtrip back to molecule arrays preserves everything
    mol2 = rmm.to_molecules()
    assert int(np.asarray(mol2.valid).sum()) == n
    assert set(np.asarray(mol2.mid).tolist()) == set(np.asarray(mol.mid).tolist())


def test_rmm_init_packing_consistent_on_boundaries():
    """Regression: init_from_molecules must bin by the SAME host-f64
    cell assignment that defines the cell-local coordinates.  An
    independent f32 device binning can disagree on boundary-exact
    coordinates (lattice scenes), displacing molecules by a whole cell
    edge (observed: 4% of molecules, forces ~1e12).  Invariant: the
    absolute position reconstructed from (cell origin + local) equals
    the molecule's true position."""
    import numpy as np
    import jax.numpy as jnp

    from ls1_mardyn_tpu.io.generators import cubic_grid
    from ls1_mardyn_tpu.models.components import Component
    from ls1_mardyn_tpu.ops.cells import CellGridSpec
    from ls1_mardyn_tpu.ops.rmm import RMMSimulation
    from ls1_mardyn_tpu.scene import build_scene

    n, nd, cap = 4096, 8, 32
    rho, rc, T = 0.8, 2.5, 1.1
    L = (n / rho) ** (1 / 3)
    c = Component(cid=0)
    c.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0, rc, True)
    data = cubic_grid(n, [L, L, L], T, components=[c], seed=7)
    # force many boundary-exact coordinates: snap a third of the
    # molecules onto cell planes
    cl = L / nd
    snap = np.arange(0, n, 3)
    data.r[snap, 0] = np.round(data.r[snap, 0] / cl) * cl % L
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    spec = CellGridSpec(dims=(nd, nd, nd),
                        box=tuple(float(b) for b in np.asarray(box)), cap=cap)
    sim = RMMSimulation(table, pp, box, spec, dt=0.002,
                        target_temperature=T, thermostat=True, tx=2,
                        interpret=True)
    sim.init_from_molecules(mol)
    p = np.asarray(sim.state.planes, np.float64)
    w = p[:, :, 3, :] > 0.5
    lane = np.arange(nd * cap)
    zz, yy = np.meshgrid(np.arange(nd), np.arange(nd), indexing="ij")
    clv = np.asarray(spec.cell_len)
    absr = np.stack([
        p[:, :, 0, :] + (lane // cap)[None, None, :] * clv[0],
        p[:, :, 1, :] + yy[:, :, None] * clv[1],
        p[:, :, 2, :] + zz[:, :, None] * clv[2],
    ], -1)
    mid = p[:, :, 7, :].astype(int)
    rt = np.asarray(mol.r, np.float64)[mid[w] - 1]
    err = np.abs(absr[w] - rt).max()
    assert err < 1e-4, f"mispacked molecules: max displacement {err}"


@pytest.mark.parametrize("sentinel_edge", [0.2, 0.8])
def test_rmm_shift_rebin_matches_full(sentinel_edge):
    """The 3-stage shift-merge rebin must produce the same molecules
    in the same cells with identical r/v/F as the global-sort rebin
    (slot assignment within a cell may differ), in both sentinel and
    validity-plane modes, after real drift across cell boundaries."""
    n, rho, rc, T = 500, 0.5, 2.5, 1.2
    L = (n / rho) ** (1 / 3)
    data = cubic_grid(n, [L, L, L], T, seed=3)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    nd = max(4, int(L / (rc + sentinel_edge)))
    nd -= nd % 4
    spec = CellGridSpec(dims=(nd, nd, nd),
                        box=tuple(float(b) for b in np.asarray(box)), cap=32)
    sim = RMMSimulation(table, pp, box, spec, dt=0.004,
                        target_temperature=T, thermostat=True, tx=4,
                        rebin_every=10 ** 9, sample_every=1, interpret=True)
    sim.init_from_molecules(mol)
    for _ in range(12):
        sim.state, _ = sim._step_jit(sim.state)
    st = sim.state
    sa, ova = sim._rebin(st)
    sb, ovb = sim._rebin_shift(st)
    assert not bool(ova) and not bool(ovb)

    def by_mid(s):
        p = np.asarray(s.planes)
        f = np.asarray(s.forces)
        nz, ny, C, W = p.shape
        flat = p.transpose(0, 1, 3, 2).reshape(-1, C)
        ff = f.transpose(0, 1, 3, 2).reshape(-1, 3)
        valid = flat[:, 3] > 0.5
        cap = spec.cap
        nx = spec.dims[0]
        cell = np.stack([
            np.tile(np.repeat(np.arange(nx), cap), nz * ny),
            np.tile(np.repeat(np.arange(ny), nx * cap), nz),
            np.repeat(np.arange(nz), ny * nx * cap),
        ], -1)
        o = np.argsort(flat[valid, 7])
        return flat[valid][o], ff[valid][o], cell[valid][o]

    fa, Fa, ca = by_mid(sa)
    fb, Fb, cb = by_mid(sb)
    assert fa.shape == fb.shape
    np.testing.assert_array_equal(fa[:, 7], fb[:, 7])  # same molecules
    np.testing.assert_array_equal(ca, cb)              # same cells
    np.testing.assert_array_equal(fa[:, 0:3], fb[:, 0:3])  # same locals
    np.testing.assert_array_equal(fa[:, 4:7], fb[:, 4:7])
    np.testing.assert_array_equal(Fa, Fb)
    if sim.sentinel:
        pb = np.asarray(sb.planes)
        wv = pb[:, :, 3, :] > 0.5
        slot = np.tile(np.arange(spec.cap), spec.dims[0])[None, None, :]
        exp = SENTINEL_SCALE * (1.0 + slot)
        assert not ((~wv) & (np.abs(pb[:, :, 1, :] - exp) > 1e-3)).any()
