"""RMM dense-state simulation vs the general single-chip path.

The analogue of the reference's RMM validation (VCP1CLJRMMTest +
LeapfrogRMM equivalence): same scene, same steps, energies and
temperature must match the general path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.pallas_path import PallasLJPath
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
