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
