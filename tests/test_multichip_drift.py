"""Multi-chip NVE energy drift (VERDICT r1 item 4): the sharded f32
step uses Kahan-compensated integration (the SPDP mixed-precision
role, SIMD_TYPES.h:110-113).  The 8-device run must conserve energy
like a 1-device run of the same engine (i.e. migration, halo
exchange, and the compensation-carrying payload inject no energy),
and the absolute drift must stay at the f32 noise floor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.models.components import Component
from ls1_mardyn_tpu.parallel.decomposition import SlabConfig, SlabSimulation
from ls1_mardyn_tpu.scene import build_scene

STEPS = 800


@pytest.fixture(scope="module")
def scene():
    # elongated box: |r| ~ 25 makes absolute-f32 integration rounding
    # visible (ulp(25) ~ 2e-6 vs dt*v ~ 2e-3)
    c = Component(cid=0)
    rc = 2.5
    c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, rc, True)  # shifted
    n, Lxy = 500, 7.0
    Lz = n / (0.4 * Lxy * Lxy)
    data = cubic_grid(n, [Lxy, Lxy, Lz], 0.85, seed=6, components=[c])
    mol, pp, table, _ = build_scene(data, cutoff=2.5, dtype=jnp.float32)
    return data, mol, pp, table, (Lxy, Lxy, Lz), n


def _drift(energies):
    e = np.asarray(energies)
    return float(np.abs(e - e[0]).max() / max(abs(e[0]), 1.0))


def _run(scene, n_dev):
    data, mol, pp, table, box, n = scene
    nz = int(box[2] / 2.5) // n_dev * n_dev
    cfg = SlabConfig(
        n_devices=n_dev, nz_local=nz // n_dev, ny=2, nx=2, cap=64,
        box=tuple(float(b) for b in box),
        n_local_cap=2 * n // n_dev + 64, migrate_cap=64, tx=2, dt=0.002,
        target_temperature=0.0, thermostat=False,
        eps24=float(table.eps24[0, 0, 0, 0]),
        sig2=float(table.sig2[0, 0, 0, 0]),
        shift6=float(table.shift6[0, 0, 0, 0]),
        rc2=6.25, interpret=True,
    )
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dd",))
    sim = SlabSimulation(cfg, pp, mesh=mesh)
    mol_sh = sim.distribute(mol)
    aux = sim.make_aux(sim._force_sharded(mol_sh)[0])
    edges = sim._edges_default
    es = []
    for k in range(STEPS):
        mol_sh, aux, gv, _macro, ovf, _nloc = sim._step_sharded_lb(
            mol_sh, aux, edges, jnp.asarray(k, jnp.int32)
        )
        if k % 20 == 0:
            es.append(float(gv.upot) + 0.5 * float(gv.summv2))
            assert not bool(ovf)
    return _drift(es)


def test_sharded_f32_nve_drift_matches_single_device(scene):
    drift_single = _run(scene, 1)
    drift_sharded = _run(scene, 8)
    # VERDICT r1 item 4 'Done' criterion: within 2x of the 1-device
    # figure of the same engine at the same dt (plus an f32 sampling
    # noise floor on E ~ O(1e3))
    floor = 5e-5
    assert drift_sharded < 2.0 * max(drift_single, floor), (
        drift_sharded, drift_single,
    )
    # and absolutely small: compensated integration holds the drift at
    # the f32 noise floor over 800 steps (uncompensated absolute-f32
    # measured ~100x worse on this scene class, README 'Precision')
    assert drift_sharded < 2e-3, drift_sharded
