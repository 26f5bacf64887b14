"""Multi-chip FMM: the sharded evaluation (one psum of the global leaf
table, replicated tree pass, x-sliced near field) must match the
single-chip solver on the same configuration.

TPU translation of the reference's MPI-parallel tree in its
duplicated-global-levels mode (/root/reference/src/bhfmm/containers/
UniformPseudoParticleContainer.h:95-135: global levels replicated on
every rank + allreduce of multipole moments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ls1_mardyn_tpu.ops.fmm import FMMSolver

NDEV = 8


def _mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:NDEV]), ("dd",))


def _scene(N, box, seed=7, gid_pairs=False):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0, box, (N, 3))
    q = np.where(np.arange(N) % 2 == 0, 1.0, -1.0).astype(np.float64)
    if gid_pairs:
        # two sites share a group id; sorting by z below can split a
        # group across devices -- the exclusion must still hold
        gid = (np.arange(N, dtype=np.int32) // 2) + 1
    else:
        gid = np.arange(N, dtype=np.int32) + 1
    return r, q, gid


def _run_sharded(solver, mesh, r, q, gid, ndev=NDEV):
    N = len(r)
    order = np.argsort(r[:, 2], kind="stable")
    rs = r[order].reshape(ndev, N // ndev, 3)
    qs = q[order].reshape(ndev, -1)
    gs = gid[order].reshape(ndev, -1)

    def f(rl, ql, gl):
        u, F, phi, ovf = solver.compute_sharded(
            rl[0], ql[0], ql[0] != 0.0, gl[0], "dd", ndev
        )
        return (
            jax.lax.psum(u, "dd"),
            F[None],
            phi[None],
            jax.lax.pmax(ovf.astype(jnp.int32), "dd"),
        )

    fn = shard_map(
        f,
        mesh=mesh,
        in_specs=(P("dd"), P("dd"), P("dd")),
        out_specs=(P(), P("dd"), P("dd"), P()),
    )
    U, F, phi, ovf = fn(
        jnp.asarray(rs), jnp.asarray(qs), jnp.asarray(gs)
    )
    assert int(ovf) == 0
    # back to original site order
    inv = np.empty(N, np.int64)
    inv[order] = np.arange(N)
    return float(U), np.asarray(F.reshape(N, 3))[inv], np.asarray(
        phi.reshape(N)
    )[inv]


@pytest.mark.parametrize("gid_pairs", [False, True])
def test_sharded_fmm_matches_single_chip(gid_pairs):
    mesh = _mesh()
    box = 10.0
    N = 512
    r, q, gid = _scene(N, box, gid_pairs=gid_pairs)
    solver = FMMSolver(
        box=box, depth=3, order=6, cap=64, dtype=jnp.float64,
        periodic=True,
    )
    U0, F0, phi0, ovf0 = solver._jit_compute(
        jnp.asarray(r), jnp.asarray(q), jnp.ones(N, bool),
        jnp.asarray(gid),
    )
    assert not bool(ovf0)
    U, F, phi = _run_sharded(solver, mesh, r, q, gid)
    np.testing.assert_allclose(U, float(U0), rtol=1e-11)
    scale = np.abs(np.asarray(F0)).max()
    np.testing.assert_allclose(F / scale, np.asarray(F0) / scale,
                               atol=1e-12)
    np.testing.assert_allclose(phi, np.asarray(phi0), rtol=1e-10,
                               atol=1e-12)


def test_sharded_fmm_replicated_fallback():
    """depth 2 -> 4 leaf rows < 8 devices: the near field falls back to
    the replicated single-contributor path and must still be exact."""
    mesh = _mesh()
    box = 8.0
    N = 256
    r, q, gid = _scene(N, box, seed=11)
    solver = FMMSolver(
        box=box, depth=2, order=6, cap=96, dtype=jnp.float64,
        periodic=True,
    )
    U0, F0, _phi0, ovf0 = solver._jit_compute(
        jnp.asarray(r), jnp.asarray(q), jnp.ones(N, bool),
        jnp.asarray(gid),
    )
    assert not bool(ovf0)
    U, F, _phi = _run_sharded(solver, mesh, r, q, gid)
    np.testing.assert_allclose(U, float(U0), rtol=1e-11)
    scale = np.abs(np.asarray(F0)).max()
    np.testing.assert_allclose(F / scale, np.asarray(F0) / scale,
                               atol=1e-12)


def test_parallel_driver_fmm_matches_single_chip(tmp_path, monkeypatch):
    """ewald_method='fmm' under --parallel (slab): the sharded FMM
    drives the same scene as the single-chip FMM driver; the globals
    after identical deterministic leapfrog steps must agree to
    reduction-order precision (the SEQ-vs-PAR harness of
    validationRun.py / Jenkinsfile:390-399)."""
    import os

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.ops.fmm import FMMElectrostatics
    from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation
    from tests.test_ewald_driver import _molten_salt_config

    _mesh()  # skip without 8 virtual devices
    os.chdir(tmp_path)
    # nz >= 8 devices: box = 20 * 1.1 = 22, rc 2.5 -> 8 rows.  n_side
    # must be EVEN: an odd rock-salt lattice carries net charge +1 and
    # the periodic lattice sum diverges (FMMSolver requires
    # neutrality), exploding both runs chaotically.
    cfg, data = _molten_salt_config(n_side=20, d=1.1)
    cfg.ewald_method = "fmm"
    cfg.fmm_order = 6
    monkeypatch.setattr(
        MDSimulation, "_load_phasespace", lambda self, c: data
    )
    seq = MDSimulation(cfg, dtype=jnp.float64)
    assert isinstance(seq.ewald, FMMElectrostatics)
    seq_gv = seq.run(steps=3, print_every=0)

    par = ParallelMDSimulation(cfg, n_devices=NDEV, dtype=jnp.float64)
    assert par.kind == "slab"
    assert par._fmm is not None
    par_gv = par.run(steps=3, print_every=0)
    np.testing.assert_allclose(
        float(par_gv.upot), float(seq_gv.upot), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(par_gv.temperature), float(seq_gv.temperature), rtol=1e-9
    )


def test_mesh3d_driver_fmm_matches_single_chip(tmp_path, monkeypatch):
    """ewald_method='fmm' on the 3-D mesh decomposition (devices > z
    rows forces mesh3d): SEQ-vs-PAR parity like the slab case, with
    the flat mesh rank feeding the sharded FMM's leaf-table offsets."""
    import os

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.ops.fmm import FMMElectrostatics
    from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation
    from tests.test_ewald_driver import _molten_salt_config

    _mesh()
    os.chdir(tmp_path)
    # box = 16 * 1.1 = 17.6, rc 2.5 -> 7 z rows < 8 devices -> mesh3d
    cfg, data = _molten_salt_config(n_side=16, d=1.1)
    cfg.ewald_method = "fmm"
    cfg.fmm_order = 6
    monkeypatch.setattr(
        MDSimulation, "_load_phasespace", lambda self, c: data
    )
    seq = MDSimulation(cfg, dtype=jnp.float64)
    assert isinstance(seq.ewald, FMMElectrostatics)
    seq_gv = seq.run(steps=3, print_every=0)

    par = ParallelMDSimulation(cfg, n_devices=NDEV, dtype=jnp.float64)
    assert par.kind == "mesh3d"
    assert par._fmm is not None
    par_gv = par.run(steps=3, print_every=0)
    np.testing.assert_allclose(
        float(par_gv.upot), float(seq_gv.upot), rtol=1e-9
    )
