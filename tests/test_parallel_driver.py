"""ParallelMDSimulation: XML scene -> slab run with plugins (the
<parallelisation type="DomainDecomposition"> wiring)."""

import os

import numpy as np

from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation


def test_parallel_driver_runs_with_plugins(tmp_path):
    os.chdir(tmp_path)
    n, rho, T = 512, 0.5, 1.0
    L = (n / rho) ** (1 / 3)
    cfg = XMLConfig(
        timestep=0.002,
        temperature=T,
        box=np.array([L, L, L]),
        cutoff=2.5,
        lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator", {"numMolecules": str(n)}),
        output_plugins=[
            PluginSpec("ResultWriter",
                       {"writefrequency": "1", "outputprefix": "par"}),
        ],
    )
    sim = ParallelMDSimulation(cfg, n_devices=4)
    gv = sim.run(steps=5, print_every=0,
                 final_checkpoint=str(tmp_path / "par_end.restart.dat"))
    assert int(float(gv.n)) == n
    assert np.isfinite(float(gv.upot)) and float(gv.upot) < 0
    assert 0.3 < float(gv.temperature) < 3.0
    # ResultWriter ran on gathered state
    lines = (tmp_path / "par.res").read_text().splitlines()
    assert len([l for l in lines if not l.lstrip().startswith("#")]) == 5
    # final checkpoint restarts
    from ls1_mardyn_tpu.io.ascii_reader import read_inp

    data = read_inp(str(tmp_path / "par_end.restart.dat"))
    assert len(data.mid) == n


def test_parallel_matches_single_chip_globals(tmp_path):
    """SEQ vs PAR cross-check through the user-facing drivers."""
    os.chdir(tmp_path)
    import jax.numpy as jnp

    from ls1_mardyn_tpu.driver import MDSimulation

    n, rho, T = 512, 0.5, 1.0
    L = (n / rho) ** (1 / 3)

    def cfg():
        return XMLConfig(
            timestep=0.002, temperature=T, box=np.array([L, L, L]),
            cutoff=2.5, lj_cutoff=2.5,
            generator=PluginSpec("CubicGridGenerator",
                                 {"numMolecules": str(n)}),
        )

    psim = ParallelMDSimulation(cfg(), n_devices=4, dtype=jnp.float64)
    gv_par = psim.run(steps=5, print_every=0)

    ssim = MDSimulation(cfg(), dtype=jnp.float64, force_mode="cells")
    gv_seq = ssim.run(steps=5, print_every=0)

    np.testing.assert_allclose(
        float(gv_par.temperature), float(gv_seq.temperature), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(gv_par.upot), float(gv_seq.upot), rtol=1e-8
    )


def test_parallel_driver_mesh3d_beyond_slab_granularity(tmp_path):
    """More devices than z cell rows: the driver switches to the 3-D
    Cartesian mesh decomposition (DomainDecomposition MPIGridDims) and
    the run matches single-chip globals."""
    os.chdir(tmp_path)
    import jax.numpy as jnp

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.parallel.mesh3d import Mesh3DSimulation

    n, rho, T = 512, 0.5, 1.0
    L = (n / rho) ** (1 / 3)  # dims = (4,4,4) < 8 devices in z

    def cfg():
        return XMLConfig(
            timestep=0.002, temperature=T, box=np.array([L, L, L]),
            cutoff=2.5, lj_cutoff=2.5,
            generator=PluginSpec("CubicGridGenerator",
                                 {"numMolecules": str(n)}),
        )

    par = ParallelMDSimulation(cfg(), n_devices=8, dtype=jnp.float64)
    assert isinstance(par.sim, Mesh3DSimulation)
    assert int(np.prod(par.sim.cfg.grid)) == 8
    gv_par = par.run(
        steps=5, print_every=0,
        final_checkpoint=str(tmp_path / "mesh_end.restart.dat"),
    )

    seq = MDSimulation(cfg(), dtype=jnp.float64, force_mode="cells")
    gv_seq = seq.run(steps=5, print_every=0)

    assert int(float(gv_par.n)) == n
    np.testing.assert_allclose(
        float(gv_par.upot), float(gv_seq.upot), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(gv_par.temperature), float(gv_seq.temperature), rtol=1e-9
    )
    from ls1_mardyn_tpu.io.ascii_reader import read_inp

    data = read_inp(str(tmp_path / "mesh_end.restart.dat"))
    assert len(data.mid) == n
