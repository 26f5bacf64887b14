"""WallPotential on the siteWiseForces slot (VERDICT r1 item 7): the
wall energy appears in U_pot and the wall force is the exact gradient
(NVE stays conserved with the wall active).  Reference:
src/plugins/WallPotential.{h:124,cpp:105-260}."""

import os

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _scene(n=125, T=0.8):
    L = 8.0
    data = cubic_grid(n, [L, 3.0, L], T, seed=5)
    data.r[:, 1] += 1.0  # keep everyone a bit off the floor
    data.box = np.array([L, 8.0, L])
    return data, L


def _cfg(L, plugins, ensemble="NVT", T=0.8):
    return XMLConfig(
        timestep=0.001, temperature=T, box=np.array([L, 8.0, L]),
        cutoff=2.2, lj_cutoff=2.2, ensemble_type=ensemble,
        plugins=[PluginSpec(name=nm, params=pr) for nm, pr in plugins],
    )


WALL = {"potential": "93", "density": "0.9", "sigma": "1.0",
        "epsilon": "1.0", "yoff": "0.0", "ycut": "2.0", "width": "0.0"}


def _u93_expected(y, rho=0.9, eps=1.0, sig_w=1.0, ycut=2.0, sig_c=1.0,
                  eps_c=1.0):
    e = np.sqrt(eps * eps_c)
    s = 0.5 * (sig_w + sig_c)
    s3 = s**3
    s9 = s3**3

    def u(yy):
        return 4 * np.pi * rho * e * s3 * (
            s9 / (45 * yy**9) - s3 / (6 * yy**3)
        )

    yy = np.abs(y)
    return np.where(yy < ycut, u(np.maximum(yy, 1e-6)) - u(ycut), 0.0)


def test_wall_energy_in_upot(tmp_path):
    os.chdir(tmp_path)
    data, L = _scene()
    sim = MDSimulation(_cfg(L, [("WallPotential", dict(WALL))]),
                       dtype=jnp.float64, phase_space_data=data)
    sim.engine.prepare_start()
    u_with = float(sim.engine.macro.upot)

    data2, _ = _scene()
    sim0 = MDSimulation(_cfg(L, []), dtype=jnp.float64,
                        phase_space_data=data2)
    sim0.engine.prepare_start()
    u_without = float(sim0.engine.macro.upot)

    # sigma/eps of the fluid are 1 (cubic_grid default component)
    expected = _u93_expected(np.asarray(data.r)[:, 1]).sum()
    assert abs((u_with - u_without) - expected) < 1e-8 * max(
        abs(expected), 1.0
    )


def _etot(gv):
    # gv.upot is the TOTAL potential energy (Macroscopic.upot)
    return float(gv.upot) + 0.5 * float(gv.summv2)


def test_wall_nve_conserves_energy(tmp_path):
    """The wall force must be the exact gradient of the wall energy:
    a single molecule oscillating in the 9-3 well (never crossing the
    truncation plane) conserves E = U + KE to integrator accuracy."""
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData

    base = cubic_grid(1, [8.0, 8.0, 8.0], 0.0, seed=1)
    # 9-3 well minimum sits at y = sig_wi*(2/5)^(1/6) ~ 0.858 (depth
    # ~2.6 eps); 0.5*v^2 = 0.5 keeps the orbit inside the well
    base.r[:] = np.array([[4.0, 0.86, 4.0]])
    base.v[:] = np.array([[0.0, 1.0, 0.0]])
    base.box = np.array([8.0, 8.0, 8.0])
    cfg = _cfg(8.0, [("WallPotential", dict(WALL))], ensemble="NVE")
    cfg.box = np.array([8.0, 8.0, 8.0])
    cfg.timestep = 0.0005
    sim = MDSimulation(cfg, dtype=jnp.float64, phase_space_data=base)
    gv0 = sim.run(steps=1, print_every=0)
    e0 = _etot(gv0)
    gv1 = sim.run(steps=1000, print_every=0)
    e1 = _etot(gv1)
    assert abs(e1 - e0) < 1e-5 * max(abs(e0), 1.0), (e0, e1)
    # the molecule stayed in the well (never reached the cutoff plane)
    y = float(np.asarray(sim.molecules().r)[0, 1])
    assert 0.2 < y < 2.0


def test_wall_holds_fluid_off_floor(tmp_path):
    """Many-body smoke: the repulsive core keeps the fluid off y=0 and
    the total energy stays bounded (the truncated tail makes exact NVE
    conservation scene-dependent, as in the reference)."""
    os.chdir(tmp_path)
    data, L = _scene(T=0.6)
    cfg = _cfg(L, [("WallPotential", dict(WALL))], ensemble="NVE")
    sim = MDSimulation(cfg, dtype=jnp.float64, phase_space_data=data)
    gv0 = sim.run(steps=1, print_every=0)
    gv1 = sim.run(steps=200, print_every=0)
    assert abs(_etot(gv1) - _etot(gv0)) < 0.15 * abs(_etot(gv0))
    y = np.asarray(sim.molecules().r)[np.asarray(sim.molecules().valid), 1]
    assert (y > 0.15).all()
