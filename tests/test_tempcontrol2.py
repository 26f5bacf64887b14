"""TemperatureControl depth (VERDICT r1 missing item 3): target
ramping, thermostated-direction selection, slab subdivision, and the
multi-chip wiring.  Reference: TemperatureControl.{h:54-63,155,cpp}."""

import os

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig


def _base_cfg(n=343, rho=0.5, T=1.0, Lz_mult=1.0):
    L = (n / rho) ** (1 / 3)
    return XMLConfig(
        timestep=0.002, temperature=T,
        box=np.array([L, L, L * Lz_mult]),
        cutoff=2.5, lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator",
                             {"numMolecules": str(int(n * Lz_mult))}),
    ), L


def test_ramp_drives_temperature():
    cfg, L = _base_cfg()
    cfg.temp_control.append(dict(
        lower=(0.0, 0.0, 0.0), upper=(L, L, L),
        target_temperature=0.8, frequency=1, exponent=0.6,
        component=-1,
        ramp_start_t=0.8, ramp_end_t=1.6,
        ramp_update_start=50, ramp_update_stop=250,
        ramp_update_freq=10,
    ))
    sim = MDSimulation(cfg, dtype=jnp.float64, force_mode="cells")
    gv_pre = sim.run(steps=40, print_every=0)
    t_pre = float(gv_pre.temperature)
    gv_post = sim.run(steps=300, print_every=0)
    t_post = float(gv_post.temperature)
    # before the ramp: held near 0.8; after it: driven toward 1.6
    assert abs(t_pre - 0.8) < 0.15, t_pre
    assert t_post > 1.35, t_post


def test_directions_scale_only_chosen_components():
    cfg, L = _base_cfg(T=1.2)
    cfg.temp_control.append(dict(
        lower=(0.0, 0.0, 0.0), upper=(L, L, L),
        target_temperature=0.3, frequency=1, exponent=0.4,
        component=-1, directions=(0,),  # thermostat x only
    ))
    sim = MDSimulation(cfg, dtype=jnp.float64, force_mode="cells")
    sim.run(steps=120, print_every=0)
    mol = sim.molecules()
    v = np.asarray(mol.v)[np.asarray(mol.valid)]
    tx = (v[:, 0] ** 2).mean()
    tyz = 0.5 * (v[:, 1] ** 2 + v[:, 2] ** 2).mean()
    # x kinetic temperature cooled well below the unthermostated y/z
    assert tx < 0.6 * tyz, (tx, tyz)


def test_parallel_temp_control_regions(tmp_path):
    """The slab decomposition applies region thermostats with psum'd
    per-slab sums (the ADVICE r1 item: --parallel silently ignored
    temp_control)."""
    os.chdir(tmp_path)
    P = 8
    n, rho = 700, 0.35
    Lxy = 7.0
    Lz = n / (rho * Lxy * Lxy)
    cfg = XMLConfig(
        timestep=0.002, temperature=1.0,
        box=np.array([Lxy, Lxy, Lz]),
        cutoff=2.5, lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator",
                             {"numMolecules": str(n)}),
    )
    cfg.temp_control.append(dict(
        lower=(0.0, 0.0, 0.0), upper=(Lxy, Lxy, Lz / 2),
        target_temperature=0.4, frequency=1, exponent=0.6,
        component=-1,
    ))
    from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation

    sim = ParallelMDSimulation(cfg, n_devices=P, dtype=jnp.float64)
    assert sim.kind == "slab"
    assert sim.sim.cfg.temp_control_regions
    sim.run(steps=60, print_every=0)
    mol = sim.molecules()
    valid = np.asarray(mol.valid)
    r = np.asarray(mol.r)[valid]
    v = np.asarray(mol.v)[valid]
    lo = r[:, 2] < Lz / 2
    t_lo = (v[lo] ** 2).sum(1).mean() / 3
    t_hi = (v[~lo] ** 2).sum(1).mean() / 3
    assert t_lo < 0.75 * t_hi, (t_lo, t_hi)
