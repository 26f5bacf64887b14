"""DistControl / DriftCtrl / PosNegComp / ExtractPhase / MettDeamon."""

import os

import numpy as np

from ls1_mardyn_tpu.driver import MDSimulation
from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig
from ls1_mardyn_tpu.models.components import Component


def _slab_config(plugins=(), Ly=30.0, T=0.8, rho=0.7):
    """Liquid film in y [10, 20), vapor elsewhere."""
    Lx = Lz = 8.0
    c = Component(cid=0)
    c.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0)
    n = int(rho * Lx * Lz * 10.0)
    rng = np.random.default_rng(12)
    r = rng.uniform(0, 1, (n, 3)) * np.array([Lx, 10.0, Lz])
    r[:, 1] += 10.0
    v = rng.normal(0, np.sqrt(T), (n, 3))
    box = np.array([Lx, Ly, Lz])
    cfg = XMLConfig(
        timestep=0.002, temperature=T, box=box, cutoff=2.5, lj_cutoff=2.5,
        components=[c], mixing_xi=np.ones((1, 1)), mixing_eta=np.ones((1, 1)),
        plugins=[PluginSpec(nm, dict(pr)) for nm, pr in plugins],
    )
    data = PhaseSpaceData(
        components=[c], mixing_xi=np.ones((1, 1)), mixing_eta=np.ones((1, 1)),
        eps_rf=1.0, box=box, temperature=T, current_time=0.0,
        mid=np.arange(1, n + 1, dtype=np.int64),
        cid=np.zeros(n, np.int32), r=r, v=v,
        q=np.tile([1.0, 0, 0, 0], (n, 1)), L=np.zeros_like(r),
    )
    return cfg, data, n


def _sim(cfg, data, monkeypatch):
    monkeypatch.setattr(MDSimulation, "_load_phasespace", lambda self, c: data)
    return MDSimulation(cfg, force_mode="cells")


def test_distcontrol_finds_interfaces(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    cfg, data, n = _slab_config(plugins=[
        ("DistControl", {"control": {"update": "1"},
                         "subdivision": {"number": "60"},
                         "method": {"type": "density"},
                         "outputprefix": "DistControl"}),
    ])
    sim = _sim(cfg, data, monkeypatch)
    dc = sim._plugins[0]
    # init() already located the film at [10, 20)
    assert 9.0 < dc.left < 11.5
    assert 18.5 < dc.right < 21.0
    seen = []
    dc.register_observer(lambda l, r: seen.append((l, r)))
    sim.run(steps=1, print_every=0)
    assert seen  # observer notified on update
    sim._plugins[0].finish(sim)
    assert (tmp_path / "DistControl.dat").exists()


def test_distcontrol_denderiv(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    cfg, data, n = _slab_config(plugins=[
        ("DistControl", {"control": {"update": "1"},
                         "subdivision": {"number": "60"},
                         "method": {"type": "denderiv"}}),
    ])
    sim = _sim(cfg, data, monkeypatch)
    dc = sim._plugins[0]
    assert 9.0 < dc.left < 11.5
    assert 18.5 < dc.right < 21.0


def test_driftctrl_imposes_drift(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    cfg, data, n = _slab_config(plugins=[
        ("DriftCtrl", {"control": {"freq": {"control": "1"}},
                       "target": {"cid": "1",
                                  "drift": {"vx": "0.5", "vy": "0", "vz": "0"}},
                       "range": {"yl": "10", "yr": "20",
                                 "subdivision": {"binwidth": "2.5"}}}),
    ])
    sim = _sim(cfg, data, monkeypatch)
    # trigger the control pass directly (before_forces at step 1... use run)
    sim._plugins[0].before_forces(sim, 0)
    mol = sim.engine.mol
    v = np.asarray(mol.v)
    y = np.asarray(mol.r)[:, 1]
    valid = np.asarray(mol.valid)
    for lo in (10.0, 12.5, 15.0, 17.5):
        sel = valid & (y >= lo) & (y < lo + 2.5)
        np.testing.assert_allclose(v[sel, 0].mean(), 0.5, atol=1e-6)
        np.testing.assert_allclose(v[sel, 1].mean(), 0.0, atol=1e-6)


def test_posnegcomp(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    c2 = Component(cid=1)
    c2.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0)
    cfg, data, n = _slab_config(plugins=[
        ("PosNegComp", {"cid_ub_pos": "1", "cid_ub_neg": "2"}),
    ])
    cfg.components.append(c2)
    data.components.append(c2)
    data.mixing_xi = np.ones((2, 2))
    data.mixing_eta = np.ones((2, 2))
    cfg.mixing_xi = np.ones((2, 2))
    cfg.mixing_eta = np.ones((2, 2))
    sim = _sim(cfg, data, monkeypatch)
    sim._plugins[0].before_forces(sim, 0)
    mol = sim.engine.mol
    v = np.asarray(mol.v)
    cid = np.asarray(mol.cid)
    valid = np.asarray(mol.valid)
    assert (cid[valid & (v[:, 1] >= 0)] == 0).all()
    assert (cid[valid & (v[:, 1] < 0)] == 1).all()


def test_extractphase(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    cfg, data, n = _slab_config(plugins=[
        ("ExtractPhase", {"step": "1", "left": "10", "right": "20"}),
    ])
    # add a few vapor molecules outside the film
    extra = np.array([[1.0, 2.0, 1.0], [1.0, 25.0, 1.0]])
    data.r = np.vstack([data.r, extra])
    data.v = np.vstack([data.v, np.zeros((2, 3))])
    data.q = np.vstack([data.q, np.tile([1.0, 0, 0, 0], (2, 1))])
    data.L = np.vstack([data.L, np.zeros((2, 3))])
    data.cid = np.concatenate([data.cid, np.zeros(2, np.int32)])
    data.mid = np.concatenate([data.mid, [n + 1, n + 2]])
    sim = _sim(cfg, data, monkeypatch)
    assert int(np.asarray(sim.engine.mol.valid).sum()) == n + 2
    sim._plugins[0].before_forces(sim, 1)
    mol = sim.engine.mol
    valid = np.asarray(mol.valid)
    assert int(valid.sum()) == n
    y = np.asarray(mol.r)[valid, 1]
    assert ((y >= 10.0) & (y <= 20.0)).all()


def _mett_config(plugins=()):
    """Two-component scene (component 2 = frozen variant of 1) with a
    liquid slab at the bottom serving as the in-memory reservoir."""
    Lx = Lz = 8.0
    Ly = 30.0
    T = 0.8
    comps = []
    for k in range(2):
        c = Component(cid=k)
        c.add_ljcenter(0, 0, 0, 1.0, 1.0, 1.0)
        comps.append(c)
    rng = np.random.default_rng(12)
    n = 400
    r = rng.uniform(0, 1, (n, 3)) * np.array([Lx, 8.0, Lz])
    v = rng.normal(0, np.sqrt(T), (n, 3))
    box = np.array([Lx, Ly, Lz])
    cfg = XMLConfig(
        timestep=0.002, temperature=T, box=box, cutoff=2.5,
        lj_cutoff=2.5, components=comps,
        mixing_xi=np.ones((2, 2)), mixing_eta=np.ones((2, 2)),
        plugins=[PluginSpec(nm, dict(pr)) for nm, pr in plugins],
    )
    data = PhaseSpaceData(
        components=comps, mixing_xi=np.ones((2, 2)),
        mixing_eta=np.ones((2, 2)),
        eps_rf=1.0, box=box, temperature=T, current_time=0.0,
        mid=np.arange(1, n + 1, dtype=np.int64),
        cid=np.zeros(n, np.int32), r=r, v=v,
        q=np.tile([1.0, 0, 0, 0], (n, 1)), L=np.zeros_like(r),
    )
    return cfg, data, n


def test_mettdeamon_reservoir_feed_and_release(tmp_path, monkeypatch):
    """Reference reservoir-slab semantics (MettDeamon.cpp): feed sum
    crossing one bin width inserts the active reservoir bin as FROZEN
    component-2 molecules at the feed boundary; frozen molecules ride
    with the feed; crossing the transition plane (2 bin widths)
    releases them back to component 1."""
    import dataclasses as dc

    import jax.numpy as jnp

    os.chdir(tmp_path)
    cfg, data, n = _mett_config(plugins=[
        ("MettDeamon", {
            "control": {"updatefreq": "10",
                        "feed": {"init": "1.1", "direction": "1",
                                 "method": "4",
                                 "release_velo": {"method": "1"}}},
            "reservoir": {"width": "4.0", "binwidth": "2.0",
                          "ins_percent": "1.0"},
            "changes": {"change": {"from": "1", "to": "2"}},
            "writefrequency": "1",
        }),
    ])
    sim = _sim(cfg, data, monkeypatch)
    md = sim._plugins[0]
    assert md.bins and len(md.bins) == 2
    assert md.transition_y == 4.0

    # free some capacity (molecules deleted by an evaporation sink)
    mol = sim.engine.mol
    valid = np.asarray(mol.valid).copy()
    kill = np.flatnonzero(valid)[:120]
    valid[kill] = False
    sim.engine.mol = dc.replace(mol, valid=jnp.asarray(valid))

    md.before_event_new_timestep(sim, 1)
    md.before_forces(sim, 1)  # feed_sum = 1.1 < binwidth: no insert
    assert md.inserted == 0
    md.before_event_new_timestep(sim, 2)
    md.before_forces(sim, 2)  # feed_sum = 2.2 >= 2.0: insert bin 0
    assert md.inserted > 0
    mol = sim.engine.mol
    valid = np.asarray(mol.valid)
    cid = np.asarray(mol.cid)
    frozen = valid & (cid == 1)
    assert frozen.sum() == md.inserted
    y_frozen = np.asarray(mol.r)[frozen, 1]
    # inserted at the feed boundary: y in [feed_sum - bin, feed_sum)
    assert (y_frozen < 2.0 + 0.21).all()
    assert md.active_bin == 1

    # frozen molecules ride with the feed
    y0 = np.asarray(mol.r)[frozen, 1].copy()
    md.before_event_new_timestep(sim, 3)
    md.before_forces(sim, 3)
    mol = sim.engine.mol
    y1 = np.asarray(mol.r)[np.asarray(mol.valid)
                           & (np.asarray(mol.cid) == 1), 1]
    assert len(y1) >= len(y0)

    # teleport one frozen molecule past the transition plane: released
    mol = sim.engine.mol
    cid = np.asarray(mol.cid)
    valid = np.asarray(mol.valid)
    fi = np.flatnonzero(valid & (cid == 1))[0]
    r = np.array(mol.r)
    r[fi, 1] = md.transition_y + 0.5
    sim.engine.mol = dc.replace(mol, r=jnp.asarray(r, mol.r.dtype))
    md.before_event_new_timestep(sim, 4)
    md.before_forces(sim, 4)
    assert md.released >= 1
    assert int(np.asarray(sim.engine.mol.cid)[fi]) == 0
    # feed log written
    md.after_forces(sim, 4)
    assert os.path.exists("MettDeamon_feed.dat")
