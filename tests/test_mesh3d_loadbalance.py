"""mesh3d z-layer load balancing (VERDICT r2 next-item 4): dynamic
per-z-layer device bounds at device granularity, chosen from the
molecule distribution under the constraint layer extent >= nzl*rc
(cell pitch >= rc keeps the +-1-row halo valid).  Bounds are a dynamic
step argument -- moving them never recompiles.  Reference role:
KDDecomposition.h:21-55 rebalancing, here composed with the 3-D
Cartesian grid (DomainDecomposition.h MPIGridDims)."""

import os

import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.io.xml_config import XMLConfig
from ls1_mardyn_tpu.parallel.driver import ParallelMDSimulation

P = 8
LXY = 7.4
LZ = 7.4
FILM = 3.6


def _film_data(rho_liq=0.65, rho_vap=0.02, T=0.9):
    """Dense film in z < FILM inside a cube shallow enough (2 z cell
    rows) that 8 devices force the 2x2x2 mesh3d decomposition; the
    film sits entirely inside the lower uniform z layer, so uniform
    bounds are maximally imbalanced."""
    liq = cubic_grid(
        int(rho_liq * LXY * LXY * FILM), [LXY, LXY, FILM], T, seed=3
    )
    vap = cubic_grid(
        int(rho_vap * LXY * LXY * (LZ - FILM)),
        [LXY, LXY, LZ - FILM], T, seed=4,
    )
    vap.r[:, 2] += FILM
    n1 = len(liq.mid)
    return PhaseSpaceData(
        components=liq.components,
        mixing_xi=liq.mixing_xi,
        mixing_eta=liq.mixing_eta,
        eps_rf=liq.eps_rf,
        box=np.array([LXY, LXY, LZ]),
        temperature=T,
        current_time=0.0,
        mid=np.concatenate([liq.mid, vap.mid + n1]),
        cid=np.concatenate([liq.cid, vap.cid]),
        r=np.concatenate([liq.r, vap.r]),
        v=np.concatenate([liq.v, vap.v]),
        q=np.concatenate([liq.q, vap.q]),
        L=np.concatenate([liq.L, vap.L]),
    )


def _cfg():
    return XMLConfig(
        timestep=0.002, temperature=0.9,
        box=np.array([LXY, LXY, LZ]), cutoff=2.5, lj_cutoff=2.5,
    )


def _layer_counts(sim):
    g = sim.molecules()
    valid = np.asarray(g.valid)
    z = np.asarray(g.r)[valid, 2]
    zb = sim.sim.zb_host
    Pz = sim.sim.cfg.grid[2]
    lay = np.clip(np.searchsorted(zb[1:-1], z, side="right"), 0, Pz - 1)
    return np.bincount(lay, minlength=Pz), z


def test_mesh3d_init_balancing_drops_imbalance(tmp_path):
    os.chdir(tmp_path)
    data = _film_data()
    sim = ParallelMDSimulation(_cfg(), n_devices=P, dtype=jnp.float64,
                               phase_space_data=data)
    assert sim.kind == "mesh3d"
    Pz = sim.sim.cfg.grid[2]
    assert Pz == 2
    # init-time balancing adopted non-uniform bounds
    zb = sim.sim.zb_host
    assert not np.allclose(np.diff(zb), LZ / Pz)
    # min-height constraint holds (cell pitch >= rc inside every layer)
    min_h = sim.sim.cfg.nzl * 2.5
    assert (np.diff(zb) >= min_h * (1 - 1e-6)).all()
    counts_bal, z = _layer_counts(sim)
    counts_uni = np.bincount(
        np.clip((z / (LZ / Pz)).astype(int), 0, Pz - 1), minlength=Pz
    )
    imb_uni = counts_uni.max() / counts_uni.mean()
    imb_bal = counts_bal.max() / counts_bal.mean()
    assert imb_uni / imb_bal >= 1.25, (imb_uni, imb_bal)
    # a few steps run clean across the moved bounds (migration +
    # halos route by the dynamic zb)
    gv = sim.run(steps=3, print_every=0)
    assert np.isfinite(float(gv.upot))


def _xfilm_data(rho_liq=0.65, rho_vap=0.01, T=0.9):
    """Dense film in x within [2.0, 3.6]: inhomogeneity NORMAL TO X,
    the case single-axis (z-only) balancing cannot touch (round-3
    verdict item 8; reference role: the KD tree repartitions all axes,
    KDDecomposition.h:21-55, and ALL's TENSOR method balances each
    axis marginal, src/parallel/ALLLoadBalancer.h).

    Geometry note: the film sits entirely inside the lower uniform x
    device layer (edge 3.7) but with its count-median at x ~ 2.8 >=
    the min layer extent nxl*rc = 2.5, so the balancer can actually
    reach the equal-count edge.  With Px = 2 layers the uniform
    imbalance is ~2.0 (everything in one layer), the theoretical
    maximum -- the balanced bounds must bring it to ~1.0."""
    x_lo, x_hi = 2.0, FILM
    # hand-rolled film lattice: two x planes (2.35, 3.15) with the
    # second plane y/z-offset by half a spacing (min pair distance
    # 0.76 sigma) and +-0.2 x jitter so the x MARGINAL is symmetric
    # about ~2.75 -- cubic_grid's truncated lattice parks the film's
    # count-median below the min layer extent (2.5) and the balancer
    # clamps; the physics needs only a valid LJ-safe configuration
    rng = np.random.default_rng(17)
    a = 1.3
    ys = np.arange(0.3, LXY - 0.2, a)
    zs = np.arange(0.3, LZ - 0.2, a)
    p1 = np.stack(np.meshgrid([x_lo + 0.35], ys, zs,
                              indexing="ij"), -1).reshape(-1, 3)
    p2 = np.stack(np.meshgrid([x_lo + 1.15], ys + a / 2, zs + a / 2,
                              indexing="ij"), -1).reshape(-1, 3)
    pts = np.concatenate([p1, p2])
    pts[:, 0] += rng.uniform(-0.2, 0.2, len(pts))
    liq = cubic_grid(len(pts), [x_hi - x_lo, LXY, LZ], T, seed=3)
    liq.r = pts
    liq.mid = np.arange(1, len(pts) + 1, dtype=np.int64)
    liq.cid = np.zeros(len(pts), np.int64)
    liq.v = rng.normal(0.0, np.sqrt(T), (len(pts), 3))
    liq.q = np.tile([1.0, 0.0, 0.0, 0.0], (len(pts), 1))
    liq.L = np.zeros((len(pts), 3))
    vap_lo = cubic_grid(
        int(rho_vap * x_lo * LXY * LZ), [x_lo, LXY, LZ], T, seed=4,
    )
    vap_hi = cubic_grid(
        int(rho_vap * (LXY - x_hi) * LXY * LZ),
        [LXY - x_hi, LXY, LZ], T, seed=5,
    )
    vap_hi.r[:, 0] += x_hi
    n1 = len(liq.mid)
    n2 = n1 + len(vap_lo.mid)
    return PhaseSpaceData(
        components=liq.components,
        mixing_xi=liq.mixing_xi,
        mixing_eta=liq.mixing_eta,
        eps_rf=liq.eps_rf,
        box=np.array([LXY, LXY, LZ]),
        temperature=T,
        current_time=0.0,
        mid=np.concatenate(
            [liq.mid, vap_lo.mid + n1, vap_hi.mid + n2]
        ),
        cid=np.concatenate([liq.cid, vap_lo.cid, vap_hi.cid]),
        r=np.concatenate([liq.r, vap_lo.r, vap_hi.r]),
        v=np.concatenate([liq.v, vap_lo.v, vap_hi.v]),
        q=np.concatenate([liq.q, vap_lo.q, vap_hi.q]),
        L=np.concatenate([liq.L, vap_lo.L, vap_hi.L]),
    )


def test_mesh3d_x_axis_balancing(tmp_path):
    """An x-inhomogeneous scene under mesh3d gets balanced x bounds
    (imbalance drop >= 2x vs uniform) and the physics still matches a
    single-chip run."""
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.driver import MDSimulation

    # the scene is symmetric under axis swap; disable the engine's
    # axis-swap heuristic so the x film genuinely exercises x bounds
    data = _xfilm_data()
    par = ParallelMDSimulation(_cfg(), n_devices=P, dtype=jnp.float64,
                               phase_space_data=data)
    assert par.kind == "mesh3d"
    Px = par.sim.cfg.grid[0]
    assert Px == 2
    xb = par.sim.xb_host
    # init-time balancing adopted non-uniform x bounds with the
    # min-extent constraint intact
    assert not np.allclose(np.diff(xb), LXY / Px)
    min_w = par.sim.cfg.nxl * 2.5
    assert (np.diff(xb) >= min_w * (1 - 1e-6)).all()
    g = par.molecules()
    valid = np.asarray(g.valid)
    x = np.asarray(g.r)[valid, 0]
    lay = np.clip(np.searchsorted(xb[1:-1], x, side="right"), 0, Px - 1)
    counts_bal = np.bincount(lay, minlength=Px)
    counts_uni = np.bincount(
        np.clip((x / (LXY / Px)).astype(int), 0, Px - 1), minlength=Px
    )
    imb_uni = counts_uni.max() / counts_uni.mean()
    imb_bal = counts_bal.max() / counts_bal.mean()
    # with Px = 2 layers, imb_uni <= 2.0 by definition; the scene puts
    # it at ~1.97 (everything in layer 0) and the balanced bounds must
    # take it to ~1.0 -- i.e. the drop saturates the geometric maximum
    assert imb_uni >= 1.85, imb_uni
    assert imb_bal <= 1.1, imb_bal
    assert imb_uni / imb_bal >= 1.75, (imb_uni, imb_bal)
    # physics parity across the moved x bounds
    gv_p = par.run(steps=3, print_every=0)
    seq = MDSimulation(_cfg(), dtype=jnp.float64, force_mode="cells",
                       phase_space_data=_xfilm_data(),
                       allow_axis_swap=False)
    gv_s = seq.run(steps=3, print_every=0)
    assert abs(float(gv_p.upot) - float(gv_s.upot)) < 1e-6 * max(
        1.0, abs(float(gv_s.upot))
    )
    assert abs(float(gv_p.temperature) - float(gv_s.temperature)) < 1e-9


def test_mesh3d_balanced_matches_single_chip(tmp_path):
    """Balanced bounds change WHERE molecules live, not the physics:
    global U/T match a single-chip run of the same scene."""
    os.chdir(tmp_path)
    from ls1_mardyn_tpu.driver import MDSimulation

    data = _film_data()
    par = ParallelMDSimulation(_cfg(), n_devices=P, dtype=jnp.float64,
                               phase_space_data=data)
    assert par.kind == "mesh3d"
    assert not np.allclose(
        np.diff(par.sim.zb_host), LZ / par.sim.cfg.grid[2]
    )
    gv_p = par.run(steps=3, print_every=0)
    seq = MDSimulation(_cfg(), dtype=jnp.float64, force_mode="cells",
                       phase_space_data=data)
    gv_s = seq.run(steps=3, print_every=0)
    assert abs(float(gv_p.upot) - float(gv_s.upot)) < 1e-6 * max(
        1.0, abs(float(gv_s.upot))
    )
    assert abs(float(gv_p.temperature) - float(gv_s.temperature)) < 1e-9
