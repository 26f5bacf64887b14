"""Pallas shift-merge rebin (ops/pallas_rebin.py) vs the lax.sort
shift-merge rebin (ops/rmm.py:_rebin_shift): the kernel implements the
same stable (source-row, slot) packing order, so the output must be
BIT-identical -- planes, forces, sentinel fill, and the overflow flag.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.ops.cells import CellGridSpec
from ls1_mardyn_tpu.ops.rmm import RMMSimulation
from ls1_mardyn_tpu.scene import build_scene


def _drifted_sim(sentinel_edge, steps=12, dt=0.004, seed=3):
    n, rho, T = 500, 0.5, 1.2
    rc = 2.5
    L = (n / rho) ** (1 / 3)
    data = cubic_grid(n, [L, L, L], T, seed=seed)
    mol, pp, table, box = build_scene(data, cutoff=rc, dtype=jnp.float32)
    nd = max(4, int(L / (rc + sentinel_edge)))
    nd -= nd % 4
    spec = CellGridSpec(dims=(nd, nd, nd),
                        box=tuple(float(b) for b in np.asarray(box)), cap=32)
    sim = RMMSimulation(table, pp, box, spec, dt=dt,
                        target_temperature=T, thermostat=True, tx=4,
                        rebin_every=10 ** 9, sample_every=1, interpret=True)
    sim.init_from_molecules(mol)
    for _ in range(steps):
        sim.state, _ = sim._step_jit(sim.state)
    return sim


@pytest.mark.parametrize("sentinel_edge", [0.2, 0.8])
def test_pallas_rebin_bit_identical(sentinel_edge):
    sim = _drifted_sim(sentinel_edge)
    st = sim.state
    sa, ova = sim._rebin_shift(st)
    sb, ovb = sim._rebin_shift_pl(st)
    assert bool(ova) == bool(ovb) == False  # noqa: E712
    np.testing.assert_array_equal(np.asarray(sa.planes), np.asarray(sb.planes))
    np.testing.assert_array_equal(np.asarray(sa.forces), np.asarray(sb.forces))


def test_pallas_rebin_overflow_flag_on_skin_violation():
    """A state whose molecules hop more than one cell between rebins
    must latch the overflow flag in both implementations (the caller
    then falls back to the global rebin)."""
    sim = _drifted_sim(0.2, steps=0)
    st = sim.state
    # teleport one molecule two cells along x: local += 2*cell_len
    p = np.asarray(st.planes).copy()
    w = p[:, :, 3, :] > 0.5
    zi, yi, li = np.argwhere(w)[0]
    p[zi, yi, 0, li] += 2.0 * float(sim.spec.cell_len[0])
    st = type(st)(planes=jnp.asarray(p), forces=st.forces,
                  vcomp=st.vcomp, rcomp=st.rcomp, u6=st.u6, vir=st.vir)
    _, ova = sim._rebin_shift(st)
    _, ovb = sim._rebin_shift_pl(st)
    assert bool(ova) and bool(ovb)
