"""Cell-table GCMC probe: O(27*cap) per trial instead of O(N)
(LinkedCells::getEnergy is cell-local in the reference,
/root/reference/src/particleContainer/LinkedCells.cpp).  Round-2
verdict item 7: at the 10M-molecule muVT scale each interval did
n_trials x O(N) work."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.ensemble.grand_canonical import (
    ChemicalPotential,
    GrandCanonicalEnsemble,
    cell_probe_energy,
    single_molecule_energy,
)
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.scene import build_scene


def _scene(n=600, rho=0.35, T=1.2):
    L = (n / rho) ** (1 / 3)  # ~12: >= 3 cells per axis at rc 2.5
    data = cubic_grid(n, [L, L, L], T, seed=5)
    mol, pp, table, box = build_scene(
        data, cutoff=2.5, dtype=jnp.float64,
        capacity=n + 128,
    )
    return mol, pp, box, L


def test_cell_probe_matches_full_probe():
    from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles

    mol, pp, box, L = _scene()
    rc = 2.5
    dims = tuple(int(np.floor(L / rc)) for _ in range(3))
    spec = CellGridSpec(dims=dims, box=(L, L, L), cap=64)
    bins = bin_particles(mol.r, mol.valid, spec)
    assert not bool(bins.overflow)
    rng = np.random.default_rng(2)
    for _ in range(6):
        r = jnp.asarray(rng.uniform(0, L, 3))
        q = jnp.asarray([1.0, 0, 0, 0])
        e_full = float(
            single_molecule_energy(
                mol, pp, jnp.asarray([L] * 3), r, q,
                jnp.asarray(0, jnp.int32), jnp.asarray(-1, jnp.int32),
            )
        )
        e_cell = float(
            cell_probe_energy(
                mol, pp, jnp.asarray([L] * 3), bins.slots, dims, r, q,
                jnp.asarray(0, jnp.int32), jnp.asarray(-1, jnp.int32),
            )
        )
        np.testing.assert_allclose(e_cell, e_full, rtol=1e-12, atol=1e-12)
    # exclusion: a real molecule's self-energy probe
    e_full = float(
        single_molecule_energy(
            mol, pp, jnp.asarray([L] * 3), mol.r[7], mol.q[7],
            mol.cid[7], jnp.asarray(7, jnp.int32),
        )
    )
    e_cell = float(
        cell_probe_energy(
            mol, pp, jnp.asarray([L] * 3), bins.slots, dims,
            mol.r[7], mol.q[7], mol.cid[7], jnp.asarray(7, jnp.int32),
        )
    )
    np.testing.assert_allclose(e_cell, e_full, rtol=1e-12, atol=1e-12)


def test_cell_probe_cycle_matches_full_cycle(monkeypatch):
    """Same seed, same scene: the cell-probe cycle must reproduce the
    O(N) cycle's acceptance decisions exactly (energies agree to f64
    roundoff, including same-cycle insertion deltas and deletions of
    just-inserted molecules)."""
    mol, pp, box, L = _scene()
    cps = [ChemicalPotential(mu=2.0, interval=1,
                             insertions_per_interval=6,
                             deletions_per_interval=4)]

    def run(force_cell):
        gc = GrandCanonicalEnsemble(cps, 1.2, [L, L, L], seed=42)
        if force_cell:
            monkeypatch.setattr(
                GrandCanonicalEnsemble, "CELL_PROBE_MIN_N", 1
            )
        else:
            monkeypatch.setattr(
                GrandCanonicalEnsemble, "CELL_PROBE_MIN_N", 10**12
            )
        m = mol
        for step in range(1, 4):
            m = gc.step(m, pp, step)
        return m, gc

    m_full, gc_full = run(False)
    m_cell, gc_cell = run(True)
    assert gc_cell._probe_caps[0] is not None  # cell path actually ran
    assert gc_full._probe_caps[0] is None
    assert gc_cell.accepted_ins == gc_full.accepted_ins
    assert gc_cell.accepted_del == gc_full.accepted_del
    assert int(m_cell.num_valid()) == int(m_full.num_valid())
    np.testing.assert_allclose(
        np.asarray(m_cell.r), np.asarray(m_full.r), atol=1e-12
    )


def test_cell_probe_table_overflow_retries(monkeypatch):
    """An undersized probe table must not corrupt the cycle: the host
    doubles the capacity and reruns on the untouched input state."""
    mol, pp, box, L = _scene()
    cps = [ChemicalPotential(mu=2.0, interval=1,
                             insertions_per_interval=3,
                             deletions_per_interval=1)]
    gc = GrandCanonicalEnsemble(cps, 1.2, [L, L, L], seed=11)
    monkeypatch.setattr(GrandCanonicalEnsemble, "CELL_PROBE_MIN_N", 1)
    gc._probe_caps[0] = gc._probe_geometry(mol, pp)
    dims, cap = gc._probe_caps[0]
    gc._probe_caps[0] = (dims, 2)  # force overflow
    m = gc.step(mol, pp, 1)
    assert gc._probe_caps[0][1] > 2  # capacity was escalated
    assert gc.attempted == 4
    assert int(m.num_valid()) >= int(mol.num_valid()) - 1


def test_cell_probe_slot_reuse_parity(monkeypatch):
    """Slot-reuse regression: with capacity == N, every same-cycle
    insertion must reuse a slot a deletion just freed.  The freed
    slot's table entry is stale (it points at the NEW molecule's
    position through the OLD cell's row); the freed mask must exclude
    it so the delta list counts the molecule exactly once.  Without
    the mask, trials whose 27-cell neighborhood covers both cells
    double-count the pair and diverge from the O(N) probe."""
    n, rho, T = 320, 0.45, 1.2
    L = (n / rho) ** (1 / 3)  # small box: neighborhoods overlap a lot
    data = cubic_grid(n, [L, L, L], T, seed=8)
    mol, pp, box, _ = build_scene(
        data, cutoff=2.5, dtype=jnp.float64, capacity=n,  # NO reserve
    )
    cps = [ChemicalPotential(mu=-4.0, interval=1,
                             insertions_per_interval=8,
                             deletions_per_interval=8)]

    def run(force_cell):
        gc = GrandCanonicalEnsemble(cps, T, [L, L, L], seed=7)
        monkeypatch.setattr(
            GrandCanonicalEnsemble, "CELL_PROBE_MIN_N",
            1 if force_cell else 10 ** 12,
        )
        m = mol
        for step in range(1, 5):
            m = gc.step(m, pp, step)
        return m, gc

    m_full, gc_full = run(False)
    m_cell, gc_cell = run(True)
    assert gc_cell._probe_caps[0] is not None
    # reuse actually happened: some deletions AND insertions accepted
    assert gc_full.accepted_del > 0 and gc_full.accepted_ins > 0
    assert gc_cell.accepted_ins == gc_full.accepted_ins
    assert gc_cell.accepted_del == gc_full.accepted_del
    np.testing.assert_allclose(
        np.asarray(m_cell.r), np.asarray(m_full.r), atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(m_cell.valid), np.asarray(m_full.valid)
    )


def test_cell_probe_freed_mask_semantics():
    """Deterministic stale-row check: delete molecule s, reinsert it
    at a DIFFERENT cell (slot reused), list it in the deltas.  A probe
    whose 27-cell neighborhood covers the OLD cell must not read the
    stale table row (which now points at the new position): with the
    freed mask the cell probe + delta correction equals the O(N)
    probe; without it the pair is double-counted."""
    from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles

    mol, pp, box, L = _scene(n=200, rho=0.3)
    dims = tuple(int(np.floor(L / 2.5)) for _ in range(3))
    spec = CellGridSpec(dims=dims, box=(L, L, L), cap=64)
    bins = bin_particles(mol.r, mol.valid, spec)
    table = bins.slots
    boxj = jnp.asarray([L, L, L], jnp.float64)

    # pick a valid molecule s; move it one cell along x (slot reuse)
    s = 7
    r_old = np.asarray(mol.r)[s].copy()
    r_new = (r_old + np.array([2.6, 0.0, 0.0])) % L
    mol2 = dataclasses.replace(
        mol, r=mol.r.at[s].set(jnp.asarray(r_new))
    )
    freed = jnp.zeros((mol.capacity,), bool).at[s].set(True)

    # probe at the OLD position: its neighborhood contains the old
    # cell (stale row for s) AND the new position is within rc
    probe_r = jnp.asarray(r_old + 0.3)
    q1 = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float64)
    cid0 = jnp.asarray(0, jnp.int32)
    excl = jnp.asarray(-1, jnp.int32)

    e_ref = float(single_molecule_energy(
        mol2, pp, boxj, probe_r, q1, cid0, excl
    ))
    e_cell = float(cell_probe_energy(
        mol2, pp, boxj, table, dims, probe_r, q1, cid0, excl,
        freed=freed,
    ))
    # delta correction for the reinserted molecule (what _cycle adds)
    from ls1_mardyn_tpu.ensemble.grand_canonical import min_image
    from ls1_mardyn_tpu.models.interaction import (
        molecule_pair, site_offsets,
    )

    drm = min_image(probe_r[None, :] - mol2.r[s][None], boxj)
    com2 = jnp.sum(drm * drm, axis=-1)
    mlj = com2 < pp.rc2_lj
    mel = com2 < pp.rc2
    out = molecule_pair(
        drm, site_offsets(pp, q1[None], cid0[None]),
        site_offsets(pp, mol2.q[s][None], mol2.cid[s][None]),
        cid0, mol2.cid[s][None], pp, mlj, mel,
    )
    e_delta = float(
        jnp.sum(out["u6lj"]) / 6.0 + jnp.sum(out["uX"])
        + jnp.sum(out["my_rf"])
    )
    assert abs((e_cell + e_delta) - e_ref) < 1e-9 * max(1, abs(e_ref)), (
        e_cell, e_delta, e_ref
    )
    # WITHOUT the freed mask the stale row double-counts the pair
    e_nomask = float(cell_probe_energy(
        mol2, pp, boxj, table, dims, probe_r, q1, cid0, excl
    ))
    assert abs((e_nomask + e_delta) - e_ref) > 1e-6
