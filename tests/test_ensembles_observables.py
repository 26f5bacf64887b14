"""muVT grand canonical, RDF sampling, region thermostats.

Reference analogues: insertionTest (test_input/insertionTest.inp usage
in ChemicalPotential), RDFTest, TemperatureControl sampling.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ls1_mardyn_tpu.ensemble.grand_canonical import (
    ChemicalPotential,
    GrandCanonicalEnsemble,
    single_molecule_energy,
)
from ls1_mardyn_tpu.io.generators import cubic_grid
from ls1_mardyn_tpu.models.oracle import compute_forces_n2_jit
from ls1_mardyn_tpu.scene import build_scene


def _fluid(n=200, rho=0.4, T=1.2, rc=2.5, seed=5):
    L = (n / rho) ** (1.0 / 3.0)
    data = cubic_grid(n, [L, L, L], T, seed=seed)
    mol, pp, table, box = build_scene(
        data, cutoff=rc, capacity=n + 64, dtype=jnp.float64
    )
    return mol, pp, table, box, T


def test_single_molecule_energy_matches_oracle_delta():
    """Probe energy of molecule i == difference of total Upot with and
    without it (the quantity ChemicalPotential feeds to Metropolis)."""
    mol, pp, table, box, T = _fluid(n=64)
    _, macro_all = compute_forces_n2_jit(mol, pp, box)
    i = 17
    mol_without = dataclasses.replace(mol, valid=mol.valid.at[i].set(False))
    _, macro_wo = compute_forces_n2_jit(mol_without, pp, box)
    e_probe = float(
        single_molecule_energy(
            mol, pp, box, mol.r[i], mol.q[i], mol.cid[i],
            jnp.asarray(i, jnp.int32),
        )
    )
    delta = float(macro_all.upot) - float(macro_wo.upot)
    np.testing.assert_allclose(e_probe, delta, rtol=1e-10)


def test_gcmc_moves_conserve_invariants():
    mol, pp, table, box, T = _fluid(n=200)
    cp = ChemicalPotential(mu=-3.0, component=0, interval=1,
                           insertions_per_interval=2,
                           deletions_per_interval=2)
    gc = GrandCanonicalEnsemble([cp], T, np.asarray(box), seed=7)
    n0 = int(mol.num_valid())
    for step in range(1, 6):
        mol = gc.step(mol, pp, step)
    n1 = int(mol.num_valid())
    assert gc.attempted == 20
    # N changed by exactly (accepted insertions - accepted deletions)
    assert n1 - n0 == gc.accepted_ins - gc.accepted_del
    # ids unique among valid molecules
    mids = np.asarray(mol.mid)[np.asarray(mol.valid)]
    assert len(set(mids.tolist())) == len(mids)


def test_gcmc_equilibrates_density_direction():
    """With very attractive mu the system should gain particles, with
    very repulsive mu it should lose them (direction check only)."""
    mol, pp, table, box, T = _fluid(n=100, rho=0.2)
    gc_hi = GrandCanonicalEnsemble(
        [ChemicalPotential(mu=5.0, component=0, interval=1,
                           insertions_per_interval=4, deletions_per_interval=4)],
        T, np.asarray(box), seed=3,
    )
    m_hi = mol
    for s in range(1, 10):
        m_hi = gc_hi.step(m_hi, pp, s)
    gc_lo = GrandCanonicalEnsemble(
        [ChemicalPotential(mu=-20.0, component=0, interval=1,
                           insertions_per_interval=4, deletions_per_interval=4)],
        T, np.asarray(box), seed=3,
    )
    m_lo = mol
    for s in range(1, 10):
        m_lo = gc_lo.step(m_lo, pp, s)
    assert int(m_hi.num_valid()) > int(m_lo.num_valid())


def test_rdf_histogram_matches_numpy():
    from ls1_mardyn_tpu.ops.cells import CellGridSpec, neighbor_table
    from ls1_mardyn_tpu.ops.rdf import pair_distance_histogram

    mol, pp, table, box, T = _fluid(n=150, rho=0.3)
    rc = 2.5
    spec = CellGridSpec.create(np.asarray(box), rc, cap=64)
    nbr_ids, nbr_shift = neighbor_table(spec)
    nbins = 25
    h = np.asarray(
        pair_distance_histogram(
            mol, spec, jnp.asarray(nbr_ids),
            jnp.asarray(nbr_shift, mol.r.dtype), rmax=rc, nbins=nbins,
        )
    )
    # numpy reference with minimum image
    r = np.asarray(mol.r)[np.asarray(mol.valid)]
    L = np.asarray(box)
    d = r[:, None, :] - r[None, :, :]
    d -= L * np.round(d / L)
    dist = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(len(r), k=1)
    dist = dist[iu]
    ref, _ = np.histogram(dist[dist < rc], bins=nbins, range=(0, rc))
    np.testing.assert_allclose(h, ref)


def test_temperature_control_regions():
    from ls1_mardyn_tpu.ops.thermostat import (
        TemperatureControlRegion,
        apply_temperature_control,
    )

    mol, pp, table, box, T = _fluid(n=200, T=1.0)
    L = float(np.asarray(box)[0])
    # cold lower half, hot upper half
    regions = (
        TemperatureControlRegion(
            lower=(0.0, 0.0, 0.0), upper=(L, L, L / 2),
            target_temperature=0.5, exponent=0.5,
        ),
        TemperatureControlRegion(
            lower=(0.0, 0.0, L / 2), upper=(L, L, L),
            target_temperature=2.0, exponent=0.5,
        ),
    )
    m = mol
    for k in range(30):
        m = apply_temperature_control(m, pp, regions, jnp.asarray(k))
    v = np.asarray(m.v)
    z = np.asarray(m.r)[:, 2]
    mass = np.asarray(pp.mass)[np.asarray(m.cid)]
    valid = np.asarray(m.valid)
    lo = (z < L / 2) & valid
    hi_mask = (z >= L / 2) & valid
    t_lo = (mass[lo] * (v[lo] ** 2).sum(1)).sum() / (3 * lo.sum())
    t_hi = (mass[hi_mask] * (v[hi_mask] ** 2).sum(1)).sum() / (3 * hi_mask.sum())
    assert abs(t_lo - 0.5) < 0.05
    assert abs(t_hi - 2.0) < 0.2


def test_muvt_driver_reserves_insertion_slots(tmp_path, monkeypatch):
    """The driver must build the molecule array with free slots when
    the ensemble is muVT (insertion = activating a masked slot; with
    capacity == N the first accepted insertion raised)."""
    import os

    import jax.numpy as jnp

    from ls1_mardyn_tpu.driver import MDSimulation
    from ls1_mardyn_tpu.io.xml_config import PluginSpec, XMLConfig

    os.chdir(tmp_path)
    n, rho, T = 216, 0.5, 1.5
    L = (n / rho) ** (1 / 3)
    cfg = XMLConfig(
        timestep=0.002, temperature=T, box=np.array([L, L, L]),
        cutoff=2.5, lj_cutoff=2.5,
        generator=PluginSpec("CubicGridGenerator",
                             {"numMolecules": str(n)}),
        ensemble_type="muVT",
    )
    cfg.chemical_potentials.append(
        PluginSpec("ChemicalPotential",
                   {"mu": "0.5", "cid": "1", "interval": "1"})
    )
    sim = MDSimulation(cfg, dtype=jnp.float64, force_mode="cells")
    assert sim.engine.mol.capacity > n
    gv = sim.run(steps=10, print_every=0)
    assert np.isfinite(float(gv.upot))
    # generous mu drives insertions: N must have been able to grow
    assert int(float(gv.n)) >= n


def test_chemical_potential_xml_full_semantics(tmp_path):
    """<chemicalpotential> carries the reference's full parameter set:
    trial-instance counts (ChemicalPotential.h:23,101 _instances) and a
    restricted control volume (setControlVolume); insertions must land
    inside it and deletions must only pick molecules inside it."""
    import xml.etree.ElementTree as ET

    from ls1_mardyn_tpu.ensemble.grand_canonical import (
        _build_chemical_potentials,
    )
    from ls1_mardyn_tpu.io.xml_config import PluginSpec, _params_dict

    el = ET.fromstring(
        """<chemicalpotential><mu>1.0</mu><cid>1</cid>
        <interval>2</interval><instances>3</instances>
        <control><lower><x>0</x><y>0</y><z>0</z></lower>
        <upper><x>4</x><y>8</y><z>8</z></upper></control>
        </chemicalpotential>"""
    )
    spec = PluginSpec("ChemicalPotential", _params_dict(el))
    (cp,) = _build_chemical_potentials([spec], np.array([8.0, 8.0, 8.0]))
    assert cp.mu == 1.0 and cp.component == 0 and cp.interval == 2
    assert cp.insertions_per_interval == 3
    assert cp.deletions_per_interval == 3
    np.testing.assert_allclose(cp.control_lower, [0, 0, 0])
    np.testing.assert_allclose(cp.control_upper, [4, 8, 8])

    mol, pp, table, box, T = _fluid(n=100, rho=0.2)
    cp2 = ChemicalPotential(
        mu=8.0, component=0, interval=1,
        insertions_per_interval=6, deletions_per_interval=0,
        control_lower=np.zeros(3),
        control_upper=np.array([0.25, 1.0, 1.0]) * np.asarray(box),
    )
    gc = GrandCanonicalEnsemble([cp2], T, np.asarray(box), seed=11)
    m = mol
    pre = np.asarray(mol.valid).copy()
    for s in range(1, 8):
        m = gc.step(m, pp, s)
    assert gc.accepted_ins > 0
    new = np.asarray(m.valid) & ~pre
    # every inserted molecule is inside the control volume
    assert np.all(np.asarray(m.r)[new, 0] <= 0.25 * float(box[0]) + 1e-9)
