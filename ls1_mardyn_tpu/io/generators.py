"""Scenario generators: in-situ phase-space creation.

Host-side equivalents of the reference's generator family
(/root/reference/src/io/CubicGridGeneratorInternal.cpp: face-centered
lattice filling the box to a target density with Maxwell-Boltzmann
velocities; src/utils/generator/ velocity assigners).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ls1_mardyn_tpu.io.ascii_reader import PhaseSpaceData
from ls1_mardyn_tpu.models.components import Component


def maxwell_velocities(
    n: int, temperature: float, mass, rng: np.random.Generator
) -> np.ndarray:
    """Maxwell-Boltzmann velocity draw at temperature T (kB == 1 in
    reduced units; MaxwellVelocityAssigner analogue)."""
    mass = np.broadcast_to(np.asarray(mass, float), (n,))
    sigma = np.sqrt(temperature / mass)
    v = rng.normal(size=(n, 3)) * sigma[:, None]
    # zero net momentum (CubicGridGeneratorInternal::removeMomentum)
    p = (mass[:, None] * v).sum(axis=0)
    v -= p / mass.sum()
    return v


def cubic_grid(
    num_molecules: int,
    box: Sequence[float],
    temperature: float,
    components: Optional[Sequence[Component]] = None,
    cid: int = 0,
    seed: int = 42,
) -> PhaseSpaceData:
    """Face-centered-cubic-ish grid of `>= num_molecules` sites, then
    truncated to exactly num_molecules (the reference generator's
    binary-search sizing simplified: two interleaved simple-cubic
    lattices, CubicGridGeneratorInternal.cpp).
    """
    box = np.asarray(box, float)
    if components is None:
        c = Component(cid=0)
        c.add_ljcenter(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, False)
        components = [c]
    # two interleaved lattices -> 2*k^3 >= n
    k = int(np.ceil((num_molecules / 2.0) ** (1.0 / 3.0)))
    spacing = box / k
    idx = np.arange(k)
    g = np.stack(np.meshgrid(idx, idx, idx, indexing="ij"), -1).reshape(-1, 3)
    a = (g + 0.25) * spacing
    b = (g + 0.75) * spacing
    r = np.concatenate([a, b], axis=0)[:num_molecules]
    n = len(r)
    rng = np.random.default_rng(seed)
    mass = components[cid].mass
    v = maxwell_velocities(n, temperature, mass, rng)
    K = len(components)
    return PhaseSpaceData(
        components=list(components),
        mixing_xi=np.ones((K, K)),
        mixing_eta=np.ones((K, K)),
        eps_rf=1.0e10,
        box=box,
        temperature=temperature,
        current_time=0.0,
        mid=np.arange(1, n + 1, dtype=np.int64),
        cid=np.full(n, cid, np.int32),
        r=r,
        v=v,
        q=np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
        L=np.zeros((n, 3)),
    )
