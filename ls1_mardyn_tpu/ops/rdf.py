"""Radial distribution function sampling.

The role of the reference's RDF plugin + RDFCellProcessor
(/root/reference/src/io/RDF.{h,cpp} + adapter/RDFCellProcessor): a
binned histogram of molecule-molecule (COM) distances per component
pair, accumulated over sampled steps and normalized against the ideal
gas shell count.

TPU design: pair distances come from the same neighbor machinery as
the force path; the histogram is a one-hot matmul (bins on lanes)
instead of a scatter -- histograms ARE matmuls on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.ops.cells import CellGridSpec, bin_particles
from ls1_mardyn_tpu.state import MoleculeState


@functools.partial(jax.jit, static_argnames=("spec", "nbins", "rmax", "chunk"))
def pair_distance_histogram(
    mol: MoleculeState,
    spec: CellGridSpec,
    nbr_ids: jnp.ndarray,
    nbr_shift: jnp.ndarray,
    rmax: float,
    nbins: int,
    chunk: int = 32,
) -> jnp.ndarray:
    """Histogram of pair COM distances < rmax over cell neighborhoods.
    Returns [nbins] float counts of unordered pairs."""
    n = mol.capacity
    cap = spec.cap
    dtype = mol.r.dtype
    bins = bin_particles(mol.r, mol.valid, spec)
    dr_bin = rmax / nbins

    def one_cell(c):
        i_idx = bins.slots[c]
        j_idx = bins.slots[nbr_ids[c]].reshape(-1)
        j_shift = jnp.repeat(nbr_shift[c], cap, axis=0).astype(dtype)
        si = jnp.clip(i_idx, 0, n - 1)
        sj = jnp.clip(j_idx, 0, n - 1)
        oki = (i_idx >= 0) & mol.valid[si]
        okj = (j_idx >= 0) & mol.valid[sj]
        ri = mol.r[si]
        rj = mol.r[sj] + j_shift
        d = ri[:, None, :] - rj[None, :, :]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
        ok = (
            oki[:, None]
            & okj[None, :]
            & (si[:, None] != sj[None, :])
            & (dist < rmax)
        )
        b = jnp.clip((dist / dr_bin).astype(jnp.int32), 0, nbins - 1)
        # histogram via one-hot matmul: [pairs, nbins] one-hot summed
        oh = (
            b[..., None] == jnp.arange(nbins, dtype=jnp.int32)
        ) & ok[..., None]
        return jnp.sum(oh.astype(dtype), axis=(0, 1))

    cells = jnp.arange(spec.n_cells)
    pad = (-spec.n_cells) % chunk
    cells_p = jnp.concatenate([cells, jnp.zeros((pad,), cells.dtype)])
    hists = jax.lax.map(jax.vmap(one_cell), cells_p.reshape(-1, chunk))
    keep = (jnp.arange(spec.n_cells + pad) < spec.n_cells).astype(dtype)
    h = jnp.sum(hists.reshape(-1, nbins) * keep[:, None], axis=0)
    return 0.5 * h  # unordered pairs


@functools.partial(
    jax.jit, static_argnames=("spec", "ncomp", "chunk")
)
def pair_count_by_component(
    r: jnp.ndarray,
    valid: jnp.ndarray,
    cid: jnp.ndarray,
    spec: CellGridSpec,
    nbr_ids: jnp.ndarray,
    nbr_shift: jnp.ndarray,
    rc2_lj,
    rc2_c,
    ncomp: int,
    chunk: int = 32,
):
    """Exact unordered pair counts per component pair, within the LJ
    and electrostatic cutoffs separately: two [ncomp, ncomp] matrices
    (the measuring half of the reference's FlopCounter cell processor,
    adapter/FlopCounter.h:60 -- it traverses the cells and counts the
    pairs each loop body would actually evaluate, rather than modeling
    them from the mean density).  Counting is one-hot matmuls per cell
    row: counts[k, l] = oh_i^T (mask) oh_j."""
    n = r.shape[0]
    cap = spec.cap
    dtype = r.dtype
    bins = bin_particles(r, valid, spec)
    eye = jnp.eye(ncomp, dtype=dtype)

    def one_cell(c):
        i_idx = bins.slots[c]
        j_idx = bins.slots[nbr_ids[c]].reshape(-1)
        j_shift = jnp.repeat(nbr_shift[c], cap, axis=0).astype(dtype)
        si = jnp.clip(i_idx, 0, n - 1)
        sj = jnp.clip(j_idx, 0, n - 1)
        oki = (i_idx >= 0) & valid[si]
        okj = (j_idx >= 0) & valid[sj]
        d = r[si][:, None, :] - (r[sj] + j_shift)[None, :, :]
        dr2 = jnp.sum(d * d, axis=-1)
        ok = oki[:, None] & okj[None, :] & (si[:, None] != sj[None, :])
        oh_i = eye[jnp.clip(cid[si], 0, ncomp - 1)]  # [cap, K]
        oh_j = eye[jnp.clip(cid[sj], 0, ncomp - 1)]  # [27cap, K]
        m_lj = (ok & (dr2 < rc2_lj)).astype(dtype)
        m_c = (ok & (dr2 < rc2_c)).astype(dtype)
        return oh_i.T @ m_lj @ oh_j, oh_i.T @ m_c @ oh_j

    cells = jnp.arange(spec.n_cells)
    pad = (-spec.n_cells) % chunk
    cells_p = jnp.concatenate([cells, jnp.zeros((pad,), cells.dtype)])
    keep = (jnp.arange(spec.n_cells + pad) < spec.n_cells).astype(dtype)
    lj, cc = jax.lax.map(jax.vmap(one_cell), cells_p.reshape(-1, chunk))
    lj = jnp.sum(lj.reshape(-1, ncomp, ncomp) * keep[:, None, None], axis=0)
    cc = jnp.sum(cc.reshape(-1, ncomp, ncomp) * keep[:, None, None], axis=0)
    return 0.5 * lj, 0.5 * cc, bins.overflow


def normalize_rdf(hist: np.ndarray, n: int, volume: float, rmax: float, samples: int):
    """g(r) normalization against the ideal-gas shell
    (RDF.cpp accumulation/normalization)."""
    nbins = len(hist)
    dr = rmax / nbins
    edges = np.arange(nbins + 1) * dr
    shell = 4.0 / 3.0 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    rho = n / volume
    ideal = 0.5 * n * rho * shell * samples
    r_mid = 0.5 * (edges[1:] + edges[:-1])
    g = np.where(ideal > 0, hist / np.maximum(ideal, 1e-300), 0.0)
    return r_mid, g
