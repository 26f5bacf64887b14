"""Ewald summation: full periodic electrostatics for point charges.

The TPU-native replacement for the reference's long-range
electrostatics solver (bhfmm FastMultipoleMethod,
/root/reference/src/bhfmm/ -- order-p multipole trees with MPI
neighborhoods).  As SURVEY.md section 7 step 9 argues, the idiomatic
TPU choice is a uniform k-space method: the structure factors
    S(k) = sum_j q_j exp(i k.r_j)
are dense [N_sites, K] matmuls (phases = r @ k^T on the MXU), the
reciprocal energy/forces are elementwise in k, and nothing is
tree-shaped or data-dependent.  Capability parity target: the
H2O/NaBr electrolyte scenes (FMMCharge.inp) that the reference runs
through bhfmm.

Standard Ewald split (charges only; 4*pi*eps0 == 1, tinfoil boundary):
  U_real  = 1/2 sum_{i!=j,images} q_i q_j erfc(alpha r)/r   (cutoff rc)
  U_recip = (2*pi/V) sum_{k!=0} e^{-k^2/(4 a^2)}/k^2 |S(k)|^2
  U_self  = -alpha/sqrt(pi) * sum q_i^2
  U_intra = -1/2 sum_mol sum_{site pairs} q_a q_b erf(alpha r_ab)/r_ab
(intramolecular pairs are excluded interactions in the reference's
model -- the pair loop runs only between molecules -- so their k-space
contribution is removed by the erf term.)

The real-space part rides the existing cell-pair machinery: callers
replace the bare Coulomb charge-charge interaction with the
erfc-screened one (potentials.charge_charge_screened) and add this
module's reciprocal pieces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ls1_mardyn_tpu.models.interaction import PairParams, site_offsets
from ls1_mardyn_tpu.state import MoleculeState


def make_kvectors(box, kmax: int, alpha: float, dtype=np.float64):
    """All reciprocal vectors 0 < |n| <= kmax (integer shells), with
    their Ewald coefficients 4*pi/V * exp(-k^2/4a^2)/k^2.
    Returns (k [K,3], coeff [K])."""
    box = np.asarray(box, float)
    rng = np.arange(-kmax, kmax + 1)
    n = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    n = n[(n ** 2).sum(1) > 0]
    n = n[(n ** 2).sum(1) <= kmax ** 2]
    k = 2.0 * np.pi * n / box[None, :]
    k2 = (k ** 2).sum(1)
    V = float(np.prod(box))
    coeff = 4.0 * np.pi / V * np.exp(-k2 / (4.0 * alpha ** 2)) / k2
    return k.astype(dtype), coeff.astype(dtype)


@dataclasses.dataclass(frozen=True)
class EwaldParams:
    alpha: float
    kmax: int

    @staticmethod
    def auto(box, rc: float, accuracy: float = 1e-5) -> "EwaldParams":
        """Standard parameter heuristic: alpha from the real-space
        cutoff so erfc(alpha*rc) ~ accuracy, kmax to match."""
        box = np.asarray(box, float)
        alpha = np.sqrt(-np.log(accuracy)) / rc
        kmax = int(np.ceil(alpha * np.max(box) * np.sqrt(-np.log(accuracy)) / np.pi))
        return EwaldParams(alpha=float(alpha), kmax=max(kmax, 1))

    @staticmethod
    def tune(
        box, rc: float, q2_sum: float, n: int, accuracy: float = 1e-5
    ) -> "EwaldParams":
        """Self-tuning against the Kolafa-Perram RMS force-error
        estimates (Mol. Simul. 9, 351 (1992)) -- the quantitative
        version of auto(): given the system's charge content
        (q2_sum = sum q_i^2, n charge sites), pick alpha so the
        real-space error at rc meets `accuracy` (in force units), then
        grow kmax until the reciprocal estimate matches:
          dF_real  ~ 2 q2/sqrt(n rc V) exp(-a^2 rc^2)
          dF_recip ~ 2 q2 a/(pi sqrt(n kc V^(2/3)... )) exp(-(pi kc/(a L))^2)
        """
        box = np.asarray(box, float)
        V = float(np.prod(box))
        L = float(np.max(box))
        q2 = max(float(q2_sum), 1e-300)
        n = max(int(n), 1)

        def err_real(a):
            return 2.0 * q2 / np.sqrt(n * rc * V) * np.exp(-(a * rc) ** 2)

        def err_recip(a, kc):
            kappa = 2.0 * np.pi * kc / L  # cutoff in k-space
            return (
                2.0 * q2 * a / (np.pi * np.sqrt(n * kappa * V))
                * np.exp(-((kappa / (2.0 * a)) ** 2))
            )

        # bisect alpha so the real-space error meets the target
        lo, hi = 1e-3 / rc, 20.0 / rc
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            if err_real(mid) > accuracy:
                lo = mid
            else:
                hi = mid
        alpha = hi
        kmax = 1
        while err_recip(alpha, kmax) > accuracy and kmax < 64:
            kmax += 1
        return EwaldParams(alpha=float(alpha), kmax=int(kmax))


def reciprocal_energy_forces(
    mol: MoleculeState,
    pp: PairParams,
    kvec: jnp.ndarray,  # [K,3]
    coeff: jnp.ndarray,  # [K]
    alpha: float,
    psum=None,
    global_share: float = 1.0,
):
    """Reciprocal-space energy + per-molecule site forces/torques.

    Also subtracts the self term and the intramolecular (excluded-pair)
    erf interaction so that (this + erfc-screened real-space pair sum)
    equals the true periodic Coulomb sum over distinct molecules.

    Returns (U_recip_minus_corrections, F [N,3], M [N,3]).

    Multi-chip (k-space sharding over the molecule axis): call inside a
    shard_map with `psum` reducing over the mesh axis and `global_share
    = 1/n_devices`.  Each device accumulates the structure factor of
    its LOCAL molecules, one psum of the [K] chunks merges the global
    S(k) (the analogue of the reference's allreduce of multipole
    moments, UniformPseudoParticleContainer.h:95-135), and forces on
    local molecules follow from the global S(k) without any further
    communication.  The returned energy is the local share: a later
    psum of it yields the global reciprocal energy exactly once.
    """
    dtype = mol.r.dtype
    n = mol.capacity
    sites = site_offsets(pp, mol.q, mol.cid)
    q_site = pp.charge_q[mol.cid]  # [N, NC] includes zero padding
    wq = q_site * mol.valid[:, None].astype(dtype)
    # absolute charge-site positions [N, NC, 3]
    rs = mol.r[:, None, :] + sites["charge"]

    # k-space in chunks (phases [N, NC, Kc] would not fit for large K):
    # pass 1 accumulates the structure factor, pass 2 the forces.
    K = kvec.shape[0]
    KC = 512
    padK = (-K) % KC
    kp = jnp.concatenate([kvec, jnp.zeros((padK, 3), dtype)])
    cp_ = jnp.concatenate([coeff, jnp.zeros((padK,), dtype)])
    kchunks = kp.reshape(-1, KC, 3)
    cchunks = cp_.reshape(-1, KC)

    def sf_chunk(kc):
        phase = jnp.einsum("nsd,kd->nsk", rs, kc, preferred_element_type=dtype)
        Sr = jnp.sum(wq[..., None] * jnp.cos(phase), axis=(0, 1))
        Si = jnp.sum(wq[..., None] * jnp.sin(phase), axis=(0, 1))
        return Sr, Si

    Sr_c, Si_c = jax.lax.map(sf_chunk, kchunks)  # [nchunk, KC]
    if psum is not None:
        Sr_c, Si_c = psum((Sr_c, Si_c))
    u_recip = 0.5 * jnp.sum(cchunks * (Sr_c * Sr_c + Si_c * Si_c))

    def force_chunk(carry, xs):
        kc, cc, Sr, Si = xs
        phase = jnp.einsum("nsd,kd->nsk", rs, kc, preferred_element_type=dtype)
        imag = jnp.sin(phase) * Sr[None, None, :] - jnp.cos(phase) * Si[None, None, :]
        fk = cc[:, None] * kc  # [KC,3]
        f = jnp.einsum("nsk,kd->nsd", imag, fk, preferred_element_type=dtype)
        return carry + f, None

    f0 = jnp.zeros(rs.shape, dtype)
    f_site, _ = jax.lax.scan(
        force_chunk, f0, (kchunks, cchunks, Sr_c, Si_c)
    )
    f_site = f_site * wq[..., None]

    F = jnp.sum(f_site, axis=1)
    M = jnp.sum(jnp.cross(sites["charge"], f_site), axis=1)

    u_corr, F_c, M_c = self_intra_corrections(mol, pp, alpha, rs, wq)

    share = jnp.asarray(global_share, dtype)
    return share * u_recip + u_corr, F + F_c, M + M_c


def self_intra_corrections(
    mol: MoleculeState,
    pp: PairParams,
    alpha: float,
    rs: jnp.ndarray,  # [N, NC, 3] absolute charge-site positions
    wq: jnp.ndarray,  # [N, NC] validity-weighted site charges
):
    """Self-energy and intramolecular-exclusion corrections shared by
    the direct (EwaldSolver) and mesh (PMESolver) k-space paths.

    Returns (u_self + u_intra, F [N,3], M [N,3]).  Subtracting these
    from the reciprocal sum makes (k-space + erfc-screened real-space
    pair sum) equal the true periodic Coulomb sum over *distinct*
    molecules (intramolecular pairs are excluded interactions in the
    reference's model -- the pair loop runs only between molecules)."""
    dtype = rs.dtype
    offs = rs - mol.r[:, None, :]  # site offsets from the COM

    # self energy
    a = jnp.asarray(alpha, dtype)
    u_self = -a / jnp.sqrt(jnp.asarray(np.pi, dtype)) * jnp.sum(wq * wq)

    # intramolecular exclusion: subtract erf-screened intra pairs
    # (and their forces/torques)
    drs = rs[:, :, None, :] - rs[:, None, :, :]  # [N,NC,NC,3]
    dist2 = jnp.sum(drs * drs, axis=-1)
    NC = wq.shape[1]
    eye = jnp.eye(NC, dtype=bool)
    pair_ok = (
        (~eye)[None]
        & (jnp.abs(wq[:, :, None] * wq[:, None, :]) > 0)
        & (dist2 > 1e-20)
    )
    dist = jnp.sqrt(jnp.where(pair_ok, dist2, 1.0))
    qq = wq[:, :, None] * wq[:, None, :]
    erf_term = jax.scipy.special.erf(a * dist) / dist
    u_intra = -0.5 * jnp.sum(jnp.where(pair_ok, qq * erf_term, 0.0))
    # intra correction force on site a (U_corr(r) = -qq*erf(ar)/r):
    # F_a = qq * (2a/sqrt(pi) e^{-a^2 r^2} - erf(ar)/r) / r^2 * dr_vec
    two_a_pi = 2.0 * a / jnp.sqrt(jnp.asarray(np.pi, dtype))
    dist2s = jnp.where(pair_ok, dist2, 1.0)
    fmag = jnp.where(
        pair_ok,
        qq * (two_a_pi * jnp.exp(-a * a * dist2) - erf_term) / dist2s,
        0.0,
    )
    f_intra_site = jnp.sum(fmag[..., None] * drs, axis=2)  # [N,NC,3]
    F = jnp.sum(f_intra_site, axis=1)
    M = jnp.sum(jnp.cross(offs, f_intra_site), axis=1)
    return u_self + u_intra, F, M


class EwaldSolver:
    """Bundles the reciprocal pieces; the real-space erfc part is
    applied inside the pair interaction (set screen_alpha in the
    interaction call)."""

    def __init__(self, box, params: EwaldParams, dtype=jnp.float64):
        self.params = params
        k, c = make_kvectors(np.asarray(box), params.kmax, params.alpha)
        self.kvec = jnp.asarray(k, dtype)
        self.coeff = jnp.asarray(c, dtype)

    def __call__(self, mol: MoleculeState, pp: PairParams):
        return reciprocal_energy_forces(
            mol, pp, self.kvec, self.coeff, self.params.alpha
        )
