"""Power-spectrum (C_ell / D_ell) conditional samplers.

The reference's portfolio (SURVEY.md 2.4), pure and jittable:

- binned conjugate inverse-gamma draw (centered parametrization;
  reference: CenteredGibbs.py:24-48 TT, :54-93 EE/BB)
- blocked Metropolis-within-Gibbs with truncated-normal proposals on the
  non-centered (whitened) parametrization (reference: ClsSampler.py:45-125,
  NonCenteredGibbs.py:205-248 TT, :252-445 pol), with both the pixel-space
  and the harmonic-only ("all_sph") likelihood paths
  (reference: NonCenteredGibbs.py:333-377)
- per-ell k x k inverse-Wishart draw for joint correlated fields
  (TT/TE/EE...; the reference only ever scaffolded this — invwishart import
  CenteredGibbs.py:7 and the 3x3 Cython kernel variance_expension.pyx:36-61)

All spectra are sampled as binned D_ell (conversion GibbsSampler.py:54;
binning utils.py:150-162); whiten/recenter transforms for ASIS included
(reference: ASIS.py:109-120).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..harmonics.gridstate import (alm2cl_state, variance_expansion_state)
from ..harmonics.spectra import bin_sum, unfold_bins
from ..ops.model import SkyModel

__all__ = [
    "invgamma_dl", "centered_cls_sample",
    "propose_truncnorm", "truncnorm_logratio", "nc_cls_sample",
    "invwishart_cls_sample",
    "whiten", "recenter",
]


# ---------------------------------------------------------------------------
# Centered conjugate inverse-gamma step
# ---------------------------------------------------------------------------

def invgamma_dl(key, s_flat: jnp.ndarray, bins: np.ndarray, lmax: int):
    """Binned conjugate draw for one field.

    beta_bin = sum_l (2l+1) l(l+1) hat-C_l / (4 pi),
    alpha_bin = sum_l (2l+1)/2 - 1,  D_bin = beta_bin / Gamma(alpha_bin)
    (reference: CenteredGibbs.py:24-48; alpha of a degenerate first bin is
    clamped to 1 as in the reference's alpha_bin0 := 1)."""
    dt = s_flat.dtype
    cl_hat = alm2cl_state(s_flat, lmax)
    ell = jnp.arange(lmax + 1, dtype=dt)
    beta_l = (2.0 * ell + 1.0) * ell * (ell + 1.0) * cl_hat / (4.0 * jnp.pi)
    beta = bin_sum(beta_l, bins, lmax)
    counts = bin_sum(2.0 * ell + 1.0, bins, lmax)
    alpha = counts / 2.0 - 1.0
    alpha = jnp.where(alpha <= 0, 1.0, alpha)
    g = jax.random.gamma(key, alpha.astype(dt))
    return beta / g


def centered_cls_sample(key, s: jnp.ndarray, bins_list: Sequence[np.ndarray],
                        lmax: int):
    """Independent binned inverse-gamma draws per field (EE then BB in the
    reference, CenteredGibbs.py:81-93).  s: (nfields, nflat).
    Returns tuple of per-field (nbins_f,) binned D_ell."""
    keys = jax.random.split(key, len(bins_list))
    return tuple(
        invgamma_dl(k, s[f], bins, lmax)
        for f, (k, bins) in enumerate(zip(keys, bins_list))
    )


# ---------------------------------------------------------------------------
# Non-centered blocked Metropolis-within-Gibbs
# ---------------------------------------------------------------------------

def propose_truncnorm(key, x, sigma):
    """x' ~ N(x, sigma^2) truncated to [0, inf) (reference:
    ClsSampler.py:79-92)."""
    lower = -x / sigma
    z = jax.random.truncated_normal(key, lower, jnp.full_like(lower, jnp.inf),
                                    dtype=x.dtype)
    return x + sigma * z


def truncnorm_logratio(x_old, x_new, sigma):
    """log q(old | new) - log q(new | old) for the truncated-normal kernel:
    only the truncation normalizers survive (reference computes both
    truncnorm logpdfs, ClsSampler.py:112-125)."""
    return (jax.scipy.special.log_ndtr(x_old / sigma)
            - jax.scipy.special.log_ndtr(x_new / sigma))


def _dl_tuple_to_var(dl_tuple, bins_list, lmax, nstate_, dtype):
    """Per-field binned D_ell -> (nfields, nstate) prior variance —
    a broadcast over the grid-packed layout, no gather."""
    vars_ = [
        variance_expansion_state(unfold_bins(dl.astype(dtype), bins, lmax),
                                 lmax)
        for dl, bins in zip(dl_tuple, bins_list)
    ]
    return jnp.stack(vars_, axis=0)


def make_nc_log_likelihood(model: SkyModel, bins_list, all_sph: bool,
                           d_alm: jnp.ndarray | None = None):
    """Returns log L(dl_tuple; s_nc) for the non-centered parametrization.

    pixel path  : -1/2 sum_pix N^-1 (d - A B C^{1/2} s_nc)^2  — one synthesis
                  per evaluation (reference: NonCenteredGibbs.py:333-355)
    complement  : the same masked likelihood through the cut-sky identity
                  (exact on a quadrature grid; SkyModel.data_loglike_cut) —
                  transforms run over the masked rings only.  Selected
                  automatically when the model carries the cut decomposition.
    all_sph path: the same likelihood evaluated fully in harmonic space,
                  valid on the full sky where the analysis-basis noise is
                  white: -g/2 sum (d_alm - b_l C^{1/2} s_nc)^2
                  (reference: NonCenteredGibbs.py:357-377)
    """
    lmax = model.lmax

    if all_sph:
        if d_alm is None:
            raise ValueError("all_sph likelihood needs precomputed d_alm")
        g = model.noise.harmonic_white_level()  # (nfields,)

        def log_like(dl_tuple, s_nc):
            var = _dl_tuple_to_var(dl_tuple, bins_list, lmax, model.nstate,
                                   s_nc.dtype)
            s = jnp.sqrt(var) * s_nc
            resid = d_alm - model.beam(s)
            return -0.5 * jnp.sum(g[:, None] * resid * resid)
    elif model.has_cut:

        def log_like(dl_tuple, s_nc):
            var = _dl_tuple_to_var(dl_tuple, bins_list, lmax, model.nstate,
                                   s_nc.dtype)
            u = model.beam(jnp.sqrt(var) * s_nc)
            return model.data_loglike_cut(u)
    else:

        def log_like(dl_tuple, s_nc):
            var = _dl_tuple_to_var(dl_tuple, bins_list, lmax, model.nstate,
                                   s_nc.dtype)
            s = jnp.sqrt(var) * s_nc
            resid = model.d - model.forward(s)
            return -0.5 * jnp.sum(model.noise.inv_noise * resid * resid)

    return log_like


class NCClsInfo(NamedTuple):
    accept: tuple      # per-field (nblocks_f,) acceptance indicator means
    log_like: jnp.ndarray


def nc_cls_sample(key, dl_tuple, s_nc, log_like_fn, bins_list, blocks_list,
                  prop_sigma_list, n_iter: int = 1):
    """Blocked MH sweep(s) over binned D_ell given the whitened map s_nc.

    blocks_list[f] : list of (start, stop) bin-index ranges for field f
                     (static; the reference's ell-blocks, config.py:51-55)
    prop_sigma_list[f] : (nbins_f,) proposal std devs
    n_iter : MH sweeps per call (reference n_iter_metropolis)

    Per sweep: propose every bin once (truncated normal), then accept/reject
    block-by-block, field-by-field, each decision using one likelihood
    evaluation (reference: NonCenteredGibbs.py:401-445).

    Compiled as a ``lax.scan`` over a static (nblocks, nbins_total) one-hot
    block table (sweeps are a second scan level), so compile size is one
    block body regardless of n_iter x nblocks — the reference's production
    configuration has tens of blocks and many sweeps (config.py:51-55,65-68)
    and an unrolled trace would not fit a remote-compile budget."""
    nfields = len(dl_tuple)
    dt = dl_tuple[0].dtype
    sizes = [int(d.shape[-1]) for d in dl_tuple]
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    ntot = int(offs[-1])
    rows = []
    for f, blocks in enumerate(blocks_list):
        for (lo, hi) in blocks:
            r = np.zeros(ntot)
            r[offs[f] + lo: offs[f] + hi] = 1.0
            rows.append(r)
    bmask = jnp.asarray(np.stack(rows), dtype=dt)      # (nblocks, ntot)
    nblocks = bmask.shape[0]
    sigma = jnp.concatenate([jnp.broadcast_to(jnp.asarray(p, dt), (n,))
                             for p, n in zip(prop_sigma_list, sizes)])

    def split_fields(dvec):
        return tuple(dvec[..., offs[f]: offs[f + 1]] for f in range(nfields))

    dl0 = jnp.concatenate([d.astype(dt) for d in dl_tuple], axis=-1)
    ll0 = log_like_fn(dl_tuple, s_nc)

    def sweep(carry, k):
        dl, ll = carry
        kp, ka = jax.random.split(k)
        # propose every bin once from the sweep-start value; each bin belongs
        # to exactly one block, so the per-block proposal correction depends
        # only on the sweep-start dl (bins of block b are untouched until
        # block b's own accept decision)
        props = propose_truncnorm(kp, dl, sigma)
        lr_vec = truncnorm_logratio(dl, props, sigma)
        akeys = jax.random.split(ka, nblocks)

        def block_step(c, xs):
            dl_c, ll_c = c
            mask_b, kb = xs
            cand = jnp.where(mask_b > 0, props, dl_c)
            ll_cand = log_like_fn(split_fields(cand), s_nc)
            qcorr = jnp.sum(mask_b * lr_vec)
            acc = (jnp.log(jax.random.uniform(kb, dtype=dt))
                   < ll_cand - ll_c + qcorr)
            dl_c = jnp.where(acc, cand, dl_c)
            ll_c = jnp.where(acc, ll_cand, ll_c)
            return (dl_c, ll_c), acc.astype(dt)

        (dl, ll), accs = jax.lax.scan(block_step, (dl, ll), (bmask, akeys))
        return (dl, ll), accs

    (dlf, ll), accs = jax.lax.scan(sweep, (dl0, ll0),
                                   jax.random.split(key, n_iter))
    acc_mean = jnp.mean(accs, axis=0)                  # (nblocks,)
    out_acc, i0 = [], 0
    for f, blocks in enumerate(blocks_list):
        out_acc.append(acc_mean[i0: i0 + len(blocks)])
        i0 += len(blocks)
    return split_fields(dlf), NCClsInfo(accept=tuple(out_acc), log_like=ll)


# ---------------------------------------------------------------------------
# Joint k x k inverse-Wishart step (TT/TE/EE... extension)
# ---------------------------------------------------------------------------

def invwishart_cls_sample(key, s: jnp.ndarray, lmax: int, lmin: int = 2):
    """Per-ell joint draw C_ell ~ InvWishart(nu = 2l+1, Psi = S_ell) where
    S_ell = sum_m a_lm a_lm^T is the k x k scatter of the fields.

    Sampled via the Bartlett decomposition, vmapped over ell.  Returns
    (lmax+1, k, k) C_ell blocks (zero below lmin).  This is the joint
    correlated-field generalization the reference prepared but never wired
    (invwishart import CenteredGibbs.py:7, 3x3 kernel
    variance_expension.pyx:36-61)."""
    k = s.shape[0]
    dt = s.dtype
    L = lmax + 1
    # S[l, i, j] = sum over valid slots of degree l of s_i s_j; in the
    # grid-packed layout that is one einsum over the (part, m) axes
    g = s.reshape(k, 2, L, L)
    S = jnp.einsum("ipml,jpml->lij", g, g)
    nu = 2.0 * jnp.arange(lmax + 1, dtype=dt) + 1.0

    kchi, knorm = jax.random.split(key)
    # Bartlett: W ~ Wishart(nu, I): L lower-tri, diag sqrt(chi2_{nu-i}),
    # off-diag N(0,1); then Wishart(nu, Psi^-1) sample = (A L)(A L)^T with
    # A A^T = Psi^-1; the InvWishart draw is its inverse.
    i_idx = jnp.arange(k, dtype=dt)
    df = jnp.maximum(nu[:, None] - i_idx[None, :], 1e-3)  # (L, k)
    chi2 = 2.0 * jax.random.gamma(kchi, df / 2.0).astype(dt)
    normals = jax.random.normal(knorm, (lmax + 1, k, k), dtype=dt)
    tril = jnp.tril(normals, k=-1)
    Lmat = tril + jax.vmap(jnp.diag)(jnp.sqrt(chi2))
    # Bartlett: W = A (L L^T) A^T ~ Wishart(nu, A A^T) for any A with
    # A A^T = Psi^-1 = S^-1; take A = cS^-T (cS = chol(S), lower), so
    # C = W^-1 = A^-T (L L^T)^-1 A^-1 = cS (L L^T)^-1 cS^T.
    eye = jnp.eye(k, dtype=dt)
    Sreg = S + 1e-30 * eye
    cS = jnp.linalg.cholesky(Sreg)
    LLT = Lmat @ jnp.swapaxes(Lmat, -1, -2)
    inv_LLT = jnp.linalg.inv(LLT + 1e-30 * eye)
    C = cS @ inv_LLT @ jnp.swapaxes(cS, -1, -2)
    lmask = jnp.arange(lmax + 1) >= lmin
    # where (not multiply): sub-lmin rows can contain inf from degenerate
    # scatters, and 0 * inf = nan
    return jnp.where(lmask[:, None, None], C, 0.0)


# ---------------------------------------------------------------------------
# ASIS whiten / recenter transforms (reference: ASIS.py:109-120, 185-203)
# ---------------------------------------------------------------------------

def whiten(s, dl_tuple, bins_list, lmax):
    """s_nc = C^-1/2 s (slots with C = 0 stay 0)."""
    var = _dl_tuple_to_var(dl_tuple, bins_list, lmax, s.shape[-1], s.dtype)
    inv_sqrt = jnp.where(var > 0, 1.0 / jnp.sqrt(jnp.where(var > 0, var, 1.0)),
                         0.0)
    return s * inv_sqrt


def recenter(s_nc, dl_tuple, bins_list, lmax):
    """s = C^{1/2} s_nc."""
    var = _dl_tuple_to_var(dl_tuple, bins_list, lmax, s_nc.shape[-1],
                           s_nc.dtype)
    return jnp.sqrt(var) * s_nc
