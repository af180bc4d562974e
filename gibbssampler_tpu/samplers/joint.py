"""Joint correlated-field sampling: per-ell k x k covariance blocks.

The reference prepared but never wired joint TT/TE/EE sampling: the 3x3
Cython variance-expansion kernel (variance_expension.pyx:36-61), the
invwishart import (CenteredGibbs.py:7), and an exact-conditional exploration
in comments (main-checkpoint.py:332-347).  Here it is first-class:

- ``exact_joint_cr``: full-sky exact draw of k correlated fields per slot,
  posterior precision P_i = C_ell(i)^-1 + diag_f(g_f b_l^2), via batched
  k x k Cholesky factorizations (vmapped over the (lmax+1)^2 slots)
- ``invwishart_cls_sample`` (cls_samplers): conjugate per-ell inverse-Wishart
  draw of the C_ell blocks
- ``synfast_joint``: simulate correlated fields from C_ell blocks

Fields are ordered (T, E[, B]); T uses the spin-0 transform and (E, B) the
spin-2 transform of the same SHT (see ops.model.SkyModel spin="tqu").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..harmonics.gridstate import ell_mask_state, nstate, state_masks
from .cr import CRInfo

__all__ = ["expand_cl_blocks", "exact_joint_cr", "synfast_joint",
           "blocks_to_dl"]


def expand_cl_blocks(cl_blocks: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """(lmax+1, k, k) C_ell blocks -> (nstate, k, k) per-slot covariance
    (broadcast over the grid-packed layout; invalid slots get zero)."""
    L = lmax + 1
    k = cl_blocks.shape[-1]
    valid = jnp.asarray(state_masks(lmax).valid, dtype=cl_blocks.dtype)
    out = cl_blocks[None, None, :, :, :] * valid[..., None, None]
    return out.reshape(2 * L * L, k, k)


def blocks_to_dl(cl_blocks: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """C_ell blocks -> D_ell blocks (l(l+1)/2pi scaling elementwise)."""
    ell = jnp.arange(lmax + 1, dtype=cl_blocks.dtype)
    fac = ell * (ell + 1.0) / (2.0 * jnp.pi)
    return cl_blocks * fac[:, None, None]


def _slot_chol_sample(key, P, b, active):
    """Draw x ~ N(P^-1 b, P^-1) per slot; P: (n, k, k), b: (n, k).

    Inactive slots (monopole/dipole) get x = 0."""
    n, k = b.shape
    eye = jnp.eye(k, dtype=P.dtype)
    P_safe = jnp.where(active[:, None, None] > 0, P, eye)
    L = jnp.linalg.cholesky(P_safe)
    # mean = P^-1 b  via two triangular solves
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    mean = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)[..., 0]
    # fluctuation = L^-T xi  (covariance P^-1)
    xi = jax.random.normal(key, (n, k, 1), dtype=P.dtype)
    fluc = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), xi, lower=False)[..., 0]
    return (mean + fluc) * active[:, None]


def exact_joint_cr(key, model, cl_blocks, bt_ninv_d):
    """Full-sky exact joint CR draw.

    model : SkyModel with spin="tqu" (k = 3) or spin=2 (k = 2, correlated E/B)
    cl_blocks : (lmax+1, k, k) prior C_ell covariance blocks (zero below l=2)
    bt_ninv_d : (k, nstate) data term B A^T N^-1 d

    Per real-packed slot i the posterior over the k-vector s_i is
    N(P^-1 b_i, P^-1) with P = C_ell(i)^-1 + diag_f(g_f b_l(i)^2)
    (the joint generalization of the reference's diagonal solve,
    CenteredGibbs.py:108-132 / main-checkpoint.py:332-347)."""
    lmax = model.lmax
    k = bt_ninv_d.shape[0]
    dt = bt_ninv_d.dtype
    cov = expand_cl_blocks(cl_blocks.astype(dt), lmax)        # (nstate, k, k)
    active = jnp.asarray(ell_mask_state(lmax, lmin=2), dtype=dt)
    eye = jnp.eye(k, dtype=dt)
    cov_safe = jnp.where(active[:, None, None] > 0, cov, eye)
    cinv = jnp.linalg.inv(cov_safe)
    hdiag = model.harmonic_noise_diag().astype(dt)            # (k, nflat)
    P = cinv + jax.vmap(jnp.diag, in_axes=1)(hdiag)
    x = _slot_chol_sample(key, P, bt_ninv_d.T, active)        # (nstate, k)
    s = x.T
    return s, CRInfo(accept=jnp.ones((), dt), extra=jnp.zeros((), dt))


def synfast_joint(key, cl_blocks, lmax: int, dtype=jnp.float32):
    """Draw correlated real-packed alm fields from C_ell blocks:
    s_i = L_ell(i) xi with L the Cholesky factor (k, nstate)."""
    cl_blocks = jnp.asarray(cl_blocks, dtype=dtype)
    k = cl_blocks.shape[-1]
    active = jnp.asarray(ell_mask_state(lmax, lmin=2), dtype=dtype)
    cov = expand_cl_blocks(cl_blocks, lmax)
    eye = jnp.eye(k, dtype=dtype)
    L = jnp.linalg.cholesky(jnp.where(active[:, None, None] > 0, cov, eye))
    xi = jax.random.normal(key, (nstate(lmax), k, 1), dtype=dtype)
    s = (L @ xi)[..., 0] * active[:, None]
    return s.T
