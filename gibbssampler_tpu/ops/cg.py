"""Batched preconditioned conjugate gradients on TPU.

Replaces the reference's qcinv multigrid/PCG chain (descriptor
[0, ["diag_cl"], lmax, nside, 4000, 1e-6, tr_cg, cache_mem()], reference:
ConstrainedRealization.py:40-41): a diagonally preconditioned CG where each
operator application costs two SHTs, expressed as a ``lax.while_loop`` so the
whole solve stays on device, and batched over chains — all chains iterate in
lockstep until every chain's residual passes the tolerance (converged chains
keep iterating on already-converged systems, which is free in lockstep SPMD
and keeps shapes static).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["cg_solve", "CGInfo"]


class CGInfo(NamedTuple):
    iterations: jnp.ndarray     # scalar int32 — iterations executed
    residual_norm: jnp.ndarray  # (...,) final ||b - Q x|| per batch element
    converged: jnp.ndarray      # (...,) bool per batch element


def _batch_dot(a, b, ndim_sys: int):
    """Sum over the trailing ndim_sys axes (the per-system axes)."""
    axes = tuple(range(-ndim_sys, 0))
    return jnp.sum(a * b, axis=axes)


def cg_solve(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    precond_diag: jnp.ndarray | None = None,
    tol: float = 1e-6,
    maxiter: int = 4000,
    ndim_sys: int = 2,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    apply_dtype=None,
    operator_hi: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    replace_every: int = 50,
):
    """Solve operator(x) = b for SPD ``operator``.

    Parameters
    ----------
    operator : linear map on arrays shaped like ``b``
    b : (..., *system_shape) right-hand side(s); leading axes are batch
    x0 : initial guess (0 if None; RJPO seeds with the previous sample,
         reference: CenteredGibbs.py:162-191)
    precond_diag : elementwise M^-1 (same shape as b broadcastable); the
         diag_cl-style preconditioner
    precond : general SPD preconditioner callable M^-1 v (e.g. the
         block-diagonal k x k preconditioner of the joint sampler);
         overrides precond_diag
    tol : relative tolerance on ||r|| / ||b|| per batch element.
         Precision note (measured, tools/cg_scale.py): at production scale
         (lmax=512 masked polarized sky) PLAIN fp32 CG STAGNATES before
         ||r||/||b|| = 1e-5 (4000 iters, no convergence) while fp64
         converges in ~200-400 iterations.  The mixed scheme below (fp32
         mat-vecs + fp64 vectors/recurrences + periodic true-residual
         replacement) recovers fp64-class convergence at ~fp32 apply cost
         — the production remedy; full fp64 (TPU emulation) remains the
         reference-parity fallback.
    maxiter : iteration cap (reference budget: 4000)
    ndim_sys : how many trailing axes form one linear system
    apply_dtype : run ``operator`` at this LOWER dtype (cast in/out per
         apply) while keeping x/r/p and all recurrence scalars at
         ``b.dtype`` — mixed-precision CG.  The hot mat-vec (two SHTs)
         then runs at fp32 MXU rate instead of fp64 emulation.
    operator_hi : optional full-precision operator used only for the
         periodic residual replacement (defaults to the low-precision
         apply, which still removes recurrence drift, the dominant fp32
         failure mode).
    replace_every : with ``apply_dtype``: every K iterations recompute the
         TRUE residual r = b - Q x and restart the search direction
         (p = z) — van der Vorst-style residual replacement; removes the
         accumulated recurrence error that makes plain fp32 stagnate.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    if precond is not None:
        minv = precond
    elif precond_diag is not None:
        minv = lambda v: precond_diag * v
    else:
        minv = lambda v: v

    hi = b.dtype
    lo = None if apply_dtype is None else jnp.dtype(apply_dtype)
    if lo is not None and lo == hi:
        lo = None

    def apply_op(v):
        if lo is None:
            return operator(v)
        return operator(v.astype(lo)).astype(hi)

    rep_op = operator_hi if operator_hi is not None else apply_op

    r = b - rep_op(x)
    z = minv(r)
    p = z
    rz = _batch_dot(r, z, ndim_sys)
    bnorm = jnp.sqrt(_batch_dot(b, b, ndim_sys))
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)

    def cond(state):
        i, x, r, p, rz = state
        rnorm = jnp.sqrt(_batch_dot(r, r, ndim_sys))
        return jnp.logical_and(i < maxiter, jnp.any(rnorm > tol * bnorm))

    def body(state):
        i, x, r, p, rz = state
        qp = apply_op(p)
        denom = _batch_dot(p, qp, ndim_sys)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        alpha_b = alpha[(...,) + (None,) * ndim_sys]
        x = x + alpha_b * p
        r = r - alpha_b * qp

        if lo is not None and replace_every:
            def repl(xr):
                x_, r_ = xr
                rr = b - rep_op(x_)
                zz = minv(rr)
                return rr, zz, _batch_dot(rr, zz, ndim_sys)

            def norepl(xr):
                _x, r_ = xr
                zz = minv(r_)
                rzn = _batch_dot(r_, zz, ndim_sys)
                beta = rzn / jnp.where(rz == 0, 1.0, rz)
                return r_, zz + beta[(...,) + (None,) * ndim_sys] * p, rzn

            r, p, rz_new = lax.cond((i + 1) % replace_every == 0,
                                    repl, norepl, (x, r))
            return i + 1, x, r, p, rz_new

        z = minv(r)
        rz_new = _batch_dot(r, z, ndim_sys)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta[(...,) + (None,) * ndim_sys] * p
        return i + 1, x, r, p, rz_new

    i0 = jnp.asarray(0, dtype=jnp.int32)
    i, x, r, p, rz = lax.while_loop(cond, body, (i0, x, r, p, rz))
    rnorm = jnp.sqrt(_batch_dot(r, r, ndim_sys))
    info = CGInfo(iterations=i, residual_norm=rnorm,
                  converged=rnorm <= tol * bnorm)
    return x, info
