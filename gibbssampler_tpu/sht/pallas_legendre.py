"""Pallas TPU kernel for the triangular Legendre contraction.

The Legendre operator tensors lam[m, l, r] are zero for l < m — half the
dense einsum's table reads and MXU work multiply zeros.  This kernel blocks
the contraction over (m, r-tile, l-tile) and *skips* l-tiles strictly below
the diagonal: the BlockSpec index map clamps skipped steps onto the first
valid tile (Pallas elides the repeated fetch) and ``pl.when`` gates the
matmul, so both HBM traffic and FLOPs drop by ~2x.

Layouts (kernel-friendly; Mosaic requires the last two block dims to tile
as (8k, 128k)):
    lam : (L, L, nr)   [m, l, r]   operator table (fp32 or bf16)
    x   : (L, C, L)    [m, c, l]   stacked batch (chains x fields x re/im)
    out : (L, nr, C)   [m, r, c]   ring-Fourier coefficients, fp32

The azimuthal stage consumes the (m, r, c) layout directly as a single
matmul over m, so no transpose is needed downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["legendre_synth_tri", "legendre_adj_tri"]


def _cdiv(a, b):
    return -(-a // b)


def _synth_kernel(lam_ref, x_ref, out_ref, *, tile_l):
    m = pl.program_id(0)
    lt = pl.program_id(2)

    @pl.when(lt == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # compute only when the l-tile reaches the diagonal (l_hi > m)
    @pl.when((lt + 1) * tile_l > m)
    def _():
        lam = lam_ref[0]          # (TL, TR)
        x = x_ref[0]              # (C, TL)
        out_ref[0] += jnp.dot(lam.T, x.T,
                              preferred_element_type=jnp.float32)


def legendre_synth_tri(lam, x, tile_l: int = 128, tile_r: int = 128,
                       interpret: bool = False):
    """out[m, r, c] = sum_{l >= m} lam[m, l, r] x[m, c, l].

    lam: (L, L, nr); x: (L, C, L).  L, nr, C should be multiples of the
    tile sizes / 128 for peak efficiency (callers pad)."""
    L, L2, nr = lam.shape
    C = x.shape[1]
    assert L == L2 and x.shape == (L, C, L)
    nlt = _cdiv(L, tile_l)
    nrt = _cdiv(nr, tile_r)

    def lam_index(m, rt, lt):
        # clamp below-diagonal steps onto the first valid tile so the
        # pipeline re-uses the already-fetched block instead of streaming
        # dead zeros
        first = m // tile_l
        return (m, jnp.maximum(lt, first), rt)

    def x_index(m, rt, lt):
        first = m // tile_l
        return (m, 0, jnp.maximum(lt, first))

    grid = (L, nrt, nlt)
    return pl.pallas_call(
        functools.partial(_synth_kernel, tile_l=tile_l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_l, tile_r), lam_index),
            pl.BlockSpec((1, C, tile_l), x_index),
        ],
        out_specs=pl.BlockSpec((1, tile_r, C), lambda m, rt, lt: (m, rt, 0)),
        out_shape=jax.ShapeDtypeStruct((L, nr, C), jnp.float32),
        interpret=interpret,
    )(lam, x)


def _adj_kernel(lam_ref, g_ref, out_ref, *, tile_l):
    m = pl.program_id(0)
    lt = pl.program_id(1)
    rt = pl.program_id(2)

    @pl.when(rt == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((lt + 1) * tile_l > m)
    def _():
        lam = lam_ref[0]          # (TL, TR)
        g = g_ref[0]              # (TR, C)
        out_ref[0] += jnp.dot(lam, g,
                              preferred_element_type=jnp.float32).T


def legendre_adj_tri(lam, g, tile_l: int = 128, tile_r: int = 128,
                     interpret: bool = False):
    """out[m, c, l] = sum_r lam[m, l, r] g[m, r, c]  (zero for l < m by
    construction of lam).  lam: (L, L, nr); g: (L, nr, C)."""
    L, L2, nr = lam.shape
    C = g.shape[-1]
    assert L == L2 and g.shape == (L, nr, C)
    nlt = _cdiv(L, tile_l)
    nrt = _cdiv(nr, tile_r)

    def lam_index(m, lt, rt):
        first = m // tile_l
        return (m, jnp.maximum(lt, first), rt)

    grid = (L, nlt, nrt)
    return pl.pallas_call(
        functools.partial(_adj_kernel, tile_l=tile_l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_l, tile_r), lam_index),
            pl.BlockSpec((1, tile_r, C), lambda m, lt, rt: (m, rt, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, tile_l),
                               lambda m, lt, rt: (m, 0, lt)),
        out_shape=jax.ShapeDtypeStruct((L, C, L), jnp.float32),
        interpret=interpret,
    )(lam, g)
