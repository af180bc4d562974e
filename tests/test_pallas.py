"""Pallas triangular Legendre kernels vs dense einsum (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from gibbssampler_tpu.sht.pallas_legendre import (
    legendre_synth_tri, legendre_adj_tri,
)


def _tri_table(L, nr, seed=0):
    rng = np.random.default_rng(seed)
    lam = rng.normal(size=(L, L, nr)).astype(np.float32)
    for m in range(L):
        lam[m, :m, :] = 0.0
    return lam


def test_synth_matches_einsum():
    L, nr, C = 16, 12, 8
    lam = _tri_table(L, nr)
    x = np.random.default_rng(1).normal(size=(L, C, L)).astype(np.float32)
    ref = np.einsum("mlr,mcl->mrc", lam, x)
    out = legendre_synth_tri(jnp.asarray(lam), jnp.asarray(x),
                             tile_l=4, tile_r=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_adj_matches_einsum():
    L, nr, C = 16, 12, 8
    lam = _tri_table(L, nr)
    g = np.random.default_rng(2).normal(size=(L, nr, C)).astype(np.float32)
    ref = np.einsum("mlr,mrc->mcl", lam, g)
    out = legendre_adj_tri(jnp.asarray(lam), jnp.asarray(g),
                           tile_l=4, tile_r=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
