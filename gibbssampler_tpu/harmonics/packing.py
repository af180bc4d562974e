"""Real-packed alm conventions and index maps.

The whole framework stores spherical-harmonic coefficients of real fields as a
*real* vector of length (lmax+1)^2 using the same packing as the reference
implementation (reference: utils.py:49-76, variance_expension.pyx:65-100):

- entries [0, lmax]                : the m = 0 coefficients, a_{l0} (real), l = 0..lmax
- then, m-major for m = 1..lmax, l = m..lmax, interleaved pairs
  (sqrt(2) * Re a_{lm}, sqrt(2) * Im a_{lm})

With this sqrt(2) scaling, a field whose angular power spectrum is C_ell has
*every* real coefficient independently distributed N(0, C_ell) (reference:
CenteredGibbs.py:112-113) — this is what makes the prior covariance a plain
diagonal vector (`variance expansion`) and every conditional elementwise.

Internally the SHT wants coefficients on a dense (m, l) grid so the Legendre
contraction is a batched matmul.  This module precomputes (with numpy, once
per lmax, cached) the static index maps between:

- ``flat``  : the real packing above, shape (..., (lmax+1)^2)
- ``grid``  : complex array indexed [m, l], shape (..., lmax+1, lmax+1),
              upper-triangular in the sense l >= m (entries l < m are zero)
- ``healpy``: complex array in healpy ordering idx = m(2 lmax + 1 - m)/2 + l,
              shape (..., (lmax+1)(lmax+2)/2) — for interop and tests only.

All maps are plain gathers so they fuse into surrounding jitted code.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

__all__ = [
    "AlmIndexMaps",
    "index_maps",
    "nflat",
    "nhealpy",
    "flat_to_grid",
    "grid_to_flat",
    "flat_to_healpy",
    "healpy_to_flat",
]

_SQRT2 = np.sqrt(2.0)
_INV_SQRT2 = 1.0 / np.sqrt(2.0)


def nflat(lmax: int) -> int:
    """Length of the real packing: (lmax+1)^2."""
    return (lmax + 1) ** 2


def nhealpy(lmax: int) -> int:
    """Number of complex alm in healpy triangular ordering."""
    return (lmax + 1) * (lmax + 2) // 2


@dataclass(frozen=True)
class AlmIndexMaps:
    """Static index tables for one lmax (numpy arrays; hashable by identity)."""

    lmax: int
    # per flat slot i:
    ell_of: np.ndarray        # (nflat,) int32, degree l of slot i
    m_of: np.ndarray          # (nflat,) int32, order m of slot i
    is_imag: np.ndarray       # (nflat,) bool, slot holds sqrt2*Im part
    # flat -> grid scatter:  grid[m, l].re/im built by gathers from flat
    grid_re_src: np.ndarray   # (lmax+1, lmax+1) int32 flat index feeding Re
    grid_im_src: np.ndarray   # (lmax+1, lmax+1) int32 flat index feeding Im
    grid_re_scale: np.ndarray  # (lmax+1, lmax+1) float, 1 / invsqrt2 / 0
    grid_im_scale: np.ndarray  # same for Im
    # grid -> flat gather: flat[i] from grid[m_of[i], ell_of[i]] re or im
    flat_scale: np.ndarray    # (nflat,) float, 1 for m=0, sqrt2 otherwise
    # healpy interop
    hp_of_flat: np.ndarray    # (nflat,) int32 healpy index of slot i
    hp_ell: np.ndarray        # (nhealpy,) int32
    hp_m: np.ndarray          # (nhealpy,) int32


@functools.lru_cache(maxsize=None)
def index_maps(lmax: int) -> AlmIndexMaps:
    L = lmax + 1
    n = nflat(lmax)

    ell_of = np.zeros(n, dtype=np.int32)
    m_of = np.zeros(n, dtype=np.int32)
    is_imag = np.zeros(n, dtype=bool)

    # m = 0 block
    ell_of[:L] = np.arange(L)
    pos = L
    # m >= 1 blocks, interleaved (re, im)
    for m in range(1, L):
        nl = L - m
        ells = np.arange(m, L)
        ell_of[pos: pos + 2 * nl: 2] = ells
        ell_of[pos + 1: pos + 2 * nl: 2] = ells
        m_of[pos: pos + 2 * nl] = m
        is_imag[pos + 1: pos + 2 * nl: 2] = True
        pos += 2 * nl
    assert pos == n

    # flat slot index for (m, l, part)
    re_slot = np.zeros((L, L), dtype=np.int64)
    im_slot = np.zeros((L, L), dtype=np.int64)
    grid_re_scale = np.zeros((L, L))
    grid_im_scale = np.zeros((L, L))
    re_slot_of = {}
    pos = L
    for l in range(L):
        re_slot[0, l] = l
        grid_re_scale[0, l] = 1.0
    for m in range(1, L):
        for l in range(m, L):
            re_slot[m, l] = pos
            im_slot[m, l] = pos + 1
            grid_re_scale[m, l] = _INV_SQRT2
            grid_im_scale[m, l] = _INV_SQRT2
            pos += 2

    # healpy index of each flat slot
    hp_of_flat = (m_of.astype(np.int64) * (2 * lmax + 1 - m_of) // 2
                  + ell_of).astype(np.int32)
    nh = nhealpy(lmax)
    hp_ell = np.zeros(nh, dtype=np.int32)
    hp_m = np.zeros(nh, dtype=np.int32)
    for m in range(L):
        base = m * (2 * lmax + 1 - m) // 2
        hp_ell[base + m: base + L] = np.arange(m, L)
        hp_m[base + m: base + L] = m

    flat_scale = np.where(m_of == 0, 1.0, _SQRT2)

    return AlmIndexMaps(
        lmax=lmax,
        ell_of=ell_of,
        m_of=m_of,
        is_imag=is_imag,
        grid_re_src=re_slot.astype(np.int32),
        grid_im_src=im_slot.astype(np.int32),
        grid_re_scale=grid_re_scale,
        grid_im_scale=grid_im_scale,
        flat_scale=flat_scale,
        hp_of_flat=hp_of_flat,
        hp_ell=hp_ell,
        hp_m=hp_m,
    )


def flat_to_grid(flat: jnp.ndarray, lmax: int):
    """Real-packed (..., (lmax+1)^2) -> complex-as-two-reals (m, l) grids.

    Returns (re, im), each (..., lmax+1, lmax+1); re[m, l] = Re a_{lm},
    im[m, l] = Im a_{lm}; entries with l < m are zero.
    """
    maps = index_maps(lmax)
    re_src = jnp.asarray(maps.grid_re_src)
    im_src = jnp.asarray(maps.grid_im_src)
    re_sc = jnp.asarray(maps.grid_re_scale, dtype=flat.dtype)
    im_sc = jnp.asarray(maps.grid_im_scale, dtype=flat.dtype)
    re = flat[..., re_src] * re_sc
    im = flat[..., im_src] * im_sc
    return re, im


def grid_to_flat(re: jnp.ndarray, im: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Inverse of :func:`flat_to_grid`."""
    maps = index_maps(lmax)
    m_of = jnp.asarray(maps.m_of)
    ell_of = jnp.asarray(maps.ell_of)
    is_imag = jnp.asarray(maps.is_imag)
    scale = jnp.asarray(maps.flat_scale, dtype=re.dtype)
    re_part = re[..., m_of, ell_of]
    im_part = im[..., m_of, ell_of]
    return jnp.where(is_imag, im_part, re_part) * scale


def flat_to_healpy(flat: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Real packing -> complex healpy-ordered alm (for interop/tests)."""
    re, im = flat_to_grid(flat, lmax)
    maps = index_maps(lmax)
    hm = jnp.asarray(maps.hp_m)
    hl = jnp.asarray(maps.hp_ell)
    return re[..., hm, hl] + 1j * im[..., hm, hl]


def healpy_to_flat(alm: jnp.ndarray, lmax: int) -> jnp.ndarray:
    """Complex healpy-ordered alm -> real packing."""
    maps = index_maps(lmax)
    hp_of = jnp.asarray(maps.hp_of_flat)
    is_imag = jnp.asarray(maps.is_imag)
    scale = jnp.asarray(maps.flat_scale, dtype=alm.real.dtype)
    vals = alm[..., hp_of]
    return jnp.where(is_imag, vals.imag, vals.real) * scale
