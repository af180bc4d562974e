"""Pixel-noise model with quadrature-aware weighting.

The reference assumes HEALPix pixels of uniform area Omega = 4 pi / Npix and
white noise N = sigma^2 I, so A^T N^-1 A = Npix/(4 pi sigma^2) I *approximately*
(reference: config.py:72-73, CenteredGibbs.py:108-132).  On a quadrature grid
(Gauss–Legendre) pixel areas vary by ring; we therefore parameterize the noise
by a "flat" inverse-noise field tau(pix) = mask / sigma^2 and define

    N^-1 = diag( q * tau ),     q = pixel_area / omega,   omega = 4 pi / npix

i.e. the inverse noise per pixel is scaled by the pixel's relative area.  For
uniform-area grids (HEALPix) q = 1 and this reduces exactly to the
reference's model.  The payoff on quadrature grids: any pixel-diagonal
operator of the form diag(c * q) has an *exactly* diagonal harmonic image
c/omega * I (because A^T diag(w_quad) A = I), so the full-sky constrained-
realization solve, the auxiliary-variable step, and the Langevin
preconditioners are exact — not approximate as in the reference.

Maps may be (nrings, nphi) arrays (iso-latitude grids) or flat (npix,)
vectors (HEALPix RING order); ``pix_ndim`` records which.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import register_arrays_pytree

__all__ = ["NoiseModel"]


@dataclass(frozen=True)
class NoiseModel:
    """White (masked) pixel noise for one or more Stokes fields.

    Attributes
    ----------
    tau : (nfields, *pix) flat inverse-noise (mask / sigma^2); masked pixels
        carry tau = 0, i.e. infinite noise (reference: ClsSampler.py:28-33).
    q_map : broadcastable-to-pix relative pixel area (pixel_area / omega).
    omega : scalar, mean pixel solid angle 4 pi / npix.
    """

    tau: jnp.ndarray
    q_map: jnp.ndarray
    omega: float

    @property
    def pix_ndim(self) -> int:
        return self.tau.ndim - 1

    @property
    def _pix_axes(self):
        return tuple(range(-self.pix_ndim, 0))

    @classmethod
    def white(cls, sigma2, grid, nfields: int, mask=None, dtype=jnp.float32):
        """Uniform white noise of variance sigma2 (scalar or per-field) on an
        iso-latitude grid; optional (nrings, nphi) mask in [0, 1]."""
        omega = 4.0 * np.pi / grid.npix
        q = (grid.pixel_area / omega)[:, None]        # (nrings, 1)
        sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, dtype=dtype), (nfields,))
        tau = jnp.ones((nfields, grid.nrings, grid.nphi), dtype=dtype)
        tau = tau / sigma2[:, None, None]
        if mask is not None:
            tau = tau * jnp.asarray(mask, dtype=dtype)
        return cls(tau=tau, q_map=jnp.asarray(q, dtype=dtype),
                   omega=float(omega))

    @classmethod
    def white_healpix(cls, sigma2, geo, nfields: int, mask=None,
                      dtype=jnp.float32, sht=None):
        """Uniform white noise on a HEALPix grid (flat npix maps, q = 1 —
        exactly the reference's noise model, config.py:36-38).

        If ``sht`` is a padded-layout HealpixSHT, the noise lives in the
        padded section layout instead: q_map is the validity mask (0 on
        padding slots, so inv_noise = 0 there and padding never contributes
        to any noise-weighted operator), and ``mask`` is still given in RING
        order and converted."""
        sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, dtype=dtype), (nfields,))
        if sht is not None and getattr(sht, "layout", "ring") == "padded":
            valid = sht.valid.astype(dtype)
            tau = jnp.broadcast_to(valid, (nfields, sht.npadded)) \
                / sigma2[:, None]
            if mask is not None:
                tau = tau * sht.from_ring(jnp.asarray(mask, dtype=dtype))
            return cls(tau=tau, q_map=valid, omega=float(geo.pixel_area))
        tau = jnp.ones((nfields, geo.npix), dtype=dtype) / sigma2[:, None]
        if mask is not None:
            tau = tau * jnp.asarray(mask, dtype=dtype)
        return cls(tau=tau, q_map=jnp.ones((geo.npix,), dtype=dtype),
                   omega=float(geo.pixel_area))

    @property
    def inv_noise(self) -> jnp.ndarray:
        """N^-1 per pixel, (nfields, *pix)."""
        return self.tau * self.q_map

    @property
    def tau_max(self) -> jnp.ndarray:
        """(nfields,) max flat inverse noise — the aux-variable mu bound
        (reference: ConstrainedRealization.py:44 sets mu = max(N^-1) + eps)."""
        return jnp.max(self.tau, axis=self._pix_axes)

    @property
    def f_sky(self) -> jnp.ndarray:
        """(nfields,) effective unmasked sky fraction (area-weighted)."""
        occ = (self.tau > 0).astype(self.tau.dtype)
        area = jnp.broadcast_to(self.q_map, self.tau.shape[1:])
        tot = jnp.sum(area)
        return jnp.sum(occ * area, axis=self._pix_axes) / tot

    def harmonic_white_level(self) -> jnp.ndarray:
        """(nfields,) g such that A^T N^-1 A = g I when the mask is trivial
        and tau is uniform: g = tau / omega (the reference's
        Npix/(4 pi sigma^2), config.py:72)."""
        return self.tau_max / self.omega

    def field_bcast(self, v: jnp.ndarray) -> jnp.ndarray:
        """Broadcast a (nfields,) vector over the pixel axes."""
        return v.reshape(v.shape + (1,) * self.pix_ndim)


register_arrays_pytree(NoiseModel, array_fields=("tau", "q_map"),
                       static_fields=("omega",))
