"""Pixel-noise model with quadrature-aware weighting.

The reference assumes HEALPix pixels of uniform area Omega = 4 pi / Npix and
white noise N = sigma^2 I, so A^T N^-1 A = Npix/(4 pi sigma^2) I *approximately*
(reference: config.py:72-73, CenteredGibbs.py:108-132).  On a quadrature grid
(Gauss–Legendre) pixel areas vary by ring; we therefore parameterize the noise
by a "flat" inverse-noise field tau(r, j) = mask / sigma^2 and define

    N^-1 = diag( q_r * tau ),     q_r = w_r (2 pi / nphi) / omega,
    omega = 4 pi / npix,

i.e. the inverse noise per pixel is scaled by the pixel's relative area.  For
uniform-area grids q_r = 1 and this reduces exactly to the reference's model.
The payoff: any pixel-diagonal operator of the form diag(c * q_r) has an
*exactly* diagonal harmonic image c/omega * I (because A^T diag(w_quad) A = I
on a quadrature grid), so the full-sky constrained-realization solve, the
auxiliary-variable step, and the Langevin preconditioners are exact — not
approximate as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

__all__ = ["NoiseModel"]


@dataclass(frozen=True)
class NoiseModel:
    """White (masked) pixel noise for one or more Stokes fields.

    Attributes
    ----------
    tau : (nfields, nrings, nphi) flat inverse-noise (mask / sigma^2); masked
        pixels carry tau = 0, i.e. infinite noise (reference: ClsSampler.py:28-33).
    q_profile : (nrings,) relative pixel area w_quad / omega.
    omega : scalar, mean pixel solid angle 4 pi / npix.
    """

    tau: jnp.ndarray
    q_profile: jnp.ndarray
    omega: float

    @classmethod
    def white(cls, sigma2, grid, nfields: int, mask=None, dtype=jnp.float32):
        """Uniform white noise of variance sigma2 (scalar or per-field),
        optional pixel mask (nrings, nphi) in {0, 1} (or apodized)."""
        omega = 4.0 * np.pi / grid.npix
        q = grid.pixel_area / omega
        sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, dtype=dtype), (nfields,))
        tau = jnp.ones((nfields, grid.nrings, grid.nphi), dtype=dtype)
        tau = tau / sigma2[:, None, None]
        if mask is not None:
            tau = tau * jnp.asarray(mask, dtype=dtype)
        return cls(tau=tau, q_profile=jnp.asarray(q, dtype=dtype),
                   omega=float(omega))

    @property
    def inv_noise(self) -> jnp.ndarray:
        """N^-1 per pixel, (nfields, nrings, nphi)."""
        return self.tau * self.q_profile[:, None]

    @property
    def tau_max(self) -> jnp.ndarray:
        """(nfields,) max flat inverse noise — the aux-variable mu bound
        (reference: ConstrainedRealization.py:44 sets mu = max(N^-1) + eps)."""
        return jnp.max(self.tau, axis=(-2, -1))

    @property
    def f_sky(self) -> jnp.ndarray:
        """(nfields,) effective unmasked sky fraction (area-weighted)."""
        w = self.q_profile[:, None] / (self.tau.shape[-1] * self.q_profile.sum())
        occ = (self.tau > 0).astype(self.tau.dtype)
        return jnp.sum(occ * w, axis=(-2, -1))

    def harmonic_white_level(self) -> jnp.ndarray:
        """(nfields,) g such that A^T N^-1 A = g I exactly when the mask is
        trivial and tau is uniform: g = tau / omega (the reference's
        Npix/(4 pi sigma^2), config.py:72)."""
        return self.tau_max / self.omega
