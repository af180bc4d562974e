"""The forward model d = A B s + n as a bundle of jittable operators.

``SkyModel`` unifies temperature (spin-0, one field) and polarization
(spin-2, E/B fields) behind one interface so every sampler is written once:

- state ``s``    : (..., nfields, nstate) grid-packed alm
  (harmonics.gridstate; the gather-free TPU layout)
- pixel data ``d``: (..., nfields, nrings, nphi) maps  (T, or Q/U)

The reference implements the same operators per case through healpy + qcinv
(A: hp.alm2map; A^T: map2alm * Npix/4pi, reference: utils.py:79-111; the
qcinv opfilt_tt/opfilt_pp forward ops, reference: ConstrainedRealization.py:40,
CenteredGibbs.py:281).  Here A/A^T are the exact-transpose TPU SHT pair and
everything else is elementwise, so Q applies fuse into two SHTs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..harmonics.gridstate import (almxfl_state, ell_mask_state,
                                   expand_cl_state, nstate)
from ..sht.transform import SHT
from ..utils.pytree import register_arrays_pytree
from .noise import NoiseModel

__all__ = ["SkyModel"]


@dataclass(frozen=True)
class SkyModel:
    """Operators for one observed dataset (beam, noise, mask, SHT).

    spin = 0: nfields = 1 (T).  spin = 2: nfields = 2 (E, B alm; Q, U maps).
    spin = 3: joint TQU — nfields = 3, fields (T, E, B) <-> maps (T, Q, U),
    T through the spin-0 transform and (E, B) through spin-2 (the joint
    correlated-field mode the reference scaffolded; SURVEY.md 2.6.8).
    """

    sht: SHT
    noise: NoiseModel
    bl: jnp.ndarray            # (lmax+1,) beam window
    spin: int
    d: Optional[jnp.ndarray] = None   # observed maps (nfields, nr, nphi)

    @property
    def lmax(self) -> int:
        return self.sht.lmax

    @property
    def nfields(self) -> int:
        return {0: 1, 2: 2, 3: 3}[self.spin]

    @property
    def nstate(self) -> int:
        """State-vector length per field (grid packing, 2 (lmax+1)^2)."""
        return nstate(self.lmax)

    @property
    def map_ndim(self) -> int:
        """Pixel-array rank: 2 for (nrings, nphi) grids, 1 for HEALPix."""
        return getattr(self.sht, "map_ndim", 2)

    def _field(self, f: jnp.ndarray, i: int) -> jnp.ndarray:
        """Select field i from (..., nfields, *pix)."""
        return jnp.take(f, i, axis=f.ndim - self.map_ndim - 1)

    def _stack_fields(self, fields) -> jnp.ndarray:
        return jnp.stack(fields, axis=-(self.map_ndim + 1))

    def ell_mask(self, dtype=None) -> jnp.ndarray:
        """(nstate,) 1 on valid slots with l >= 2 (the monopole/dipole and
        the layout's invalid slots are projected out everywhere)."""
        dtype = dtype or self.sht.dtype
        return jnp.asarray(ell_mask_state(self.lmax, lmin=2), dtype=dtype)

    # ---- primitive operators -------------------------------------------

    def beam(self, s: jnp.ndarray) -> jnp.ndarray:
        """B s (diagonal per-ell, identical for every field)."""
        return almxfl_state(s, self.bl.astype(s.dtype), self.lmax)

    def synthesis(self, s: jnp.ndarray) -> jnp.ndarray:
        """A s: (..., nfields, nstate) -> (..., nfields, *pix)."""
        if self.spin == 0:
            return self._stack_fields([self.sht.synthesis_state(s[..., 0, :])])
        if self.spin == 3:
            t = self.sht.synthesis_state(s[..., 0, :])
            q, u = self.sht.synthesis_spin2_state(s[..., 1, :], s[..., 2, :])
            return self._stack_fields([t, q, u])
        q, u = self.sht.synthesis_spin2_state(s[..., 0, :], s[..., 1, :])
        return self._stack_fields([q, u])

    def adjoint_synthesis(self, f: jnp.ndarray) -> jnp.ndarray:
        """A^T f: (..., nfields, *pix) -> (..., nfields, nstate)."""
        if self.spin == 0:
            return self.sht.adjoint_synthesis_state(
                self._field(f, 0))[..., None, :]
        if self.spin == 3:
            t = self.sht.adjoint_synthesis_state(self._field(f, 0))
            e, b = self.sht.adjoint_synthesis_spin2_state(self._field(f, 1),
                                                          self._field(f, 2))
            return jnp.stack([t, e, b], axis=-2)
        e, b = self.sht.adjoint_synthesis_spin2_state(self._field(f, 0),
                                                      self._field(f, 1))
        return jnp.stack([e, b], axis=-2)

    def forward(self, s: jnp.ndarray) -> jnp.ndarray:
        """A B s — the noiseless sky seen by the instrument."""
        return self.synthesis(self.beam(s))

    def project_data(self, f: jnp.ndarray) -> jnp.ndarray:
        """B^T A^T f = B A^T f (B diagonal)."""
        return self.beam(self.adjoint_synthesis(f))

    # ---- composite operators -------------------------------------------

    def bt_ninv_d(self, d: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """B A^T N^-1 d — the data-dependent term of the CR mean, precomputed
        once per dataset (reference precomputes it at init,
        CenteredGibbs.py:296-314)."""
        d = self.d if d is None else d
        return self.project_data(self.noise.inv_noise * d)

    def q_apply(self, s: jnp.ndarray, inv_cvar: jnp.ndarray) -> jnp.ndarray:
        """Q s = C^-1 s + B A^T N^-1 A B s.

        inv_cvar: (..., nfields, nstate) inverse prior variance per slot
        (zeros on l < 2 slots; those components are projected out)."""
        mask = self.ell_mask(s.dtype)
        s = s * mask
        out = inv_cvar * s + self.project_data(
            self.noise.inv_noise * self.forward(s))
        return out * mask

    def harmonic_noise_diag(self) -> jnp.ndarray:
        """(nfields, nstate) exact diagonal of B A^T N^-1 A B when the mask
        is trivial (full sky): g_f * b_l^2 with g_f = tau_f / omega.  Used by
        the exact full-sky solves (reference: CenteredGibbs.py:108-132) and
        as the CG preconditioner / Langevin preconditioner on masked skies
        (with an f_sky correction).  Invalid layout slots carry 0."""
        bl2 = expand_cl_state(self.bl.astype(self.sht.dtype) ** 2, self.lmax)
        g = self.noise.tau_max / self.noise.omega
        return g[:, None] * bl2[None, :]


register_arrays_pytree(SkyModel, array_fields=("sht", "noise", "bl", "d"),
                       static_fields=("spin",))
