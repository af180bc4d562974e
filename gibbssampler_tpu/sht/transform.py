"""TPU-native spherical-harmonic transforms (spin-0 and spin-2).

The transform is the framework's dominant kernel — the TPU-first re-design of
what the reference gets from healpy/libsharp on CPU (hp.alm2map / hp.map2alm /
adjoint synthesis; reference: utils.py:79-111, CenteredGibbs.py:505-513,
ClsSampler.py:100-110).  Structure:

  synthesis  (alm -> map):  per-m Legendre matmul over l  ->  ring (i)rFFT
  analysis   (map -> alm):  ring rFFT  ->  per-m weighted Legendre matmul

Both stages batch over arbitrary leading axes (fields, chains), so vmapping
chains turns the Legendre stage into large MXU matmuls.  On the Gauss–
Legendre grid ``analysis`` is the exact inverse of ``synthesis`` and
``adjoint_synthesis`` is the exact transpose of ``synthesis`` (verified to
machine precision in tests) — one consistent A / A^T everywhere, fixing the
reference's mixed iter=3/iter=0 adjoint discipline (SURVEY.md 2.6.9).

alm are real-packed vectors (see harmonics.packing); maps are
(..., nrings, nphi) real arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..harmonics.packing import flat_to_grid, grid_to_flat
from .grids import SphereGrid, gauss_legendre_grid
from .legendre import legendre_table, spin2_lambda_tables

__all__ = ["SHT", "make_sht"]


def _complex_dtype(real_dtype):
    return jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64


class SHT:
    """Precomputed transform operators for one (grid, lmax, dtype).

    Holds the Legendre operator tensors on device and exposes pure, jittable
    methods.  Instances are cheap to close over in jitted sampler steps (the
    tables become baked-in device constants).
    """

    def __init__(self, grid: SphereGrid, lmax: int, dtype=jnp.float32,
                 spin2: bool = False):
        self.grid = grid
        self.lmax = lmax
        self.dtype = jnp.dtype(dtype)
        self.cdtype = _complex_dtype(self.dtype)
        L = lmax + 1
        if grid.nphi < 2 * lmax + 2:
            raise ValueError(
                f"grid nphi={grid.nphi} too small for lmax={lmax}; need >= {2*lmax+2}")

        x = np.cos(grid.theta)
        self.lam0 = jnp.asarray(legendre_table(lmax, x), dtype=self.dtype)
        # quadrature weights including the 2 pi / nphi azimuthal factor
        self.wq = jnp.asarray(grid.weights * (2.0 * np.pi / grid.nphi),
                              dtype=self.dtype)
        self.nphi = grid.nphi
        self.nrings = grid.nrings
        # per-ring, per-m phase e^{i m phi0_r}
        m = np.arange(L)
        phase = np.exp(1j * np.outer(grid.phi0, m))  # (nr, L)
        self.has_phase = bool(np.any(grid.phi0 != 0.0))
        self.phase = jnp.asarray(phase, dtype=self.cdtype)
        self.lam_p2 = self.lam_m2 = None
        if spin2:
            lp, lm_ = spin2_lambda_tables(lmax, grid.theta)
            self.lam_p2 = jnp.asarray(lp, dtype=self.dtype)
            self.lam_m2 = jnp.asarray(lm_, dtype=self.dtype)

    # -- spin 0 ------------------------------------------------------------

    def _legendre_synth(self, flat, lam):
        """flat alm -> F[..., nr, m] (complex ring Fourier coefficients)."""
        re, im = flat_to_grid(flat.astype(self.dtype), self.lmax)
        Fre = jnp.einsum("mlr,...ml->...rm", lam, re)
        Fim = jnp.einsum("mlr,...ml->...rm", lam, im)
        return Fre + 1j * Fim

    def synthesis(self, flat: jnp.ndarray) -> jnp.ndarray:
        """A: real-packed alm (..., (lmax+1)^2) -> map (..., nr, nphi)."""
        F = self._legendre_synth(flat, self.lam0)
        if self.has_phase:
            F = F * self.phase
        pad = self.nphi // 2 + 1 - (self.lmax + 1)
        F = jnp.pad(F, [(0, 0)] * (F.ndim - 1) + [(0, pad)])
        return jnp.fft.irfft(F, n=self.nphi, axis=-1) * self.nphi

    def _analysis_core(self, maps, ring_w):
        """map -> real-packed alm with per-ring weights ring_w."""
        G = jnp.fft.rfft(maps.astype(self.dtype), axis=-1)[..., : self.lmax + 1]
        if self.has_phase:
            G = G * jnp.conj(self.phase)
        G = G * ring_w[:, None]
        are = jnp.einsum("mlr,...rm->...ml", self.lam0, G.real)
        aim = jnp.einsum("mlr,...rm->...ml", self.lam0, G.imag)
        return grid_to_flat(are, aim, self.lmax)

    def analysis(self, maps: jnp.ndarray) -> jnp.ndarray:
        """Exact inverse of synthesis on a quadrature grid (hp.map2alm role)."""
        return self._analysis_core(maps, self.wq)

    def adjoint_synthesis(self, maps: jnp.ndarray) -> jnp.ndarray:
        """A^T: exact transpose of ``synthesis`` w.r.t. the plain (unweighted)
        pixel dot product and the real-packed alm dot product (the role of
        the reference's map2alm * Npix/(4 pi), reference: utils.py:79-111,
        but exact by construction)."""
        return self._analysis_core(maps, jnp.ones_like(self.wq))

    # -- spin 2 ------------------------------------------------------------

    def _require_spin2(self):
        if self.lam_p2 is None:
            raise ValueError("SHT built without spin2=True")

    def synthesis_spin2(self, e_flat: jnp.ndarray, b_flat: jnp.ndarray):
        """(E, B) real-packed alm -> (Q, U) maps.

        Convention: Q + iU = sum_lm a+_{lm} 2Y_lm with a+ = -(E + iB),
        a- = -(E - iB) (IAU/healpy CMB convention).
        """
        self._require_spin2()
        ere, eim = flat_to_grid(e_flat.astype(self.dtype), self.lmax)
        bre, bim = flat_to_grid(b_flat.astype(self.dtype), self.lmax)
        # a+ = -(E + iB), a- = -(E - iB)
        ap_re, ap_im = -(ere - bim), -(eim + bre)
        am_re, am_im = -(ere + bim), -(eim - bre)
        Fp = (jnp.einsum("mlr,...ml->...rm", self.lam_p2, ap_re)
              + 1j * jnp.einsum("mlr,...ml->...rm", self.lam_p2, ap_im))
        Fm = (jnp.einsum("mlr,...ml->...rm", self.lam_m2, am_re)
              + 1j * jnp.einsum("mlr,...ml->...rm", self.lam_m2, am_im))
        if self.has_phase:
            Fp = Fp * self.phase
            Fm = Fm * self.phase
        # assemble full complex FFT bins of P = Q + iU:
        #   bin m (0..lmax)       <- Fp_m
        #   bin nphi - m (m>=1)   <- conj(Fm_m)
        n = self.nphi
        shape = Fp.shape[:-1] + (n,)
        G = jnp.zeros(shape, dtype=self.cdtype)
        G = G.at[..., : self.lmax + 1].set(Fp)
        neg = jnp.conj(Fm[..., 1:])  # m = 1..lmax -> bins n-1 .. n-lmax
        G = G.at[..., n - self.lmax:].add(neg[..., ::-1])
        P = jnp.fft.ifft(G, n=n, axis=-1) * n
        return P.real, P.imag

    def _analysis_spin2_core(self, q_maps, u_maps, ring_w):
        self._require_spin2()
        P = q_maps.astype(self.dtype) + 1j * u_maps.astype(self.dtype)
        C = jnp.fft.fft(P, axis=-1)
        L = self.lmax + 1
        Cp = C[..., :L]                       # sum_j P e^{-i m phi_j}, m >= 0
        Cm_rev = C[..., self.nphi - self.lmax:]
        Cm = jnp.concatenate([C[..., :1], Cm_rev[..., ::-1]], axis=-1)
        # Cm[m] = sum_j P e^{+i m phi_j}
        if self.has_phase:
            Cp = Cp * jnp.conj(self.phase)
            Cm = Cm * self.phase
        Cp = Cp * ring_w[:, None]
        Cm = Cm * ring_w[:, None]
        # a+_{lm} = sum_r w 2lam_lm Cp ;  a-_{lm} = sum_r w -2lam_lm conj(Cm)
        ap_re = jnp.einsum("mlr,...rm->...ml", self.lam_p2, Cp.real)
        ap_im = jnp.einsum("mlr,...rm->...ml", self.lam_p2, Cp.imag)
        am_re = jnp.einsum("mlr,...rm->...ml", self.lam_m2, Cm.real)
        am_im = jnp.einsum("mlr,...rm->...ml", self.lam_m2, -Cm.imag)
        # E = -(a+ + a-)/2,  B = i (a+ - a-)/2
        e_re, e_im = -0.5 * (ap_re + am_re), -0.5 * (ap_im + am_im)
        b_re, b_im = -0.5 * (ap_im - am_im), 0.5 * (ap_re - am_re)
        return (grid_to_flat(e_re, e_im, self.lmax),
                grid_to_flat(b_re, b_im, self.lmax))

    def analysis_spin2(self, q_maps, u_maps):
        """Exact inverse: (Q, U) maps -> (E, B) real-packed alm."""
        return self._analysis_spin2_core(q_maps, u_maps, self.wq)

    def adjoint_synthesis_spin2(self, q_maps, u_maps):
        """Exact transpose of synthesis_spin2 w.r.t. plain dot products."""
        return self._analysis_spin2_core(q_maps, u_maps,
                                         jnp.ones_like(self.wq))


def make_sht(lmax: int, grid: SphereGrid | None = None, dtype=jnp.float32,
             spin2: bool = False) -> SHT:
    """Build an SHT for ``lmax`` (Gauss–Legendre grid by default)."""
    if grid is None:
        grid = gauss_legendre_grid(lmax)
    return SHT(grid, lmax, dtype=dtype, spin2=spin2)
