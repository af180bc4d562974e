"""HEALPix-grid spherical harmonic transforms (reference data parity).

The reference stores every map in HEALPix RING ordering (Npix = 12 nside^2)
via healpy (reference: config.py:19-21, main_polarization.py:36).  This
module reimplements the pixelization geometry and an SHT on it from scratch,
with the same TPU-first structure as the Gauss–Legendre transform
(per-m Legendre matmuls + real cos/sin azimuthal matmuls; no complex dtypes):

- ring geometry (z, ring sizes 4i / 4 nside, first-pixel offsets) from the
  HEALPix definition (Gorski et al. 2005)
- equatorial-belt rings share one azimuthal DFT matrix (their phi0 offsets
  are elementwise rotations of the ring Fourier coefficients)
- polar-cap rings (ring i has 4i pixels) use zero-padded per-ring matrices,
  batched over rings and shared between mirrored north/south rings

Analysis on HEALPix is a *scaled adjoint* (pixel area 4 pi / Npix), i.e. the
iter=0 map2alm of healpy — the same approximation the reference's sampler
math assumes (A^T A ~= Npix/4pi I; reference: config.py:72-73).  The adjoint
itself is the exact transpose of synthesis (verified in tests), which is what
the MCMC kernels require.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..harmonics.gridstate import flat_to_state, state_to_flat
from ..utils.pytree import register_arrays_pytree
from .lcore import LegendreCore
from .legendre import legendre_table, spin2_lambda_tables

__all__ = ["HealpixGeometry", "healpix_geometry", "HealpixSHT",
           "make_healpix_sht"]


@dataclass(frozen=True)
class HealpixGeometry:
    nside: int
    theta: np.ndarray      # (nrings,) ring colatitudes, north -> south
    nphi: np.ndarray       # (nrings,) pixels per ring
    phi0: np.ndarray       # (nrings,) first-pixel longitude
    ring_start: np.ndarray  # (nrings,) RING-order offset of each ring

    @property
    def npix(self) -> int:
        return 12 * self.nside * self.nside

    @property
    def nrings(self) -> int:
        return self.theta.shape[0]

    @property
    def pixel_area(self) -> float:
        return 4.0 * np.pi / self.npix

    def __hash__(self):
        return hash(("healpix", self.nside))

    def __eq__(self, other):
        return isinstance(other, HealpixGeometry) and self.nside == other.nside


@functools.lru_cache(maxsize=None)
def healpix_geometry(nside: int) -> HealpixGeometry:
    """RING-scheme ring table for one nside (healpy pix geometry equivalent)."""
    assert nside >= 1
    rings = np.arange(1, 4 * nside)
    z = np.empty(rings.shape)
    nphi = np.empty(rings.shape, dtype=np.int64)
    phi0 = np.empty(rings.shape)
    for idx, i in enumerate(rings):
        if i < nside:                       # north cap
            z[idx] = 1.0 - (i * i) / (3.0 * nside * nside)
            nphi[idx] = 4 * i
            phi0[idx] = np.pi / (4.0 * i)
        elif i <= 3 * nside:                # equatorial belt
            z[idx] = 4.0 / 3.0 - 2.0 * i / (3.0 * nside)
            nphi[idx] = 4 * nside
            s = (i - nside + 1) % 2
            phi0[idx] = s * np.pi / (4.0 * nside)
        else:                               # south cap
            i_m = 4 * nside - i
            z[idx] = -(1.0 - (i_m * i_m) / (3.0 * nside * nside))
            nphi[idx] = 4 * i_m
            phi0[idx] = np.pi / (4.0 * i_m)
    ring_start = np.concatenate([[0], np.cumsum(nphi)[:-1]])
    return HealpixGeometry(nside=nside, theta=np.arccos(z), nphi=nphi,
                           phi0=phi0, ring_start=ring_start)


class HealpixSHT(LegendreCore):
    """SHT on the HEALPix grid; same method surface as
    :class:`~gibbssampler_tpu.sht.transform.SHT` but maps are RING-ordered
    pixel vectors (..., npix).  The Legendre stage (wedge m-blocking +
    north/south ring-parity split — the HEALPix ring layout is
    equator-symmetric with a self-paired equator ring) is shared with the
    GL transform via sht.lcore."""

    map_ndim = 1   # maps are flat (..., npix) RING-order vectors

    def __init__(self, nside: int, lmax: int, dtype=jnp.float32,
                 spin2: bool = False, table_dtype=None, m_block: int = 128,
                 ring_split: bool = True):
        geo = healpix_geometry(nside)
        self.geo = geo
        self.grid = geo              # SkyModel uses .grid.npix etc.
        self.nside = nside
        self._init_core(lmax, geo.theta, dtype, table_dtype, m_block,
                        ring_split)
        self._constrain_F = None
        L = lmax + 1
        ns = nside

        x = np.cos(geo.theta)
        self.lam0 = self._block_table(legendre_table(lmax, x))
        self.lam_p2 = self.lam_m2 = self.lam_w = self.lam_x = None
        if spin2:
            lp, lm_ = spin2_lambda_tables(lmax, geo.theta)
            self._build_spin2_tables(lp, lm_)

        # ring sections (indices into the nrings axis)
        self.ncap = ns - 1
        self.nbelt = 2 * ns + 1
        self.belt_sl = slice(self.ncap, self.ncap + self.nbelt)
        self.capS_sl = slice(self.ncap + self.nbelt, geo.nrings)

        m = np.arange(L)
        # belt: shared DFT matrix + per-ring phi0 rotation
        nb = 4 * ns
        ang = 2.0 * np.pi * np.outer(m, np.arange(nb)) / nb
        self.belt_cos = jnp.asarray(np.cos(ang), dtype=self.dtype)
        self.belt_sin = jnp.asarray(np.sin(ang), dtype=self.dtype)
        bphi = geo.phi0[self.belt_sl]
        bang = np.outer(bphi, m)
        self.belt_rot_cos = jnp.asarray(np.cos(bang), dtype=self.dtype)
        self.belt_rot_sin = jnp.asarray(np.sin(bang), dtype=self.dtype)

        # caps: per-ring padded matrices with the (j + 1/2) offset baked in,
        # shared between north ring i and its southern mirror
        if self.ncap > 0:
            wpad = 4 * (ns - 1)
            Mc = np.zeros((self.ncap, L, wpad))
            Ms = np.zeros((self.ncap, L, wpad))
            for idx in range(self.ncap):
                i = idx + 1
                n_r = 4 * i
                phi = (np.pi / (2.0 * i)) * (np.arange(n_r) + 0.5)
                a = np.outer(m, phi)
                Mc[idx, :, :n_r] = np.cos(a)
                Ms[idx, :, :n_r] = np.sin(a)
            self.cap_cos = jnp.asarray(Mc, dtype=self.dtype)
            self.cap_sin = jnp.asarray(Ms, dtype=self.dtype)
            self.cap_wpad = wpad
        else:
            self.cap_cos = self.cap_sin = None
            self.cap_wpad = 0

        # RING-order gather maps between the padded section layout and the
        # npix pixel vector
        npadded = 2 * self.ncap * self.cap_wpad + self.nbelt * nb
        pix_of = np.zeros(geo.npix, dtype=np.int64)      # padded idx per pixel
        src_of = np.full(npadded, -1, dtype=np.int64)    # pixel per padded idx
        belt_off = self.ncap * self.cap_wpad
        capS_off = belt_off + self.nbelt * nb
        for r in range(geo.nrings):
            start, n_r = geo.ring_start[r], geo.nphi[r]
            if r < self.ncap:
                base = r * self.cap_wpad
            elif r < self.ncap + self.nbelt:
                base = belt_off + (r - self.ncap) * nb
            else:
                base = capS_off + (r - self.ncap - self.nbelt) * self.cap_wpad
            idxs = base + np.arange(n_r)
            pix_of[start: start + n_r] = idxs
            src_of[idxs] = start + np.arange(n_r)
        self._pix_of = jnp.asarray(pix_of)
        self._src_of = jnp.asarray(np.maximum(src_of, 0))
        self._src_valid = jnp.asarray((src_of >= 0).astype(np.float64),
                                      dtype=self.dtype)
        self._npadded = npadded

        # analysis scaling: uniform pixel area (iter=0 map2alm semantics)
        self.pixel_area = geo.pixel_area
        self.nrings = geo.nrings
        self.wq = jnp.full((geo.nrings,), geo.pixel_area, dtype=self.dtype)

    # ---- azimuthal primitives ----------------------------------------

    def _belt_rot(self, Xre, Xim, sign):
        c = self.belt_rot_cos
        s = sign * self.belt_rot_sin
        return Xre * c - Xim * s, Xre * s + Xim * c

    def _cos_sin_eval(self, Xre, Xim):
        """pixels(..., npix) = Re[sum_m (Xre + i Xim)_rm e^{i m phi_pix}]
        = Xre cos(m phi) - Xim sin(m phi), summed over m."""
        batch = Xre.shape[:-2]
        outs = []
        if self.ncap > 0:
            cN_re, cN_im = Xre[..., : self.ncap, :], Xim[..., : self.ncap, :]
            capN = (jnp.einsum("...rm,rmj->...rj", cN_re, self.cap_cos)
                    - jnp.einsum("...rm,rmj->...rj", cN_im, self.cap_sin))
            outs.append(capN.reshape(batch + (-1,)))
        bre, bim = Xre[..., self.belt_sl, :], Xim[..., self.belt_sl, :]
        bre, bim = self._belt_rot(bre, bim, +1)
        belt = bre @ self.belt_cos - bim @ self.belt_sin
        outs.append(belt.reshape(batch + (-1,)))
        if self.ncap > 0:
            cS_re, cS_im = Xre[..., self.capS_sl, :], Xim[..., self.capS_sl, :]
            # southern mirror rings share the northern matrices in reversed
            # ring order (ring 4nside - i has the geometry of ring i)
            capS = (jnp.einsum("...rm,rmj->...rj", cS_re,
                               self.cap_cos[::-1])
                    - jnp.einsum("...rm,rmj->...rj", cS_im,
                                 self.cap_sin[::-1]))
            outs.append(capS.reshape(batch + (-1,)))
        padded = jnp.concatenate(outs, axis=-1)
        return padded[..., self._pix_of]

    def _cos_sin_adj(self, maps):
        """Transpose of _cos_sin_eval: returns (C, S) with
        C_rm = sum_j f cos(m phi_j), S_rm = sum_j f sin(m phi_j)."""
        maps = maps.astype(self.dtype)
        batch = maps.shape[:-1]
        padded = maps[..., self._src_of] * self._src_valid
        L = self.lmax + 1
        nb = 4 * self.nside
        Cs, Ss = [], []
        off = 0
        if self.ncap > 0:
            w = self.ncap * self.cap_wpad
            capN = padded[..., :w].reshape(batch + (self.ncap, self.cap_wpad))
            Cs.append(jnp.einsum("...rj,rmj->...rm", capN, self.cap_cos))
            Ss.append(jnp.einsum("...rj,rmj->...rm", capN, self.cap_sin))
            off = w
        belt = padded[..., off: off + self.nbelt * nb].reshape(
            batch + (self.nbelt, nb))
        Cb = belt @ self.belt_cos.T
        Sb = belt @ self.belt_sin.T
        # transpose of the phi0 rotation: the complex pair (C - iS) picks up
        # e^{-i m phi0}, which on the (C, +S) pair is a rotation by +phi0
        Cb, Sb = self._belt_rot(Cb, Sb, +1)
        Cs.append(Cb)
        Ss.append(Sb)
        if self.ncap > 0:
            w = self.ncap * self.cap_wpad
            capS = padded[..., off + self.nbelt * nb:].reshape(
                batch + (self.ncap, self.cap_wpad))
            Cs.append(jnp.einsum("...rj,rmj->...rm", capS,
                                 self.cap_cos[::-1]))
            Ss.append(jnp.einsum("...rj,rmj->...rm", capS,
                                 self.cap_sin[::-1]))
        C = jnp.concatenate(Cs, axis=-2)
        S = jnp.concatenate(Ss, axis=-2)
        return C, S

    # ---- spin 0 -------------------------------------------------------

    def synthesis_state(self, x):
        F = self._lsynth_stack(self.lam0, self._state_grids(x))
        Fre, Fim = F[..., 0, :, :], F[..., 1, :, :]
        if self._constrain_F is not None:
            Fre, Fim = self._constrain_F(Fre), self._constrain_F(Fim)
        cm = jnp.ones((self.lmax + 1,), self.dtype).at[1:].set(2.0)
        return self._cos_sin_eval(Fre * cm, Fim * cm)

    def synthesis(self, flat):
        return self.synthesis_state(
            flat_to_state(flat.astype(self.dtype), self.lmax))

    def adjoint_synthesis_state(self, maps):
        C, S = self._cos_sin_adj(maps)
        # G_m = sum_j f e^{-im phi} = C - iS; real packing absorbs the cm
        # factor exactly as in the GL transform
        a2 = self._ladj_stack(self.lam0, jnp.stack([C, -S], axis=-3))
        return self._grids_to_state(a2)

    def adjoint_synthesis(self, maps):
        return state_to_flat(self.adjoint_synthesis_state(maps), self.lmax)

    def analysis_state(self, maps):
        return self.adjoint_synthesis_state(maps) * self.pixel_area

    def analysis(self, maps):
        """iter=0 map2alm: pixel-area-weighted adjoint (approximate inverse,
        reference semantics: utils.py:89-104 with the Npix/4pi rescale)."""
        return self.adjoint_synthesis(maps) * self.pixel_area

    # ---- spin 2 -------------------------------------------------------

    def _require_spin2(self):
        if self.lam_p2 is None and self.lam_w is None:
            raise ValueError("HealpixSHT built without spin2=True")

    def synthesis_spin2_state(self, e_state, b_state):
        self._require_spin2()
        Fp_re, Fp_im, Fm_re, Fm_im = self._spin2_F(e_state, b_state)
        pos = jnp.ones((self.lmax + 1,), self.dtype).at[0].set(0.0)
        Are = Fp_re + Fm_re * pos
        Aim = Fp_im + Fm_im * pos
        Bre = Fp_re - Fm_re * pos
        Bim = Fp_im - Fm_im * pos
        q = self._cos_sin_eval(Are, Aim)
        u = self._cos_sin_eval(Bim, -Bre)
        return q, u

    def synthesis_spin2(self, e_flat, b_flat):
        return self.synthesis_spin2_state(
            flat_to_state(e_flat.astype(self.dtype), self.lmax),
            flat_to_state(b_flat.astype(self.dtype), self.lmax))

    def adjoint_synthesis_spin2_state(self, q_maps, u_maps):
        self._require_spin2()
        Cq, Sq = self._cos_sin_adj(q_maps)
        Cu, Su = self._cos_sin_adj(u_maps)
        # C+_m = sum (Q + iU) e^{-im phi}: re = Cq + Su, im = Cu - Sq
        # C-_m = sum (Q + iU) e^{+im phi}: re = Cq - Su, im = Cu + Sq
        Cp_re, Cp_im = Cq + Su, Cu - Sq
        Cm_re, Cm_im = Cq - Su, Cu + Sq
        return self._spin2_alm(Cp_re, Cp_im, Cm_re, Cm_im)

    def adjoint_synthesis_spin2(self, q_maps, u_maps):
        e, b = self.adjoint_synthesis_spin2_state(q_maps, u_maps)
        return (state_to_flat(e, self.lmax), state_to_flat(b, self.lmax))

    def analysis_spin2_state(self, q_maps, u_maps):
        e, b = self.adjoint_synthesis_spin2_state(q_maps, u_maps)
        return e * self.pixel_area, b * self.pixel_area

    def analysis_spin2(self, q_maps, u_maps):
        e, b = self.adjoint_synthesis_spin2(q_maps, u_maps)
        return e * self.pixel_area, b * self.pixel_area


register_arrays_pytree(
    HealpixSHT,
    array_fields=("lam0", "lam_p2", "lam_m2", "lam_w", "lam_x", "par_sign",
                  "belt_cos", "belt_sin", "belt_rot_cos", "belt_rot_sin",
                  "cap_cos", "cap_sin", "_pix_of", "_src_of", "_src_valid",
                  "wq", "pack_in", "pack_out"),
    static_fields=("geo", "grid", "nside", "lmax", "dtype", "table_dtype",
                   "m_block", "ring_split", "nrh", "has_mid", "_constrain_F",
                   "ncap", "nbelt", "belt_sl", "capS_sl", "cap_wpad",
                   "_npadded", "pixel_area", "nrings"),
)


def make_healpix_sht(nside: int, lmax: int | None = None,
                     dtype=jnp.float32, spin2: bool = False) -> HealpixSHT:
    """Build a HEALPix SHT; default lmax = 2 nside (the reference's choice,
    config.py:21)."""
    if lmax is None:
        lmax = 2 * nside
    return HealpixSHT(nside, lmax, dtype=dtype, spin2=spin2)
