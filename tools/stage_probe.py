"""Time each sub-stage of the real spin-2 synthesis/adjoint pipeline at
bench scale (64 chains) to locate the non-roofline overhead."""

import functools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import numpy as np
import jax
import jax.numpy as jnp

from gibbssampler_tpu.sht import make_sht
from gibbssampler_tpu.harmonics import nflat
from gibbssampler_tpu.harmonics.packing import flat_to_grid, grid_to_flat

LMAX = 512
C = 64
REPS = 30
f32 = jnp.float32


def timed(name, step, x, aux=None):
    """Scalar-carry harness: input perturbed by the carry (prevents hoisting),
    output fully summed (prevents DCE); reduction cost ~HBM-read of output.
    ``aux`` (e.g. the SHT pytree) is passed as a jit argument so tables are
    runtime parameters, not lowered constants (remote-compile payload)."""
    @functools.partial(jax.jit, static_argnums=0)
    def run(n, x, aux):
        def body(t, _):
            xi = jax.tree.map(lambda v: v * (1.0 + t * 1e-24), x)
            y = step(xi, aux)
            s = sum(jnp.sum(v) for v in jax.tree.leaves(y))
            return jnp.tanh(s * 1e-20), None
        t, _ = jax.lax.scan(body, jnp.zeros((), f32), None, length=n)
        return t

    _ = float(run(2, x, aux)); _ = float(run(REPS, x, aux))
    t0 = time.time(); _ = float(run(2, x, aux)); t2 = time.time() - t0
    t0 = time.time(); _ = float(run(REPS, x, aux)); dt = time.time() - t0
    per = (dt - t2) / (REPS - 2)
    print(f"{name:46s} {per*1e3:9.2f} ms", flush=True)
    return per


def main():
    sht = make_sht(LMAX, dtype=f32, spin2=True)
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(key, (C, nflat(LMAX)), f32)
    b = jax.random.normal(key, (C, nflat(LMAX)), f32)
    grids = flat_to_grid(e, LMAX)
    q = jax.random.normal(key, (C, sht.nrings, sht.nphi), f32)
    u = jax.random.normal(key, (C, sht.nrings, sht.nphi), f32)

    print(f"c={C} lmax={LMAX} grid {sht.nrings}x{sht.nphi}")

    # full transforms
    timed("synthesis_spin2 (full)",
          lambda eb, s: s.synthesis_spin2(eb[0], eb[1]), (e, b), sht)
    timed("adjoint_synthesis_spin2 (full)",
          lambda qu, s: s.adjoint_synthesis_spin2(qu[0], qu[1]), (q, u), sht)

    # pack/unpack
    timed("flat_to_grid x2", lambda eb, s: (flat_to_grid(eb[0], LMAX)
                                            + flat_to_grid(eb[1], LMAX)),
          (e, b), sht)
    timed("grid_to_flat", lambda g, s: grid_to_flat(g[0], g[1], LMAX),
          grids, sht)

    # legendre stage alone (2 tables, as in spin-2)
    def leg(g, s):
        re, im = g
        F1 = s._lsynth2(s.lam_p2, re, im)
        F2 = s._lsynth2(s.lam_m2, re, im)
        return F1[0] + F2[0], F1[1] + F2[1]
    timed("legendre stage (2 tables)", leg, grids, sht)

    # adjoint legendre stage alone (2 tables)
    Fpair = (jax.random.normal(key, (C, sht.nrings, LMAX + 1), f32),
             jax.random.normal(key, (C, sht.nrings, LMAX + 1), f32))
    def ladj(g, s):
        a1 = s._ladj2(s.lam_p2, g[0], g[1])
        a2 = s._ladj2(s.lam_m2, g[0], g[1])
        return a1[0] + a2[0], a1[1] + a2[1]
    timed("adjoint legendre stage (2 tables)", ladj, Fpair, sht)

    # azimuthal stage alone (4 matmuls + unfold)
    F4 = (jax.random.normal(key, (C, sht.nrings, LMAX + 1), f32),) * 4
    def azi(Fs, s):
        Are, Aim, Bre, Bim = Fs
        pet = s.dtype
        qc = jnp.matmul(Are, s.dft_cos, preferred_element_type=pet)
        qs = jnp.matmul(Aim, s.dft_sin, preferred_element_type=pet)
        us = jnp.matmul(Bre, s.dft_sin, preferred_element_type=pet)
        uc = jnp.matmul(Bim, s.dft_cos, preferred_element_type=pet)
        qq = s._unfold_half(qc - qs, qc + qs)
        uu = s._unfold_half(uc + us, uc - us)
        return qq, uu
    timed("azimuthal stage (4 matmuls + unfold)", azi, F4, sht)

    # analysis-side azimuthal: fold + 4 transposed matmuls
    def azi_a(qu, s):
        qm, um = qu
        qu_, qv_ = s._fold_half(qm)
        uu_, uv_ = s._fold_half(um)
        pet = s.dtype
        return (jnp.matmul(qu_, s.dft_cos.T, preferred_element_type=pet),
                jnp.matmul(qv_, s.dft_sin.T, preferred_element_type=pet),
                jnp.matmul(uu_, s.dft_cos.T, preferred_element_type=pet),
                jnp.matmul(uv_, s.dft_sin.T, preferred_element_type=pet))
    timed("fold + 4 azimuthal^T matmuls", azi_a, (q, u), sht)


if __name__ == "__main__":
    main()
