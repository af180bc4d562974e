"""Probe: exploit Legendre-table triangularity (lambda_lm = 0 for l < m)
by slicing the m axis into blocks and contracting only l >= m0 per block.

At lmax=512 a 4-block wedge does 0.63x the dense flops; this measures
whether XLA keeps MXU efficiency on the sliced shapes (bench scale:
64 chains, re/im stacked -> 128 rows).
"""

import functools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 40
f32 = jnp.float32
L = 513
NR = 513
C = 128   # chains * re/im


def timed(name, step, x, w, flops):
    @functools.partial(jax.jit, static_argnums=2)
    def run(x, w, n):
        def body(c, _):
            return step(c, w), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    _ = float(jnp.ravel(run(x, w, 2))[0])
    _ = float(jnp.ravel(run(x, w, REPS))[0])
    t0 = time.time(); _ = float(jnp.ravel(run(x, w, 2))[0]); t2 = time.time() - t0
    t0 = time.time(); _ = float(jnp.ravel(run(x, w, REPS))[0]); dt = time.time() - t0
    per = (dt - t2) / (REPS - 2)
    print(f"{name:56s} {per*1e3:8.2f} ms  {flops/per/1e12:7.1f} TFLOP/s",
          flush=True)
    return per


key = jax.random.PRNGKey(0)
lam = jax.random.normal(key, (L, L, NR), f32) * 0.03
g = jax.random.normal(jax.random.PRNGKey(1), (C, L, L), f32) * 0.01
fl_dense = 2.0 * C * L * L * NR


def synth_dense(c, lam_):
    F = jnp.einsum("mlr,cml->crm", lam_, c, preferred_element_type=f32)
    return jnp.tanh(F)


timed("synth dense einsum mlr,cml->crm", synth_dense, g, lam, fl_dense)


def make_wedge(nblk):
    bounds = [round(i * L / nblk) for i in range(nblk + 1)]
    lams = tuple(lam[bounds[i]:bounds[i + 1], bounds[i]:, :]
                 for i in range(nblk))
    fl = sum(2.0 * C * (bounds[i + 1] - bounds[i]) * (L - bounds[i]) * NR
             for i in range(nblk))
    def synth_wedge(c, lams_):
        outs = []
        for i in range(nblk):
            m0, m1 = bounds[i], bounds[i + 1]
            outs.append(jnp.einsum("mlr,cml->crm", lams_[i],
                                   c[:, m0:m1, m0:],
                                   preferred_element_type=f32))
        return jnp.tanh(jnp.concatenate(outs, axis=-1))
    return synth_wedge, lams, fl


for nblk in (2, 4, 8):
    fn, lams, fl = make_wedge(nblk)
    timed(f"synth wedge {nblk} blocks (flops x{fl/fl_dense:.3f})",
          fn, g, lams, fl)

# adjoint direction: F (c, r, m) -> alm grids (c, m, l)
F = jax.random.normal(jax.random.PRNGKey(2), (C, NR, L), f32) * 0.01


def adj_dense(c, lam_):
    a = jnp.einsum("mlr,crm->cml", lam_, c, preferred_element_type=f32)
    return jnp.tanh(a)


timed("adj dense einsum mlr,crm->cml", adj_dense, F, lam, fl_dense)


def make_wedge_adj(nblk):
    bounds = [round(i * L / nblk) for i in range(nblk + 1)]
    lams = tuple(lam[bounds[i]:bounds[i + 1], bounds[i]:, :]
                 for i in range(nblk))
    fl = sum(2.0 * C * (bounds[i + 1] - bounds[i]) * (L - bounds[i]) * NR
             for i in range(nblk))
    def adj_wedge(c, lams_):
        outs = []
        for i in range(nblk):
            m0, m1 = bounds[i], bounds[i + 1]
            a = jnp.einsum("mlr,crm->cml", lams_[i], c[..., m0:m1],
                           preferred_element_type=f32)
            pad = [(0, 0)] * (a.ndim - 1) + [(m0, 0)]
            outs.append(jnp.pad(a, pad))
        return jnp.tanh(jnp.concatenate(outs, axis=-2))
    return adj_wedge, lams, fl


for nblk in (2, 4, 8):
    fn, lams, fl = make_wedge_adj(nblk)
    timed(f"adj wedge {nblk} blocks (flops x{fl/fl_dense:.3f})",
          fn, F, lams, fl)
