"""Probe: Legendre-stage arithmetic intensity vs batch (chains) size.

Table streaming (540 MB fp32 per einsum) dominates at 64 chains; if the
stage is HBM-bound, doubling chains should cost far less than 2x, and
bf16 tables (true bf16 x bf16 matmul) should cut the stage time.
"""

import functools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import jax
import jax.numpy as jnp

REPS = 30
f32 = jnp.float32
bf16 = jnp.bfloat16
L = 513
NR = 513


def timed(name, step, x, w, flops, bytes_):
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
    print(f"{name:52s} {per*1e3:8.2f} ms  {flops/per/1e12:6.1f} TFLOP/s  "
          f"{bytes_/per/1e9:6.0f} GB/s", flush=True)
    return per


key = jax.random.PRNGKey(0)
lam = jax.random.normal(key, (L, L, NR), f32) * 0.03
lam_b = lam.astype(bf16)

for C in (128, 256, 512):
    g = jax.random.normal(jax.random.PRNGKey(1), (C, L, L), f32) * 0.01
    fl = 2.0 * C * L * L * NR
    by = 4.0 * (L * L * NR + 2 * C * L * L)   # table + in + out fp32

    def synth(c, lam_):
        return jnp.tanh(jnp.einsum("mlr,cml->crm", lam_, c,
                                   preferred_element_type=f32))

    timed(f"fp32 einsum C={C}", synth, g, lam, fl, by)

    gb = g.astype(bf16)
    by_b = 2.0 * L * L * NR + 2.0 * C * L * L * (2 + 4)

    def synth_b(c, lam_):
        return jnp.tanh(jnp.einsum("mlr,cml->crm", lam_, c,
                                   preferred_element_type=f32)).astype(bf16)

    timed(f"bf16 einsum C={C}", synth_b, gb, lam_b, fl, by_b)

# azimuthal stage scaling for comparison: (C, nr, L) @ (L, nh)
NPH = 514
dft = jax.random.normal(key, (L, NPH), f32) * 0.03
for C in (128, 256):
    F = jax.random.normal(jax.random.PRNGKey(2), (C, NR, L), f32) * 0.01
    fl = 2.0 * C * NR * L * NPH
    by = 4.0 * (L * NPH + C * NR * (L + NPH))

    def azim(c, w):
        return jnp.tanh(jnp.matmul(c, w,
                                   preferred_element_type=f32))[..., :L]

    timed(f"fp32 azimuthal matmul C={C}", azim, F, dft, fl, by)
