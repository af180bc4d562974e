"""Bisect which element of the SHT-stage expression kills matmul throughput:
the 3-D batch form, the odd dims, the slice, or the max-rescale."""

import functools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import jax
import jax.numpy as jnp

REPS = int(os.environ.get("PROBE_REPS", "40"))


def timed(name, step, x, w, flops):
    @functools.partial(jax.jit, static_argnums=2)
    def run(x, w, n):
        def body(c, _):
            return step(c, w), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    _ = float(jnp.ravel(run(x, w, 2))[0]); _ = float(jnp.ravel(run(x, w, REPS))[0])
    t0 = time.time(); _ = float(jnp.ravel(run(x, w, 2))[0]); t2 = time.time() - t0
    t0 = time.time(); _ = float(jnp.ravel(run(x, w, REPS))[0]); dt = time.time() - t0
    per = (dt - t2) / (REPS - 2)
    print(f"{name:58s} {per*1e3:8.2f} ms  {flops/per/1e12:7.1f} TFLOP/s")


key = jax.random.PRNGKey(0)
f32 = jnp.float32

# A: 2-D, square-ish, slice feedback
x = jax.random.normal(key, (32832, 513), f32) * 0.01
w = jax.random.normal(key, (513, 514), f32) * 0.04
fl = 2.0 * 32832 * 513 * 514
timed("A 2d matmul + slice", lambda c, w_: jnp.matmul(c, w_)[:, :513], x, w, fl)

# B: same + max-rescale
def stepB(c, w_):
    y = jnp.matmul(c, w_)[:, :513]
    return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
timed("B 2d matmul + slice + max-rescale", stepB, x, w, fl)

# C: 3-D batch form (128,513,513)@(513,514)
x3 = jax.random.normal(key, (128, 513, 513), f32) * 0.01
fl3 = 2.0 * 128 * 513 * 513 * 514
timed("C 3d matmul + slice", lambda c, w_: jnp.matmul(c, w_)[..., :513],
      x3, w, fl3)

# D: 3-D + rescale
def stepD(c, w_):
    y = jnp.matmul(c, w_)[..., :513]
    return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30))
timed("D 3d matmul + slice + max-rescale", stepD, x3, w, fl3)

# E: legendre einsum, unscaled feedback via tanh (cheap elementwise)
lam = jax.random.normal(key, (513, 513, 513), f32) * 0.04
a = jax.random.normal(key, (128, 513, 513), f32) * 0.01
flL = 2.0 * 513 * 128 * 513 * 513
def stepE(c, lam_):
    F = jnp.einsum("mlr,cml->crm", lam_, c)
    return jnp.tanh(jnp.swapaxes(F, -1, -2))
timed("E legendre einsum mlr,cml->crm + tanh", stepE, a, lam, flL)

# F: legendre einsum with sum-rescale instead of tanh
def stepF(c, lam_):
    F = jnp.einsum("mlr,cml->crm", lam_, c)
    F = jnp.swapaxes(F, -1, -2)
    return F * (1.0 / jnp.maximum(jnp.max(jnp.abs(F)), 1e-30))
timed("F legendre einsum + max-rescale", stepF, a, lam, flL)

# G: batched-matmul layout (m,c,l)@(m,l,r), tanh feedback, no transpose
am = jax.random.normal(key, (513, 128, 513), f32) * 0.01
timed("G batched (m,c,l)@(m,l,r) + tanh",
      lambda c, lam_: jnp.tanh(jnp.matmul(c, lam_) * 0.01), am, lam, flL)

# H: 3-D via explicit 2-D reshape (the proposed azimuthal fix)
def stepH(c, w_):
    y = jnp.matmul(c.reshape(-1, 513), w_)[:, :513]
    return y.reshape(128, 513, 513)
timed("H 3d as reshape->2d matmul->reshape", stepH, x3, w, fl3)

# I: Legendre with table read halved (parity-fold traffic model):
# two einsums, each half-l and half-r -> same flops/2, bytes/2
lam_h = jax.random.normal(key, (513, 257, 257), f32) * 0.04
a_h = jax.random.normal(key, (128, 513, 257), f32) * 0.01
flI = 2.0 * 2 * 513 * 128 * 257 * 257
def stepI(c, lam_):
    Fe = jnp.einsum("mlr,cml->crm", lam_, c)
    Fo = jnp.einsum("mlr,cml->crm", lam_, c)
    out = jnp.concatenate([Fe + Fo, Fe - Fo], axis=-2)[..., :257, :]
    return jnp.tanh(jnp.swapaxes(out, -1, -2))
timed("I parity-folded legendre model (2x half einsums)", stepI, a_h, lam_h,
      flI)

# J: bf16 tables legendre einsum
lamb = (jax.random.normal(key, (513, 513, 513), f32) * 0.04).astype(jnp.bfloat16)
def stepJ(c, lam_):
    F = jnp.einsum("mlr,cml->crm", lam_, c.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return jnp.tanh(jnp.swapaxes(F, -1, -2))
timed("J legendre einsum bf16 tables", stepJ, a, lamb, flL)

# K: azimuthal as einsum crl,lj->crj (XLA may flatten (c,r) itself)
timed("K azimuthal einsum crl,lj->crj",
      lambda c, w_: jnp.einsum("crl,lj->crj", c, w_)[..., :513], x3, w, fl3)

# L: parity model with DISTINCT tables (no CSE)
lam_e = jax.random.normal(key, (513, 257, 257), f32) * 0.04
lam_o = jax.random.normal(jax.random.PRNGKey(9), (513, 257, 257), f32) * 0.04
a_h2 = jax.random.normal(key, (128, 513, 257), f32) * 0.01
flL2 = 2.0 * 2 * 513 * 128 * 257 * 257
def stepL(c, lams):
    le, lo = lams
    Fe = jnp.einsum("mlr,cml->crm", le, c)
    Fo = jnp.einsum("mlr,cml->crm", lo, c)
    out = jnp.concatenate([Fe + Fo, Fe - Fo], axis=-2)[..., :257, :]
    return jnp.tanh(jnp.swapaxes(out, -1, -2))
timed("L parity legendre distinct tables", stepL, a_h2, (lam_e, lam_o), flL2)

# M: parity + bf16 tables
lam_eb = lam_e.astype(jnp.bfloat16); lam_ob = lam_o.astype(jnp.bfloat16)
def stepM(c, lams):
    le, lo = lams
    cb = c.astype(jnp.bfloat16)
    Fe = jnp.einsum("mlr,cml->crm", le, cb, preferred_element_type=f32)
    Fo = jnp.einsum("mlr,cml->crm", lo, cb, preferred_element_type=f32)
    out = jnp.concatenate([Fe + Fo, Fe - Fo], axis=-2)[..., :257, :]
    return jnp.tanh(jnp.swapaxes(out, -1, -2))
timed("M parity legendre bf16 tables", stepM, a_h2, (lam_eb, lam_ob), flL2)
