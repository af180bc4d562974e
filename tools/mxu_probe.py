"""Probe MXU utilization of the SHT's two matmul stages in isolation.

The full-iteration roofline (docs/PERF.md) measured ~29 TFLOP/s against a
~197 TFLOP/s bf16 peak — this probe times each stage's bare contraction to
find where the gap lives (layout, fusion, or shape).

Run on the TPU:  python tools/mxu_probe.py
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import numpy as np
import jax
import jax.numpy as jnp

L = int(os.environ.get("PROBE_L", "513"))      # lmax+1
NR = int(os.environ.get("PROBE_NR", "513"))    # rings
NH = int(os.environ.get("PROBE_NH", "514"))    # nphi//2+1
C = int(os.environ.get("PROBE_C", "128"))      # batch (chains x re/im etc)
REPS = int(os.environ.get("PROBE_REPS", "30"))


def timeit(name, fn, *args, flops=None):
    out = fn(*args, 2)
    _ = float(jnp.ravel(out)[0])
    t0 = time.time(); _ = float(jnp.ravel(fn(*args, 2))[0]); t2 = time.time() - t0
    t0 = time.time(); _ = float(jnp.ravel(fn(*args, REPS))[0]); dt = time.time() - t0
    per = (dt - t2) / (REPS - 2)
    tf = flops / per / 1e12 if flops else 0.0
    print(f"{name:42s} {per*1e3:8.2f} ms   {tf:7.1f} TFLOP/s")
    return per


import functools


def scan_wrap(step):
    @functools.partial(jax.jit, static_argnums=2)
    def run(x, w, n):
        def body(c, _):
            y = step(c, w)
            s = 1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
            return jax.tree.map(lambda a: a * s, y) if isinstance(y, tuple) \
                else y * s, None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jax.tree.leaves(y)[0]
    return run


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.float32
    print(f"device: {jax.devices()[0]}  L={L} NR={NR} NH={NH} C={C}")

    # 1. azimuthal-stage shape: (C, NR, L) @ (L, NH)
    x = jax.random.normal(key, (C, NR, L), dt)
    w = jax.random.normal(key, (L, NH), dt)
    fl = 2.0 * C * NR * L * NH
    az = scan_wrap(lambda a, b: jnp.matmul(a, b)[..., :L])
    # feed back: output (C,NR,NH) -> slice to L columns to keep shapes stable
    timeit("azimuthal matmul (C,NR,L)@(L,NH)", az, x, w, flops=fl)

    # 2. Legendre einsum exactly as in transform.py: "mlr,cml->crm"
    lam = jax.random.normal(key, (L, L, NR), dt)
    a = jax.random.normal(key, (C, L, L), dt)
    fl = 2.0 * L * C * L * NR
    def leg_step(a_, lam_):
        F = jnp.einsum("mlr,cml->crm", lam_, a_)
        return jnp.swapaxes(F, -1, -2)  # back to (c, m, l=r) for feedback
    timeit("legendre einsum mlr,cml->crm", scan_wrap(leg_step), a, lam, flops=fl)

    # 3. same contraction, table laid out (m, r, l): "mrl,cml->crm"
    lam2 = jax.random.normal(key, (L, NR, L), dt)
    def leg_step2(a_, lam_):
        F = jnp.einsum("mrl,cml->crm", lam_, a_)
        return jnp.swapaxes(F, -1, -2)
    timeit("legendre einsum mrl,cml->crm", scan_wrap(leg_step2), a, lam2, flops=fl)

    # 4. batched matmul form: (m, c, l) @ (m, l, r)
    am = jax.random.normal(key, (L, C, L), dt)
    def leg_step3(a_, lam_):
        F = jnp.matmul(a_, lam_)          # (m, c, r)
        return jnp.swapaxes(F, 0, 1) if False else F[..., :L]
    lam3 = jax.random.normal(key, (L, L, NR), dt)
    timeit("batched matmul (m,c,l)@(m,l,r)", scan_wrap(leg_step3), am, lam3,
           flops=fl)

    # 5. big 2-D matmul reference point (dense MXU ceiling at these sizes)
    M = C * 64
    xk = jax.random.normal(key, (M, 2048), dt)
    wk = jax.random.normal(key, (2048, 2048), dt)
    fl = 2.0 * M * 2048 * 2048
    timeit(f"dense ({M},2048)@(2048,2048)",
           scan_wrap(lambda a_, b_: jnp.matmul(a_, b_)[:, :2048]), xk, wk,
           flops=fl)

    # 6. bf16-input variants of 1 and 4
    xb = x.astype(jnp.bfloat16); wb = w.astype(jnp.bfloat16)
    fl = 2.0 * C * NR * L * NH
    azb = scan_wrap(lambda a_, b_: jnp.matmul(
        a_, b_, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[..., :L])
    timeit("azimuthal matmul bf16 in, f32 acc", azb, xb, wb, flops=fl)


if __name__ == "__main__":
    main()
