"""Pure chained-matmul probe: measures the device's actual matmul rate
without reductions or layout changes, across sizes and precisions."""

import functools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import jax
import jax.numpy as jnp

REPS = int(os.environ.get("PROBE_REPS", "40"))


def chain(M, K, dtype, precision=None, pet=None):
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, K), dtype)
    w = w * (1.0 / K ** 0.5)

    @functools.partial(jax.jit, static_argnums=2)
    def run(x, w, n):
        def body(c, _):
            y = jnp.matmul(c, w, precision=precision,
                           preferred_element_type=pet)
            return y.astype(c.dtype), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y

    _ = float(run(x, w, 2)[0, 0]); _ = float(run(x, w, REPS)[0, 0])
    t0 = time.time(); _ = float(run(x, w, 2)[0, 0]); t2 = time.time() - t0
    t0 = time.time(); _ = float(run(x, w, REPS)[0, 0]); dt = time.time() - t0
    per = (dt - t2) / (REPS - 2)
    fl = 2.0 * M * K * K
    name = f"({M},{K})@({K},{K}) {jnp.dtype(dtype).name} prec={precision}"
    print(f"{name:60s} {per*1e3:8.2f} ms  {fl/per/1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    print(jax.devices())
    chain(8192, 2048, jnp.float32)
    chain(8192, 2048, jnp.float32, precision=jax.lax.Precision.DEFAULT)
    chain(8192, 2048, jnp.float32, precision=jax.lax.Precision.HIGHEST)
    chain(8192, 2048, jnp.bfloat16, pet=jnp.float32)
    chain(4096, 1024, jnp.bfloat16, pet=jnp.float32)
    chain(4096, 1024, jnp.float32)
    chain(32832, 513, jnp.float32)   # azimuthal-stage shape
