"""SHT throughput microbench (the framework's hot kernel).

Measures batched spin-2 synthesis+adjoint round trips per second at
production scale and the implied HBM table bandwidth, for fp32 vs bfloat16
operator tables.  Run on the TPU: python tools/sht_bench.py
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

import numpy as np
import jax
import jax.numpy as jnp

LMAX = int(os.environ.get("SHT_LMAX", "512"))
BATCH = int(os.environ.get("SHT_BATCH", "16"))
REPS = int(os.environ.get("SHT_REPS", "50"))


def bench(table_dtype):
    from gibbssampler_tpu.sht import make_sht
    from gibbssampler_tpu.harmonics import nflat

    sht = make_sht(LMAX, dtype=jnp.float32, spin2=True,
                   table_dtype=table_dtype)
    e = jax.random.normal(jax.random.PRNGKey(0), (BATCH, nflat(LMAX)),
                          dtype=jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, nflat(LMAX)),
                          dtype=jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=3)
    def roundtrip(sht, e, b, n):
        def body(carry, _):
            e_, b_ = carry
            q, u = sht.synthesis_spin2(e_, b_)
            e2, b2 = sht.adjoint_synthesis_spin2(q, u)
            scale = 1.0 / jnp.maximum(jnp.max(jnp.abs(e2)), 1e-30)
            return (e2 * scale, b2 * scale), None

        (e_, b_), _ = jax.lax.scan(body, (e, b), None, length=n)
        return e_, b_

    # NOTE: block_until_ready is unreliable on the axon backend; force
    # completion by fetching a value, and use two scan lengths to cancel
    # dispatch overhead
    _ = float(roundtrip(sht, e, b, 2)[0][0, 0])
    _ = float(roundtrip(sht, e, b, REPS)[0][0, 0])
    t0 = time.time()
    _ = float(roundtrip(sht, e, b, 2)[0][0, 0])
    t2 = time.time() - t0
    t0 = time.time()
    _ = float(roundtrip(sht, e, b, REPS)[0][0, 0])
    dt = time.time() - t0
    per_pair = (dt - t2) / (REPS - 2)
    bytes_per_transform = (2 * (LMAX + 1) ** 2 * sht.grid.nrings
                           * jnp.dtype(table_dtype).itemsize)
    bw = 2 * bytes_per_transform / per_pair / 1e9
    print(f"table_dtype={jnp.dtype(table_dtype).name}: "
          f"{per_pair * 1e3:.1f} ms per synth+adjoint pair "
          f"(batch {BATCH}), table read bw ~{bw:.0f} GB/s",
          file=sys.stderr, flush=True)
    return per_pair


if __name__ == "__main__":
    t32 = bench(jnp.float32)
    tb = bench(jnp.bfloat16)
    print(f"bf16 speedup over fp32: {t32 / tb:.2f}x", file=sys.stderr)
