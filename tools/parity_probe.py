"""TPU probe: time the spin-2 synthesis+adjoint pair (the sampler's hot op)
with the ring-parity split on vs off, and spin-0 likewise.

Usage:  python tools/parity_probe.py [lmax] [nchains]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gibbssampler_tpu.sht import make_sht  # noqa: E402

LMAX = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
REPS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e3


def main():
    L = LMAX + 1
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(key, (NCH, 2 * L * L), dtype=jnp.float32)
    b = jax.random.normal(key, (NCH, 2 * L * L), dtype=jnp.float32)
    for split in (False, True):
        sht = make_sht(LMAX, dtype=jnp.float32, spin2=True, ring_split=split)

        pair2 = jax.jit(lambda s, x, y: s.adjoint_synthesis_spin2_state(
            *s.synthesis_spin2_state(x, y)))
        ms2 = timeit(pair2, sht, e, b)

        pair0 = jax.jit(lambda s, x: s.adjoint_synthesis_state(
            s.synthesis_state(x)))
        ms0 = timeit(pair0, sht, e)
        print(f"split={split}: spin2 synth+adj {ms2:.1f} ms, "
              f"spin0 synth+adj {ms0:.1f} ms  "
              f"(lmax={LMAX}, {NCH} chains)", flush=True)


if __name__ == "__main__":
    main()
