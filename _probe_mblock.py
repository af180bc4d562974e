import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))
import jax
if (len(sys.argv) > 1 and sys.argv[1] == "correct") or len(sys.argv) <= 1:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from gibbssampler_tpu.sht import make_sht
from gibbssampler_tpu.harmonics import nflat

MODE = sys.argv[1] if len(sys.argv) > 1 else "correct"
f32 = jnp.float32

if MODE == "correct":
    LMAX, C = 96, 3
    e = jax.random.normal(jax.random.PRNGKey(0), (C, nflat(LMAX)), dtype=f32)
    b = jax.random.normal(jax.random.PRNGKey(1), (C, nflat(LMAX)), dtype=f32)
    ref = None
    for mb in (0, 32, 40):
        sht = make_sht(LMAX, dtype=f32, spin2=True, m_block=mb)
        q, u = sht.synthesis_spin2(e, b)
        e2, b2 = sht.adjoint_synthesis_spin2(q, u)
        t = sht.synthesis(e[0] * 0 + e[0])
        a0 = sht.adjoint_synthesis(t)
        out = [np.asarray(v) for v in (q, u, e2, b2, a0)]
        if ref is None:
            ref = out
        else:
            err = max(np.max(np.abs(o - r)) / np.max(np.abs(r)) for o, r in zip(out, ref))
            print(f"m_block={mb}: relerr vs dense = {err:.2e}")
else:
    LMAX, C, REPS = 512, 64, 40
    mb = int(MODE)
    e = jax.random.normal(jax.random.PRNGKey(0), (C, nflat(LMAX)), dtype=f32)
    b = jax.random.normal(jax.random.PRNGKey(1), (C, nflat(LMAX)), dtype=f32)
    sht = make_sht(LMAX, dtype=f32, spin2=True, m_block=mb)
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
    _ = float(roundtrip(sht, e, b, 2)[0][0, 0])
    _ = float(roundtrip(sht, e, b, REPS)[0][0, 0])
    t0 = time.time(); _ = float(roundtrip(sht, e, b, 2)[0][0, 0]); t2 = time.time()-t0
    t0 = time.time(); _ = float(roundtrip(sht, e, b, REPS)[0][0, 0]); dt = time.time()-t0
    per = (dt - t2) / (REPS - 2)
    print(f"m_block={mb}: {per*1e3:8.2f} ms per spin-2 synth+adjoint roundtrip (64 chains)")
