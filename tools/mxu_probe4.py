import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))
import jax, jax.numpy as jnp
REPS = 40
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
    print(f"{name:52s} {per*1e3:8.2f} ms  {flops/per/1e12:7.1f} TFLOP/s", flush=True)

key = jax.random.PRNGKey(0); f32 = jnp.float32
x3 = jax.random.normal(key, (128, 513, 513), f32) * 0.01
w = jax.random.normal(key, (513, 514), f32) * 0.04
fl3 = 2.0 * 128 * 513 * 513 * 514
timed("K azimuthal einsum crl,lj->crj",
      lambda c, w_: jnp.einsum("crl,lj->crj", c, w_)[..., :513], x3, w, fl3)

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

lam_eb = lam_e.astype(jnp.bfloat16); lam_ob = lam_o.astype(jnp.bfloat16)
def stepM(c, lams):
    le, lo = lams
    cb = c.astype(jnp.bfloat16)
    Fe = jnp.einsum("mlr,cml->crm", le, cb, preferred_element_type=f32)
    Fo = jnp.einsum("mlr,cml->crm", lo, cb, preferred_element_type=f32)
    out = jnp.concatenate([Fe + Fo, Fe - Fo], axis=-2)[..., :257, :]
    return jnp.tanh(jnp.swapaxes(out, -1, -2))
timed("M parity legendre bf16 tables", stepM, a_h2, (lam_eb, lam_ob), flL2)
