"""Stage attribution for the planckish (floor + sparse) flagship bench.

Times, as standalone scans on the TPU: the full ASIS step, the CR step
alone, the blocked-MH step alone, and micro ops (full sparse synthesis,
floor cut synthesis) so the ms/iter budget of BENCH_MASK=planckish can be
attributed.  PROBE_NCHAINS (128), PROBE_ITERS (30), PROBE_LMAX (512).
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))
os.environ.setdefault("BENCH_MASK", "planckish")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

NCHAINS = int(os.environ.get("PROBE_NCHAINS", "128"))
N_ITER = int(os.environ.get("PROBE_ITERS", "30"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_scan(name, body, sch, carry, n=N_ITER):
    """body(scheme, carry, key) -> carry; the scheme rides through jit as a
    pytree argument (closing over it would bake the operator tables into
    the serialized module and blow the remote-compile request limit)."""
    from gibbssampler_tpu.utils.exec_cache import cached_call

    @jax.jit
    def run(sch, carry, keys):
        def f(c, k):
            return body(sch, c, k), None
        out, _ = jax.lax.scan(f, carry, keys)
        return out

    keys = jax.random.split(jax.random.PRNGKey(5), n)
    out = cached_call(run, "probe_" + name, sch, carry, keys)
    jax.block_until_ready(out)
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(6), n)
    out = cached_call(run, "probe_" + name, sch, carry, keys)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    log(f"{name:34s} {dt:8.1f} ms/iter")
    return out


def main():
    import bench
    scheme, (dl_ee, dl_bb, bins_pair) = bench.build()
    dl0 = tuple(bench._binned_mean_np(d, b)
                for d, b in zip((dl_ee, dl_bb), bins_pair))
    from gibbssampler_tpu.schemes.gibbs import _init_scheme
    dl0j = tuple(jnp.asarray(d, dtype=scheme.model.sht.dtype) for d in dl0)
    states = _init_scheme(scheme, jax.random.split(jax.random.PRNGKey(1),
                                                   NCHAINS), dl0j)
    jax.block_until_ready(states.s)
    nst = jax.tree.leaves(states)[0].shape[0]

    def full_step(sch, sts, key):
        kn, kc = jax.random.split(key)
        pool = sch.draw_noise_pool(kn, nst)
        ks = jax.random.split(kc, nst)
        if pool:
            return jax.vmap(sch.step)(ks, sts, pool)[0]
        return jax.vmap(sch.step)(ks, sts)[0]

    def cr_only(sch, sts, key):
        kn, kc = jax.random.split(key)
        pool = sch.draw_noise_pool(kn, nst)
        ks = jax.random.split(kc, nst)

        def one(k, st, nz):
            s, _ = sch._cr_step(k, st.s, sch.var_cls(st.dl), nz)
            return st._replace(s=s)
        if pool:
            return jax.vmap(one)(ks, sts, pool)
        return jax.vmap(lambda k, st: one(k, st, None))(ks, sts)

    def mh_only(sch, sts, key):
        from gibbssampler_tpu.schemes.gibbs import _nc_cls_step
        from gibbssampler_tpu.samplers import cls_samplers as cls_mod
        ks = jax.random.split(key, nst)

        def one(k, st):
            dl_c = cls_mod.centered_cls_sample(k, st.s, sch.bins_list,
                                               sch.lmax)
            s_nc = cls_mod.whiten(st.s, dl_c, sch.bins_list, sch.lmax)
            dl, _ = _nc_cls_step(sch, k, dl_c, s_nc)
            s = cls_mod.recenter(s_nc, dl, sch.bins_list, sch.lmax)
            return st._replace(s=s, dl=dl)
        return jax.vmap(one)(ks, sts)

    def conj_only(sch, sts, key):
        from gibbssampler_tpu.samplers import cls_samplers as cls_mod
        ks = jax.random.split(key, nst)

        def one(k, st):
            dl_c = cls_mod.centered_cls_sample(k, st.s, sch.bins_list,
                                               sch.lmax)
            s_nc = cls_mod.whiten(st.s, dl_c, sch.bins_list, sch.lmax)
            s = cls_mod.recenter(s_nc, dl_c, sch.bins_list, sch.lmax)
            return st._replace(s=s, dl=dl_c)
        return jax.vmap(one)(ks, sts)

    timed_scan("full flagship step", full_step, scheme, states)
    timed_scan("CR step only", cr_only, scheme, states)
    timed_scan("conj+whiten/recenter only", conj_only, scheme, states)
    timed_scan("MH step only (conj+whiten+MH)", mh_only, scheme, states)

    s = states.s

    def cut_synth(sch, x, key):
        u = sch.model.beam(x)
        out = jax.vmap(sch.model.synthesis_cut)(u)
        return x + 0 * jnp.sum(out) / (jnp.abs(jnp.sum(out)) + 1.0)

    timed_scan("floor cut synthesis (vmapped)", cut_synth, scheme, s)
    if scheme.model.has_sparse:
        def sp_synth(sch, x, key):
            u = sch.model.beam(x)
            out = jax.vmap(sch.model.synthesis_sp)(u)
            return x + 0 * jnp.sum(out) / (jnp.abs(jnp.sum(out)) + 1.0)
        timed_scan("sparse point synthesis (vmapped)", sp_synth, scheme, s)


if __name__ == "__main__":
    main()
