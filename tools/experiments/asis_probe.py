"""Stage timing probe for the flagship ASIS iteration (dev tool).

Times the sub-stages of one ASIS Gibbs iteration at bench scale to locate
the compute bottleneck: overrelaxed aux CR, conjugate draw, whiten /
recenter, the full rank-one blocked-MH step, and inside it the batched
ell-selected cut synthesis.

Usage: PROBE_NCHAINS=64 python tools/asis_probe.py
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

LMAX = int(os.environ.get("PROBE_LMAX", "512"))
NCH = int(os.environ.get("PROBE_NCHAINS", "64"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, nrep=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(nrep):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / nrep * 1e3
    print(f"{name:55s} {ms:8.1f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["BENCH_SCHEME"] = "asis"
    os.environ.setdefault("BENCH_NCHAINS", str(NCH))
    import bench
    scheme, (dl_ee, dl_bb, bins_pair) = bench.build()
    model = scheme.model
    from gibbssampler_tpu.samplers import cls_samplers as cls_mod
    from gibbssampler_tpu.schemes.gibbs import GibbsState, _nc_cls_step

    dl0 = tuple(bench._binned_mean_np(d, b)
                for d, b in zip((dl_ee, dl_bb), bins_pair))
    keys = jax.random.split(jax.random.PRNGKey(0), NCH)
    dl0j = tuple(jnp.asarray(np.broadcast_to(d, (NCH,) + d.shape))
                 for d in dl0)

    @jax.jit
    def init(keys, dl0j):
        return jax.vmap(lambda k, a, b: scheme.init_state(k, (a, b)))(
            keys, *dl0j)

    state = init(keys, dl0j)
    jax.block_until_ready(state.s)
    log(f"state: {state.s.shape}")

    @jax.jit
    def full_step(keys, state):
        return jax.vmap(scheme.step)(keys, state)[0].s

    @jax.jit
    def cr_only(keys, state):
        return jax.vmap(lambda k, st: scheme._cr_step(
            k, st.s, scheme.var_cls(st.dl), None)[0])(keys, state)

    @jax.jit
    def conj_only(keys, state):
        return jax.vmap(lambda k, st: cls_mod.centered_cls_sample(
            k, st.s, scheme.bins_list, scheme.lmax))(keys, state)

    @jax.jit
    def whiten_only(state):
        return jax.vmap(lambda st: cls_mod.whiten(
            st.s, st.dl, scheme.bins_list, scheme.lmax))(state)

    @jax.jit
    def mh_only(keys, state):
        def one(k, st):
            s_nc = cls_mod.whiten(st.s, st.dl, scheme.bins_list, scheme.lmax)
            dl, info = _nc_cls_step(scheme, k, st.dl, s_nc)
            return dl[0]
        return jax.vmap(one)(keys, state)

    # the batched ell-selected cut synthesis alone (singles bins)
    bins_bb = np.asarray(bins_pair[1])
    nb_bb = len(bins_bb) - 1
    big = min(277, nb_bb)
    lo_idx = list(range(big, nb_bb))
    L = LMAX + 1
    sel = np.zeros((len(lo_idx), L))
    for k, lo in enumerate(lo_idx):
        sel[k, bins_bb[lo]: bins_bb[lo + 1]] = 1.0
    sel = jnp.asarray(sel, jnp.float32)
    cut = model.cut_sht
    log(f"singles: {len(lo_idx)} bins, cut rings {cut.grid.nrings}")

    @jax.jit
    def lsel_only(state):
        def one(st):
            z = jnp.zeros_like(st.s[0])
            q, u = cut.synthesis_spin2_state_lsel(z, st.s[1], sel)
            return jnp.sum(q * q) + jnp.sum(u * u)
        return jax.vmap(one)(state)

    @jax.jit
    def cut_synth_only(state):
        def one(st):
            return model.synthesis_cut(st.s).sum()
        return jax.vmap(one)(state)

    print(f"lmax={LMAX} nchains={NCH}")
    timeit("full ASIS step", full_step, keys, state)
    timeit("overrelax CR step", cr_only, keys, state)
    timeit("conjugate invgamma draw", conj_only, keys, state)
    timeit("whiten", whiten_only, state)
    timeit("NC blocked-MH step (whiten + rank-one MH)", mh_only, keys, state)
    timeit(f"lsel cut synthesis ({len(lo_idx)} singles)", lsel_only, state)
    timeit("one plain cut synthesis", cut_synth_only, state)


if __name__ == "__main__":
    main()
