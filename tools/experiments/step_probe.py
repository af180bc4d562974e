"""Stage-level timing probe for the headline Gibbs step.

Builds the exact bench configuration (lmax=512 masked polarized GL sky with
the cut decomposition) and times each stage of the centered aux+MALA
iteration separately, as scans of the stage alone, so the ms/iter budget of
bench.py can be attributed:

    python tools/step_probe.py            # on the TPU (serial — one process)

Env: PROBE_NCHAINS (default 128), PROBE_ITERS (default 50),
PROBE_LMAX (default 512).
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

NCHAINS = int(os.environ.get("PROBE_NCHAINS", "128"))
N_ITER = int(os.environ.get("PROBE_ITERS", "50"))
LMAX = int(os.environ.get("PROBE_LMAX", "512"))


def build():
    from gibbssampler_tpu.inference import example_dl, simulate_dataset
    from gibbssampler_tpu.ops import with_cut_decomposition
    from gibbssampler_tpu.sht import gauss_legendre_grid

    dl_ee = example_dl(LMAX, "ee", amp=1000.0)
    dl_bb = example_dl(LMAX, "bb", amp=1000.0)
    grid = gauss_legendre_grid(LMAX)
    lat = np.abs(np.pi / 2 - grid.theta)
    mask = np.broadcast_to((lat > 0.2).astype(np.float64)[:, None],
                           (grid.nrings, grid.nphi))
    model, _ = simulate_dataset(
        jax.random.PRNGKey(0), LMAX, spin=2,
        dl_fields=np.stack([dl_ee, dl_bb]), noise_sigma2=0.2 ** 2,
        fwhm_radians=np.radians(0.5), mask=mask, dtype=jnp.float32,
        grid=grid)
    return with_cut_decomposition(model), (dl_ee, dl_bb)


def timed_scan(name, body, init_carry, model):
    """Time N_ITER scan iterations of body(carry, key) -> carry."""
    from gibbssampler_tpu.utils.exec_cache import cached_call

    @jax.jit
    def run(m, carry, keys):
        def f(c, k):
            return body(m, c, k), None
        out, _ = jax.lax.scan(f, carry, keys)
        return out

    keys = jax.random.split(jax.random.PRNGKey(7), N_ITER)
    out = cached_call(run, f"probe_{name}", model, init_carry, keys)
    jax.block_until_ready(out)
    t0 = time.time()
    out = cached_call(run, f"probe_{name}", model, init_carry, keys)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / N_ITER * 1e3
    print(f"{name:32s} {ms:8.2f} ms/iter")
    return ms


def main():
    from gibbssampler_tpu.samplers import cr as cr_mod
    from gibbssampler_tpu.samplers import cls_samplers as cls_mod
    from gibbssampler_tpu.harmonics.gridstate import variance_expansion_state
    from gibbssampler_tpu.harmonics.spectra import unfold_bins

    model, (dl_ee, dl_bb) = build()
    bins = np.arange(2, LMAX + 2)
    dt = jnp.float32
    nf, ns = model.nfields, model.nstate

    def var_of(dl_pair):
        return jnp.stack([
            variance_expansion_state(unfold_bins(d.astype(dt), bins, LMAX),
                                     LMAX) for d in dl_pair])

    dl0 = (jnp.asarray(dl_ee[2:], dt), jnp.asarray(dl_bb[2:], dt))
    s0 = jnp.zeros((NCHAINS, nf, ns), dt)
    btd = jax.jit(lambda m: m.bt_ninv_d())(model)

    def vm(fn):
        return jax.vmap(fn, in_axes=(None, 0, 0))

    # stage bodies: carry = s (NCHAINS, nf, ns)
    def aux_body(m, s, k):
        f = lambda mm, ss, kk: cr_mod.aux_gibbs_cr(
            kk, mm, var_of(dl0), btd, ss, n_gibbs=1)[0]
        return vm(f)(m, s, jax.random.split(k, NCHAINS))

    def mala_body(m, s, k):
        f = lambda mm, ss, kk: cr_mod.mala_cr(
            kk, mm, var_of(dl0), btd, ss, tau=0.02)[0]
        return vm(f)(m, s, jax.random.split(k, NCHAINS))

    def cls_body(m, s, k):
        # carry s fixed; draw dl and fold a summary back into s so the scan
        # has a data dependence (prevents dead-code elimination)
        f = lambda mm, ss, kk: cls_mod.centered_cls_sample(
            kk, ss, [bins, bins], LMAX)
        dls = jax.vmap(lambda ss, kk: jnp.concatenate(f(m, ss, kk)))(
            s, jax.random.split(k, NCHAINS))
        return s + jnp.mean(dls) * 1e-30

    def cut_synth_body(m, s, k):
        u = jax.vmap(m.synthesis_cut)(s)
        return s + jnp.sum(u) * 1e-30

    def cut_adj_body(m, s, k):
        fcut = jnp.zeros((NCHAINS, nf, m.cut_sht.grid.nrings,
                          m.cut_sht.grid.nphi), dt)
        a = jax.vmap(m.adjoint_synthesis_cut)(fcut + jnp.mean(s) * 1e-30)
        return s + jnp.sum(a) * 1e-30

    def randn_body(m, s, k):
        xi = jax.random.normal(k, s.shape, dt)
        return s + xi * 1e-30

    def varexp_body(m, s, k):
        v = var_of(dl0)
        return s + jnp.sum(v) * 1e-30 + s * 1e-30

    def full_body(m, s, k):
        k1, k2 = jax.random.split(k)
        f = lambda mm, ss, kk: cr_mod.aux_then_mala_cr(
            kk, mm, var_of(dl0), btd, ss, n_gibbs=1, tau=0.02)[0]
        s = vm(f)(m, s, jax.random.split(k1, NCHAINS))
        dls = jax.vmap(lambda ss, kk: jnp.concatenate(
            cls_mod.centered_cls_sample(kk, ss, [bins, bins], LMAX)))(
            s, jax.random.split(k2, NCHAINS))
        return s + jnp.mean(dls) * 1e-30

    print(f"lmax={LMAX} nchains={NCHAINS} iters={N_ITER} "
          f"cut rings={model.cut_sht.grid.nrings}/{model.sht.grid.nrings}")
    timed_scan("randn_state", randn_body, s0, model)
    timed_scan("variance_expansion", varexp_body, s0, model)
    timed_scan("cut_synthesis", cut_synth_body, s0, model)
    timed_scan("cut_adjoint", cut_adj_body, s0, model)
    timed_scan("aux_gibbs(1)", aux_body, s0, model)
    timed_scan("mala", mala_body, s0, model)
    timed_scan("centered_cls(invgamma)", cls_body, s0, model)
    timed_scan("full_step(aux+mala+cls)", full_body, s0, model)


if __name__ == "__main__":
    main()
