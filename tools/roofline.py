"""Per-chip roofline for the dominant kernels.

(BASELINE.json north_star: "Per-chip roofline on the CG+SHT kernel";
VERDICT r4 missing #4.)

Two ingredients, both measured on THIS chip rather than quoted from a
spec sheet:

1. Attainable peaks — large square fp32/bf16 matmul TFLOP/s (MXU) and
   streaming HBM bandwidth (triad axpy), timed directly.
2. Workload intensity — FLOP and HBM-byte counts for each hot kernel
   from XLA's compiled cost model (``.compile().cost_analysis()``),
   divided by the measured wall time of the same executable.

Workloads (all at the bench protocol: lmax=512, 128 vmapped chains,
BENCH_* env respected): the full flagship ASIS step, the CR step, the
blocked-MH C_ell step, one vmapped cut spin-2 synthesis, and one CG
mat-vec batch (``q_apply_cut``).  The binding constraint per kernel is
whichever fraction (MXU vs HBM) is higher.

Usage:  python tools/roofline.py            # band mask
        BENCH_MASK=planckish python tools/roofline.py
Prints a markdown table for docs/PERF.md.
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
N_ITER = int(os.environ.get("PROBE_ITERS", "30"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def measure_peaks():
    """Attainable matmul TFLOP/s and HBM GB/s on this chip."""
    peaks = {}
    for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        n = 8192
        x = jnp.ones((n, n), dt)
        y = jnp.ones((n, n), dt)
        f = jax.jit(lambda a, b: a @ b)
        sec = _timeit(f, x, y)
        peaks[name] = 2 * n**3 / sec / 1e12
        log(f"peak {name} matmul: {peaks[name]:.1f} TFLOP/s "
            f"({n}x{n}, {sec*1e3:.1f} ms)")
    n = 1 << 28                      # 1 GiB fp32 per operand
    x = jnp.ones((n,), jnp.float32)
    y = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda a, b: a + 1.5 * b)
    sec = _timeit(f, x, y)
    peaks["hbm_gbs"] = 3 * 4 * n / sec / 1e9     # read x, read y, write out
    log(f"stream HBM bandwidth: {peaks['hbm_gbs']:.0f} GB/s "
        f"(triad, {sec*1e3:.1f} ms)")
    return peaks


def cost_of(compiled):
    """(flops, hbm_bytes) from XLA's cost model; (None, None) if absent."""
    try:
        ca = compiled.cost_analysis()
    except Exception as e:                                # noqa: BLE001
        log(f"cost_analysis unavailable: {e}")
        return None, None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    if not ca:
        return None, None
    flops = ca.get("flops")
    by = ca.get("bytes accessed")
    return flops, by


def roofline_row(name, sch, carry, body, peaks, n=N_ITER, per_iter_scale=1):
    """Compile body wrapped in a scan of n steps; report per-step numbers."""
    from gibbssampler_tpu.utils.exec_cache import cached_call

    @jax.jit
    def run(sch, carry, keys):
        def f(c, k):
            return body(sch, c, k), None
        out, _ = jax.lax.scan(f, carry, keys)
        return out

    keys = jax.random.split(jax.random.PRNGKey(7), n)
    # compile via the exec cache wrapper (axon remote compiles are slow)
    out = cached_call(run, "roofline_" + name, sch, carry, keys)
    jax.block_until_ready(out)
    t0 = time.time()
    out = cached_call(run, "roofline_" + name, sch, carry, keys)
    jax.block_until_ready(out)
    sec = (time.time() - t0) / n
    # cost model on a plainly-jitted executable of the same graph
    lowered = run.lower(sch, carry, keys)
    flops = hbm = None
    try:
        flops, hbm = cost_of(lowered.compile())
    except Exception as e:                                # noqa: BLE001
        log(f"{name}: compile-for-cost failed: {e}")
    row = {"name": name, "ms": sec * 1e3}
    if flops:
        row["tflops"] = flops / n / sec / 1e12
        row["mxu_frac"] = row["tflops"] / peaks["fp32"]
    if hbm:
        row["gbs"] = hbm / n / sec / 1e9
        row["hbm_frac"] = row["gbs"] / peaks["hbm_gbs"]
    log(f"{name:34s} {sec*1e3:8.1f} ms"
        + (f"  {row['tflops']:6.2f} TF/s ({row['mxu_frac']*100:4.1f}% fp32 MXU)"
           if flops else "")
        + (f"  {row['gbs']:6.0f} GB/s ({row['hbm_frac']*100:4.1f}% HBM)"
           if hbm else ""))
    return row


def main():
    import bench
    peaks = measure_peaks()
    scheme, (dl_ee, dl_bb, bins_pair) = bench.build()
    dl0 = tuple(bench._binned_mean_np(d, b)
                for d, b in zip((dl_ee, dl_bb), bins_pair))
    from gibbssampler_tpu.schemes.gibbs import _init_scheme, _nc_cls_step
    from gibbssampler_tpu.samplers import cls_samplers as cls_mod
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
        ks = jax.random.split(key, nst)

        def one(k, st):
            dl_c = cls_mod.centered_cls_sample(k, st.s, sch.bins_list,
                                               sch.lmax)
            s_nc = cls_mod.whiten(st.s, dl_c, sch.bins_list, sch.lmax)
            dl, _ = _nc_cls_step(sch, k, dl_c, s_nc)
            s = cls_mod.recenter(s_nc, dl, sch.bins_list, sch.lmax)
            return st._replace(s=s, dl=dl)
        return jax.vmap(one)(ks, sts)

    s = states.s

    def cut_synth(sch, x, key):
        u = sch.model.beam(x)
        out = jax.vmap(sch.model.synthesis_cut)(u)
        return x + 0 * jnp.sum(out) / (jnp.abs(jnp.sum(out)) + 1.0)

    def q_matvec(sch, x, key):
        # CG mat-vec: Q x over the cut decomposition with unit prior
        m = sch.model
        inv_cvar = m.ell_mask() * 1.0
        out = jax.vmap(lambda v: m.q_apply_cut(v, inv_cvar))(x)
        return x + 0 * jnp.sum(out) / (jnp.abs(jnp.sum(out)) + 1.0)

    rows = [
        roofline_row("full flagship step", scheme, states, full_step, peaks),
        roofline_row("CR step", scheme, states, cr_only, peaks),
        roofline_row("blocked-MH C_ell step", scheme, states, mh_only, peaks),
        roofline_row("cut spin-2 synthesis", scheme, s, cut_synth, peaks),
        roofline_row("CG mat-vec (q_apply_cut)", scheme, s, q_matvec, peaks),
    ]
    print("\n| kernel | ms | TFLOP/s | % fp32-MXU peak | GB/s | % HBM peak |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['ms']:.1f} "
              f"| {r.get('tflops', float('nan')):.2f} "
              f"| {r.get('mxu_frac', float('nan'))*100:.1f} "
              f"| {r.get('gbs', float('nan')):.0f} "
              f"| {r.get('hbm_frac', float('nan'))*100:.1f} |")
    print(f"\npeaks: fp32 {peaks['fp32']:.1f} TF/s, "
          f"bf16 {peaks['bf16']:.1f} TF/s, HBM {peaks['hbm_gbs']:.0f} GB/s "
          f"(measured, this chip)")


if __name__ == "__main__":
    main()
