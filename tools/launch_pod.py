"""Multi-host pod launch: one process per host, global ('chains', 'm') mesh.

The reference's scaling story is a SLURM array of 10 *independent* processes
(reference: job-script.sh:1-8) pooled offline (config.py:161-225).  The
TPU-native equivalent is a single SPMD program over all hosts of a pod
slice: ``jax.distributed.initialize()`` discovers peers (from SLURM/TPU
metadata or the JAX coordinator env vars), every host contributes its local
devices to one global mesh, chains shard over the 'chains' axis, and
cross-chain diagnostics/adaptation become ICI/DCN collectives instead of
scratch-filesystem pooling.

Run (one command per host, e.g. via `srun` or the TPU VM launcher):

    python tools/launch_pod.py --lmax 256 --nchains 64 --n-iter 1000

Single-host/multi-device also works (it skips distributed init when only
one process is present).  The companion sbatch wrapper is
tools/job-script-pod.sh.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lmax", type=int, default=128)
    ap.add_argument("--nchains", type=int, default=16,
                    help="global chain count (divisible by the chains axis)")
    ap.add_argument("--n-m", type=int, default=1,
                    help="m-axis (model-parallel) mesh extent")
    ap.add_argument("--n-iter", type=int, default=500)
    ap.add_argument("--noise-sigma2", type=float, default=0.04)
    ap.add_argument("--mask-band-deg", type=float, default=11.5)
    ap.add_argument("--cr-method", default="aux_mala")
    ap.add_argument("--out", default="pod_results.npz")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (else auto-discovery)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax
    multi = (args.num_processes or 1) > 1 or \
        os.environ.get("SLURM_NTASKS", "1") not in ("", "1")
    if multi:
        # SLURM/TPU-metadata auto-discovery unless given explicitly
        kw = {}
        if args.coordinator:
            kw = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
        jax.distributed.initialize(**kw)
    pid = jax.process_index()

    import numpy as np
    import jax.numpy as jnp
    from gibbssampler_tpu.inference import example_dl, simulate_dataset
    from gibbssampler_tpu.ops import SkyModel
    from gibbssampler_tpu.parallel import make_mesh, shard_sht, sharded_run
    from gibbssampler_tpu.schemes import CenteredGibbs
    from gibbssampler_tpu.sht import gauss_legendre_grid

    lmax = args.lmax
    grid = gauss_legendre_grid(lmax)
    lat = np.abs(np.pi / 2 - grid.theta)
    keep = (lat > np.radians(args.mask_band_deg)).astype(np.float64)
    mask = (np.broadcast_to(keep[:, None], (grid.nrings, grid.nphi))
            if args.mask_band_deg > 0 else None)
    fields = np.stack([example_dl(lmax, "ee", amp=1000.0),
                       example_dl(lmax, "bb", amp=1000.0)])
    model, _ = simulate_dataset(
        jax.random.PRNGKey(0), lmax, spin=2, dl_fields=fields,
        noise_sigma2=args.noise_sigma2, fwhm_radians=np.radians(0.5),
        mask=mask, dtype=jnp.float32)

    ndev = len(jax.devices())          # global device count across hosts
    mesh = make_mesh(n_chains=ndev // args.n_m, n_m=args.n_m)
    if args.n_m > 1:
        model = SkyModel(sht=shard_sht(model.sht, mesh), noise=model.noise,
                         bl=model.bl, spin=model.spin, d=model.d)
    bins = np.arange(2, lmax + 2)
    scheme = CenteredGibbs(model, [bins, bins], cr_method=args.cr_method,
                           cr_options={"n_gibbs": 1, "tau": 0.02})
    dl0 = tuple(np.maximum(f[2:], 1e-6) for f in fields)

    if pid == 0:
        print(f"mesh {dict(mesh.shape)} over {ndev} devices, "
              f"{jax.process_count()} processes; {args.nchains} chains")
    t0 = time.time()
    out = sharded_run(scheme, jax.random.PRNGKey(1), dl0,
                      n_iter=args.n_iter, nchains=args.nchains, mesh=mesh)
    jax.block_until_ready(out["dl_chains"])
    wall = time.time() - t0

    if pid == 0:
        from gibbssampler_tpu.diagnostics import summarize_chains
        chain = np.asarray(out["dl_chains"][0])
        s = summarize_chains(chain, burn_frac=0.2)
        np.savez(args.out, dl_chain_0=chain,
                 ess=s["ess"], rhat=s["rhat"], wall=wall,
                 config=json.dumps(vars(args)))
        print(f"{args.n_iter} iters x {args.nchains} chains in {wall:.1f}s; "
              f"median ESS {float(np.median(s['ess'])):.1f}, "
              f"max R-hat {float(np.max(s['rhat'])):.3f}")


if __name__ == "__main__":
    main()
