"""Chain-scaling probe of the cut-ring spin-2 synthesis (dev tool)."""
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np
import jax
import jax.numpy as jnp

LMAX = int(os.environ.get("PROBE_LMAX", "512"))


def main():
    from gibbssampler_tpu.sht import gauss_legendre_grid, make_sht
    from gibbssampler_tpu.sht.transform import SHT

    grid = gauss_legendre_grid(LMAX)
    lat = np.abs(np.pi / 2 - grid.theta)
    rows = np.where(lat <= 0.2)[0]
    print(f"cut rows: {len(rows)}")
    from gibbssampler_tpu.sht.grids import Grid
    cut_grid = Grid(theta=grid.theta[rows], wq=grid.wq[rows],
                    nphi=grid.nphi, phi0=grid.phi0,
                    nrings=len(rows), npix=len(rows) * grid.nphi)
    cut = SHT(LMAX, cut_grid, spin2=True, allow_aliasing=True)
    nstate = 2 * (LMAX + 1) ** 2

    for nch in (1, 8, 32, 64, 128):
        x = jnp.asarray(np.random.randn(nch, 2, nstate).astype(np.float32))

        @jax.jit
        def f(x):
            q, u = jax.vmap(lambda s: cut.synthesis_spin2_state(s[0], s[1]))(x)
            return q.sum() + u.sum()

        r = f(x); jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(10):
            r = f(x)
        jax.block_until_ready(r)
        print(f"nchains {nch:4d}: {(time.time()-t0)/10*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
