"""gibbssampler_tpu — a TPU-native Bayesian CMB power-spectrum inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
research code Gabriel-Ducrocq/GibbsSampler (see /root/reference and SURVEY.md):
Gibbs sampling of (sky map s, power spectrum C_ell) under the model

    d = A B s + n

where A is spherical-harmonic synthesis, B a Gaussian beam, and n Gaussian
pixel noise.  Everything runs as pure jittable functions on TPU: the
spherical-harmonic transforms are blocked Legendre/FFT matmuls, the
constrained-realization solvers are batched (vmapped over chains) and the
chain axis shards over a device mesh.

Subpackages
-----------
harmonics   alm packing conventions, D_ell <-> C_ell, variance expansion, bins
sht         TPU-native spherical harmonic transforms (Gauss-Legendre + HEALPix)
ops         linear operators (beam, noise, Q = C^-1 + B A^T N^-1 A B), batched CG
samplers    conditional samplers: constrained-realization portfolio + C_ell steps
schemes     full Gibbs drivers: centered, non-centered, ASIS, PNCP
parallel    mesh/chain sharding, cross-chain collectives, adaptation
diagnostics ESS, R-hat, ESJD, acceptance tracking, timers
inference   config dataclasses, dataset simulation, run scripts, checkpointing
"""

__version__ = "0.1.0"

import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.expanduser("~/.cache/gibbssampler_tpu/jaxcache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
del _os
