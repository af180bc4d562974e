#!/bin/bash
# Round-4 follow-up: the ASIS flagship with the reference's "Composition !"
# aux+MALA CR (CenteredGibbs.py:833-836) in place of the overrelaxed
# sampler, plus long headline runs for low-noise ESS estimates.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_sweeps2.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "$@" >> "$LOG" 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)]" >> "$LOG"
}

# HEALPix + planckish flagship retries: inter-chunk optimization_barrier
# now bounds the engines' chunk liveness (both OOM'd from XLA hoisting
# every chunk's tensors live)
run BENCH_GRID=healpix python bench.py
run BENCH_MASK=planckish python bench.py
run BENCH_MASK=planckish GS_PHI_CHUNK=8 python bench.py

# aux+MALA CR inside ASIS (short run first: compile + quick read)
run BENCH_CR=aux_mala python bench.py
# aux-Gibbs-only CR for attribution (is MALA or the aux sweep the mixer?)
run BENCH_CR=aux_mala BENCH_NGIBBS=2 python bench.py

# long runs (300 iters) for the real headline: ESS estimator noise at 60
# iters is ~20-30%
run BENCH_CR=aux_mala BENCH_ITERS=300 python bench.py
run BENCH_ITERS=300 python bench.py                      # overrelax ref-config
run BENCH_SCHEME=centered BENCH_ITERS=300 python bench.py

echo "ALL2 DONE [$(date +%H:%M:%S)]" >> "$LOG"
