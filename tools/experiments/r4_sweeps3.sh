#!/bin/bash
# Round-4 third pass: re-tune proposals under the aux+MALA flagship
# (the overrelax-tuned sigmas pooled sd under bad mixing), sweep MALA's
# tau and the aux sweep count, then long headline runs.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_sweeps3.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "$@" >> "$LOG" 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)]" >> "$LOG"
}

run BENCH_CR=aux_mala TUNE_NCHAINS=128 TUNE_SEG_ITERS=200 TUNE_SEGMENTS=3 \
    python tools/tune_flagship.py

run BENCH_CR=aux_mala BENCH_ITERS=300 BENCH_SAVE_ESS=/tmp/ess_asis.npz \
    python bench.py
run BENCH_CR=aux_mala BENCH_ITERS=300 BENCH_TAU=0.05 python bench.py
run BENCH_CR=aux_mala BENCH_ITERS=300 BENCH_TAU=0.1 python bench.py
run BENCH_CR=aux_mala BENCH_ITERS=300 BENCH_NGIBBS=2 python bench.py

# reference-grade comparison runs at the same chain length
run BENCH_SCHEME=centered BENCH_ITERS=300 BENCH_SAVE_ESS=/tmp/ess_cent.npz \
    python bench.py

# planckish diagnosis: fewer chains (runtime device error at 128)
run BENCH_MASK=planckish BENCH_NCHAINS=64 python bench.py

echo "ALL3 DONE [$(date +%H:%M:%S)]" >> "$LOG"
