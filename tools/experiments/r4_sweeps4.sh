#!/bin/bash
# Round-4 final pass: tune with the multiplicative-from-analytic tuner,
# then driver-default headline runs and the table-engine HEALPix flagship.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_sweeps4.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "$@" >> "$LOG" 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)]" >> "$LOG"
}

# tune from the analytic seed (BENCH_TUNED=0 inside the tool), aux_mala CR
run TUNE_NCHAINS=128 TUNE_SEG_ITERS=150 python tools/tune_flagship.py

# the exact driver configuration (all defaults) — the BENCH_r04 number
run BENCH_SAVE_ESS=/tmp/ess_asis_final.npz python bench.py

# centered comparison at the same protocol (per-bin ESS for the analysis)
run BENCH_SCHEME=centered BENCH_SAVE_ESS=/tmp/ess_cent_final.npz python bench.py

# HEALPix nside=256 flagship with the phased/Nyquist TABLE engine
run BENCH_GRID=healpix python bench.py

# realistic mask: GS_PHI_CHUNK=4 keeps each chunk's map stack under the
# ~2 GB single-buffer TPU kernel limit at 128 chains (8 -> 2.85 GB faults
# the device at runtime; 16 chains / 0.7 GB runs fine)
run BENCH_MASK=planckish GS_PHI_CHUNK=4 python bench.py

echo "ALL4 DONE [$(date +%H:%M:%S)]" >> "$LOG"
