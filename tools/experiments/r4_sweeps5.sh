#!/bin/bash
# Final driver-protocol numbers with host-level segmentation (BENCH_SEG).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_sweeps5.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "$@" >> "$LOG" 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)]" >> "$LOG"
}
run BENCH_SAVE_ESS=/tmp/ess_asis_final.npz python bench.py
run BENCH_GRID=healpix python bench.py
run BENCH_GRID=healpix BENCH_SCHEME=centered python bench.py
run BENCH_MASK=planckish python bench.py
run BENCH_SCHEME=centered BENCH_SAVE_ESS=/tmp/ess_cent_final.npz python bench.py
echo "ALL5 DONE [$(date +%H:%M:%S)]" >> "$LOG"
