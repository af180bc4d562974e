#!/bin/bash
# Round-4 flagship tuning/measurement pipeline (serial — ONE process may
# use the TPU at a time).  Results append to $LOG; each bench run prints
# one JSON line on stdout and ms/iter on stderr.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/r4_sweeps.log}
run() {
  echo "=== $* [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 3600 env "$@" >> "$LOG" 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)]" >> "$LOG"
}

# 1. two-phase proposal tuning at the flagship config (writes
#    tuned_proposals.json, picked up by every later asis run)
run TUNE_NCHAINS=128 TUNE_SEG_ITERS=150 TUNE_SEGMENTS=3 \
    python tools/tune_flagship.py

# 2. flagship with tuned sigmas: overrelax sweep count
run BENCH_NGIBBS=1 python bench.py
run BENCH_NGIBBS=2 python bench.py
run BENCH_NGIBBS=5 python bench.py
run BENCH_NGIBBS=20 python bench.py

# 3. MH sweeps per iteration (at n_gibbs=1)
run BENCH_NITER_MH=2 python bench.py
run BENCH_NITER_MH=5 python bench.py

# 4. m-domain chunk size
run GS_MDOMAIN_CHUNK=24 python bench.py
run GS_MDOMAIN_CHUNK=32 python bench.py

# 5. the reference's own grid: HEALPix nside=256, centered + flagship
run BENCH_GRID=healpix BENCH_SCHEME=centered python bench.py
run BENCH_GRID=healpix python bench.py

# 6. realistic mask: apodized band + 200 point-source holes (chunked
#    phi-domain engine), 128 chains
run BENCH_MASK=planckish python bench.py

echo "ALL DONE [$(date +%H:%M:%S)]" >> "$LOG"
