#!/usr/bin/env bash
# Round-3 TPU measurement session — STRICTLY SEQUENTIAL (never two TPU
# processes at once; they corrupt each other's state and timings).
# Run from the repo root when the tunnel is up. Each step appends to
# $OUT so a dropped tunnel loses at most one step.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-/tmp/r3_tpu_results.txt}
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$OUT"
  timeout 3000 "$@" 2>&1 | tee -a "$OUT"
  echo "=== exit $? ===" | tee -a "$OUT"
}

# 1. Kernel parity on hardware (transposed default, then the big tile).
run python scripts/tpu_parity_check.py
run python scripts/tpu_parity_check.py 64 64

# 2. Primary bench: transposed geometry (default), then lane A/B.
run python bench.py
run env TPUGS_KERNEL_GEOMETRY=lane python bench.py

# 3. Viewer tile ladder (the pair-halving lever the transposed kernel
#    unlocks), then the honest e2e profile at the 32x32 reference point.
run python scripts/sweep_viewer_tiles.py
run python scripts/profile_viewer_e2e.py

# 4. Viewer headline number at the tuned tile (edit tile/cap after step 3).
run python scripts/bench_render.py
