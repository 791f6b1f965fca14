#!/usr/bin/env bash
# Mandatory landing gate for any commit touching tpugs/ops/**.
#
# Runs the tracked bench (real TPU, primary config) and the full CPU test
# suite. BOTH must pass, and the bench number printed here must be recorded
# in the commit message. A perf claim in docs without a same-commit bench
# run is a defect (VERDICT r4 item 2).
#
# Usage: bash scripts/preflight.sh [--fast]
#   --fast: skip the garden-scale bench config (suite + primary bench only)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== preflight: bench.py (real TPU) ==="
if [[ "${1:-}" == "--fast" ]]; then
  TPUGS_BENCH_SKIP_GARDEN=1 timeout 1800 python bench.py
else
  timeout 1800 python bench.py
fi

echo "=== preflight: pytest tests/ (CPU, 8 virtual devices) ==="
timeout 3600 python -m pytest tests/ -q

echo "=== preflight PASSED — record the bench line above in the commit message ==="
