#!/usr/bin/env bash
# Pre-snapshot check gate — the TPU-native answer to the reference's
# always-run `check-neptune` target (/root/reference/scripts/build.sh:201-239,
# lit wiring in /root/reference/test/CMakeLists.txt:31-44): a broken tree
# must not ship silently.
#
# Usage:
#   scripts/check.sh          # fast tier (~2-3 min): core IR/frontend/tools/
#                             # golden + Pallas interpret parity + periodic +
#                             # fuzz oracles, then `python bench.py --smoke`
#   scripts/check.sh --full   # the whole pytest suite (~25-30 min) + smoke
#
# Run this before EVERY snapshot or milestone commit. Round 4 shipped a
# TypeError on the hot dispatch path, 11 red tests, and an rc=1 bench
# artifact precisely because nothing forced this 3-minute check.
set -euo pipefail
cd "$(dirname "$0")/.."

FAST_TIER=(
  tests/test_ir.py
  tests/test_frontend.py
  tests/test_tools.py
  tests/test_golden.py
  tests/test_executor.py
  tests/test_pallas.py
  tests/test_periodic.py
  tests/test_fuzz.py
  tests/test_review_regressions.py
  tests/test_review2_regressions.py
  tests/test_fold.py
)

if [[ "${1:-}" == "--full" ]]; then
  python -m pytest tests/ -q
else
  python -m pytest "${FAST_TIER[@]}" -q
fi

# one cheap bench row end-to-end: proves the driver's parse target
# (`{"metric": ..., "vs_baseline": ...}`) still emits on this tree.
# timeout: a wedged TPU tunnel must fail the gate loudly, not hang it
# (observed: tenant contention spikes stall even the smoke row).
timeout 600 python bench.py --smoke
echo "check.sh: OK"
