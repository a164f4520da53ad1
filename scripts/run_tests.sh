#!/usr/bin/env bash
# CI entry point: run BOTH test tiers.
#
# Tier 1 (default suite, ~8 min on this 1-core host): everything not
# marked @pytest.mark.slow — includes the full-depth golden parity gate.
# Tier 2 (slow suite, ~30 min): convergence, multi-host, CLI train runs,
# spatial full-model equivalence.
#
# Usage: scripts/run_tests.sh [fast|slow|all]   (default: all)

set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-all}"

case "$tier" in
  fast)
    python -m pytest tests/ -q
    ;;
  slow)
    python -m pytest tests/ -q -m slow
    ;;
  all)
    python -m pytest tests/ -q -m "slow or not slow"
    ;;
  *)
    echo "usage: $0 [fast|slow|all]" >&2
    exit 2
    ;;
esac
