#!/usr/bin/env bash
# CI-style test runner with wall-clock budgets (VERDICT r3 item 8).
#
# Tiers (defined in tests/conftest.py SLOW_MODULES + pyproject addopts):
#   quick  — `pytest tests/`          default gate; budget: < 10 min
#   slow   — `pytest tests/ -m slow`  oracle/golden/e2e tier; budget: < 45 min
#   all    — `pytest tests/ -m ""`    everything
#
# On multi-core hosts pytest-xdist shards the run: SDTPU_TEST_WORKERS=auto
# (or an integer) adds `-n N`.  The TPU CI host is 1-core, so the default is
# a serial run; budgets above are measured serial on that host (see
# docs/testing.md for the recorded numbers).
set -euo pipefail
cd "$(dirname "$0")/.."

# Hermetic CPU run: the environment's axon TPU plugin monkeypatches
# jax.get_backend and force-initializes its PJRT client even for CPU-only
# requests — if the TPU tunnel is down, every jax import then hangs.  An
# empty pool-IP list skips the plugin registration entirely; tests never
# touch the TPU (conftest pins the CPU backend anyway).
export PALLAS_AXON_POOL_IPS=""
export JAX_PLATFORMS=cpu

TIER="${1:-quick}"
WORKERS="${SDTPU_TEST_WORKERS:-}"

ARGS=(tests/ -q --durations=25)
case "$TIER" in
  quick) BUDGET=600 ;;
  slow)  ARGS+=(-m slow); BUDGET=2700 ;;
  all)   ARGS+=(-m "");  BUDGET=3000 ;;
  *) echo "usage: $0 [quick|slow|all]" >&2; exit 2 ;;
esac
if [[ -n "$WORKERS" ]]; then
  ARGS+=(-n "$WORKERS")
fi

START=$(date +%s)
python -m pytest "${ARGS[@]}"
RC=$?
WALL=$(( $(date +%s) - START ))
echo "tier=$TIER wall=${WALL}s budget=${BUDGET}s"
if (( WALL > BUDGET )); then
  echo "WARNING: $TIER tier exceeded its wall-clock budget (${WALL}s > ${BUDGET}s)" >&2
fi
exit $RC
