#!/bin/sh
# Run the full test suite in bounded chunks on a 1-core host.
#
# A single `pytest tests/` exceeds 20 minutes here (1 CPU, no persistent
# compile cache — see tests/conftest.py), which trips 10-minute command
# timeouts in CI-style drivers. This script runs the core (non-slow)
# tier first, then the slow tier one module at a time, so every pytest
# invocation stays well under 10 minutes and a partial failure names
# the module that broke.
#
# Usage: sh tools/run_suite.sh [core|slow|all]   (default: all)
set -e
tier="${1:-all}"

run() {
    echo "== pytest $*"
    python -m pytest "$@" -q --no-header
}

if [ "$tier" = core ] || [ "$tier" = all ]; then
    run tests/ -m "not slow"
fi

if [ "$tier" = slow ] || [ "$tier" = all ]; then
    # One invocation per slow module (each < ~8 min on this host).
    for mod in $(python -m pytest tests/ -m slow --collect-only -q \
                   2>/dev/null | sed -n 's/::.*//p' | sort -u); do
        run "$mod" -m slow
    done
fi
echo "suite OK ($tier)"
