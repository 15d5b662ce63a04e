#!/bin/bash
# Run the test suite on the virtual-device CPU backend WITHOUT dialing the
# axon TPU relay.
#
# Two env vars matter (see .claude/skills/verify/SKILL.md "Gotchas"):
#   PALLAS_AXON_POOL_IPS=  — empty disables the axon sitecustomize PJRT
#       registration entirely.  With it set, jax initialization BLOCKS
#       (futex wait) whenever another process holds the relay — tests
#       deadlock against any concurrent TPU job.
#   JAX_PLATFORMS=cpu      — select the CPU backend (tests/conftest.py
#       also pins this + 8 virtual devices).
#
# Usage: scripts/run_tests.sh [pytest args...]   (default: fast tier)
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
if [ $# -eq 0 ]; then
    exec python -m pytest tests/ -x -q -m "not slow"
fi
exec python -m pytest "$@"
