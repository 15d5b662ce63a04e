#!/bin/bash
# Clean-chip contract (VERDICT r4 task 1c): run this LAST, before the
# driver's bench window.  It verifies that nothing else holds the TPU
# relay or its HBM — the r4 official bench failed with
# RESOURCE_EXHAUSTED because a "final attempt" training job was left
# running into the driver window.
#
#   bash scripts/preflight.sh            # exit 0 = chip clean
#
# Checks:
#   1. no tracked background job PID (/tmp/r5*.pid etc.) is still alive
#   2. the relay answers
#   3. a 14 GiB HBM allocation succeeds (the bench rung-1 footprint)

set -u
cd "$(dirname "$0")/.."
rc=0

for f in /tmp/r5*.pid /tmp/run.pid /tmp/train*.pid; do
    [ -f "$f" ] || continue
    pid=$(cat "$f")
    if kill -0 "$pid" 2>/dev/null; then
        echo "PREFLIGHT FAIL: background job $pid ($f) still running"
        rc=1
    fi
done

if ! timeout 120 python -c "import jax; print(jax.devices())" \
        >/dev/null 2>&1; then
    echo "PREFLIGHT FAIL: relay does not answer"
    exit 1
fi

if ! timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.zeros((14 << 30,), jnp.int8)
jax.block_until_ready(x)
EOF
then
    echo "PREFLIGHT FAIL: 14 GiB HBM probe failed — another process holds the chip"
    rc=1
fi

[ "$rc" = 0 ] && echo "PREFLIGHT OK: relay answers, 14 GiB HBM free, no stray jobs"
exit $rc
