#!/bin/bash
# Round-3g: the final headline preview — exactly what the driver's
# `python bench.py` will run (trained 2.4B checkpoint auto-loaded,
# speculative K=8, B=10 win-8 bb=5 W4), plus its sequential twin for
# the speedup attribution.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3g stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3g stage 1: trained-ckpt sequential, default config (B=10 bb=5 K=0)"
UMGEN_BENCH_SPEC_K=0 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3g stage 2: driver-default preview — FULL 30-frame `python bench.py`"
timeout 4500 python bench.py >> "$LOG" 2>&1

say "r3g done"
