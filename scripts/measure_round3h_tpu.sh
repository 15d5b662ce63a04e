#!/bin/bash
# Round-3h: the headline with REAL-scene conditioning (r3g stage 2
# measured acceptance 0.24 because the bench conditioned the trained
# model on uniform-random token windows — far out of distribution).

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3h stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3h stage 1: trained-ckpt sequential, real-scene cond (B=10 bb=5 K=0)"
UMGEN_BENCH_SPEC_K=0 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3h stage 2: trained-ckpt speculative, real-scene cond (6-frame probe)"
UMGEN_BENCH_FRAMES=6 timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3h stage 3: driver-default preview — FULL 30-frame python bench.py"
timeout 4500 python bench.py >> "$LOG" 2>&1

say "r3h done"
