#!/bin/bash
# Round-3c TPU measurements — after the in-scan ring quantization fix
# (the bf16 [L, B*S, H, Dh] ingest collect was the 3.6 GB peak temp that
# OOMed B=12/16 by <0.5 GB, r3a stages 7-9) and the transposed flash
# kernel (Dh-on-sublanes; kills the 48->128 lane padding):
#   * flash-attention TF/s + XLA crossover at the cascade shapes
#   * retry the B=12/B=16 batch-scaling probes with int8 OAR KV
#   * re-measure the B=8 default (faster cascade)
#   * 30-frame confirmation of the best config

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3c stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3c stage 1: flash-attention probe (transposed kernel, crossover)"
timeout 2400 python scripts/probe_flash_attn.py >> "$LOG" 2>&1

say "r3c stage 2: B=8 win-8 bb=4 W4 re-measure (new flash cascade)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3c stage 3: B=12 win-6 bb=4 W4 int8 KV retry (in-scan ring quantize)"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=6 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3c stage 4: B=16 win-4 bb=4 W4 int8 KV retry"
UMGEN_BENCH_BATCH=16 UMGEN_BENCH_WINDOW=4 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3c stage 5: B=16 win-6 bb=4 W4 int8 KV (window/batch tradeoff)"
UMGEN_BENCH_BATCH=16 UMGEN_BENCH_WINDOW=6 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3c done — pick the best row and 30-frame-confirm it in r3d"
