#!/bin/bash
# Round-3f: recompute-mode batch scaling (VERDICT r2 task 5 — lift the
# reference-faithful mode above 1x A100 = 0.32 f/s).  The r3d ablation
# attributes the cascade to attention 5.75 s + matmuls ~4.9 s at B=4;
# per-scene FLOPs are constant, so larger batch should lift MFU (matmul
# 74 -> 113 TF/s measured from M=4.4k to 8k).  Recompute allocates no
# rings, so B=8 fits where cached mode needed win-8.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3f stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3f stage 1: recompute B=8 (batch-MFU probe)"
UMGEN_BENCH_TAR_MODE=recompute UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW= \
    UMGEN_BENCH_BATCH_BLOCK=4 UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=4 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3f stage 2: recompute B=6"
UMGEN_BENCH_TAR_MODE=recompute UMGEN_BENCH_BATCH=6 UMGEN_BENCH_WINDOW= \
    UMGEN_BENCH_BATCH_BLOCK=2 UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=4 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3f stage 3: recompute B=12 (if HBM allows — no rings in this mode)"
UMGEN_BENCH_TAR_MODE=recompute UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW= \
    UMGEN_BENCH_BATCH_BLOCK=4 UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=4 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3f stage 4: 30-frame confirmation of B=10 win-8 bb=5 W4 (default candidate)"
UMGEN_BENCH_BATCH=10 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=5 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=30 \
    timeout 3600 python bench.py >> "$LOG" 2>&1

say "r3f done"
