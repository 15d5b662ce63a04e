#!/bin/bash
# Round-3e: train the FULL 2.4B "larger" model on-chip (stateless
# sign-SGD + bf16 params — the only optimizer state that fits 16 GB
# next to the model), then measure speculative decoding on the TRAINED
# checkpoint.  This converts the r3b acceptance projection (2.63
# drafts/chunk at tiny scale) into a real larger-scale end-to-end
# number — the VERDICT r2 task-1 north-star path.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3e stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3e stage 1: train larger (2.4B) sign-SGD bf16, 1200 steps, B=1 win-3"
timeout 9000 python -m umgen_tpu.tools.train --model_scale larger \
    --steps 1200 --batch_size 1 --window 3 --lr 3e-4 \
    --optimizer sign_sgd --param_dtype bfloat16 --remat \
    --synthetic_data 6 --ckpt_dir output/large_ckpt --save_every 400 \
    --log_every 20 >> "$LOG" 2>&1

say "r3e stage 2: trained-ckpt sequential bench (B=8 win-8 bb=4 W4)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    UMGEN_BENCH_CKPT=output/large_ckpt/final \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3e stage 3: trained-ckpt SPECULATIVE bench (same config, K=8)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_SPEC_K=8 UMGEN_BENCH_FRAMES=6 \
    UMGEN_BENCH_CKPT=output/large_ckpt/final \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3e stage 4: trained-ckpt speculative 30-frame confirmation"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_SPEC_K=8 UMGEN_BENCH_FRAMES=30 \
    UMGEN_BENCH_CKPT=output/large_ckpt/final \
    timeout 3600 python bench.py >> "$LOG" 2>&1

say "r3e done"
