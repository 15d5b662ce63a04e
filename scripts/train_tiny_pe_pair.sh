#!/bin/bash
# Tiny-scale A/B: identical training (data, steps, seed) in absolute vs
# relative temporal-PE mode, for the cache-divergence quality row
# (VERDICT r4 task 4 "a measured quality row").  CPU-friendly.
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
LOG=output/tiny_pe_pair.log
mkdir -p output
echo "=== $(date -u +%H:%M:%S) tiny absolute train" >> "$LOG"
timeout 14400 python -m umgen_tpu.tools.train --model_scale tiny \
    --steps 3000 --batch_size 2 --window 4 --lr 3e-4 \
    --synthetic_data 8 --ckpt_dir output/tiny_abs --save_every 1500 \
    --log_every 200 >> "$LOG" 2>&1
echo "=== $(date -u +%H:%M:%S) tiny relative train" >> "$LOG"
timeout 14400 python -m umgen_tpu.tools.train --model_scale tiny \
    --steps 3000 --batch_size 2 --window 4 --lr 3e-4 \
    --synthetic_data 8 --temporal_pe relative \
    --ckpt_dir output/tiny_rel --save_every 1500 \
    --log_every 200 >> "$LOG" 2>&1
echo "=== $(date -u +%H:%M:%S) tiny pair done" >> "$LOG"
