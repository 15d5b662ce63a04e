#!/bin/bash
# Tiny-scale A/B: identical training (data, steps, seed) in absolute vs
# relative temporal-PE mode, then the cache-divergence quality row for
# each (VERDICT r4 task 4 "a measured quality row").  TPU-mode: tiny
# trains at ~0.1 s/step on chip (a CPU attempt measured ~6 s/step under
# host contention — unusable).  Run while the relay is free.
set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "tiny-pe-pair: absolute train (3000 steps)"
timeout 3600 python -m umgen_tpu.tools.train --model_scale tiny \
    --steps 3000 --batch_size 2 --window 4 --lr 3e-4 \
    --synthetic_data 8 --ckpt_dir output/tiny_abs --save_every 0 \
    --log_every 500 >> "$LOG" 2>&1 || say "absolute train exited nonzero"

say "tiny-pe-pair: relative train (same data/steps/seed)"
timeout 3600 python -m umgen_tpu.tools.train --model_scale tiny \
    --steps 3000 --batch_size 2 --window 4 --lr 3e-4 \
    --synthetic_data 8 --temporal_pe relative \
    --ckpt_dir output/tiny_rel --save_every 0 \
    --log_every 500 >> "$LOG" 2>&1 || say "relative train exited nonzero"

# the quality row: post-slide cached-vs-recompute token agreement over a
# 30-frame rollout (the r3 absolute-mode baseline decayed map/image
# agreement to ~0.3 by frame 30 on the 3k tiny checkpoint)
say "tiny-pe-pair: cache-divergence row, ABSOLUTE mode"
timeout 2400 python scripts/measure_cache_divergence.py \
    --ckpt output/tiny_abs/final --frames 30 --cond 4 \
    >> "$LOG" 2>&1 || say "absolute divergence exited nonzero"

say "tiny-pe-pair: cache-divergence row, RELATIVE mode"
timeout 2400 python scripts/measure_cache_divergence.py \
    --ckpt output/tiny_rel/final --frames 30 --cond 4 \
    >> "$LOG" 2>&1 || say "relative divergence exited nonzero"

say "tiny-pe-pair done"
