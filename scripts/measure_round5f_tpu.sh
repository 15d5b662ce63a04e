#!/bin/bash
# Round-5f: the calibration control leg — identical to r5c's training
# (relative PE, 24 scenes, window 8, 1000 steps) but WITHOUT the OAR
# label smoothing/loss-weight intervention.  r5c measured acceptance
# 0.43/0.45 with a smoothing-softened verifier; lossless rejection
# accepts with min(1, p_verify/p_draft), so the smoothing cap is itself
# a suspect.  This leg separates "smoothing hurt" from "data-bound":
#   acceptance(no-smooth) >> 0.45 -> smoothing was the limiter
#   acceptance(no-smooth) ~= 0.45 -> calibration is data-bound, full stop
set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r5f stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r5f stage 1: no-smoothing control training (relative PE, 24 scenes)"
timeout 8600 python -m umgen_tpu.tools.train \
    --model_scale larger \
    --steps 1000 --batch_size 1 --window 8 --lr 3e-4 \
    --optimizer sign_sgd --param_dtype bfloat16 --remat \
    --synthetic_data 24 --temporal_pe relative \
    --ckpt_dir output/large_ckpt8cal2 --save_every 400 \
    --log_every 40 >> "$LOG" 2>&1 \
    || say "stage 1 exited nonzero — continuing with newest ckpt"

CKPT=output/large_ckpt8cal2/final
[ -d "$CKPT" ] || CKPT=$(ls -d output/large_ckpt8cal2/step_* 2>/dev/null | tail -1)
[ -n "$CKPT" ] || { say "no checkpoint produced"; exit 1; }

say "r5f stage 2: in-regime acceptance on $CKPT (cond=4, window 8)"
timeout 1800 python scripts/measure_spec_acceptance.py \
    --ckpt "$CKPT" --scale larger --frames 4 --cond 4 --window 8 \
    --k 8 --sample topk --kv_dtype float8_e4m3fn >> "$LOG" 2>&1 \
    || say "stage 2 exited nonzero"

say "r5f stage 3: serving-depth acceptance (cond=16)"
timeout 1800 python scripts/measure_spec_acceptance.py \
    --ckpt "$CKPT" --scale larger --frames 4 --cond 16 --window 8 \
    --k 8 --sample topk --kv_dtype float8_e4m3fn >> "$LOG" 2>&1 \
    || say "stage 3 exited nonzero"

say "r5f done"
