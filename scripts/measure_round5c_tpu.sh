#!/bin/bash
# Round-5c: draft/verifier CALIBRATED 2.4B training + the decisive
# in-regime acceptance number (VERDICT r4 task 5).
#
# The r4 falsification localized the shallow-acceptance cap to the
# OAR/TAR sharpness ratio (OAR overfits 6 synthetic scenes to loss
# 0.55-0.89 while TAR sits at 1.94; the lossless rejection scheme
# punishes a verifier sharper than its draft).  One training change
# answers it: 24 scenes (4x the data), OAR label smoothing 0.1 and OAR
# loss weight 0.5 — all three push the verifier's confidence toward the
# draft's.  The run also trains in RELATIVE temporal-PE mode (r5's new
# first-class re-anchoring): with a window-8 ring every attention
# distance at ANY rollout depth is a trained distance, so this one
# checkpoint answers BOTH open causes:
#   stage 2 (cond=4, depth <= 8)  -> the calibration question
#   stage 3 (cond=16, depth 17-20) -> the depth/re-anchoring question
# against the ~0.7 drafts/chunk break-even of the ~1.6x verify-chunk
# cost.
#
# Run AFTER r5a/r5b release the relay.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r5c stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r5c stage 1: calibrated RELATIVE-PE window-8 training (24 scenes, smooth 0.1, oar_w 0.5)"
timeout "${R5C_TRAIN_BUDGET_S:-5400}" python -m umgen_tpu.tools.train \
    --model_scale larger \
    --steps "${R5C_STEPS:-1200}" --batch_size 1 --window 8 --lr 3e-4 \
    --optimizer sign_sgd --param_dtype bfloat16 --remat \
    --synthetic_data 24 --oar_label_smooth 0.1 --oar_loss_weight 0.5 \
    --temporal_pe relative \
    --ckpt_dir output/large_ckpt8cal --save_every 400 \
    --log_every 20 >> "$LOG" 2>&1 \
    || say "stage 1 exited nonzero (timeout or crash) — continuing with newest ckpt"

CKPT=output/large_ckpt8cal/final
[ -d "$CKPT" ] || CKPT=$(ls -d output/large_ckpt8cal/step_* 2>/dev/null | tail -1)
[ -n "$CKPT" ] || { say "no calibrated checkpoint produced"; exit 1; }

say "r5c stage 2: IN-REGIME acceptance on $CKPT (cond=4, window 8, fp8 rings)"
timeout 1800 python scripts/measure_spec_acceptance.py \
    --ckpt "$CKPT" --scale larger --frames 4 --cond 4 --window 8 \
    --k 8 --sample topk --kv_dtype float8_e4m3fn >> "$LOG" 2>&1 \
    || say "stage 2 exited nonzero"

say "r5c stage 3: acceptance at the SERVING depth (cond=16 of a 20-frame stream)"
timeout 1800 python scripts/measure_spec_acceptance.py \
    --ckpt "$CKPT" --scale larger --frames 4 --cond 16 --window 8 \
    --k 8 --sample topk --kv_dtype float8_e4m3fn >> "$LOG" 2>&1 \
    || say "stage 3 exited nonzero"

say "r5c done"
