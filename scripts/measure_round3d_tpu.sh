#!/bin/bash
# Round-3d TPU measurements:
#   * recompute-cascade attribution by ablation (attention ties Pallas/
#     XLA at ~10.5 s — find the real cost center)
#   * B=10 win-8 probes (keeps the serving window at 8 while pushing
#     batch: rings 10.6 G int4 + int8 OAR KV ~1.2 G should fit)
#   * re-run the fixed flash probe (rows=40/80 legs died on a relay
#     upload limit, now generated on device)
#   * 30-frame confirmation of the best 6-frame-probe config

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3d stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3d stage 1: recompute-cascade ablation (attn=identity / bf16 / trunk)"
timeout 3600 python scripts/probe_recompute2.py --batch 4 >> "$LOG" 2>&1

say "r3d stage 2: flash probe rerun (device-generated operands)"
timeout 2400 python scripts/probe_flash_attn.py >> "$LOG" 2>&1

say "r3d stage 3: B=10 win-8 bb=2 W4 (batch push at the win-8 default)"
UMGEN_BENCH_BATCH=10 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=2 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3d stage 4: B=10 win-8 bb=5 W4 (fewer weight re-streams)"
UMGEN_BENCH_BATCH=10 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=5 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3d stage 5: 30-frame confirmation, B=12 win-6 bb=4 W4"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=6 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=30 \
    timeout 3600 python bench.py >> "$LOG" 2>&1

say "r3d done"
