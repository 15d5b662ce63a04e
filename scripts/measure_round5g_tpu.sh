#!/bin/bash
# Round-5g (continuation): sub-int4 (int2) TAR rings — the one lever the
# round-5 frontier analysis left unvisited (PERFORMANCE.md: "past B=5 the
# honest levers are sub-int4 rings or the layer-pipelined split").
#
# int2 rings halve ring HBM again vs int4 (win-20: 1.32 GB/scene vs 2.63;
# win-8: 0.53 vs 1.05), which admits
#   - B=8  at the FULL 20-frame window   (int4 caps at B=5),
#   - B=12..16 at the win-8 serving ring (int4 caps at B=10).
# Quality machinery: prefill-frozen per-channel equalizers + per-frame-head
# scales (tests/test_tar_cache.py::test_block_tar_decode_deferred_q2_*).
#
# Requires the random-init serving artifact (fresh trees have no train
# state): scripts/make_serving_ckpt.py --random_init.  Stage 3 needs the
# tar-w4 variant and builds it if absent.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r5g stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r5g stage 1: B=12 win-8 bb=4 int2 rings (headline attempt)"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=8 \
    UMGEN_BENCH_BATCH_BLOCK=4 UMGEN_BENCH_KV_DTYPE=int2 \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=700 UMGEN_BENCH_HARD_BUDGET_S=720 \
    timeout 800 python bench.py >> "$LOG" 2>&1 || say "1 exited nonzero"

say "r5g stage 2: B=16 win-8 bb=4 int2 rings (stretch)"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_BATCH=16 UMGEN_BENCH_WINDOW=8 \
    UMGEN_BENCH_BATCH_BLOCK=4 UMGEN_BENCH_KV_DTYPE=int2 \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=700 UMGEN_BENCH_HARD_BUDGET_S=720 \
    timeout 800 python bench.py >> "$LOG" 2>&1 || say "2 exited nonzero"

say "r5g stage 3: B=8 win-20 bb=4 int2 rings + tar-w4 (full-window attempt)"
# tar-w4 needs its own config-matched artifact or the bench pays the
# ~11-min in-process random-init startup and blows the stage timeout
[ -d output/large_ckpt/serving_tarw4 ] || \
    JAX_PLATFORMS=cpu timeout 2400 python scripts/make_serving_ckpt.py \
        --random_init --tar_w4 1 --dst output/large_ckpt/serving_tarw4 \
        >> "$LOG" 2>&1 || say "tarw4 artifact build failed"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=20 \
    UMGEN_BENCH_BATCH_BLOCK=4 UMGEN_BENCH_KV_DTYPE=int2 \
    UMGEN_BENCH_SERVING=output/large_ckpt/serving_tarw4 \
    UMGEN_BENCH_TAR_W4=1 UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=700 UMGEN_BENCH_HARD_BUDGET_S=720 \
    timeout 800 python bench.py >> "$LOG" 2>&1 || say "3 exited nonzero"

say "r5g stage 4: B=15 win-8 bb=5 int2 rings (record-config stream ratio)"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_BATCH=15 UMGEN_BENCH_WINDOW=8 \
    UMGEN_BENCH_BATCH_BLOCK=5 UMGEN_BENCH_KV_DTYPE=int2 \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=700 UMGEN_BENCH_HARD_BUDGET_S=720 \
    timeout 800 python bench.py >> "$LOG" 2>&1 || say "4 exited nonzero"

say "r5g done"
