"""Headline benchmark: frames/sec/chip for the UMGen_Large 30-frame rollout.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repository publishes NO numbers (BASELINE.md).
`vs_baseline` is therefore reported against a documented analytic estimate
of the PyTorch reference on one A100:

  per frame, "larger" scale (2.4B params, batch 1):
    TAR cascade recompute over the 20x2207 window ≈ 145 TFLOP
      @ ~40% A100 bf16 MFU (312 TFLOP/s) ............ ≈ 1.16 s
    OAR decode: 2202 sequential steps x 36 layers,
      ~510 MB bf16 weight reads/step @ ~70% of 2 TB/s  ≈ 0.81 s
    host round trips (pose decode to CPU per TAR call, numba collision +
      .item() checks per bbox token — SURVEY §3.2) and per-token Python
      dispatch at ~0.5 ms/token ....................... ≈ 1.1 s
  total ≈ 3.1 s/frame → ~0.32 frames/sec.

Environment knobs:
  UMGEN_BENCH_SCALE     larger (default) | stander | debug | tiny
  UMGEN_BENCH_FRAMES    measured frames (default 30 — the flagship rollout
                        length, + warmup)
  UMGEN_BENCH_BATCH     parallel scenes (default 8)
  UMGEN_BENCH_TAR_MODE  temporal_cache (default) | recompute
  UMGEN_BENCH_KV_DTYPE  TAR-ring storage: int4 (default; nibble-packed with
                        per-frame-head scales) | float8_e4m3fn | bfloat16
  UMGEN_BENCH_W8        int8 weight-only quantization (default "all" = every
                        stack; "1" also selects all stacks; "decode" = only
                        the decode-path stacks; per-matmul rel err < 2%)
  UMGEN_BENCH_W4        group-128 int4 OAR weights via the fused w4 kernel
                        (default 1 on TPU; per-matmul rel err 4-8% — the
                        measured end-to-end budget on a trained checkpoint
                        is in PERFORMANCE.md "Quality budget of the
                        serving defaults": bbox stream bit-identical,
                        pose >= 0.99, collision/MMD unchanged; set 0 for
                        the int8 stack)
  UMGEN_BENCH_SPEC_K    speculative draft-chunk length (default 8 when a
                        trained checkpoint is being served, else 0 —
                        acceptance is structurally ~0 on random weights
                        and the verify overhead then costs 40-54%;
                        lossless either way)
  UMGEN_BENCH_CKPT      train-state checkpoint to serve (default: the
                        on-chip-trained output/large_ckpt/final when
                        present at the larger scale; "" forces random
                        weights)
"""

import json
import os
import time

A100_REFERENCE_FRAMES_PER_SEC = 0.32


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.models.rollout import Rollout
    from umgen_tpu.models.umgen import UMGen

    scale = os.environ.get("UMGEN_BENCH_SCALE", "larger")
    n_frames = int(os.environ.get("UMGEN_BENCH_FRAMES", "30"))
    # default serving config (best measured at the 8-frame ring window,
    # PERFORMANCE.md 2026-08-20 r3d): 10 parallel scenes, 8-frame ring
    # window, int4 TAR rings + int8 OAR cache, W4A8 fused decode with a
    # 5-scene batch-split kernel grid, chunked prefill — 1.975 f/s/chip
    # (B=16 win-4 measures 2.003 but trades the temporal window down to
    # 4 frames; window is the quality knob, so the default keeps 8)
    B = int(os.environ.get("UMGEN_BENCH_BATCH", "10"))
    tar_mode = os.environ.get("UMGEN_BENCH_TAR_MODE", "temporal_cache")
    kv_dtype = os.environ.get("UMGEN_BENCH_KV_DTYPE", "int4")
    T = 20                      # flagship conditioning window

    pos_unroll = int(os.environ.get("UMGEN_BENCH_POS_UNROLL", "1"))
    # 8-frame ring window: what fits B=8 in 16 GB HBM (win-8 B=8 measures
    # 1.836 f/s vs win-20 B=4's 1.51; full-window is the quality knob —
    # UMGEN_BENCH_WINDOW=20)
    window = os.environ.get("UMGEN_BENCH_WINDOW", "8" if B >= 6 else "")
    # fused decode kernel (flat int8 KV) is the default serving config on TPU
    import jax as _jax
    fused_default = "1" if _jax.default_backend() == "tpu" else "0"
    fused = os.environ.get("UMGEN_BENCH_FUSED", fused_default) == "1"
    # the OAR cache supports bf16/fp8/int8/int4 (int4 via the v5i4/w4i4
    # kernels — a memory knob: measured slightly slower than int8)
    oar_kv = os.environ.get("UMGEN_BENCH_OAR_KV",
                            "int8" if fused or kv_dtype == "int4"
                            else kv_dtype)
    # trained-checkpoint serving (resolved before the config so the
    # speculative default can key off it): UMGEN_BENCH_CKPT, or the
    # on-chip-trained 2.4B at output/large_ckpt when present
    ckpt_path = os.environ.get("UMGEN_BENCH_CKPT", "")
    if ckpt_path == "" and scale == "larger":
        cand = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "output", "large_ckpt", "final")
        if os.path.isdir(cand):
            ckpt_path = cand
    # speculative decoding stays opt-in: acceptance is ~0 on random
    # weights, and on the window-3-trained output/large_ckpt it measured
    # only 0.23 drafts/chunk at the T=20 serving depth (the temporal-PE
    # slots beyond the trained window are uninitialized — see
    # PERFORMANCE.md "speculative acceptance"), which makes K=8 a net
    # loss.  A production checkpoint trained at the full 20-frame window
    # would not have that mismatch; flip UMGEN_BENCH_SPEC_K=8 to measure.
    spec_default = "0"
    cfg = ModelConfig(tar_mode=tar_mode,
                      tar_cache_dtype=kv_dtype,
                      chunked_prefill=os.environ.get(
                          "UMGEN_BENCH_CHUNKED_PREFILL", "1") == "1",
                      oar_cache_dtype=oar_kv,
                      oar_pos_unroll=pos_unroll,
                      tar_cache_window=int(window) if window else None,
                      speculative_k=int(os.environ.get(
                          "UMGEN_BENCH_SPEC_K", spec_default)),
                      speculative_bbox=os.environ.get(
                          "UMGEN_BENCH_SPEC_BBOX", "1") == "1",
                      # batch-group size for the fused kernel's innermost
                      # grid dim (needed to fit VMEM at B>4; 0 = whole
                      # batch).  Larger groups mean fewer weight
                      # re-streams per step (bb=4 beats bb=2 at B=8,
                      # bb=5 beats bb=2 at B=10); groups above ~5 scenes
                      # stop fitting VMEM.  Default: the largest divisor
                      # of B in {5, 4, 3, 2}.
                      oar_batch_block=int(os.environ.get(
                          "UMGEN_BENCH_BATCH_BLOCK",
                          str(next((d for d in (5, 4, 3, 2)
                                    if B % d == 0), 0)
                              if fused and B > 4 else 0))),
                      fused_oar_kernel=fused).scaled(scale)
    if cfg.n_embd < 128 and "UMGEN_BENCH_FUSED" not in os.environ:
        # the fused kernels (and group-128 W4 packing) need >=128-lane
        # dims; small scales (tiny n_embd=64) fall back to the XLA path
        from dataclasses import replace as dc_replace
        fused = False
        cfg = dc_replace(cfg, fused_oar_kernel=False)
    model = UMGen(cfg)
    ro = Rollout(model)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt_step = None
    if ckpt_path:
        # serve a trained checkpoint instead of random weights (needed
        # for any speculative-decoding measurement: acceptance tracks
        # TAR confidence and is structurally ~0 on random weights).
        # Free the random-init trainables FIRST: the f32 init params are
        # 9.6 GB on device and coexisting with the uploaded checkpoint
        # OOMed the 16 GB chip (r3e stage 2).
        from umgen_tpu.runtime.checkpoint import load_params
        buffers = params["buffers"]
        del params
        tree = load_params(ckpt_path)
        ckpt_step = int(np.asarray(tree["step"]))
        restored = dict(tree["params"])
        restored["buffers"] = tree.get("buffers") or buffers
        del buffers
        # orbax restores straight to DEVICE arrays — drop every extra
        # reference so the pre-quantization weights actually free when
        # `params` is rebound below (a lingering `tree` kept 4.8 GB of
        # bf16 stacks alive through serving and OOMed r3e stage 4)
        del tree
        params = jax.tree.map(jnp.asarray, restored)
        del restored
        import sys
        print(f"# loaded {ckpt_path} (step {ckpt_step})",
              file=sys.stderr, flush=True)
    w8_mode = os.environ.get("UMGEN_BENCH_W8", "all")
    # "1" and "all" both mean every stack; "decode" restricts to the
    # decode-path stacks (the historical W8=1 meaning)
    w8 = w8_mode in ("1", "all", "decode")
    # W4A8 OAR weights need the fused w4 kernel; default on (best measured:
    # +6% over int8 at B=8 — quality budget on a trained checkpoint in
    # PERFORMANCE.md)
    w4 = os.environ.get("UMGEN_BENCH_W4", "1" if fused else "0") == "1"
    if w4 and not fused:
        raise SystemExit("UMGEN_BENCH_W4=1 requires the fused kernel "
                         "(UMGEN_BENCH_FUSED=1)")
    raw_oar = params["oar"] if w4 else None
    if w8:
        from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS, DECODE_KEYS,
                                                quantize_params_int8)
        params = quantize_params_int8(
            params, keys=DECODE_KEYS if w8_mode == "decode"
            else ALL_STACK_KEYS)
        if cfg.fused_oar_kernel and w4:
            from umgen_tpu.runtime.quantize import pack_fused_w4
            params = pack_fused_w4(params, raw_oar)
        elif cfg.fused_oar_kernel:
            from umgen_tpu.runtime.quantize import pack_fused
            params = pack_fused(params, cfg.oar_cache_dtype)
    del raw_oar                        # frees the unquantized OAR stack
    jax.block_until_ready(params)

    data_dir = os.environ.get("UMGEN_BENCH_DATA", "")
    if data_dir == "" and ckpt_path:
        # condition the trained model on real scene clips (the training
        # distribution) — uniform-random token windows are far out of
        # distribution, which collapses the TAR prior's confidence and
        # with it speculative acceptance (measured 0.24 vs 2.6
        # drafts/chunk, r3g stage 2)
        cand = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "output", "large_ckpt", "synthetic")
        if os.path.isdir(cand):
            data_dir = cand
    if data_dir:
        from umgen_tpu.config import DataConfig
        from umgen_tpu.data.dataset import NuPlanTokenDataset
        ds = NuPlanTokenDataset(DataConfig(data_root=(data_dir,),
                                           block_size=T + 1))
        mods = model.layout.mod_order
        raws = []
        for i in range(B):
            scene = ds[i % len(ds)]
            span = max(scene["pose"].shape[0] - T, 1)
            t0 = (i * 7) % span
            raws.append({m: np.asarray(scene[m][t0:t0 + T]) for m in mods})
        raw = {m: np.stack([r[m] for r in raws]).astype(np.int32)
               for m in mods}
    else:
        raw = make_token_batch(model.layout, T=T, B=B, seed=0, config=cfg)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    sl = model.layout.slices()
    rng = jax.random.PRNGKey(1)

    # warmup / compile.  NB: block_until_ready is unreliable through remote
    # TPU relays — force a device→host fetch to guarantee completion (the
    # production harness fetches tokens every frame anyway).
    cached = tar_mode == "temporal_cache"
    t0 = time.perf_counter()
    if cached:
        step = jax.jit(ro.frame_step_cached, donate_argnums=(2,))
        if cfg.chunked_prefill and T > 1:
            # frame-by-frame ring ingestion (peak memory: one frame's
            # activations) — what makes B>=6 fit a 16 GB chip
            ingest = jax.jit(ro.ingest_frame, donate_argnums=(3,))
            cache = jax.jit(lambda: model.init_tar_cache(B))()
            for t in range(T - 1):
                frame_t = {m: inputs[m][:, t:t + 1]
                           for m in model.layout.mod_order}
                cache = ingest(params, frame_t, inputs["pose"][:, t + 1],
                               cache)
            last = {m: inputs[m][:, T - 1:]
                    for m in model.layout.mod_order}
            out, cache = step(params, last, cache, rng)
        else:
            prefill = jax.jit(ro.frame_step_prefill)
            out, cache = prefill(params, inputs, rng)
        tokens = np.asarray(out.tokens)
        newest = {m: jnp.asarray(tokens[:, sl[m]][:, None]) for m in
                  model.layout.mod_order}
        # compile the steady-state step too
        rng, sub = jax.random.split(rng)
        out, cache = step(params, newest, cache, sub)
        tokens = np.asarray(out.tokens)
        newest = {m: jnp.asarray(tokens[:, sl[m]][:, None]) for m in
                  model.layout.mod_order}
    else:
        step = jax.jit(ro.frame_step)
        out = step(params, inputs, rng)
        _ = np.asarray(out.tokens)
    compile_s = time.perf_counter() - t0

    # measured frames: feed each frame's output back in
    lat = []
    spec_chunks = spec_accepted = 0
    for i in range(n_frames):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        if cached:
            out, cache = step(params, newest, cache, sub)
        else:
            out = step(params, inputs, sub)
        tokens = np.asarray(out.tokens)
        lat.append(time.perf_counter() - t0)
        spec_chunks += int(out.spec_chunks)
        spec_accepted += int(out.spec_accepted)
        frame = {m: tokens[:, sl[m]][:, None] for m in
                 model.layout.mod_order}
        if cached:
            newest = {m: jnp.asarray(frame[m]) for m in
                      model.layout.mod_order}
        else:
            inputs = {m: jnp.concatenate(
                [inputs[m][:, 1:], jnp.asarray(frame[m])], axis=1)
                for m in model.layout.mod_order}

    lat = np.asarray(lat)
    p50 = float(np.median(lat))
    fps_chip = B / p50

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps_chip, 4),
        "unit": f"frames/s/chip (UMGen_{scale} rollout, B={B}, T={T}"
                f"{f', win={window}' if window else ''}, "
                f"tar={tar_mode}, kv={kv_dtype}, oar_kv={oar_kv}"
                f"{', int8-OAR' if w8 else ''}"
                f"{(', fused-w4' if w4 else ', fused-v5') if fused else ''}"
                f"{f', bb={cfg.oar_batch_block}' if cfg.oar_batch_block else ''}"
                f"{f', trained-ckpt@{ckpt_step}' if ckpt_step else ''}"
                f"{f', spec_k={cfg.speculative_k}'
                   f'({spec_accepted / max(spec_chunks, 1):.2f}/chunk)'
                   if cfg.speculative_k else ''}"
                f"; p50 frame latency "
                f"{p50:.3f}s; compile {compile_s:.0f}s; {n_frames} frames "
                f"measured)",
        "vs_baseline": round(fps_chip / A100_REFERENCE_FRAMES_PER_SEC, 3),
    }
    if spec_chunks:
        # acceptance telemetry on stderr — stdout keeps the driver's
        # one-JSON-line contract
        import sys
        print(f"# speculative: {spec_chunks} chunks, {spec_accepted} "
              f"accepted ({spec_accepted / spec_chunks:.2f} drafts/chunk)",
              file=sys.stderr, flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
