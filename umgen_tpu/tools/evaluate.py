"""CLI entry point — flag-compatible with the reference evaluate.py.

Usage (mirrors ref:projects/tools/evaluate.py:28-133):

    python -m umgen_tpu.tools.evaluate --infer_task video \
        --set_num_new_frames 30 --model_scale larger \
        --ckpt_dir data/weights/UMGen_Large.pt

Differences: ``--debug`` (random weights) also accepts ``--model_scale
debug|tiny`` for the hidden one-layer fixture (ref:infer_fun.py:147-155);
``--synthetic_data N`` generates N synthetic scenes when no dataset is
present; ``--batch_size`` runs batched multi-scene rollouts (new
capability).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="UMGen_Evaluation")
    # reference flags (ref:evaluate.py:28-133)
    p.add_argument("--pred_task", type=str, default="pose_map_bbox3d_image",
                   help="pose_map | pose_map_bbox3d | pose_map_bbox3d_image")
    p.add_argument("--ckpt_dir", type=str,
                   default="data/weights/UMGen_Large.pt")
    p.add_argument("--model_scale", type=str, default="larger",
                   help="stander | larger | debug | tiny")
    p.add_argument("--infer_task", type=str, default="video",
                   help="control | video")
    p.add_argument("--rule_constrain", type=lambda s: s not in
                   ("0", "false", "False"), default=True)
    p.add_argument("--set_num_new_frames", type=int, default=30)
    p.add_argument("--spe_text", type=str, default="UMGen_Evaluating")
    p.add_argument("--force_vis", type=bool, default=True)
    p.add_argument("--put_text", type=bool, default=True)
    p.add_argument("--save_video", type=lambda s: s not in
                   ("0", "false", "False"), default=True)
    p.add_argument("--debug", action="store_true",
                   help="skip checkpoint loading (random weights)")
    p.add_argument("--output_path", default="output/UMGen/")
    p.add_argument("--map_decoder_weights_path",
                   default="data/weights/map_vae.ckpt")
    p.add_argument("--image_decoder_weights_path",
                   default="data/weights/image_vae.tar")
    p.add_argument("--launcher", type=str, choices=["torch", "mpi"],
                   default=None, help="multi-host launcher (uses "
                   "jax.distributed when set)")
    # new flags
    p.add_argument("--data_root", type=str,
                   default="data/tokenized_origin_scenes")
    p.add_argument("--synthetic_data", type=int, default=0,
                   help="generate N synthetic scenes if dataset missing")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_scenes", type=int, default=-1)
    p.add_argument("--sample_method", type=str, default="topk")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--init_token_mod", type=str, default="",
                   help="comma-separated modalities forced to GT during "
                   "generation (init-token replay for FID/MMD eval, "
                   "ref:model_pl.py:103-130), e.g. 'map,image'")
    p.add_argument("--no_gt_video", action="store_true",
                   help="render single-panel videos instead of the default "
                   "pred|GT side-by-side panel")
    # performance options (no reference equivalents)
    p.add_argument("--tar_mode", type=str, default=None,
                   choices=["temporal_cache", "recompute"],
                   help="recompute = reference-faithful window recompute; "
                   "temporal_cache = per-layer frame KV rings (~12x fewer "
                   "TAR FLOPs).  Default: temporal_cache for video, "
                   "recompute for control (under agent control the cached "
                   "rings bake token overrides in at ingestion — recompute "
                   "keeps the reference's per-step overwrite semantics, "
                   "ref:UMGen.py:1464-1467)")
    p.add_argument("--kv_dtype", type=str, default="float8_e4m3fn",
                   help="KV cache storage dtype (float8_e4m3fn | bfloat16 "
                   "| int4 | int2; int4/int2 pack the TAR rings with "
                   "per-frame-head scales — int2 adds prefill-frozen "
                   "per-channel equalizers — and fall the OAR cache back "
                   "to int8)")
    p.add_argument("--int8", type=str, default="decode",
                   choices=["off", "decode", "all"],
                   help="weight-only int8 quantization scope")
    p.add_argument("--speculative_k", type=int, default=0,
                   help="TAR-draft speculative decoding chunk size for the "
                   "map/image/bbox segments (0 = off)")
    p.add_argument("--no_spec_bbox", action="store_true",
                   help="keep the bbox segment sequential when "
                   "--speculative_k is on (map/image stay speculative)")
    p.add_argument("--tar_cache_window", type=int, default=None,
                   help="temporal ring length (default: cond_frames)")
    p.add_argument("--tar_cache_refresh", type=int, default=0,
                   help="re-ingest the exact last-window frames every N "
                   "generated frames (bounds the post-slide ring "
                   "divergence; 1 = exact sliding-window semantics every "
                   "frame, 0 = never)")
    p.add_argument("--chunked_prefill", action="store_true",
                   help="ingest the conditioning window frame-by-frame "
                   "(same math, far lower peak memory — for large scene "
                   "batches)")
    p.add_argument("--fused_oar", action="store_true",
                   help="single-launch Pallas decode kernel (TPU; forces "
                   "int8 OAR KV storage and requires --int8 != off)")
    p.add_argument("--oar_kv_dtype", type=str, default=None,
                   help="override the OAR cache dtype separately "
                   "(e.g. int8 for the fused kernel)")
    p.add_argument("--oar_kernel", type=int, default=5, choices=(5, 7),
                   help="fused decode kernel generation: 5 = per-scene "
                   "attention loop (default; at the DMA floor for the "
                   "rollout's shapes), 7 = block-diagonal batched "
                   "attention (experimental; compute-bound at B>=4)")
    p.add_argument("--oar_batch_block", type=int, default=0,
                   help="v5 kernel batch-group size (innermost grid dim; "
                   "shares weight fetches across groups so the kernel "
                   "fits VMEM at large B — use 2 or 4 for B=8; 0 = whole "
                   "batch)")
    p.add_argument("--tar_w4", action="store_true",
                   help="group-int4 TAR-family weights (XLA dequant path; "
                   "frees ~1 GB HBM at the larger scale — the full-window "
                   "scene-batch enabler; same 4-8% per-matmul envelope as "
                   "the fused OAR W4)")
    p.add_argument("--temporal_pe", type=str, default="absolute",
                   choices=["absolute", "relative"],
                   help="temporal-PE mode; 'relative' serves owned "
                   "checkpoints trained with the per-head distance bias "
                   "(deep cached rollouts become distributionally exact "
                   "— models/umgen.py)")
    p.add_argument("--tpe_clamp", type=int, default=None,
                   help="clamp temporal-PE indices/distances to the "
                   "checkpoint's trained window - 1 (absolute mode: "
                   "avoids untrained tpe rows on deep cached rollouts)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel chips for serving: scenes split "
                   "over a dp-mesh via an explicit shard_map program "
                   "(the fused kernels are opaque to GSPMD), params "
                   "replicated.  batch_size must be a multiple of dp")
    return p


def config_from_args(args):
    """argparse namespace → scaled ModelConfig (split out for unit tests).

    The OAR cache supports bf16/fp8/int8/int4 (int4 = nibble-packed rows
    with per-(row, head) scales, served by the v5i4 fused kernel).
    kv_dtype=int4 applies to the TAR rings and falls the OAR cache back to
    int8 — the proven serving default — unless --oar_kv_dtype int4 opts
    the OAR cache in too."""
    from umgen_tpu.config import ModelConfig

    tar_mode = args.tar_mode
    if tar_mode is None:
        # control rides the cached path faithfully since round 3: the
        # agent-control overwrite is applied before ring ingestion,
        # reproducing the reference's persistent window mutation
        # (ref:UMGen.py:1464-1467) — tested token-for-token vs recompute
        # under greedy (tests/test_generate.py).  --tar_mode recompute
        # remains available for exact full-window semantics on rollouts
        # longer than the conditioning window.
        tar_mode = "temporal_cache"

    return ModelConfig(task=args.pred_task,
                       rule_constrain=args.rule_constrain,
                       sample_method=args.sample_method,
                       tar_mode=tar_mode,
                       tar_cache_dtype=args.kv_dtype,
                       oar_cache_dtype=(args.oar_kv_dtype or
                                        ("int8" if args.fused_oar
                                         or args.kv_dtype in ("int4",
                                                              "int2")
                                         else args.kv_dtype)),
                       speculative_k=args.speculative_k,
                       speculative_bbox=not args.no_spec_bbox,
                       fused_oar_kernel=args.fused_oar,
                       oar_kernel_version=args.oar_kernel,
                       oar_batch_block=args.oar_batch_block,
                       chunked_prefill=args.chunked_prefill,
                       tar_cache_window=args.tar_cache_window,
                       tar_cache_refresh=args.tar_cache_refresh,
                       temporal_pe_mode=args.temporal_pe,
                       tpe_clamp=args.tpe_clamp).scaled(
                           args.model_scale)


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    if args.launcher is not None:
        jax.distributed.initialize()

    from umgen_tpu.config import DataConfig, InferConfig, ModelConfig
    from umgen_tpu.data.dataset import NuPlanTokenDataset
    from umgen_tpu.data.pipeline import ScenePipeline
    from umgen_tpu.models.generate import Generator
    from umgen_tpu.models.umgen import UMGen, build_buffers
    from umgen_tpu.tools.harness import SceneRunner

    cfg = config_from_args(args)
    infer_cfg = InferConfig.for_task(args.infer_task,
                                     args.set_num_new_frames,
                                     batch_size=args.batch_size,
                                     seed=args.seed)
    pipeline = ScenePipeline()
    model = UMGen(cfg)

    # ---- weights ----
    if args.debug or not os.path.exists(args.ckpt_dir):
        if not args.debug:
            print(f"checkpoint {args.ckpt_dir} not found — using random "
                  "weights (debug mode)")
        params = model.init_params(jax.random.PRNGKey(args.seed),
                                   buffers=build_buffers(cfg, pipeline))
    else:
        print("loading model from", args.ckpt_dir)
        from umgen_tpu.runtime.torch_import import load_umgen_checkpoint
        params = load_umgen_checkpoint(
            args.ckpt_dir, cfg, pipeline=pipeline,
            map_codebook_path=_maybe("projects/tokenizer/weights/"
                                     "map_codebook.pth"),
            img_codebook_path=_maybe("projects/tokenizer/weights/"
                                     "img_codebook.pth"))

    if args.int8 != "off":
        from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS, DECODE_KEYS,
                                                quantize_params_int8)
        params = quantize_params_int8(
            params, keys=ALL_STACK_KEYS if args.int8 == "all"
            else DECODE_KEYS)
        if cfg.fused_oar_kernel:
            from umgen_tpu.runtime.quantize import pack_fused
            params = pack_fused(params, cfg.oar_cache_dtype)
    if args.tar_w4:
        from umgen_tpu.runtime.quantize import quantize_params_w4
        params = quantize_params_w4(params)

    # ---- detokenizers ----
    map_dec = image_dec = None
    try:
        from umgen_tpu.models.vq import (IMAGE_VQ, MAP_VQ, ImageDecoder,
                                         MapDecoder)
        if os.path.exists(args.map_decoder_weights_path):
            from umgen_tpu.runtime.torch_import import load_vq_checkpoint
            map_dec = MapDecoder(load_vq_checkpoint(
                args.map_decoder_weights_path, MAP_VQ))
        else:
            map_dec = MapDecoder()
        if os.path.exists(args.image_decoder_weights_path):
            from umgen_tpu.runtime.torch_import import load_vq_checkpoint
            image_dec = ImageDecoder(load_vq_checkpoint(
                args.image_decoder_weights_path, IMAGE_VQ))
        else:
            image_dec = ImageDecoder()
    except Exception as e:   # pragma: no cover
        print("detokenizers unavailable:", e)

    # ---- dataset ----
    data_root = args.data_root
    if args.infer_task == "control":
        data_root = "data/controlled_scenes"
    if not os.path.isdir(data_root) and args.synthetic_data > 0:
        from umgen_tpu.data.synthetic import write_synthetic_dataset
        data_root = os.path.join(args.output_path, "synthetic_scenes")
        write_synthetic_dataset(data_root, n_scenes=args.synthetic_data,
                                seed=args.seed)
        print("generated synthetic dataset at", data_root)
    dcfg = DataConfig(
        data_root=(data_root,),
        block_size=infer_cfg.num_new_frames + infer_cfg.cond_frames,
        control_test=args.infer_task == "control")
    dataset = NuPlanTokenDataset(dcfg, pipeline)
    if len(dataset) == 0:
        print(f"no scenes found under {data_root}; use --synthetic_data N")
        return 1

    if args.dp > 1:
        if dcfg.control_test:
            raise SystemExit("--dp > 1 batches video scenes; control mode "
                             "runs per-scene (per-scene init dicts)")
        if args.batch_size % args.dp:
            raise SystemExit(f"--batch_size {args.batch_size} must be a "
                             f"multiple of --dp {args.dp}")
        from umgen_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=1)
        gen = Generator(model, params, seed=args.seed, mesh=mesh,
                        spmd="shard_map")
    else:
        gen = Generator(model, params, seed=args.seed)
    init_token_mod = tuple(m for m in args.init_token_mod.split(",") if m)
    runner = SceneRunner(gen, infer_cfg, output_path=args.output_path,
                         pipeline=pipeline, map_decoder=map_dec,
                         image_decoder=image_dec,
                         save_video=args.save_video,
                         init_token_mod=init_token_mod,
                         gt_video=not args.no_gt_video)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    n = len(dataset) if args.max_scenes < 0 else min(args.max_scenes,
                                                     len(dataset))
    group = []
    for i in range(n):
        batch = dataset[i]
        if batch is None:
            continue
        group.append(batch)
        if len(group) >= max(args.batch_size, 1):
            runner.run_scenes(group, control_test=dcfg.control_test,
                              pad_to=args.dp)
            group = []
    if group:
        runner.run_scenes(group, control_test=dcfg.control_test,
                          pad_to=args.dp)

    if args.profile_dir:
        jax.profiler.stop_trace()

    if runner.timings:
        fps = np.mean([t["frames_per_sec"] for t in runner.timings])
        print(f"mean throughput: {fps:.3f} frames/sec")
    if cfg.speculative_k > 0 and gen.spec_chunks:
        # sequential decode of the same tokens costs chunks+accepted steps
        acc = gen.spec_accepted / gen.spec_chunks
        speedup = (gen.spec_chunks + gen.spec_accepted) / gen.spec_chunks
        print(f"speculative: {acc:.2f} drafts accepted/chunk "
              f"(K={cfg.speculative_k}), {speedup:.2f}x fewer OAR steps "
              "on speculative segments")
    ratio, scen = runner.box_overlap.average()
    print(f"collision rate: per-frame {ratio:.4f}, per-scenario {scen:.4f}")
    if any(runner.mmd.scores.values()):
        mmd = runner.mmd.average()
        print("MMD (generated vs GT continuation): "
              + ", ".join(f"{a}={v:.4f}" for a, v in mmd.items()))
    dataset.write_error_journal(
        os.path.join(args.output_path, "error_scene.txt"))
    if dataset.error_scenes:
        print(f"{len(dataset.error_scenes)} error scene(s) journaled to "
              f"{os.path.join(args.output_path, 'error_scene.txt')}")
    print("Sucess")   # the reference's success marker (ref:evaluate.py:221)
    return 0


def _maybe(path: str) -> Optional[str]:
    return path if os.path.exists(path) else None


if __name__ == "__main__":
    sys.exit(main())
