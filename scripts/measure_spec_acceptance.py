"""Measure speculative-decode acceptance on a trained checkpoint.

Roadmap item: the TAR prior is a free position-wise draft model for the
map/image segments; throughput scales with the acceptance rate, which is
meaningless on random weights.  This script loads a checkpoint produced by
``umgen_tpu.tools.train``, rolls out frames with ``speculative_k`` on, and
reports the telemetry the Generator accumulates (FrameOutputs →
spec_chunks/spec_accepted).

    python scripts/measure_spec_acceptance.py \
        --ckpt /tmp/spec_train_ckpt/step_0000200 --scale tiny \
        --frames 3 --k 8 --sample topk
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--scale", default="tiny")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--cond", type=int, default=4,
                    help="conditioning frames from the synthetic scene")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--sample", default="topk", choices=("topk", "greedy"))
    ap.add_argument("--no_bbox", action="store_true",
                    help="keep the bbox segment sequential (measures the "
                         "map/image-only acceptance for comparison)")
    ap.add_argument("--kv_dtype", default=None,
                    help="TAR ring dtype override (float8_e4m3fn keeps "
                         "the 2.4B scale within 16 GB at B=1)")
    ap.add_argument("--window", type=int, default=None,
                    help="tar_cache_window override")
    ap.add_argument("--data_root", default=None,
                    help="scene pkls (default: the training synthetic dir "
                         "next to the checkpoint)")
    ap.add_argument("--refresh", type=int, default=0,
                    help="tar_cache_refresh N: re-anchor the rings to "
                         "window-relative temporal slots every N frames "
                         "(the in-regime lever for deep rollouts; N=1 = "
                         "exact recompute semantics)")
    ap.add_argument("--tpe_clamp", type=int, default=-1,
                    help="temporal-PE clamp (-1 = auto from the "
                         "checkpoint dir's train_meta.json: trained "
                         "window - 1; large value = effectively off)")
    args = ap.parse_args()

    import json
    if args.tpe_clamp == -1:
        args.tpe_clamp = None
        meta_f = os.path.join(os.path.dirname(args.ckpt.rstrip("/")),
                              "train_meta.json")
        if os.path.isfile(meta_f):
            with open(meta_f) as f:
                win = json.load(f).get("window")
            if win:
                args.tpe_clamp = int(win) - 1
                print(f"tpe_clamp={args.tpe_clamp} (from {meta_f})")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from umgen_tpu.config import DataConfig, ModelConfig
    from umgen_tpu.data.dataset import NuPlanTokenDataset
    from umgen_tpu.models.generate import Generator
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.runtime import checkpoint as ckpt

    kw = {}
    # serve in the checkpoint's temporal-PE mode (relative-mode
    # checkpoints carry the distance-bias table instead of absolute tpe)
    meta_f = os.path.join(os.path.dirname(args.ckpt.rstrip("/")),
                          "train_meta.json")
    if os.path.isfile(meta_f):
        with open(meta_f) as f:
            kw["temporal_pe_mode"] = json.load(f).get(
                "temporal_pe", "absolute")
    if args.kv_dtype:
        kw["tar_cache_dtype"] = args.kv_dtype
    if args.window:
        kw["tar_cache_window"] = args.window
    if args.refresh:
        kw["tar_cache_refresh"] = args.refresh
    cfg = ModelConfig(sample_method=args.sample, speculative_k=args.k,
                      tpe_clamp=args.tpe_clamp,
                      speculative_bbox=not args.no_bbox,
                      use_pallas_attention=False, **kw,
                      ).scaled(args.scale)
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    # template-free restore (works for any optimizer's state layout, and
    # avoids instantiating a 19 GB adam template at the 2.4B scale);
    # free the init trainables first — f32 init + restored params would
    # not coexist on a 16 GB chip at the larger scale
    buffers = params["buffers"]
    del params
    # host=True: orbax's restore-to-device stalls the first big
    # executable 450-950 s on the relay backend (PERFORMANCE.md r4)
    tree = ckpt.load_params(args.ckpt, host=True)
    print(f"loaded step {int(np.asarray(tree['step']))} from {args.ckpt}")
    restored = dict(tree["params"])
    restored["buffers"] = tree.get("buffers") or buffers
    del tree, buffers
    params = jax.tree.map(jnp.asarray, restored)
    del restored

    data_root = args.data_root or os.path.join(
        os.path.dirname(args.ckpt.rstrip("/")), "synthetic")
    dataset = NuPlanTokenDataset(DataConfig(data_root=(data_root,),
                                            block_size=args.cond + 1))
    scene = dataset[0]
    cond = {m: np.asarray(scene[m])[None, :args.cond]
            for m in model.layout.mod_order}

    import time

    gen = Generator(model, params, seed=0)
    # warmup/compile pass, then a timed pass (wall clock includes the
    # sequential host loop — the e2e signal we want)
    gen.generate(cond, new_frames=1, input_cond_frames=-1)
    # the telemetry counters are cumulative — drop the warmup's
    # contribution so chunks/accepted correspond to args.frames
    gen.spec_chunks = gen.spec_accepted = 0
    t0 = time.perf_counter()
    gen.generate(cond, new_frames=args.frames, input_cond_frames=-1)
    dt_spec = time.perf_counter() - t0

    chunks, acc = gen.spec_chunks, gen.spec_accepted
    spec_positions = chunks + acc
    print(f"chunks={chunks} accepted={acc} "
          f"({acc / max(chunks, 1):.2f} drafts/chunk at K={args.k})")
    print(f"OAR steps on speculative segments: {chunks} vs {spec_positions} "
          f"sequential → {spec_positions / max(chunks, 1):.2f}x fewer")
    print(f"speculative wall: {dt_spec:.1f}s for {args.frames} frames "
          f"({args.frames / dt_spec:.3f} f/s)")

    if os.environ.get("UMGEN_SPEC_NO_SEQ") == "1":
        return 0        # acceptance-only probe (skip the wall comparison)
    # sequential comparison run (same checkpoint/seed, spec off)
    cfg0 = ModelConfig(sample_method=args.sample, speculative_k=0,
                       use_pallas_attention=False, **kw).scaled(args.scale)
    model0 = UMGen(cfg0)
    gen0 = Generator(model0, params, seed=0)
    gen0.generate(cond, new_frames=1, input_cond_frames=-1)
    t0 = time.perf_counter()
    gen0.generate(cond, new_frames=args.frames, input_cond_frames=-1)
    dt_seq = time.perf_counter() - t0
    print(f"sequential wall: {dt_seq:.1f}s for {args.frames} frames "
          f"({args.frames / dt_seq:.3f} f/s) → net e2e speedup "
          f"{dt_seq / dt_spec:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
