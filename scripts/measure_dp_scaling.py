"""Measure dp=N shard_map weak-scaling of the cached serving rollout.

Run on a multi-chip TPU slice (or a virtual CPU mesh for plumbing checks):

    python scripts/measure_dp_scaling.py --dp 1,2,4,8 --scale larger

Weak scaling: each dp width runs B = dp * scenes_per_chip scenes, so the
per-device program is IDENTICAL at every width; ideal scaling is flat
s/frame-batch (frames/s grows linearly with chips).  dp serving has no
cross-device collectives in steady state — the only sharing is the initial
param broadcast — so any slope here is relay/launch overhead, not ICI.

On a single-chip host the CPU fallback (--force_cpu) provisions a virtual
mesh to validate the sweep plumbing; CPU timings are NOT the scaling story.
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", default="1,2,4,8")
    ap.add_argument("--scale", default="tiny")
    ap.add_argument("--scenes_per_chip", type=int, default=1)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--force_cpu", action="store_true",
                    help="virtual CPU mesh (plumbing check only)")
    args = ap.parse_args()

    widths = [int(x) for x in args.dp.split(",")]
    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{max(widths)}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.models.generate import Generator
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if max(widths) > n_dev:
        print(f"host has {n_dev} devices; clamping sweep", file=sys.stderr)
        widths = [w for w in widths if w <= n_dev]

    cfg = ModelConfig(tar_mode="temporal_cache", chunked_prefill=True,
                      sample_method="greedy").scaled(args.scale)
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    T = args.window or 3
    results = []
    for dp in widths:
        B = dp * args.scenes_per_chip
        cond = make_token_batch(model.layout, T=T, B=B, seed=1, config=cfg)
        mesh = make_mesh(dp=dp, tp=1) if dp > 1 else None
        gen = Generator(model, params, seed=0, mesh=mesh,
                        spmd="shard_map" if dp > 1 else "jit")
        # warmup (compile) frame
        gen.generate(cond, new_frames=1, cond_frames=T, input_cond_frames=T)
        t0 = time.perf_counter()
        out = gen.generate(cond, new_frames=args.frames, cond_frames=T,
                           input_cond_frames=T)
        np.asarray(out["pose"])
        dt = (time.perf_counter() - t0) / args.frames
        results.append({"dp": dp, "B": B, "s_per_frame_batch": round(dt, 4),
                        "frames_per_sec_total": round(B / dt, 4)})
        print(json.dumps(results[-1]))

    base = results[0]["s_per_frame_batch"]
    for r in results:
        r["weak_scaling_eff"] = round(base / r["s_per_frame_batch"], 3)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
