"""Recompute-cascade attribution by ablation (follow-up to
probe_recompute: Pallas and XLA attention TIE at ~10.5 s/frame-batch at
B=4, so attention is not the bottleneck — find what is).

Ablations (each timed on the same tar_priors call):
  * real       — the production cascade
  * attn=skip  — attention replaced by identity (keeps every matmul/LN)
  * w8=off     — bf16 weights instead of dequant-int8
  * trunk-only — split_map_tar/split_box_tar off (36 blocks vs 96)

    python scripts/probe_recompute2.py --batch 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--scale", default="larger")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS,
                                            quantize_params_int8)
    from umgen_tpu.models.umgen import UMGen

    B, T = args.batch, 20

    def run(name, w8=True, attn_skip=False, trunk_only=False):
        kw = {}
        if trunk_only:
            kw.update(split_map_tar=False, split_box_tar=False)
        cfg = ModelConfig(tar_mode="recompute", **kw).scaled(args.scale)
        model = UMGen(cfg)
        if attn_skip:
            model.attn = lambda q, k, v, causal: v
        params = model.init_params(jax.random.PRNGKey(0))
        if w8:
            params = quantize_params_int8(params, keys=ALL_STACK_KEYS)
        jax.block_until_ready(params)
        raw = make_token_batch(model.layout, T=T, B=B, seed=0, config=cfg)
        inputs = {k: jnp.asarray(v) for k, v in raw.items()}
        fn = jax.jit(lambda p, x: model.tar_priors(p, x)["prior_seq"])
        try:
            t0 = time.perf_counter()
            np.asarray(fn(params, inputs)[0, 0])
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                np.asarray(fn(params, inputs)[0, 0])
                ts.append(time.perf_counter() - t0)
            print(f"{name}: {min(ts):.3f}s/frame-batch "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    run("real (w8, attn, 96 blocks)")
    run("attn=identity", attn_skip=True)
    run("bf16 weights", w8=False)
    run("trunk-only (36 blocks)", trunk_only=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
