"""Phase attribution for the reference-faithful recompute mode (VERDICT
r2 weak #4: 0.233 f/s at B=4 = 0.73x the A100 estimate; task 5 wants the
recompute row >= 0.32 f/s or a profiler-backed explanation).

Times the three phases of a recompute frame separately on chip, at the
serving shapes, with both attention backends:

  * TAR cascade (trunk 36 + map 24 + box 24 blocks) over the [B, 20, S]
    window — `model.tar_priors`
  * ego stack (12 TAR + 12 cross-attn) — `model.ego_logits`-equivalent
    via prefill path
  * the OAR decode (shared with cached mode; timed via bench.py rows)

Usage:  python scripts/probe_recompute.py --batch 4 --iters 3
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
    ap.add_argument("--frames_window", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS,
                                            quantize_params_int8)
    from umgen_tpu.models.umgen import UMGen

    B, T = args.batch, args.frames_window

    for pallas in (True, False):
        cfg = ModelConfig(tar_mode="recompute",
                          use_pallas_attention=pallas).scaled(args.scale)
        model = UMGen(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        params = quantize_params_int8(params, keys=ALL_STACK_KEYS)
        jax.block_until_ready(params)
        raw = make_token_batch(model.layout, T=T, B=B, seed=0, config=cfg)
        inputs = {k: jnp.asarray(v) for k, v in raw.items()}

        cascade = jax.jit(lambda p, x: model.tar_priors(p, x)["prior_seq"])
        ego = jax.jit(model.ego_logits)

        for name, fn, fa in (("tar_cascade", cascade, inputs),
                             ("ego_stack", ego, inputs)):
            try:
                t0 = time.perf_counter()
                out = fn(params, fa)
                np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
                compile_s = time.perf_counter() - t0
                ts = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    out = fn(params, fa)
                    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
                    ts.append(time.perf_counter() - t0)
                print(f"pallas={int(pallas)} {name}: "
                      f"{min(ts):.3f}s/frame-batch (B={B}, T={T}; "
                      f"compile {compile_s:.0f}s)", flush=True)
            except Exception as e:   # the XLA leg OOMs at B>=4 (S x S
                # logits materialize ~25 GB) — record and continue
                print(f"pallas={int(pallas)} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
