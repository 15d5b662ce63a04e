"""Training driver — the capability the public reference lacks.

Teacher-forced next-scene training over a (dp, tp) mesh with orbax
checkpointing:

    python -m umgen_tpu.tools.train --model_scale tiny --steps 100 \
        --synthetic_data 4 --dp 4 --tp 2

Real data uses the same pkl clips as evaluation (--data_root).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Iterator

import numpy as np


def batch_iterator(dataset, batch_size: int, window: int,
                   seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Random clip windows → stacked training batches."""
    rng = np.random.default_rng(seed)
    mods = ("pose", "map", "bbox3d", "image")
    while True:
        batch = {m: [] for m in mods}
        for _ in range(batch_size):
            scene = dataset[int(rng.integers(len(dataset)))]
            T = scene["pose"].shape[0]
            t0 = int(rng.integers(0, max(T - window, 1)))
            for m in mods:
                batch[m].append(np.asarray(scene[m][t0:t0 + window]))
        yield {m: np.stack(v).astype(np.int32) for m, v in batch.items()}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model_scale", default="tiny")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--window", type=int, default=4,
                   help="frames per training clip window")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=None,
                   help="LR warmup steps (default min(1000, steps/10) so "
                        "short runs actually reach peak LR)")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--data_root", default="data/tokenized_origin_scenes")
    p.add_argument("--synthetic_data", type=int, default=0)
    p.add_argument("--ckpt_dir", default="output/train_ckpt")
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--optimizer", default="adamw",
                   choices=("adamw", "sgd", "sign_sgd"),
                   help="sign_sgd = stateless sign updates (the only "
                        "optimizer that trains the 2.4B larger scale on "
                        "one 16 GB chip; pair with --param_dtype "
                        "bfloat16 and lr >= 1e-4)")
    p.add_argument("--param_dtype", default=None,
                   help="override the master param dtype (bfloat16 "
                        "halves param+grad memory for single-chip "
                        "large-scale training)")
    p.add_argument("--oar_label_smooth", type=float, default=0.0,
                   help="label smoothing on the OAR loss — the verifier-"
                        "sharpness cap for draft/verifier calibration "
                        "(speculative acceptance; see parallel/train.py)")
    p.add_argument("--oar_loss_weight", type=float, default=1.0)
    p.add_argument("--temporal_pe", default="absolute",
                   choices=("absolute", "relative"),
                   help="relative = window-relative temporal PE (learned "
                        "per-head distance bias at the temporal-attention "
                        "logits; makes deep cached rollouts "
                        "distributionally exact — models/umgen.py)")
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from umgen_tpu.config import DataConfig, ModelConfig
    from umgen_tpu.data.dataset import NuPlanTokenDataset
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.parallel.mesh import make_mesh
    from umgen_tpu.parallel.train import UMGenTrainer
    from umgen_tpu.runtime import checkpoint as ckpt

    data_root = args.data_root
    if not os.path.isdir(data_root) and args.synthetic_data > 0:
        from umgen_tpu.data.synthetic import write_synthetic_dataset
        data_root = os.path.join(args.ckpt_dir, "synthetic")
        write_synthetic_dataset(data_root, n_scenes=args.synthetic_data,
                                seed=args.seed)
    dataset = NuPlanTokenDataset(DataConfig(
        data_root=(data_root,), block_size=args.window + 2))
    if len(dataset) == 0:
        print("no training scenes; use --synthetic_data N")
        return 1

    cfg_kw = dict(remat=args.remat, use_pallas_attention=False,
                  temporal_pe_mode=args.temporal_pe)
    if args.param_dtype:
        cfg_kw["param_dtype"] = args.param_dtype
    cfg = ModelConfig(**cfg_kw).scaled(args.model_scale)
    model = UMGen(cfg)
    warmup = args.warmup if args.warmup is not None else \
        min(1000, max(args.steps // 10, 1))
    trainer = UMGenTrainer(model, learning_rate=args.lr,
                           warmup_steps=warmup,
                           total_steps=args.steps,
                           optimizer=args.optimizer,
                           oar_label_smooth=args.oar_label_smooth,
                           oar_loss_weight=args.oar_loss_weight)
    params = model.init_params(jax.random.PRNGKey(args.seed))
    state = trainer.init_state(params)
    if args.resume:
        state = ckpt.load_train_state(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    mesh = None
    if args.dp * args.tp > 1:
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        step_fn, place = trainer.jit_train_step(mesh)
    else:
        step_fn = trainer.jit_train_step()
        place = None

    # record the training regime next to the checkpoints — serving needs
    # trained window length to clamp temporal-PE indices (config.tpe_clamp)
    # so deep cached rollouts never index untrained tpe rows
    os.makedirs(args.ckpt_dir, exist_ok=True)
    import json
    with open(os.path.join(args.ckpt_dir, "train_meta.json"), "w") as f:
        json.dump({"window": args.window, "model_scale": args.model_scale,
                   "optimizer": args.optimizer, "steps": args.steps,
                   "batch_size": args.batch_size,
                   "temporal_pe": args.temporal_pe,
                   "oar_label_smooth": args.oar_label_smooth,
                   "oar_loss_weight": args.oar_loss_weight}, f)

    it = batch_iterator(dataset, args.batch_size, args.window, args.seed)
    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    for i in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        rng, sub = jax.random.split(rng)
        if mesh is not None:
            with mesh:
                if i == 0:
                    state, batch = place(state, batch, None)
                state, metrics = step_fn(state, batch, sub)
        else:
            state, metrics = step_fn(state, batch, sub)
        if (i + 1) % args.log_every == 0 or i == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.perf_counter() - t0
            print(f"step {i + 1}/{args.steps} loss={m['loss']:.4f} "
                  f"(ego {m['ego_loss']:.3f} tar {m['tar_loss']:.3f} "
                  f"oar {m['oar_loss']:.3f}) "
                  f"gnorm={m['grad_norm']:.2f} {dt:.1f}s")
        if args.save_every and (i + 1) % args.save_every == 0:
            path = os.path.join(args.ckpt_dir, f"step_{i + 1:07d}")
            ckpt.save_train_state(path, state)
            print("saved", path)

    final = os.path.join(args.ckpt_dir, "final")
    ckpt.save_train_state(final, state)
    print("saved", final)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
