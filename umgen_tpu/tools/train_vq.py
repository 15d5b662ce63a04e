"""VQ codec training driver — train the map/image NormVQ tokenizers.

The public reference ships pretrained VAE checkpoints and only exercises
the decode path at inference, but its quantizer classes carry the full
training machinery (EMA codebook updates with a
``torch.distributed.all_reduce`` code-usage sync,
ref:projects/tokenizer/quantize.py:414-479).  This driver completes the
capability TPU-natively: reconstruction + commitment training of the
NormVQ encoder/decoder around the functional EMA codebook
(models/quantize.py), data-parallel over a dp mesh via ``shard_map`` —
the EMA sync is the in-graph ``psum`` that ``norm_ema_quantize`` emits
when given an axis name.

    python -m umgen_tpu.tools.train_vq --target map --steps 200 \
        --batch_size 8 --dp 1 --res 64 --ch 32

Checkpoints are saved in the inference layout (``codebook`` = the EMA
embedding), so a trained run is directly loadable by MapDecoder /
ImageDecoder / NormVQTokenizer.
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def synthetic_rasters(rng: np.random.Generator, n: int, res: int,
                      channels: int) -> np.ndarray:
    """Smooth random blob fields in [-1, 1] — enough structure for the
    codec to learn a non-trivial codebook on any host."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    out = np.zeros((n, res, res, channels), np.float32)
    for i in range(n):
        for _ in range(6):
            cx, cy = rng.uniform(0, 1, 2)
            s = rng.uniform(0.05, 0.25)
            amp = rng.uniform(-1, 1, channels).astype(np.float32)
            g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
            out[i] += g[..., None] * amp
    return np.tanh(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=("map", "image"), default="map")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--res", type=int, default=0,
                    help="override resolution (small for CPU smoke runs)")
    ap.add_argument("--ch", type=int, default=0,
                    help="override base channel count")
    ap.add_argument("--n_embed", type=int, default=0)
    ap.add_argument("--kmeans", action="store_true",
                    help="k-means codebook init on the first batch "
                    "(ref:quantize.py:290-338)")
    ap.add_argument("--ckpt_dir", default="output/vq_ckpt")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from umgen_tpu.models import vq
    from umgen_tpu.models.quantize import (init_ema_state,
                                           maybe_kmeans_init,
                                           norm_ema_quantize)
    from umgen_tpu.runtime import checkpoint as ckpt

    cfg = vq.MAP_VQ if args.target == "map" else vq.IMAGE_VQ
    overrides = {}
    if args.res:
        overrides["resolution"] = args.res
    if args.ch:
        overrides["ch"] = args.ch
    if args.n_embed:
        overrides["n_embed"] = args.n_embed
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if cfg.ch % 32:
        raise SystemExit("--ch must be a multiple of 32 (GroupNorm(32) "
                         "inside the VQGAN blocks)")

    key = jax.random.PRNGKey(args.seed)
    params = vq.init_normvq(key, cfg)
    ema = init_ema_state(jax.random.PRNGKey(args.seed + 1), cfg.n_embed,
                         cfg.embed_dim, kmeans_init=args.kmeans,
                         codebook=np.asarray(params["codebook"]))
    if args.kmeans:
        ema = ema._replace(embedding=jnp.zeros_like(ema.embedding),
                           initted=jnp.asarray(False))
    train_params = {k: v for k, v in params.items() if k != "codebook"}

    tx = optax.adam(args.lr)
    opt_state = tx.init(train_params)
    axis = "dp" if args.dp > 1 else None

    def loss_fn(p, ema, x):
        z = vq.encoder_forward(p["encoder"], cfg, x)
        z = vq.conv2d(p["quant_conv"], z)
        zq, commit, idx, ema2 = norm_ema_quantize(ema, z, train=True,
                                                  axis_name=axis)
        zq = vq.conv2d(p["post_quant_conv"], zq)
        recon = vq.decoder_forward(p["decoder"], cfg, zq)
        rec = jnp.mean((recon - x) ** 2)
        return rec + commit, (ema2, rec, idx)

    def step_fn(p, ema, opt_state, x):
        (loss, (ema, rec, idx)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, ema, x)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            rec = jax.lax.pmean(rec, axis)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        # perplexity of code usage this step (codebook health)
        onehot = jax.nn.one_hot(idx.reshape(-1), cfg.n_embed)
        probs = jnp.mean(onehot, axis=0)
        if axis is not None:
            probs = jax.lax.pmean(probs, axis)
        perp = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
        return p, ema, opt_state, {"loss": loss, "rec": rec, "perp": perp}

    if args.dp > 1:
        from umgen_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=args.dp, tp=1)
        if args.batch_size % args.dp:
            raise SystemExit("batch_size must be a multiple of dp")
        step = jax.jit(shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P("dp")),
            out_specs=(P(), P(), P(), P()), check_vma=False))
    else:
        step = jax.jit(step_fn)

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for i in range(1, args.steps + 1):
        x = jnp.asarray(synthetic_rasters(rng, args.batch_size,
                                          cfg.resolution, cfg.in_channels))
        if args.kmeans and i == 1:
            z = jax.jit(lambda p, x: vq.conv2d(
                p["quant_conv"],
                vq.encoder_forward(p["encoder"], cfg, x)))(train_params, x)
            ema = maybe_kmeans_init(ema, z, jax.random.PRNGKey(args.seed))
        train_params, ema, opt_state, m = step(train_params, ema,
                                               opt_state, x)
        if i % args.log_every == 0 or i == args.steps:
            print(f"step {i}/{args.steps} loss={float(m['loss']):.4f} "
                  f"(rec {float(m['rec']):.4f}) "
                  f"perplexity={float(m['perp']):.1f} "
                  f"{time.time() - t0:.1f}s", flush=True)

    full = dict(train_params)
    full["codebook"] = ema.embedding
    path = ckpt.save_params(f"{args.ckpt_dir}/{args.target}_final", full)
    print(f"saved {path}")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
