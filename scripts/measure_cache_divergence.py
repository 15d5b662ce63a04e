"""Quantify temporal-cache vs recompute divergence on a TRAINED checkpoint.

The temporal-cache TAR keeps per-frame KV rings and, once the rollout
exceeds the conditioning window, retains stale ring entries instead of
recomputing attention over the slid window (StreamingLLM-style — documented
at umgen_tpu/models/umgen.py).  Exactness is tested while the window grows;
this script measures what happens AFTER the slide, on weights that actually
model the data (random weights tell you nothing about semantic drift):

  * per-frame, per-modality token agreement between the two streams
    (greedy sampling, identical seed → any difference is semantics)
  * first-divergence frame
  * collision rate and MMD-vs-GT of both streams (the quality deltas)

Usage (train a tiny checkpoint first):

    python -m umgen_tpu.tools.train --model_scale tiny --steps 300 \
        --synthetic_data 8 --window 4 --ckpt_dir /tmp/div_ckpt
    python scripts/measure_cache_divergence.py \
        --ckpt /tmp/div_ckpt/step_0000300 --frames 30 --cond 4
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _w4_roundtrip(w):
    """Simulate the fused kernel's W4A8 weight quantization: symmetric
    int4 in [-7, 7] with one scale per (input-row group, output column)
    (ops/decode_kernel._quantize_w4_groups), group size adapted to dims
    smaller than 128 (tiny scale).  Returns dequantized fp weights — the
    XLA path on these computes the same arithmetic as the w4 kernel."""
    import numpy as np

    w = np.asarray(w, np.float32)
    *lead, K, N = w.shape
    G = min(128, K)
    wg = w.reshape(*lead, K // G, G, N)
    scale = np.maximum(np.abs(wg).max(axis=-2, keepdims=True) / 7.0, 1e-8)
    q = np.clip(np.round(wg / scale), -7, 7)
    return (q * scale).reshape(w.shape)


def rollout(scale, tar_mode, ckpt, cond, frames, window, sample,
            w8=False, tar_cache_dtype=None, oar_cache_dtype=None,
            w4_sim=False, tar_w4_sim=False, scenes=1, seed=0,
            scene_chunk=0):
    import jax
    import numpy as np

    import json

    import jax.numpy as jnp

    from umgen_tpu.config import DataConfig, ModelConfig
    from umgen_tpu.data.dataset import NuPlanTokenDataset
    from umgen_tpu.models.generate import Generator
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.runtime import checkpoint as ckpt_io

    # serve with the temporal-PE clamp the checkpoint was trained for —
    # rollouts deeper than the trained window must not index untrained
    # tpe rows (the r3 acceptance-collapse root cause)
    tpe_clamp = None
    temporal_pe = "absolute"
    meta_f = os.path.join(os.path.dirname(ckpt.rstrip("/")),
                          "train_meta.json")
    if os.path.isfile(meta_f):
        with open(meta_f) as f:
            meta = json.load(f)
        win = meta.get("window")
        if win:
            tpe_clamp = int(win) - 1
        temporal_pe = meta.get("temporal_pe", "absolute")

    # the recompute path slides a cond_frames window; the cached path's
    # ring length is config.tar_cache_window — set both to `window` so the
    # two modes see identical conditioning semantics
    extra = {}
    if tar_cache_dtype:
        extra["tar_cache_dtype"] = tar_cache_dtype
    if oar_cache_dtype:
        extra["oar_cache_dtype"] = oar_cache_dtype
    # Pallas flash attention on TPU (XLA materializes the S x S logits —
    # OOM at the larger scale); the CPU backend interprets Pallas slowly,
    # so keep the XLA path there (tiny-scale usage)
    cfg = ModelConfig(sample_method=sample, tar_mode=tar_mode,
                      tar_cache_window=window, tpe_clamp=tpe_clamp,
                      temporal_pe_mode=temporal_pe,
                      chunked_prefill=(tar_mode == "temporal_cache"),
                      use_pallas_attention=(jax.default_backend() == "tpu"),
                      **extra).scaled(scale)
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    # template-free HOST restore (any optimizer's state layout; no 19 GB
    # adam template at the 2.4B scale; orbax restore-to-device stalls the
    # first big executable on the relay backend — PERFORMANCE.md r4).
    # Free the f32 init trainables first: they would not coexist with the
    # restored params on a 16 GB chip at the larger scale.
    buffers = params["buffers"]
    del params
    tree = ckpt_io.load_params(ckpt, host=True)
    restored = dict(tree["params"])
    restored["buffers"] = tree.get("buffers") or buffers
    del tree, buffers
    params = jax.tree.map(jnp.asarray, restored)
    del restored
    def _w4_walk(t, name):
        if isinstance(t, dict):
            if "w" in t and name in ("qkv", "proj", "fc", "q", "k", "v"):
                return {**t, "w": jax.numpy.asarray(
                    _w4_roundtrip(t["w"]), t["w"].dtype)}
            return {k: _w4_walk(v, k) for k, v in t.items()}
        return t

    if w4_sim:
        # the w4 serving config: group-int4 OAR weights (simulated by
        # dequantized round-trip), int8 everywhere else
        params = dict(params)
        params["oar"] = _w4_walk(params["oar"], "oar")
    if tar_w4_sim:
        # the r5 tar-w4 config (quantize_params_w4): group-int4
        # TAR-family weights — same arithmetic as the XLA wq4 path
        params = dict(params)
        for key in ("tar", "map_tar", "box_tar", "ego_tar", "ego_ca"):
            if key in params:
                params[key] = _w4_walk(params[key], key)
    if w8:
        from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS,
                                                quantize_params_int8)
        keys = (tuple(k for k in ALL_STACK_KEYS if k != "oar")
                if w4_sim else ALL_STACK_KEYS)
        params = quantize_params_int8(params, keys=keys)

    data_root = os.path.join(os.path.dirname(ckpt.rstrip("/")), "synthetic")
    ds = NuPlanTokenDataset(DataConfig(data_root=(data_root,),
                                       block_size=cond + frames))
    # batched multi-scene rollout: scene i at a staggered start offset —
    # one generate() call serves every scene (VERDICT r3 #4: quality
    # evidence must cover N>=8 scenes, not one)
    mods = model.layout.mod_order
    raws = []
    for i in range(scenes):
        scene = ds[i % len(ds)]
        span = max(scene["pose"].shape[0] - (cond + frames), 1)
        t0 = (i * 11) % span
        raws.append({m: np.asarray(scene[m][t0:t0 + cond + frames])
                     for m in mods})
    cond_tokens = {m: np.stack([r[m][:cond] for r in raws]) for m in mods}
    gt = {m: np.stack([r[m] for r in raws]) for m in mods}

    gen = Generator(model, params, seed=seed)
    # scene_chunk > 0: roll the scene batch in chunks of that size (the
    # fp8 reference config's TAR rings are ~2.1 GB/scene at the larger
    # scale and window 8 — 8 scenes at once would not fit 16 GB HBM;
    # chunks share one compiled program shape)
    chunk = scene_chunk or scenes
    if scenes % chunk:
        # a partial final chunk would have a different batch shape and
        # force a second large-scale compile (minutes on the relay
        # backend) — reject rather than silently pay it (ADVICE r4)
        raise ValueError(f"scenes={scenes} not divisible by "
                         f"scene_chunk={chunk}")
    outs = []
    for c0 in range(0, scenes, chunk):
        part = {m: v[c0:c0 + chunk] for m, v in cond_tokens.items()}
        outs.append(gen.generate(part, new_frames=frames,
                                 cond_frames=window,
                                 input_cond_frames=cond, progress=True))
    out = {m: np.concatenate([o[m] for o in outs]) for m in outs[0]}
    return out, gt, model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--scale", default="tiny")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cond", type=int, default=4)
    ap.add_argument("--window", type=int, default=None,
                    help="conditioning window (default: --cond; the slide "
                         "begins at generated frame window-cond+1)")
    ap.add_argument("--sample", default="greedy",
                    choices=("greedy", "topk"))
    args = ap.parse_args()
    window = args.window or args.cond

    import numpy as np

    from umgen_tpu.data.pipeline import ScenePipeline
    from umgen_tpu.ops.collision import BoxOverlap
    from umgen_tpu.ops.metrics import MMDMetric

    out_rc, gt, model = rollout(args.scale, "recompute", args.ckpt,
                                args.cond, args.frames, window, args.sample)
    out_tc, _, _ = rollout(args.scale, "temporal_cache", args.ckpt,
                           args.cond, args.frames, window, args.sample)

    # --- token agreement per generated frame, per modality --------------
    per_frame = []
    first_div = None
    for t in range(args.frames):
        row = {"frame": t + 1}
        for m in model.layout.mod_order:
            a = out_rc[m][0, args.cond + t]
            b = out_tc[m][0, args.cond + t]
            row[m] = round(float((a == b).mean()), 4)
        per_frame.append(row)
        if first_div is None and any(row[m] < 1.0
                                     for m in model.layout.mod_order):
            first_div = t + 1
    agree_all = {m: round(float(np.mean([r[m] for r in per_frame])), 4)
                 for m in model.layout.mod_order}

    # --- quality metrics of each stream ---------------------------------
    pipeline = ScenePipeline()
    report = {"first_divergence_frame": first_div,
              "mean_agreement": agree_all, "per_frame": per_frame}
    if "bbox3d" in out_rc:
        gt_b = gt["bbox3d"][0, args.cond:args.cond + args.frames]
        gb, gc, gv = pipeline.decode_bboxes(gt_b)
        for name, out in (("recompute", out_rc), ("temporal_cache", out_tc)):
            pb, pc, pv = pipeline.decode_bboxes(
                out["bbox3d"][0, args.cond:])
            bo = BoxOverlap()
            bo.update([pb[t][pv[t]] for t in range(pb.shape[0])])
            mmd = MMDMetric()
            n = min(len(gb), len(pb))
            mmd.update(pb[:n][pv[:n]], pc[:n][pv[:n]],
                       gb[:n][gv[:n]], gc[:n][gv[:n]])
            report[name] = {"collision_rate": bo.average(),
                            "mmd_vs_gt": mmd.average()}
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
