"""End-to-end quality budget of the quantized serving stack on a TRAINED
checkpoint (VERDICT round-1 weak #5: per-matmul error bounds are asserted,
but the COMPOUND effect of int8 weights + int8 OAR KV + int4 TAR rings on
rollout quality was never tracked on trained weights).

Rolls the same scene with the same seed under:

  A. fp32 weights, bf16 caches (quality reference)
  B. int8 weights                        (the w8 serving default)
  C. int8 weights + int8 OAR KV + int4 TAR rings (full serving stack)

and reports per-config token agreement vs A, collision rate, and MMD vs
the GT continuation.

    python scripts/measure_quant_quality.py \
        --ckpt output/tiny_ckpt/final --frames 30 --cond 4
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_cache_divergence import rollout  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--scale", default="tiny")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cond", type=int, default=4)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--sample", default="greedy",
                    choices=("greedy", "topk"))
    ap.add_argument("--scenes", type=int, default=1,
                    help="scenes rolled per config in ONE batched "
                         "generate (VERDICT r3 #4 asks >= 8)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="independent sampling seeds per config "
                         "(run-to-run spread; meaningful with --sample "
                         "topk)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="roll the scene batch in chunks of this size "
                         "(memory: the fp reference's fp8 rings are "
                         "~2.1 GB/scene at larger/win-8; 0 = all at once)")
    ap.add_argument("--configs", default="",
                    help="comma list of config names to run (default all; "
                         "the reference config A is always kept — "
                         "agreement needs it)")
    args = ap.parse_args()
    window = args.window or args.cond

    import numpy as np

    from umgen_tpu.data.pipeline import ScenePipeline
    from umgen_tpu.ops.collision import BoxOverlap
    from umgen_tpu.ops.metrics import MMDMetric

    configs = {
        "A_fp_reference": dict(w8=False),
        "B_int8_weights": dict(w8=True),
        "C_serving_stack": dict(w8=True, tar_cache_dtype="int4",
                                oar_cache_dtype="int8"),
        # the W4A8 bench config: group-int4 OAR weights (simulated by a
        # dequantized round-trip — same arithmetic as the w4 kernel),
        # int8 elsewhere, int4 rings + int8 OAR KV
        "D_w4_stack": dict(w8=True, w4_sim=True, tar_cache_dtype="int4",
                           oar_cache_dtype="int8"),
        # D + group-int4 TAR-family weights (the r5 full-window B=5
        # enabler — runtime/quantize.quantize_params_w4)
        "E_tar_w4_stack": dict(w8=True, w4_sim=True, tar_w4_sim=True,
                               tar_cache_dtype="int4",
                               oar_cache_dtype="int8"),
    }
    if args.configs:
        names = set(args.configs.split(","))
        unknown = names - set(configs)
        if unknown:
            # a typo here must not silently reduce the run to the fp
            # reference alone (ADVICE r4: the quantized leg this flag was
            # added to rescue would silently never execute)
            sys.exit(f"unknown configs: {sorted(unknown)}; "
                     f"known: {sorted(configs)}")
        keep = names | {"A_fp_reference"}
        configs = {k: v for k, v in configs.items() if k in keep}
    if args.chunk and args.scenes % args.chunk:
        # a partial final chunk has a different batch shape and forces a
        # second large-scale compile (minutes on the relay backend)
        sys.exit(f"--scenes {args.scenes} must be divisible by "
                 f"--chunk {args.chunk}")
    import numpy as np
    pipeline = ScenePipeline()

    def scene_metrics(out, gt, s):
        """collision rate + positional MMD for scene s of a batched out."""
        pb, pc, pv = pipeline.decode_bboxes(out["bbox3d"][s, args.cond:])
        bo = BoxOverlap()
        bo.update([pb[t][pv[t]] for t in range(pb.shape[0])])
        gb, gc, gv = pipeline.decode_bboxes(
            gt["bbox3d"][s, args.cond:args.cond + args.frames])
        mmd = MMDMetric()
        n = min(len(gb), len(pb))
        mmd.update(pb[:n][pv[:n]], pc[:n][pv[:n]],
                   gb[:n][gv[:n]], gc[:n][gv[:n]])
        return bo.average()[0], mmd.average()["posi"]

    # per (config, seed): one batched rollout over all scenes; stats are
    # aggregated over scenes x seeds so a defensible mean +/- spread backs
    # (or demotes) each lossy serving default
    acc = {name: {"collision": [], "mmd_posi": [], "agree": []}
           for name in configs}
    model = None
    for si in range(args.seeds):
        ref = None
        for name, kw in configs.items():
            out, gt, model = rollout(args.scale, "temporal_cache",
                                     args.ckpt, args.cond, args.frames,
                                     window, args.sample,
                                     scenes=args.scenes, seed=si,
                                     scene_chunk=args.chunk, **kw)
            if name == "A_fp_reference":
                ref = out
            else:
                acc[name]["agree"].append(float(np.mean(
                    [(out[m][:, args.cond:] ==
                      ref[m][:, args.cond:]).mean()
                     for m in model.layout.mod_order])))
            for s in range(args.scenes):
                col, mmd_posi = scene_metrics(out, gt, s)
                acc[name]["collision"].append(col)
                acc[name]["mmd_posi"].append(mmd_posi)

    def stat(xs):
        return {"mean": round(float(np.mean(xs)), 4),
                "std": round(float(np.std(xs)), 4), "n": len(xs)}

    report = {name: {k: stat(v) for k, v in d.items() if v}
              for name, d in acc.items()}
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
