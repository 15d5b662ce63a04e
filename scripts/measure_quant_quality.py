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
    }
    outs, model, gt = {}, None, None
    for name, kw in configs.items():
        out, gt, model = rollout(args.scale, "temporal_cache", args.ckpt,
                                 args.cond, args.frames, window,
                                 args.sample, **kw)
        outs[name] = out

    pipeline = ScenePipeline()
    ref = outs["A_fp_reference"]
    gt_b = gt["bbox3d"][0, args.cond:args.cond + args.frames]
    gb, gc, gv = pipeline.decode_bboxes(gt_b)
    report = {}
    for name, out in outs.items():
        row = {}
        if name != "A_fp_reference":
            row["token_agreement_vs_A"] = {
                m: round(float((out[m][0, args.cond:] ==
                                ref[m][0, args.cond:]).mean()), 4)
                for m in model.layout.mod_order}
        pb, pc, pv = pipeline.decode_bboxes(out["bbox3d"][0, args.cond:])
        bo = BoxOverlap()
        bo.update([pb[t][pv[t]] for t in range(pb.shape[0])])
        mmd = MMDMetric()
        n = min(len(gb), len(pb))
        mmd.update(pb[:n][pv[:n]], pc[:n][pv[:n]],
                   gb[:n][gv[:n]], gc[:n][gv[:n]])
        row["collision_rate"] = bo.average()
        row["mmd_vs_gt"] = mmd.average()
        report[name] = row
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
