"""Debug harness for test_greedy_frame_token_parity: runs both models once
and prints stage-by-stage divergence (ego tokens, TAR prior sequences, OAR
token stream by segment + first divergent position).

Usage:  python scripts/debug_ref_parity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from test_reference_parity import _install_ref_stubs  # noqa: E402

REF = "/root/reference"


def build_ref():
    _install_ref_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        from projects.configs import UMGen_config_evaluation as refcfg
        from projects.models.UMGen import UMGen as RefUMGen

        mc = refcfg.model_config
        mc.n_tar_layer = 1
        mc.n_oar_layer = 1
        mc.n_map_tar_layer = 1
        mc.n_box_tar_layer = 1
        mc.n_ego_tar_layer = 1
        mc.n_ego_ca_layer = 1
        mc.n_step = 1
        mc.dropout = 0.0
        mc.ar_dropout = 0.0
        mc.flash_attention = True
        mc.device_set = torch.device("cpu")
        mc.sample_method = "topk"
        mc.top_k = 1
        mc.top_k_map = 1
        mc.rule_constrain = False
        torch.manual_seed(0)
        ref = RefUMGen(mc)
        ref.eval()
        ref.topk_image = 1
    finally:
        os.chdir(cwd)
    return torch, ref, mc


def main():
    torch, ref, mc = build_ref()
    import jax
    import jax.numpy as jnp

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.models.rollout import Rollout
    from umgen_tpu.models.umgen import UMGen, build_buffers
    from umgen_tpu.runtime.torch_import import import_umgen

    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      sample_method="greedy", use_pallas_attention=False,
                      rule_constrain=False, merge_ar_tar=True,
                      oar_cache_dtype="float32").scaled("debug")
    params = {k: jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
              else jnp.asarray(v)
              for k, v in import_umgen(ref.state_dict(), cfg).items()}
    params["buffers"] = build_buffers(
        cfg,
        map_codebook=ref.map_codebook.weight.detach().numpy(),
        img_codebook=ref.img_codebook.weight.detach().numpy())
    model = UMGen(cfg)
    ro = Rollout(model)

    T = 3
    raw = make_token_batch(model.layout, T=T, B=1, seed=7, config=cfg)
    t_in = {m: torch.from_numpy(v.astype(np.int64)) for m, v in raw.items()}

    # ---- capture the reference's TAR priors via monkeypatch ----
    captured = {}
    orig_oar = ref.infer_oar_net

    def spy_oar(*a, **k):
        captured["oar_args"] = a
        captured["oar_kwargs"] = dict(k)
        out = orig_oar(*a, **k)
        captured["oar_out"] = out
        return out

    ref.infer_oar_net = spy_oar

    with torch.no_grad():
        theirs = ref._inference(
            inputs={m: v.clone() for m, v in t_in.items()},
            pred_task="pose_map_bbox3d_image")
    ref.infer_oar_net = orig_oar

    ref_ego = theirs["pose"].detach().numpy()[:, 0]      # [B, 3]
    print("ref ego tokens:", ref_ego)

    # ---- ours, with pose forced to the ref's ego tokens ----
    rng = jax.random.PRNGKey(0)
    inputs = {m: jnp.asarray(v) for m, v in raw.items()}
    res = ro.frame_step(params, inputs, rng,
                        pose_override=jnp.asarray(ref_ego, jnp.int32))
    lo = model.layout

    ours_tokens = np.asarray(res.tokens)                 # [B, seq_len]

    # our ego greedy (sanity — the dedicated test already passes)
    ego_logits = model.ego_logits(params, inputs)
    ours_ego = np.argmax(np.asarray(ego_logits, np.float32), -1)
    print("our ego tokens:", ours_ego.reshape(-1),
          "MATCH" if (ours_ego.reshape(-1) == ref_ego.reshape(-1)).all()
          else "DIVERGED")

    # ---- compare TAR priors ----
    # reference tar_emb: positional arg 0 of infer_oar_net (dict mod →
    # [B, T, seg_len_with_bos_eos, D]; last frame = the prior)
    ref_tar = captured["oar_args"][0] if captured["oar_args"] else None

    shifted = dict(inputs)
    shifted["pose"] = jnp.concatenate(
        [inputs["pose"], jnp.asarray(ref_ego, jnp.int32)[:, None, :]],
        axis=1)[:, 1:]
    priors = model.tar_priors(params, shifted)
    prior_seq = np.asarray(priors["prior_seq"], np.float32)  # [B, S, D]

    if ref_tar is not None:
        if isinstance(ref_tar, dict):
            # per-modality dict of [B, T, seg, D]; last frame is the prior
            for m, v in ref_tar.items():
                v = v.detach().float().numpy()
                print(f"ref tar_emb[{m!r}]:", v.shape)
                seg = None
                for s in lo.segments:
                    if s.mod == m:
                        seg = s
                if seg is None:
                    continue
                ours_m = prior_seq[:, seg.start:seg.content_end + 1]
                r = v[:, -1] if v.ndim == 4 else v
                n = min(ours_m.shape[1], r.shape[1])
                d = np.abs(ours_m[:, :n] - r[:, :n])
                print(f"  prior diff {m}: max {d.max():.3e} "
                      f"mean {d.mean():.3e}")
        else:
            r = ref_tar.detach().float().numpy()
            print("ref tar prior tensor:", r.shape)
            n = min(prior_seq.shape[1], r.shape[1])
            d = np.abs(prior_seq[:, :n] - r[:, -1][:, :n]
                       if r.ndim == 4 else prior_seq[:, :n] - r[:, :n])
            print("  prior diff: max", d.max(), "mean", d.mean())
            # per-position max over D
            pp = d.max(axis=-1)[0]
            bad = np.where(pp > 2e-4)[0]
            print("  positions with diff > 2e-4:", bad[:40],
                  f"({bad.size} total)")

    # ---- compare final token streams ----
    for mod in ("pose", "map", "bbox3d", "image"):
        r = theirs[mod].detach().numpy()[:, 0].reshape(-1)
        seg = lo.segment(mod)
        o = ours_tokens[:, seg.content_start - 1:seg.content_end].reshape(-1)
        n = min(r.size, o.size)
        neq = np.where(r[:n] != o[:n])[0]
        if neq.size:
            i = neq[0]
            print(f"{mod}: {neq.size}/{n} tokens differ; first at {i}: "
                  f"ref {r[i]} ours {o[i]}")
        else:
            print(f"{mod}: identical ({n} tokens)")

    # ---- teacher-forced margin analysis on the REF stream ----
    # Rebuild the ref's emitted frame as a full separator-bearing stream,
    # run OUR model's full causal OAR pass over it, and at every content
    # position compare our argmax to the ref token.  A genuine import bug
    # shows up as mismatches with a LARGE logit margin; fp32 near-ties
    # (random weights) show tiny margins.
    from umgen_tpu.parallel.train import frame_stream
    from umgen_tpu.models import modules as nn

    target = {m: jnp.asarray(theirs[m].detach().numpy()[:, 0],
                             jnp.int32) for m in lo.mod_order}
    stream = frame_stream(lo, target)               # [B, seq_len]
    oar_in = ro.oar_inputs_from_tokens(params, jnp.asarray(stream),
                                       priors["prior_seq"])
    h = np.asarray(model.oar_forward(params, oar_in), np.float32)
    head_ar = {"pose": "head_ar_pose", "map": "head_ar_map",
               "bbox3d": "head_ar_bbox3d", "image": "head_ar_img"}
    tot_bad = 0
    for seg in lo.segments:
        hs = h[:, seg.content_start - 1:seg.content_end]  # predicts content
        logits = np.asarray(nn.linear(params[head_ar[seg.mod]],
                                      jnp.asarray(hs)), np.float32)[0]
        toks = np.asarray(target[seg.mod])[0]
        am = logits.argmax(-1)
        mm = np.where(am != toks)[0]
        # bbox merge rule (ref:UMGen.py:1091-1104): OAR argmax pad →
        # reference resamples from the TAR head; classify those separately
        merge_ok = np.zeros(toks.size, bool)
        if seg.mod == "bbox3d":
            bseg = lo.segment("bbox3d")
            tar_h = priors["prior_seq"][:, bseg.start:bseg.content_end + 1]
            tl = np.asarray(nn.linear(
                params.get("head_tar_n_step_bbox3d",
                           params.get("head_tar_bbox3d")),
                tar_h.astype(jnp.float32)), np.float32)[0]
            # tar prior row i aligns with content position i (row 0 = BOS
            # slot predicts nothing; approximate both alignments)
            for i in mm:
                if am[i] == 1027:           # our OAR says pad
                    cand = {int(tl[j].argmax()) for j in (i, i + 1)
                            if j < tl.shape[0]}
                    if int(toks[i]) in cand:
                        merge_ok[i] = True
        margins = []
        for i in mm:
            if merge_ok[i]:
                continue
            margins.append(float(logits[i, am[i]] - logits[i, toks[i]]))
        margins = np.asarray(margins)
        big = margins[margins > 1e-2] if margins.size else margins
        print(f"TF {seg.mod}: {mm.size}/{toks.size} argmax≠ref "
              f"({int(merge_ok.sum())} merge-rule); "
              f"margin max {margins.max() if margins.size else 0:.2e}; "
              f"{big.size} above 1e-2")
        tot_bad += big.size
    print("teacher-forced large-margin mismatches:", tot_bad)


if __name__ == "__main__":
    main()
