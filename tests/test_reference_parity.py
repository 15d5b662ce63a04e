"""Activation + greedy-stream parity against the ACTUAL reference model.

Instantiates `/root/reference/projects/models/UMGen.py:51` at the hidden
debug scale (ref:projects/tools/infer_fun.py:147-155) with random torch
weights, exports its state dict through `runtime/torch_import.import_umgen`,
and asserts:

* per-block fp32 activation closeness (BlockTAR / BlockOAR / Decoder /
  GMLP forwards) — the only available proxy for `UMGen_Large.pt` load
  fidelity (name mapping, the attention-bias quirk, torch [out, in]
  transposes);
* greedy ego-net and full single-frame `_inference` token-stream equality.

The reference hard-imports CUDA-only deps (flash_attn, deepspeed, numba,
mmcv, torchvision, torchmetrics) that are absent here; import-time stubs
below satisfy them.  flash_attn_func is stubbed with a faithful fp32
softmax attention, and the model is built with flash_attention=True — the
trained checkpoints' path and naming (the manual CrossAttention fallback
both renames its projections *_wp and skips softmax on the non-causal
unmasked path, so it is neither the checkpoint format nor valid math).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="upstream reference not mounted")


def _install_ref_stubs():
    """Satisfy the reference's CUDA-only imports with inert stand-ins."""
    if "flash_attn" not in sys.modules:
        # A faithful fp32 flash_attn_func: trained checkpoints run the
        # flash path, which IS softmax attention (bottom-right-aligned
        # causal mask for Tq < Tk, flash-attn v2 semantics).  The manual
        # CrossAttention fallback (ref:module.py:604-620) never applies
        # softmax when non-causal without mask_index — a dead-path bug —
        # so flash semantics is the correct parity oracle.
        import math as _math

        import torch as _torch

        def _flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                             causal=False):
            Tq, Tk = q.shape[1], k.shape[1]
            if softmax_scale is None:
                softmax_scale = 1.0 / _math.sqrt(q.shape[-1])
            qh, kh, vh = (t.transpose(1, 2) for t in (q, k, v))
            att = (qh @ kh.transpose(-2, -1)) * softmax_scale
            if causal:
                keep = _torch.ones(Tq, Tk, dtype=_torch.bool,
                                   device=q.device).tril(diagonal=Tk - Tq)
                att = att.masked_fill(~keep, float("-inf"))
            y = att.softmax(-1) @ vh
            return y.transpose(1, 2).contiguous()   # [B, Tq, H, Dh]

        m = types.ModuleType("flash_attn")
        m.flash_attn_func = _flash_attn_func
        sys.modules["flash_attn"] = m

    if "deepspeed" not in sys.modules:
        ds = types.ModuleType("deepspeed")
        ck = types.ModuleType("deepspeed.checkpointing")
        ck.is_configured = lambda: False
        ds.checkpointing = ck
        sys.modules["deepspeed"] = ds
        sys.modules["deepspeed.checkpointing"] = ck

    if "numba" not in sys.modules:
        def _jit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        nb = types.ModuleType("numba")
        nb.jit = _jit
        nb.njit = _jit
        cuda = types.ModuleType("numba.cuda")
        dec = types.ModuleType("numba.cuda.decorators")
        dec.jit = _jit
        cuda.decorators = dec
        nb.cuda = cuda
        sys.modules["numba"] = nb
        sys.modules["numba.cuda"] = cuda
        sys.modules["numba.cuda.decorators"] = dec

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class Metric:
            def __init__(self, *a, **k):
                pass

            def add_state(self, *a, **k):
                pass

        tm.Metric = Metric
        sys.modules["torchmetrics"] = tm

    if "torchvision" not in sys.modules:
        # the eval config imports the dataset module, which imports
        # torchvision at top level; no dataset code runs in these tests
        from unittest import mock
        sys.modules["torchvision"] = mock.MagicMock(name="torchvision")
        sys.modules["torchvision.transforms"] = mock.MagicMock(
            name="torchvision.transforms")

    if "mmcv" not in sys.modules:
        class Registry:
            def __init__(self, name):
                self.name = name

            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                return deco

        mmcv = types.ModuleType("mmcv")
        utils = types.ModuleType("mmcv.utils")
        utils.Registry = Registry
        mmcv.utils = utils
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.utils"] = utils


@pytest.fixture(scope="module")
def ref_ctx():
    """The reference UMGen at debug scale (1 layer everywhere), fp32 CPU,
    greedy (top_k=1) sampling, built from its own evaluation config."""
    _install_ref_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    # the reference inference path hard-codes .cuda() on tensors
    # (ref:UMGen.py:662,1047,1167,…); neutralize for the CPU oracle run
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    cwd = os.getcwd()
    os.chdir(REF)  # codebook/category paths in the config are repo-relative
    try:
        from projects.configs import UMGen_config_evaluation as refcfg
        from projects.models.UMGen import UMGen as RefUMGen

        mc = refcfg.model_config
        # hidden debug scale (ref:infer_fun.py:147-155) + 1-layer ego
        mc.n_tar_layer = 1
        mc.n_oar_layer = 1
        mc.n_map_tar_layer = 1
        mc.n_box_tar_layer = 1
        mc.n_ego_tar_layer = 1
        mc.n_ego_ca_layer = 1
        mc.n_step = 1
        mc.dropout = 0.0
        mc.ar_dropout = 0.0
        # flash path (what trained checkpoints use — proper softmax
        # attention + q/k/v_attn naming); backed by the fp32 stub above
        mc.flash_attention = True
        mc.device_set = torch.device("cpu")
        mc.sample_method = "topk"
        mc.top_k = 1                   # multinomial over 1 candidate = argmax
        mc.top_k_map = 1
        mc.rule_constrain = False
        torch.manual_seed(0)
        ref = RefUMGen(mc)
        ref.eval()
        # image sampling ignores top_k and hardcodes top-16
        # (ref:UMGen.py:103,1135) — force argmax for determinism
        ref.topk_image = 1
    finally:
        os.chdir(cwd)
    return torch, ref, mc


@pytest.fixture(scope="module")
def our_pair(ref_ctx):
    """Our model + params imported from the reference's state dict."""
    import jax
    import jax.numpy as jnp

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.models.umgen import UMGen, build_buffers
    from umgen_tpu.runtime.torch_import import import_umgen

    torch, ref, mc = ref_ctx
    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      sample_method="greedy", use_pallas_attention=False,
                      rule_constrain=False, merge_ar_tar=True,
                      # bit-parity vs torch fp32 needs an unquantized cache
                      oar_cache_dtype="float32",
                      ).scaled("debug")
    params = {k: jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
              else jnp.asarray(v)
              for k, v in import_umgen(ref.state_dict(), cfg).items()}
    params["buffers"] = build_buffers(
        cfg,
        map_codebook=ref.map_codebook.weight.detach().numpy(),
        img_codebook=ref.img_codebook.weight.detach().numpy())
    model = UMGen(cfg)
    return model, params


def _layer0(stacked):
    import jax
    return jax.tree.map(lambda a: a[0], stacked)


def _close(ours, theirs, atol=2e-4):
    np.testing.assert_allclose(np.asarray(ours, np.float32),
                               np.asarray(theirs.detach().numpy(),
                                          np.float32),
                               atol=atol, rtol=1e-4)


def test_state_dict_fully_consumed(ref_ctx, our_pair):
    """Every reference parameter must land somewhere in our tree — a missing
    mapping would silently zero part of the 2.4B checkpoint."""
    torch, ref, mc = ref_ctx
    model, params = our_pair
    import jax

    # named_parameters, not state_dict: the latter also carries the causal
    # mask + softmax-scale buffers (441/attn + 1/cross), which no importer
    # should consume
    n_ref = sum(v.numel() for k, v in ref.named_parameters()
                if not k.startswith(("fouier_pe", "bbox3d_spatial_posi",
                                     "grid_center_posi_embedding",
                                     "map_codebook", "img_codebook")))
    # tpe_rel is this framework's relative-temporal-PE table — no torch
    # counterpart exists (the importer emits it zeroed), so it is not
    # part of the reference-parity count
    n_ours = sum(np.asarray(v).size
                 for k, sub in params.items()
                 if k not in ("buffers", "tpe_rel")
                 for v in jax.tree.leaves(sub))
    assert n_ref == n_ours


def test_block_tar_activation_parity(ref_ctx, our_pair):
    torch, ref, mc = ref_ctx
    model, params = our_pair
    from umgen_tpu.models.modules import block_tar

    B, T, S, D = 2, 3, 9, mc.n_embd
    x = np.random.default_rng(0).normal(size=(B, T, S, D)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = ref.transformer.TAR[0](torch.from_numpy(x))
    ours = block_tar(_layer0(params["tar"]), x, mc.n_head)
    _close(ours, theirs)


def test_block_oar_activation_parity(ref_ctx, our_pair):
    torch, ref, mc = ref_ctx
    model, params = our_pair
    from umgen_tpu.models.modules import block_oar

    # keep S <= block_size (21): the reference's causal mask buffer is that
    # small — its full-frame OAR always runs through the kv-cache path
    B, S, D = 2, 11, mc.n_embd
    x = np.random.default_rng(1).normal(size=(B, S, D)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = ref.transformer.OAR[0](
            torch.from_numpy(x[:, None]))   # [B, T=1, S, C]
    ours = block_oar(_layer0(params["oar"]), x, mc.n_head, causal=True)
    _close(ours, theirs[:, 0])


def test_decoder_block_activation_parity(ref_ctx, our_pair):
    torch, ref, mc = ref_ctx
    model, params = our_pair
    from umgen_tpu.models.modules import decoder_block

    B, T, S, Sc, D = 1, 2, 3, 15, mc.n_embd
    rng = np.random.default_rng(2)
    q = rng.normal(size=(B, T, S, D)).astype(np.float32)
    ctx = rng.normal(size=(B, T, Sc, D)).astype(np.float32)
    with torch.no_grad():
        theirs, _ = ref.transformer.ego_cross_attn[0](
            torch.from_numpy(q), torch.from_numpy(ctx))
    ours = decoder_block(_layer0(params["ego_ca"]),
                         q.reshape(B * T, S, D), ctx.reshape(B * T, Sc, D),
                         mc.n_head)
    _close(ours.reshape(B, T, S, D), theirs)


def _window_inputs(model, T=3, B=1, seed=7):
    from umgen_tpu.data.synthetic import make_token_batch
    return make_token_batch(model.layout, T=T, B=B, seed=seed,
                            config=model.config)


def test_ego_net_greedy_parity(ref_ctx, our_pair):
    """Greedy ego-action tokens through the full ego net (TAR stack + 3
    cross-attended queries + head) must match (ref:UMGen.py:994-1005)."""
    torch, ref, mc = ref_ctx
    model, params = our_pair
    import jax.numpy as jnp

    raw = _window_inputs(model, T=3)
    t_in = {m: torch.from_numpy(v.astype(np.int64)) for m, v in raw.items()}
    with torch.no_grad():
        theirs = ref.infer_ego_net(t_in, task_name="pose_map_bbox3d_image")
    ours_logits = model.ego_logits(
        params, {m: jnp.asarray(v) for m, v in raw.items()})
    ours = np.argmax(np.asarray(ours_logits, np.float32), axis=-1)
    np.testing.assert_array_equal(
        ours.reshape(-1), theirs.detach().numpy().reshape(-1))


@pytest.mark.slow
def test_greedy_frame_token_parity(ref_ctx, our_pair):
    """One full generated frame, greedy: the reference's `_inference`
    (ref:UMGen.py:1406-1539) vs our frame step.

    Exact fp32 argmax equality across 2199 sequential positions is not
    achievable between torch-MKL and XLA (each block matches to ~2e-4;
    random weights put many positions within that of a logit tie, and one
    flipped token reshuffles everything after it).  Diagnosed margins
    (scripts/debug_ref_parity.py): every stream mismatch is a < 3e-3
    near-tie.  So this asserts the two things that ARE deterministic:

    1. the sampled streams agree at > 97% of positions per modality (a
       structural bug — wrong prior alignment, head mix-up, BOS forcing —
       scrambles whole segments, not isolated ties), and the pose (ego)
       tokens agree exactly;
    2. teacher-forced sharpness: replaying the REFERENCE's emitted frame
       through OUR full causal OAR pass, every content-position argmax
       either equals the reference token or trails it by < 1e-2 in logit
       margin (a name-mapping/bias/transpose import bug produces LARGE
       margins at many positions).  Pose positions are excluded — the
       reference never samples them from the OAR head (they are forced
       from the ego net, ref:UMGen.py:1180-1201)."""
    torch, ref, mc = ref_ctx
    model, params = our_pair
    import jax.numpy as jnp

    from umgen_tpu.models import modules as nn
    from umgen_tpu.models.generate import Generator
    from umgen_tpu.models.rollout import Rollout
    from umgen_tpu.parallel.train import frame_stream

    T = 3
    lo = model.layout
    raw = _window_inputs(model, T=T)
    t_in = {m: torch.from_numpy(v.astype(np.int64)) for m, v in raw.items()}
    with torch.no_grad():
        theirs = ref._inference(
            inputs={m: v.clone() for m, v in t_in.items()},
            pred_task="pose_map_bbox3d_image")

    gen = Generator(model, params, seed=0)
    out = gen.generate({m: v.copy() for m, v in raw.items()},
                       new_frames=1, cond_frames=T, input_cond_frames=T)

    # --- 1. stream agreement ---
    np.testing.assert_array_equal(out["pose"][:, T],
                                  theirs["pose"].detach().numpy()[:, 0],
                                  err_msg="ego (pose) tokens diverged")
    # bbox3d cascades: one flipped pad/birth near-tie rewrites whole
    # 11-token slots downstream (measured 4-18% across eager/jit runs of
    # the SAME weights), so its bound is loose — the margin check below is
    # the sharp structural assertion
    for mod, bound in (("map", 0.05), ("bbox3d", 0.35), ("image", 0.05)):
        r = theirs[mod].detach().numpy()[:, 0].reshape(-1)
        o = out[mod][:, T].reshape(-1)
        frac = float((r != o).mean())
        assert frac < bound, (f"{mod}: {frac:.1%} of greedy tokens "
                              "diverged — structural, not tie noise")

    # --- 2. teacher-forced margin sharpness on the reference stream ---
    target = {m: jnp.asarray(theirs[m].detach().numpy()[:, 0], jnp.int32)
              for m in lo.mod_order}
    stream = frame_stream(lo, target)
    ro = Rollout(model)
    shifted = dict(raw)
    shifted["pose"] = np.concatenate(
        [raw["pose"], theirs["pose"].detach().numpy()[:, :1]], axis=1)[:, 1:]
    priors = model.tar_priors(params,
                              {m: jnp.asarray(v) for m, v in
                               shifted.items()})
    oar_in = ro.oar_inputs_from_tokens(params, jnp.asarray(stream),
                                       priors["prior_seq"])
    h = np.asarray(model.oar_forward(params, oar_in), np.float32)
    head_ar = {"map": "head_ar_map", "bbox3d": "head_ar_bbox3d",
               "image": "head_ar_img"}
    pad = 1027
    for seg in lo.segments:
        if seg.mod not in head_ar:
            continue
        hs = h[:, seg.content_start - 1:seg.content_end]
        logits = np.asarray(nn.linear(params[head_ar[seg.mod]],
                                      jnp.asarray(hs)), np.float32)[0]
        toks = np.asarray(target[seg.mod])[0]
        am = logits.argmax(-1)
        for i in np.where(am != toks)[0]:
            if seg.mod == "bbox3d" and am[i] == pad:
                continue      # merge-rule position (pad → TAR resample)
            margin = float(logits[i, am[i]] - logits[i, toks[i]])
            assert margin < 1e-2, (
                f"{seg.mod} content pos {i}: our argmax {am[i]} beats the "
                f"reference token {toks[i]} by {margin:.3e} — an import/"
                "alignment bug, not a numerical tie")


def test_gmlp_projection_parity(ref_ctx, our_pair):
    torch, ref, mc = ref_ctx
    model, params = our_pair
    from umgen_tpu.models.modules import mlp

    x = np.random.default_rng(3).normal(
        size=(4, mc.n_map_embd)).astype(np.float32)
    with torch.no_grad():
        theirs = ref.map_mlp_pre(torch.from_numpy(x))
    ours = mlp(params["map_mlp_pre"], x)
    _close(ours, theirs)


@pytest.mark.slow
def test_import_full_larger_scale_state_dict(ref_ctx):
    """2.4B-scale import fidelity without the weights file (VERDICT r3 #5).

    Synthesizes a DeepSpeed-format state dict covering EVERY key of the
    "larger" scale — the reference's named scales only change layer
    counts (ref:infer_fun.py:141-157), so replicating each stack's
    layer-0 tensors across the larger counts reproduces the exact key
    space of UMGen_Large.pt — plus the CPU-mode PE-as-Parameter keys
    (ref:UMGen.py:257-261).  Round-trips it through ``import_umgen`` and
    asserts:

    * every parameter key is CONSUMED except the deterministic PE /
      codebook tables (rebuilt by build_buffers) — and nothing else;
    * the imported tree is SHAPE-EXACT against the native
      ``init_params`` tree (via jax.eval_shape — no 9.6 GB materialize);
    * stacking order: layer i of every stack holds layer i's tensors;
    * the torch [out, in] → [in, out] transpose on a spot-checked leaf.
    """
    import jax
    import jax.numpy as jnp

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.runtime.torch_import import (extract_state_dict,
                                                import_umgen)

    torch, ref, mc = ref_ctx
    cfg = ModelConfig(dtype="float32", param_dtype="float32"
                      ).scaled("larger")

    param_keys = {k for k, _ in ref.named_parameters()}
    counts = {
        "transformer.TAR.": cfg.n_tar_layer,
        "transformer.OAR.": cfg.n_oar_layer,
        "transformer.map_tar.": cfg.n_map_tar_layer,
        "transformer.box_tar.": cfg.n_box_tar_layer,
        "transformer.ego_tar.": cfg.n_ego_tar_layer,
        "transformer.ego_cross_attn.": cfg.n_ego_ca_layer,
    }

    def widen(keys):
        """debug (1-layer) key space -> larger key space."""
        out, out_params = {}, set()
        for k, v in keys:
            for pref, n in counts.items():
                if k.startswith(pref):
                    idx, rest = k[len(pref):].split(".", 1)
                    assert idx == "0"      # debug scale: single layer
                    for i in range(n):
                        kk = f"{pref}{i}.{rest}"
                        # tag layer order into the tensor so stacking
                        # order is checkable: layer i = base + i
                        out[kk] = v + float(i)
                        out_params.add(kk)
                    break
            else:
                out[k] = v
                out_params.add(k)
        return out, out_params

    sd_full, param_keys_full = widen(
        [(k, v.detach().clone()) for k, v in ref.named_parameters()])

    class TrackingDict(dict):
        def __init__(self, d):
            super().__init__(d)
            self.accessed = set()

        def __getitem__(self, k):
            self.accessed.add(k)
            return super().__getitem__(k)

        def get(self, k, default=None):     # biases go through .get
            if super().__contains__(k):
                self.accessed.add(k)
            return super().get(k, default)

    tracked = TrackingDict(sd_full)
    # DeepSpeed container shape (ref:infer_fun.py:43-50)
    sd = extract_state_dict({"module": tracked})
    assert sd is tracked
    imported = import_umgen(sd, cfg)

    # 1. consumption: everything except the deterministic tables
    expected_skip = {k for k in param_keys_full
                     if k.startswith(("fouier_pe", "bbox3d_spatial_posi",
                                      "grid_center_posi_embedding",
                                      "map_codebook", "img_codebook"))}
    # CPU-mode PE-as-Parameter keys must exist in the synthetic dict
    # (the debug oracle runs on CPU, ref:UMGen.py:257-261)
    assert any(k.startswith("fouier_pe") for k in param_keys_full)
    missing = param_keys_full - expected_skip - tracked.accessed
    phantom = tracked.accessed - param_keys_full
    assert not missing, sorted(missing)[:8]
    assert not phantom, sorted(phantom)[:8]

    # 2. shape-exact vs the native init tree (buffers excluded)
    native = jax.eval_shape(
        lambda k: UMGen(cfg).init_params(k), jax.random.PRNGKey(0))
    native.pop("buffers")
    imp_shapes = jax.tree.map(lambda a: np.asarray(a).shape, imported)
    nat_shapes = jax.tree.map(lambda a: tuple(a.shape), native)
    assert jax.tree.structure(imp_shapes) == jax.tree.structure(nat_shapes)
    for (pa, si), (_, sn) in zip(
            jax.tree_util.tree_leaves_with_path(imp_shapes),
            jax.tree_util.tree_leaves_with_path(nat_shapes)):
        assert si == sn, (jax.tree_util.keystr(pa), si, sn)

    # 3. stacking order: the +i tag must appear at stack row i
    qkv = np.asarray(imported["tar"]["sa1"]["qkv"]["w"])
    base = qkv[0]
    for i in (1, cfg.n_tar_layer // 2, cfg.n_tar_layer - 1):
        np.testing.assert_allclose(qkv[i], base + i, atol=1e-5)

    # 4. transpose quirk: torch Linear stores [out, in]; ours is [in, out]
    ref_head = sd_full["transformer.head_ego.weight"]
    np.testing.assert_allclose(
        np.asarray(imported["head_ego"]["w"]),
        ref_head.detach().numpy().T, atol=0)
