import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models import modules as nn
from umgen_tpu.models.rollout import Rollout
from umgen_tpu.models.umgen import UMGen


def build(sample_method="greedy", **overrides):
    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      sample_method=sample_method,
                      use_pallas_attention=False,
                      rule_constrain=False, merge_ar_tar=False,
                      **overrides).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params, Rollout(model)


def inputs_for(model, T=3, B=1, seed=0):
    raw = make_token_batch(model.layout, T=T, B=B, seed=seed,
                           config=model.config)
    return {k: jnp.asarray(v) for k, v in raw.items()}


@pytest.fixture(scope="module")
def frame_greedy():
    cfg, model, params, ro = build()
    inputs = inputs_for(model)
    step = jax.jit(ro.frame_step)
    out = step(params, inputs, jax.random.PRNGKey(42))
    return cfg, model, params, ro, inputs, out


def test_frame_token_stream_structure(frame_greedy):
    cfg, model, params, ro, inputs, out = frame_greedy
    toks = np.asarray(out.tokens)
    assert toks.shape == (1, 2207)
    lo = model.layout
    for seg in lo.segments:
        assert toks[0, seg.start - 1] == seg.bos, seg.mod
        assert toks[0, seg.end - 1] == seg.eos, seg.mod
    # pose content equals the ego tokens
    np.testing.assert_array_equal(toks[0, 1:4], np.asarray(out.pose_tokens)[0])
    # vocab ranges
    sl = lo.slices()
    assert toks[0, sl["map"]].max() < 8192
    assert toks[0, sl["bbox3d"]].max() <= 1027
    assert toks[0, sl["image"]].max() < 8192
    assert toks.min() >= 0


def test_greedy_is_deterministic(frame_greedy):
    cfg, model, params, ro, inputs, out = frame_greedy
    out2 = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(out2.tokens))


def test_incremental_decode_matches_teacher_forced(frame_greedy):
    """The strongest decode-consistency check: replay the emitted stream
    through a full causal OAR pass; greedy argmax at every sampled position
    must reproduce the emitted token.  Validates KV-cache bookkeeping,
    prior alignment and every embedding path in one shot."""
    cfg, model, params, ro, inputs, out = frame_greedy
    lo = model.layout

    shifted = dict(inputs)
    shifted["pose"] = jnp.concatenate(
        [inputs["pose"], out.pose_tokens[:, None, :]], axis=1)[:, 1:]
    priors = model.tar_priors(params, shifted)
    full_in = ro.oar_inputs_from_tokens(params, out.tokens,
                                        priors["prior_seq"])
    h = model.oar_forward(params, full_in)          # [B, 2207, D]

    toks = np.asarray(out.tokens)[0]
    head_for = {"map": "head_ar_map", "image": "head_ar_img",
                "bbox3d": "head_ar_bbox3d"}
    mismatches = 0
    for seg in lo.segments:
        if seg.mod == "pose":
            continue           # forced, not sampled
        logits = nn.linear(params[head_for[seg.mod]],
                           h[:, seg.content_start - 1:seg.content_end])
        pred = np.asarray(jnp.argmax(logits, axis=-1))[0]
        got = toks[seg.content_start - 1:seg.content_end]
        mismatches += int((pred != got).sum())
    assert mismatches == 0


def test_batch_dim(frame_greedy):
    cfg, model, params, ro, *_ = frame_greedy
    inputs = inputs_for(model, B=2, seed=5)
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(1))
    assert out.tokens.shape == (2, 2207)
    # batch elements with different inputs should diverge somewhere
    assert not np.array_equal(np.asarray(out.tokens[0]),
                              np.asarray(out.tokens[1]))


def test_pose_override_forces_ego():
    cfg, model, params, ro = build()
    inputs = inputs_for(model)
    forced = jnp.asarray([[7, 8, 9]], dtype=jnp.int32)
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(0),
                                 pose_override=forced)
    np.testing.assert_array_equal(np.asarray(out.pose_tokens), [[7, 8, 9]])
    np.testing.assert_array_equal(np.asarray(out.tokens)[0, 1:4], [7, 8, 9])


def test_sampled_mode_runs():
    cfg, model, params, ro = build(sample_method="topk")
    inputs = inputs_for(model)
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(3))
    toks = np.asarray(out.tokens)
    assert toks.shape == (1, 2207)
    # different seeds → different streams
    out2 = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(4))
    assert not np.array_equal(toks, np.asarray(out2.tokens))


def test_oar_step_int8_cache_matches_bf16():
    """Scale-aware int8 KV storage (XLA path) tracks the bf16 cache."""
    from umgen_tpu.models.rollout import KV_INT8_SCALE
    cfg = ModelConfig(dtype="float32", use_pallas_attention=False,
                      n_oar_layer=2, oar_cache_dtype="bfloat16")
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.float32),
              "ln_oar": nn.init_layernorm(d, jnp.float32)}
    rng = np.random.default_rng(0)
    B, S, cl = 1, 64, 40
    kvf = rng.normal(0, 0.5, (2, B, S, cfg.n_head, cfg.head_dim))
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.float32)
    kv_bf = jnp.asarray(kvf, jnp.bfloat16)
    k8 = jnp.clip(jnp.round(jnp.asarray(kvf) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    h_ref, kr, _ = ro.oar_step(params, x, kv_bf, kv_bf, jnp.int32(cl))
    h_i8, k8r, _ = ro.oar_step(params, x, k8, k8, jnp.int32(cl))
    a, b = np.asarray(h_ref, np.float32), np.asarray(h_i8, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.08
    # new K row written back on the int8 grid
    got = np.asarray(k8r)[:, :, cl].astype(np.float32) / KV_INT8_SCALE
    want = np.asarray(kr.astype(jnp.float32))[:, :, cl]
    np.testing.assert_allclose(got, want, atol=0.1)


def test_n_step_head_frame():
    """n_step > 1 swaps in the widened multi-step bbox TAR head
    (ref:UMGen.py:221-226); inference consumes the step-0 vocab slice
    (ref:UMGen.py:1098-1101) and the frame still decodes a well-formed
    token stream."""
    cfg, model, params, ro = build(n_step=2)
    assert "head_tar_n_step_bbox3d" in params
    assert "head_tar_bbox3d" not in params
    assert params["head_tar_n_step_bbox3d"]["w"].shape == (
        cfg.n_embd, 2 * cfg.bbox3d_vocab_size)
    inputs = inputs_for(model)
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(3))
    toks = np.asarray(out.tokens)
    lo = model.layout
    sl = lo.slices()
    assert toks.shape == (1, 2207)
    assert toks[0, sl["bbox3d"]].max() <= 1027


def test_int4_oar_cache_frame():
    """oar_cache_dtype="int4" (nibble-packed rows + per-(row, head)
    scales): the XLA dequant path decodes a well-formed frame, and a
    multi-row oar_step push matches the bf16 cache path within int4
    quantization tolerance."""
    import jax.numpy as jnp
    from umgen_tpu.models.rollout import PackedKV

    cfg, model, params, ro = build(oar_cache_dtype="int4")
    kv_k, kv_v = ro.init_kv(1)
    assert isinstance(kv_k, PackedKV)
    assert kv_k.packed.shape[-1] == cfg.n_head * cfg.head_dim // 2
    inputs = inputs_for(model)
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(5))
    toks = np.asarray(out.tokens)
    lo = model.layout
    assert toks.shape == (1, 2207)
    for seg in lo.segments:
        assert toks[0, seg.start - 1] == seg.bos, seg.mod
        assert toks[0, seg.end - 1] == seg.eos, seg.mod

    # multi-row push parity vs the bf16 dense cache
    cfg2, model2, params2, ro2 = build()       # bfloat16 cache, same seed
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 4, cfg.n_embd)), jnp.float32)
    prefix = jnp.asarray(rng.normal(0, 0.5, (1, 6, cfg.n_embd)),
                         jnp.float32)
    kd_k, kd_v = ro2.init_kv(1)
    h0_d, kd_k, kd_v = ro2.oar_step(params2, prefix, kd_k, kd_v, 0)
    h_d, _, _ = ro2.oar_step(params2, x, kd_k, kd_v, 6)
    k4_k, k4_v = ro.init_kv(1)
    h0_q, k4_k, k4_v = ro.oar_step(params, prefix, k4_k, k4_v, 0)
    h_q, _, _ = ro.oar_step(params, x, k4_k, k4_v, 6)
    a = np.asarray(h_d, np.float32)
    b = np.asarray(h_q, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.12
