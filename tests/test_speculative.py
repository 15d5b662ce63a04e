"""Speculative decoding: losslessness and cache coherence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models.rollout import Rollout
from umgen_tpu.models.umgen import UMGen


def build(spec_k, sample_method="greedy"):
    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      sample_method=sample_method,
                      use_pallas_attention=False,
                      rule_constrain=False, merge_ar_tar=False,
                      speculative_k=spec_k).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params, Rollout(model)


def test_greedy_spec_matches_sequential():
    """With greedy sampling the speculative stream must equal the
    sequential stream token-for-token — this exercises drafting, chunk
    verification, boundary correction, partial-acceptance cache overwrites
    and segment-end clamping in one shot."""
    _, model, params, ro_seq = build(0)
    _, model_s, _, ro_spec = build(4)

    raw = make_token_batch(model.layout, T=3, B=1, seed=0,
                           config=model.config)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    out_seq = jax.jit(ro_seq.frame_step)(params, inputs,
                                         jax.random.PRNGKey(9))
    out_spec = jax.jit(ro_spec.frame_step)(params, inputs,
                                           jax.random.PRNGKey(9))
    a = np.asarray(out_seq.tokens)
    b = np.asarray(out_spec.tokens)
    # map + image + bbox segments decoded speculatively (bbox rules off
    # in this fixture; the rules are covered by the tests below).
    # fp32 ties under different verify groupings (Q=1 vs Q=K attention
    # orders) can flip an argmax on random weights, after which the stream
    # legitimately diverges — demand near-exact agreement
    agree = (a == b).mean()
    assert agree >= 0.99, agree


@pytest.mark.slow
def test_greedy_spec_batch2():
    _, model, params, ro_seq = build(0)
    _, _, _, ro_spec = build(4)
    raw = make_token_batch(model.layout, T=3, B=2, seed=1,
                           config=model.config)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    a = np.asarray(jax.jit(ro_seq.frame_step)(
        params, inputs, jax.random.PRNGKey(2)).tokens)
    b = np.asarray(jax.jit(ro_spec.frame_step)(
        params, inputs, jax.random.PRNGKey(2)).tokens)
    assert (a == b).mean() >= 0.99


@pytest.mark.slow
def test_sampled_spec_valid_stream():
    """Top-k speculative decode: structural validity (separators, vocab
    ranges) and seed sensitivity."""
    cfg, model, params, ro = build(4, sample_method="topk")
    raw = make_token_batch(model.layout, T=3, B=1, seed=2, config=cfg)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(0))
    toks = np.asarray(out.tokens)
    lo = model.layout
    for seg in lo.segments:
        assert toks[0, seg.start - 1] == seg.bos
        assert toks[0, seg.end - 1] == seg.eos
    sl = lo.slices()
    assert toks[0, sl["map"]].min() >= 0
    assert toks[0, sl["map"]].max() < 8192
    assert toks[0, sl["image"]].max() < 8192
    out2 = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(1))
    assert not np.array_equal(toks, np.asarray(out2.tokens))


def test_spec_residual_distribution_math():
    """Unit-check the rejection pieces: residual dist = (q - p)+ norm."""
    from umgen_tpu.models.speculative import (_scatter_dense, dist_prob_of,
                                              topk_dist)
    logits = jnp.asarray([[2.0, 1.0, 0.5, -1.0, -2.0]])
    p, idx = topk_dist(logits, 3, 1.0)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-6)
    dense = np.asarray(_scatter_dense(p, idx, 5))
    assert dense.shape == (1, 5)
    np.testing.assert_allclose(dense.sum(), 1.0, rtol=1e-6)
    assert dense[0, 3] == 0 and dense[0, 4] == 0
    tok = jnp.asarray([0])
    np.testing.assert_allclose(np.asarray(dist_prob_of(tok, p, idx)),
                               dense[:, 0])


# ---------------------------------------------------------------------------
# bbox-segment speculation (merge rule / control / collision constraint)
# ---------------------------------------------------------------------------
def build_rules(spec_k, sample_method="greedy", **over):
    kw = dict(dtype="float32", param_dtype="float32",
              sample_method=sample_method, use_pallas_attention=False,
              rule_constrain=True, merge_ar_tar=True,
              speculative_k=spec_k)
    kw.update(over)
    cfg = ModelConfig(**kw).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params, Rollout(model)


@pytest.mark.slow
def test_greedy_bbox_spec_matches_sequential_with_rules():
    """Greedy bbox speculation under the full decode rules (pad→TAR merge
    + collision rule constraint) must reproduce the sequential stream:
    drafting from the TAR bbox head, the mixture target, constraint
    application at box completions and kill-truncation all in one shot."""
    _, model, params, ro_seq = build_rules(0)
    _, _, _, ro_spec = build_rules(4)
    raw = make_token_batch(model.layout, T=3, B=2, seed=3,
                           config=model.config)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    a = np.asarray(jax.jit(ro_seq.frame_step)(
        params, inputs, jax.random.PRNGKey(5)).tokens)
    b = np.asarray(jax.jit(ro_spec.frame_step)(
        params, inputs, jax.random.PRNGKey(5)).tokens)
    assert (a == b).mean() >= 0.99, (a == b).mean()


@pytest.mark.slow
def test_greedy_bbox_spec_with_agent_control():
    """Control-overridden slots draft AND verify from the pad-masked TAR
    head (always accepted) — the streams must still agree."""
    _, model, params, ro_seq = build_rules(0)
    _, _, _, ro_spec = build_rules(4)
    raw = make_token_batch(model.layout, T=3, B=1, seed=4,
                           config=model.config)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    ctrl = np.full((1, 660), -1, np.int32)
    ctrl[0, 33:44] = np.r_[np.arange(10) * 7 % 1024, 1024]  # slot 3 forced
    ctrl = jnp.asarray(ctrl)
    a = np.asarray(jax.jit(ro_seq.frame_step)(
        params, inputs, jax.random.PRNGKey(6), None, ctrl).tokens)
    b = np.asarray(jax.jit(ro_spec.frame_step)(
        params, inputs, jax.random.PRNGKey(6), None, ctrl).tokens)
    assert (a == b).mean() >= 0.99, (a == b).mean()


@pytest.mark.slow
def test_bbox_spec_disable_flag():
    """speculative_bbox=False keeps the bbox segment sequential (fewer
    verify chunks) while map/image stay speculative."""
    _, model, params, ro_on = build_rules(4)
    _, _, _, ro_off = build_rules(4, speculative_bbox=False)
    raw = make_token_batch(model.layout, T=3, B=1, seed=5,
                           config=model.config)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    out_on = jax.jit(ro_on.frame_step)(params, inputs, jax.random.PRNGKey(7))
    out_off = jax.jit(ro_off.frame_step)(params, inputs,
                                         jax.random.PRNGKey(7))
    assert (np.asarray(out_on.tokens) == np.asarray(out_off.tokens)
            ).mean() >= 0.99
    assert int(out_on.spec_chunks) > int(out_off.spec_chunks)


@pytest.mark.slow
def test_sampled_bbox_spec_valid_stream():
    """Top-k bbox speculation: structural validity of the bbox segment."""
    cfg, model, params, ro = build_rules(4, sample_method="topk")
    raw = make_token_batch(model.layout, T=3, B=1, seed=6, config=cfg)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    out = jax.jit(ro.frame_step)(params, inputs, jax.random.PRNGKey(8))
    toks = np.asarray(out.tokens)
    lo = model.layout
    sl = lo.slices()
    bb = toks[0, sl["bbox3d"]]
    assert bb.min() >= 0 and bb.max() < cfg.bbox3d_vocab_size
    seg = lo.segment("bbox3d")
    assert toks[0, seg.start - 1] == seg.bos
    assert toks[0, seg.end - 1] == seg.eos
