"""Window-relative temporal PE (config.temporal_pe_mode="relative").

VERDICT r4 task 4: the absolute temporal-PE table (reference semantics,
ref:UMGen.py:483-515) bakes the frame slot into cached K/V, so deep cached
rollouts either index untrained rows or — with the r4 clamp — saturate
every deep frame to the SAME slot.  Relative mode moves temporal position
to the temporal-attention logits (a learned per-head distance bias,
`tpe_rel`), leaving embeddings and cached K/V PE-free: ring distances are
bounded by the window, so a depth-N cached frame is distributionally
identical to a window-anchored one at ANY N.

The headline test: with one layer per TAR stack (layer-1 temporal K/V
depend only on each frame's own tokens, so the StreamingLLM context
divergence is absent and PE anchoring is the ONLY cached-vs-recompute
difference), a cached rollout far past the window must reproduce the
slid-window recompute EXACTLY in relative mode — and must NOT in
absolute mode (the same comparison is the r3/r4 documented divergence).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models import modules as nn
from umgen_tpu.models.umgen import UMGen

D, H = 32, 4


def _ring_bias(tab, t, T_max):
    """Per-ring-slot bias for frame t (mirror of UMGen._t_bias_ring)."""
    ages = np.minimum((t - np.arange(T_max)) % T_max, tab.shape[1] - 1)
    return tab[:, ages]


def test_block_tar_bias_cached_matches_full():
    """block_tar with a [H, T, T] distance bias == sequential
    block_tar_decode with the per-slot ring bias (both decode variants)."""
    key = jax.random.PRNGKey(0)
    p = nn.init_block_tar(key, D, False, jnp.float32)
    B, T, S, T_max = 2, 5, 6, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, S, D))
    tab = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (H, T_max))) * 0.7

    rel = np.clip(np.arange(T)[:, None] - np.arange(T)[None, :],
                  0, T_max - 1)
    full = nn.block_tar(p, x, n_head=H, t_bias=jnp.asarray(tab[:, rel]))

    # in-place decode variant (writes its own slot, bias via slot ages)
    kv = (jnp.zeros((B * S, T_max, H, D // H)),
          jnp.zeros((B * S, T_max, H, D // H)))
    for t in range(T):
        y, kv = nn.block_tar_decode(
            p, x[:, t], H, kv, jnp.int32(t), jnp.int32(t + 1),
            t_bias=jnp.asarray(_ring_bias(tab, t, T_max)))
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, t]),
                                   atol=1e-4)

    # deferred variant (the production cached path: read-only rings +
    # caller scatter, self term separate)
    rk = jnp.zeros((B * S, T_max, H, D // H))
    rv = jnp.zeros((B * S, T_max, H, D // H))
    for t in range(T):
        bias = _ring_bias(tab, t, T_max)
        y, k_new, v_new = nn.block_tar_decode_deferred(
            p, x[:, t], H, rk, rv, jnp.int32(t), jnp.int32(t + 1),
            t_bias_ring=jnp.asarray(bias), t_bias_self=jnp.asarray(tab[:, 0]))
        rk = rk.at[:, t].set(k_new)
        rv = rv.at[:, t].set(v_new)
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, t]),
                                   atol=1e-4)


def _tiny_model(mode):
    cfg = ModelConfig(task="pose_map", dtype="float32",
                      param_dtype="float32", use_pallas_attention=False,
                      rule_constrain=False, tar_cache_dtype="float32",
                      tar_cache_window=3, tar_mode="temporal_cache",
                      temporal_pe_mode=mode).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    # a zero tpe_rel would make the relative path trivially bias-free —
    # randomize it so the window/ring bias plumbing is actually exercised
    params = dict(params)
    params["tpe_rel"] = jax.random.normal(
        jax.random.PRNGKey(3), params["tpe_rel"].shape) * 0.5
    return model, params


def _deep_vs_slid(mode):
    """(deep cached prior, slid-window recompute prior, same for ego)."""
    model, params = _tiny_model(mode)
    W = model.t_max                       # 3-frame ring
    T_total = 2 * W                       # depth 2x the window
    tokens = make_token_batch(model.layout, T=T_total, B=1, seed=0,
                              config=model.config)

    cache = model.init_tar_cache(B=1)
    prior = None
    for t in range(T_total):
        frame = {m: jnp.asarray(tokens[m][:, t:t + 1]) for m in tokens}
        out = model.tar_priors_cached(params, frame, cache, t)
        cache = out["cache"]
        prior = out["prior_seq"]

    window = {m: jnp.asarray(tokens[m][:, T_total - W:]) for m in tokens}
    prior_rc = model.tar_priors(params, window)["prior_seq"]

    ego_cache = model.init_tar_cache(B=1)
    ego = None
    for t in range(T_total):
        frame = {m: jnp.asarray(tokens[m][:, t:t + 1]) for m in tokens}
        ego, ego_cache = model.ego_logits_cached(params, frame, ego_cache,
                                                 t)
    ego_rc = model.ego_logits(params, window)
    return (np.asarray(prior), np.asarray(prior_rc),
            np.asarray(ego), np.asarray(ego_rc))


@pytest.mark.slow
def test_deep_rollout_matches_slid_recompute_in_relative_mode():
    prior, prior_rc, ego, ego_rc = _deep_vs_slid("relative")
    np.testing.assert_allclose(prior, prior_rc, atol=3e-4)
    np.testing.assert_allclose(ego, ego_rc, atol=3e-4)


@pytest.mark.slow
def test_deep_rollout_diverges_in_absolute_mode():
    """The contrast: identical procedure, absolute PEs — cached K/V keep
    their original absolute slots while the recompute re-anchors to
    0..W-1, so the two streams MUST differ (this gap is exactly what
    relative mode closes)."""
    prior, prior_rc, ego, ego_rc = _deep_vs_slid("absolute")
    assert np.max(np.abs(prior - prior_rc)) > 1e-3
    assert np.max(np.abs(ego - ego_rc)) > 1e-3


def test_relative_bias_reaches_gradients():
    """tpe_rel must be trainable: the temporal-attention output has
    nonzero gradient w.r.t. the distance table.  Block-level (a full
    tar_priors grad compiles 20+ s; the model-level wiring is already
    pinned by the exactness tests above — the same _t_bias_window
    product feeds apply_stack)."""
    p = nn.init_block_tar(jax.random.PRNGKey(0), D, False, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 6, D))
    T = 4

    def loss(tab):
        rel = jnp.clip(jnp.arange(T)[:, None] - jnp.arange(T)[None, :],
                       0, tab.shape[1] - 1)
        out = nn.block_tar(p, x, n_head=H, t_bias=tab[:, rel])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(jnp.zeros((H, 8)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.slow
def test_relative_mode_composes_with_quantized_serving():
    """The round-5 serving composition — relative PE x int8-everywhere x
    group-int4 TAR-family weights — must roll out end to end (pinned
    after the on-chip debug-scale CLI verification)."""
    from umgen_tpu.models.generate import Generator
    from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS,
                                            quantize_params_int8,
                                            quantize_params_w4)

    model, params = _tiny_model("relative")
    params = quantize_params_int8(params, keys=ALL_STACK_KEYS)
    params = quantize_params_w4(params)
    cond = make_token_batch(model.layout, T=3, B=1, seed=0,
                            config=model.config)
    out = Generator(model, params, seed=3).generate(
        cond, new_frames=2, cond_frames=model.t_max, input_cond_frames=3)
    for m in model.layout.mod_order:
        assert out[m].shape[1] == 5            # 3 cond + 2 generated
        assert (out[m] >= 0).all()
