"""Temporal-PE clamp: deep cached rollouts must never index untrained rows.

Round-3 diagnosis (PERFORMANCE.md "speculative acceptance"): the cached
path embedded each new frame at its ABSOLUTE stream slot, so rollouts
deeper than a checkpoint's trained window indexed untrained ``tpe`` rows
(garbage embeddings -> acceptance collapse 1.41 -> 0.23).  The reference
never hits this because it re-embeds the slid window every frame with
window-relative indices (ref:UMGen.py:1600-1603).

The structural fix (models/umgen.py add_pos_emb): indices SATURATE at
``config.tpe_clamp`` (default max_frame_len - 1) instead of wrapping —
the newest frame of a full window holds the last trained slot, matching
the reference's steady state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models.generate import Generator
from umgen_tpu.models.umgen import UMGen

BASE = dict(dtype="float32", param_dtype="float32",
            use_pallas_attention=False, rule_constrain=False,
            merge_ar_tar=False, tar_cache_dtype="float32",
            tar_mode="temporal_cache")


def _roll(cfg, params, frames=3):
    model = UMGen(cfg)
    cond = make_token_batch(model.layout, T=3, B=1, seed=0, config=cfg)
    return Generator(model, params, seed=7).generate(
        cond, new_frames=frames, cond_frames=20, input_cond_frames=3)


def test_add_pos_emb_saturates_not_wraps():
    cfg = ModelConfig(**BASE).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 2, 3, cfg.n_embd))
    deep = model.add_pos_emb(params, x, t_offset=cfg.max_frame_len + 5)
    last = model.add_pos_emb(params, x, t_offset=cfg.max_frame_len - 1)
    # every frame past the table end reuses the LAST row (saturation);
    # the old % wrap would have indexed rows 5 and 6 here
    np.testing.assert_allclose(np.asarray(deep[:, 0]),
                               np.asarray(last[:, 0]), atol=0)
    np.testing.assert_allclose(np.asarray(deep[:, 1]),
                               np.asarray(last[:, 0]), atol=0)


@pytest.mark.slow            # ~50 s: two full tiny-rollout compiles; the
def test_tpe_clamp_rows_beyond_trained_window_never_read():   # cheap
    """With tpe_clamp = trained_window - 1, NaN-poisoning every tpe row
    beyond the trained window must not change a single generated token —
    proof the cached path cannot touch untrained rows at any depth.
    (Fast tier keeps test_add_pos_emb_saturates_not_wraps, the index-level
    guarantee this rollout-level proof rides on.)"""
    cfg = ModelConfig(tpe_clamp=2, **BASE).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    out_clean = _roll(cfg, params)

    poisoned = dict(params)
    poisoned["tpe"] = params["tpe"].at[3:].set(jnp.nan)
    out_poisoned = _roll(cfg, poisoned)
    for m in out_clean:
        assert (out_clean[m] == out_poisoned[m]).all(), m


@pytest.mark.slow            # 32 s (full second tiny-model compile); a
def test_unclamped_depth_does_read_deep_rows():   # sensitivity check only
    """Sensitivity check for the test above: WITHOUT the tight clamp the
    same poisoned rows ARE read once the rollout passes frame 3, so the
    outputs must differ — i.e. the clamp is what provides the guarantee,
    not rollout shallowness."""
    cfg = ModelConfig(**BASE).scaled("tiny")     # default clamp: table end
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    out_clean = _roll(cfg, params)

    poisoned = dict(params)
    poisoned["tpe"] = params["tpe"].at[3:].set(jnp.nan)
    out_poisoned = _roll(cfg, poisoned)
    diff = any((out_clean[m] != out_poisoned[m]).any() for m in out_clean)
    assert diff
