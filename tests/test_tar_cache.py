"""Temporal-cache TAR fast path: equivalence with full recompute.

While the conditioning window is still growing (no slide yet) and temporal
PEs are absolute, the cached cascade must reproduce the recompute path
EXACTLY — same embeddings, same attention sets, same RNG consumption.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models import modules as nn
from umgen_tpu.models.generate import Generator
from umgen_tpu.models.umgen import UMGen

D, H = 32, 4


def test_block_tar_decode_matches_full():
    key = jax.random.PRNGKey(0)
    p = nn.init_block_tar(key, D, False, jnp.float32)
    B, T, S, T_max = 2, 5, 6, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, S, D))
    full = nn.block_tar(p, x, n_head=H)

    kv = (jnp.zeros((B * S, T_max, H, D // H)),
          jnp.zeros((B * S, T_max, H, D // H)))
    for t in range(T):
        y, kv = nn.block_tar_decode(p, x[:, t], H, kv, jnp.int32(t),
                                    jnp.int32(t + 1))
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, t]),
                                   atol=1e-4)


def test_block_tar_collect_kv_matches_block_tar():
    key = jax.random.PRNGKey(2)
    p = nn.init_block_tar(key, D, False, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 6, D))
    a = nn.block_tar(p, x, n_head=H)
    b, (k, v) = nn.block_tar_collect_kv(p, x, n_head=H)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert k.shape == (1 * 6, 4, H, D // H)


def test_prefill_then_decode_matches_full():
    """Ring prefill on T-1 frames + a cached step for frame T must equal the
    full forward."""
    key = jax.random.PRNGKey(4)
    p = nn.init_block_tar(key, D, False, jnp.float32)
    B, T, S, T_max = 1, 5, 6, 8
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, S, D))
    full = nn.block_tar(p, x, n_head=H)

    _, (k, v) = nn.block_tar_collect_kv(p, x[:, :T - 1], n_head=H)
    pad = [(0, 0), (0, T_max - (T - 1)), (0, 0), (0, 0)]
    kv = (jnp.pad(k, pad), jnp.pad(v, pad))
    y, _ = nn.block_tar_decode(p, x[:, T - 1], H, kv, jnp.int32(T - 1),
                               jnp.int32(T))
    np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, T - 1]),
                               atol=1e-4)


def _gen_pair(sample_method):
    base = dict(dtype="float32", param_dtype="float32",
                sample_method=sample_method, use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_cache_dtype="float32")
    cfg_r = ModelConfig(tar_mode="recompute", **base).scaled("tiny")
    cfg_c = ModelConfig(tar_mode="temporal_cache", **base).scaled("tiny")
    model_r, model_c = UMGen(cfg_r), UMGen(cfg_c)
    params = model_r.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(model_r.layout, T=3, B=1, seed=0, config=cfg_r)
    out_r = Generator(model_r, params, seed=7).generate(
        cond, new_frames=2, cond_frames=20, input_cond_frames=3)
    out_c = Generator(model_c, params, seed=7).generate(
        cond, new_frames=2, cond_frames=20, input_cond_frames=3)
    return out_r, out_c


@pytest.mark.slow
@pytest.mark.parametrize("sample_method", ["greedy", "topk"])
def test_cached_generation_matches_recompute(sample_method):
    """The two paths are mathematically identical pre-slide, but different
    matmul/reshape orders give fp32 epsilons that can flip an argmax on a
    near-tie — demand >= 99.8% token agreement across every modality."""
    out_r, out_c = _gen_pair(sample_method)
    for m in out_r:
        agree = (out_r[m] == out_c[m]).mean()
        assert agree >= 0.998, (m, agree)


def test_cached_priors_match_recompute_numerically():
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_cache_dtype="float32")
    cfg = ModelConfig(tar_mode="temporal_cache", **base).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(model.layout, T=3, B=1, seed=0, config=cfg)
    inputs = {k: jnp.asarray(v) for k, v in cond.items()}
    # recompute prior for the window
    pri_r = model.tar_priors(params, inputs)
    # cached prefill prior for the same (already-shifted-semantics) window
    cache = model.init_tar_cache(1)
    pri_c = model.prefill_tar_caches(params, inputs, cache)
    np.testing.assert_allclose(np.asarray(pri_c["prior_seq"]),
                               np.asarray(pri_r["prior_seq"]),
                               atol=2e-4)
    # and a cached single-frame step equals recompute on the grown window
    frame = {m: inputs[m][:, -1:] for m in model.layout.mod_order}
    grown = {m: jnp.concatenate([inputs[m], frame[m]], axis=1)
             for m in model.layout.mod_order}
    pri_r2 = model.tar_priors(params, grown)
    cache = pri_c["cache"]
    cache["frames"] = jnp.asarray(3, jnp.int32)
    pri_c2 = model.tar_priors_cached(params, frame, cache,
                                     jnp.asarray(3, jnp.int32))
    np.testing.assert_allclose(np.asarray(pri_c2["prior_seq"]),
                               np.asarray(pri_r2["prior_seq"]),
                               atol=2e-4)


def test_cached_fp8_runs_and_tracks_bf16():
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_mode="temporal_cache")
    cfg16 = ModelConfig(tar_cache_dtype="float32", **base).scaled("tiny")
    cfg8 = ModelConfig(tar_cache_dtype="float8_e4m3fn", **base).scaled("tiny")
    m16, m8 = UMGen(cfg16), UMGen(cfg8)
    params = m16.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(m16.layout, T=3, B=1, seed=0, config=cfg16)
    out16 = Generator(m16, params, seed=7).generate(
        cond, new_frames=1, cond_frames=20, input_cond_frames=3)
    out8 = Generator(m8, params, seed=7).generate(
        cond, new_frames=1, cond_frames=20, input_cond_frames=3)
    # fp8 ring quantization perturbs logits; with random weights greedy
    # choices are near-uniform so demand only structural sanity + majority
    # agreement on the dominant pad structure
    assert out8["map"].shape == out16["map"].shape
    agree = (out8["bbox3d"][:, -1] == out16["bbox3d"][:, -1]).mean()
    assert agree > 0.5


def test_q4_pack_roundtrip():
    """Nibble packing is exact for int4 values in [-7, 7]."""
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-7, 8, size=(3, 5, 4, 8)), jnp.int8)
    packed = nn.q4_pack(q)
    assert packed.shape == (3, 5, 4, 4)
    even = np.asarray(nn.q4_unpack_even(packed))
    odd = np.asarray(nn.q4_unpack_odd(packed))
    np.testing.assert_array_equal(even, np.asarray(q)[..., 0::2])
    np.testing.assert_array_equal(odd, np.asarray(q)[..., 1::2])


def test_block_tar_decode_deferred_q4_tracks_exact():
    """The packed-int4 ring attention approximates the exact deferred path:
    quantize a filled ring with per-(B, T, H) scales and compare outputs."""
    key = jax.random.PRNGKey(6)
    p = nn.init_block_tar(key, D, False, jnp.float32)
    B, S, T_max, Dh = 2, 6, 8, D // H
    N = B * S
    x = jax.random.normal(jax.random.PRNGKey(7), (B, S, D))
    ring_k = jax.random.normal(jax.random.PRNGKey(8), (N, T_max, H, Dh))
    ring_v = jax.random.normal(jax.random.PRNGKey(9), (N, T_max, H, Dh))
    slot, n_valid = jnp.int32(5), jnp.int32(5)

    y_ref, k_ref, v_ref = nn.block_tar_decode_deferred(
        p, x, H, ring_k, ring_v, slot, n_valid)

    def quant(a):          # per-(B, t, H) scales over (S, Dh)
        af = a.reshape(B, S, T_max, H, Dh)
        s = jnp.maximum(jnp.max(jnp.abs(af), axis=(1, 4)), 1e-6) / 7.0
        q = jnp.clip(jnp.round(af / s[:, None, :, :, None]), -7, 7)
        return nn.q4_pack(q.astype(jnp.int8).reshape(N, T_max, H, Dh)), s

    pk, sk = quant(ring_k)
    pv, sv = quant(ring_v)
    y_q4, k_q4, v_q4 = nn.block_tar_decode_deferred(
        p, x, H, pk, pv, slot, n_valid, ring_scale_k=sk, ring_scale_v=sv)

    # new K/V rows are computed pre-quantization — identical
    np.testing.assert_allclose(np.asarray(k_q4), np.asarray(k_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_q4), np.asarray(v_ref),
                               atol=1e-6)
    ref = np.asarray(y_ref)
    err = np.abs(np.asarray(y_q4) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.15, err


def test_q2_pack_roundtrip():
    """2-bit packing is exact for values in [-2, 1]."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(-2, 2, size=(3, 5, 4, 8)), jnp.int8)
    packed = nn.q2_pack(q)
    assert packed.shape == (3, 5, 4, 2)
    for j in range(4):
        np.testing.assert_array_equal(np.asarray(nn.q2_unpack(packed, j)),
                                      np.asarray(q)[..., j::4])


def test_block_tar_decode_deferred_q2_tracks_exact():
    """The 2-bit ring attention with channel equalizers approximates the
    exact deferred path.  Tolerance is looser than int4 (4 levels/channel),
    but the folded algebra — equalizer on the query/output, +0.5 offset as
    rank-1 corrections — must keep the error bounded and the new K/V rows
    exact."""
    key = jax.random.PRNGKey(6)
    p = nn.init_block_tar(key, D, False, jnp.float32)
    B, S, T_max, Dh = 2, 6, 8, D // H
    N = B * S
    x = jax.random.normal(jax.random.PRNGKey(7), (B, S, D))
    # give channels distinct magnitudes so the equalizer matters
    cmag = jnp.exp(jax.random.normal(jax.random.PRNGKey(10), (H, Dh)))
    ring_k = jax.random.normal(jax.random.PRNGKey(8),
                               (N, T_max, H, Dh)) * cmag
    ring_v = jax.random.normal(jax.random.PRNGKey(9),
                               (N, T_max, H, Dh)) * cmag
    slot, n_valid = jnp.int32(5), jnp.int32(5)

    y_ref, k_ref, v_ref = nn.block_tar_decode_deferred(
        p, x, H, ring_k, ring_v, slot, n_valid)

    def quant(a):
        af = a.reshape(B, S, T_max, H, Dh)
        c = jnp.maximum(jnp.max(jnp.abs(af), axis=(1, 2)), 1e-6)
        ae = af / c[:, None, None]
        s = jnp.maximum(jnp.max(jnp.abs(ae), axis=(1, 4)), 1e-6) / 1.5
        q = jnp.clip(jnp.round(ae / s[:, None, :, :, None] - 0.5), -2, 1)
        return (nn.q2_pack(q.astype(jnp.int8).reshape(N, T_max, H, Dh)),
                s, c)

    pk, sk, ck = quant(ring_k)
    pv, sv, cv = quant(ring_v)
    y_q2, k_q2, v_q2 = nn.block_tar_decode_deferred(
        p, x, H, pk, pv, slot, n_valid, ring_scale_k=sk, ring_scale_v=sv,
        ring_chan_k=ck, ring_chan_v=cv, ring_bits=2)

    np.testing.assert_allclose(np.asarray(k_q2), np.asarray(k_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_q2), np.asarray(v_ref),
                               atol=1e-6)
    ref = np.asarray(y_ref)
    err = np.abs(np.asarray(y_q2) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.35, err
    # and the equalized path must beat equalizer-free int2 on this
    # channel-skewed ring (the design's reason to exist)
    ones = jnp.ones_like(ck)

    def quant_flat(a):
        af = a.reshape(B, S, T_max, H, Dh)
        s = jnp.maximum(jnp.max(jnp.abs(af), axis=(1, 4)), 1e-6) / 1.5
        q = jnp.clip(jnp.round(af / s[:, None, :, :, None] - 0.5), -2, 1)
        return (nn.q2_pack(q.astype(jnp.int8).reshape(N, T_max, H, Dh)), s)

    fk, fsk = quant_flat(ring_k)
    fv, fsv = quant_flat(ring_v)
    y_flat, _, _ = nn.block_tar_decode_deferred(
        p, x, H, fk, fv, slot, n_valid, ring_scale_k=fsk, ring_scale_v=fsv,
        ring_chan_k=ones, ring_chan_v=ones, ring_bits=2)
    err_flat = np.abs(np.asarray(y_flat) - ref).max() / (
        np.abs(ref).max() + 1e-9)
    assert err < err_flat, (err, err_flat)


def test_cached_int2_runs_and_tracks_fp32():
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_mode="temporal_cache")
    cfg32 = ModelConfig(tar_cache_dtype="float32", **base).scaled("tiny")
    cfg2 = ModelConfig(tar_cache_dtype="int2", **base).scaled("tiny")
    m32, m2 = UMGen(cfg32), UMGen(cfg2)
    params = m32.init_params(jax.random.PRNGKey(0))
    cache = m2.init_tar_cache(2)
    k, v, sk, sv, ck, cv = cache["tar"]
    assert k.dtype == jnp.int8 and k.shape[-1] == m2.config.head_dim // 4
    assert sk.shape == (k.shape[0], 2, m2.t_max, m2.config.n_head)
    assert ck.shape == (k.shape[0], 2, m2.config.n_head,
                        m2.config.head_dim)
    cond = make_token_batch(m32.layout, T=3, B=1, seed=0, config=cfg32)
    out32 = Generator(m32, params, seed=7).generate(
        cond, new_frames=1, cond_frames=20, input_cond_frames=3)
    out2 = Generator(m2, params, seed=7).generate(
        cond, new_frames=1, cond_frames=20, input_cond_frames=3)
    assert out2["map"].shape == out32["map"].shape
    agree = (out2["bbox3d"][:, -1] == out32["bbox3d"][:, -1]).mean()
    assert agree > 0.5


def test_cached_int4_runs_and_tracks_fp32():
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_mode="temporal_cache")
    cfg32 = ModelConfig(tar_cache_dtype="float32", **base).scaled("tiny")
    cfg4 = ModelConfig(tar_cache_dtype="int4", **base).scaled("tiny")
    m32, m4 = UMGen(cfg32), UMGen(cfg4)
    params = m32.init_params(jax.random.PRNGKey(0))
    cache = m4.init_tar_cache(2)
    k, v, sk, sv = cache["tar"]
    assert k.dtype == jnp.int8 and k.shape[-1] == m4.config.head_dim // 2
    assert sk.shape == (k.shape[0], 2, m4.t_max, m4.config.n_head)
    cond = make_token_batch(m32.layout, T=3, B=1, seed=0, config=cfg32)
    out32 = Generator(m32, params, seed=7).generate(
        cond, new_frames=1, cond_frames=20, input_cond_frames=3)
    out4 = Generator(m4, params, seed=7).generate(
        cond, new_frames=1, cond_frames=20, input_cond_frames=3)
    assert out4["map"].shape == out32["map"].shape
    agree = (out4["bbox3d"][:, -1] == out32["bbox3d"][:, -1]).mean()
    assert agree > 0.5


@pytest.mark.slow
def test_chunked_prefill_matches_full():
    """Frame-by-frame ring ingestion produces the same generation as the
    full-window prefill program (identical math + RNG path)."""
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_cache_dtype="float32", tar_mode="temporal_cache")
    cfg_f = ModelConfig(**base).scaled("tiny")
    cfg_c = ModelConfig(chunked_prefill=True, **base).scaled("tiny")
    m_f, m_c = UMGen(cfg_f), UMGen(cfg_c)
    params = m_f.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(m_f.layout, T=3, B=2, seed=0, config=cfg_f)
    out_f = Generator(m_f, params, seed=7).generate(
        cond, new_frames=2, cond_frames=20, input_cond_frames=3)
    out_c = Generator(m_c, params, seed=7).generate(
        cond, new_frames=2, cond_frames=20, input_cond_frames=3)
    for m in out_f:
        agree = (out_f[m] == out_c[m]).mean()
        assert agree >= 0.998, (m, agree)


def test_ring_window_shorter_than_prefill():
    """tar_cache_window < conditioning length: prefill scatters the last
    `window` frames at their absolute ring slots; subsequent frames evict
    the oldest.  Smoke + structural check (semantics differ from recompute
    by design)."""
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_cache_dtype="float32", tar_mode="temporal_cache",
                tar_cache_window=2)
    cfg = ModelConfig(**base).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(model.layout, T=3, B=1, seed=0, config=cfg)
    out = Generator(model, params, seed=3).generate(
        cond, new_frames=3, cond_frames=20, input_cond_frames=3)
    assert out["pose"].shape == (1, 6, 3)
    toks = out["map"][:, 3:]
    assert toks.min() >= 0 and toks.max() < 8192


@pytest.mark.slow
def test_cached_control_matches_recompute():
    """Agent control on the cached path must reproduce recompute control
    token-for-token under greedy (VERDICT r2 task 4): the overwrite of
    the newest window frame is applied before ring ingestion, matching
    the reference's persistent in-place window mutation
    (ref:UMGen.py:1464-1467) which both paths now mirror."""
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_cache_dtype="float32")
    cfg_r = ModelConfig(tar_mode="recompute", **base).scaled("tiny")
    cfg_c = ModelConfig(tar_mode="temporal_cache", **base).scaled("tiny")
    model_r, model_c = UMGen(cfg_r), UMGen(cfg_c)
    params = model_r.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(model_r.layout, T=3, B=1, seed=0, config=cfg_r)
    n_new = 3
    traj = (np.arange(n_new * 3, dtype=np.int32).reshape(1, n_new, 3)
            % 1024)
    ctrl = np.full((1, n_new, 660), -1, np.int64)
    # control two object slots with in-vocab tokens; vary per frame so a
    # stale (non-persistent) window copy would be caught
    for t in range(n_new):
        ctrl[:, t, :11] = 200 + t
        ctrl[:, t, 11:22] = 400 + t
    kw = dict(new_frames=n_new, cond_frames=20, input_cond_frames=3,
              init_tokens={"pose": traj, "bbox3d": ctrl},
              control_test=True)
    out_r = Generator(model_r, params, seed=7).generate(cond, **kw)
    out_c = Generator(model_c, params, seed=7).generate(cond, **kw)
    np.testing.assert_array_equal(out_r["pose"], out_c["pose"])
    for m in out_r:
        agree = (out_r[m] == out_c[m]).mean()
        assert agree >= 0.998, (m, agree)


@pytest.mark.slow
def test_ring_refresh_matches_recompute_post_slide():
    """tar_cache_refresh=1 rebuilds the rings from the exact last-W
    window every frame — the cached stream must then match sliding-window
    recompute (the reference semantics, ref:UMGen.py:1600-1603) even
    AFTER the window slides, where pure ring retention diverges by
    design."""
    base = dict(dtype="float32", param_dtype="float32",
                sample_method="greedy", use_pallas_attention=False,
                rule_constrain=False, merge_ar_tar=False,
                tar_cache_dtype="float32")
    W = 2
    cfg_r = ModelConfig(tar_mode="recompute", **base).scaled("tiny")
    cfg_c = ModelConfig(tar_mode="temporal_cache", tar_cache_window=W,
                        tar_cache_refresh=1, **base).scaled("tiny")
    model_r, model_c = UMGen(cfg_r), UMGen(cfg_c)
    params = model_r.init_params(jax.random.PRNGKey(0))
    cond = make_token_batch(model_r.layout, T=W, B=1, seed=0, config=cfg_r)
    out_r = Generator(model_r, params, seed=7).generate(
        cond, new_frames=4, cond_frames=W, input_cond_frames=W)
    out_c = Generator(model_c, params, seed=7).generate(
        cond, new_frames=4, cond_frames=W, input_cond_frames=W)
    for m in out_r:
        agree = (out_r[m] == out_c[m]).mean()
        assert agree >= 0.998, (m, agree)
