"""Fused Pallas decode-step kernel vs the XLA oar_step (TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.models import modules as nn
from umgen_tpu.models.rollout import Rollout
from umgen_tpu.models.umgen import UMGen
from umgen_tpu.runtime.quantize import quantize_params_int8

tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="real-Mosaic Pallas kernel test (logic is also covered on CPU "
           "by the interpret-mode tests below)")


@tpu_only
def test_fused_decode_matches_xla():
    from umgen_tpu.ops.decode_kernel import fused_decode_step

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    B, S = 1, 256
    rng = np.random.default_rng(0)
    kv_k = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                           cfg.head_dim)), jnp.bfloat16)
    kv_v = jnp.asarray(rng.normal(0, 0.5, kv_k.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)
    cl = jnp.int32(100)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_k, kv_v, cl)
    h_f, kk_f, _ = fused_decode_step(pq["oar"], x, kv_k, kv_v, cl,
                                     n_head=cfg.n_head)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    # int8-activation quantization + bf16 residual rounding tolerance
    assert np.abs(a - b).max() / np.abs(a).max() < 0.05
    np.testing.assert_allclose(np.asarray(kk_ref.astype(jnp.float32)),
                               np.asarray(kk_f.astype(jnp.float32)),
                               atol=0.05)


@tpu_only
@pytest.mark.parametrize("kv_dtype,cl", [("bfloat16", 100), ("bfloat16", 0),
                                         ("int8", 100)])
def test_fused_v2_matches_xla(kv_dtype, cl):
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v2,
                                             pack_fused_oar, KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar(pq["oar"])
    B, S = 2, 1104
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    if kv_dtype == "int8":
        kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                      -127, 127).astype(jnp.int8)
        vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                      -127, 127).astype(jnp.int8)
        tol = 0.08      # int8 KV grid adds quantization noise
    else:
        kv, vv, tol = kv_bf, vv_bf, 0.05
    h_f, kk_f, _ = fused_decode_step_v2(packed, x, kv, vv, jnp.int32(cl),
                                        n_head=cfg.n_head)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < tol
    # written K rows match at the cache_len position
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl]
    krow_f = np.asarray(kk_f.astype(jnp.float32))[:, :, cl]
    if kv_dtype == "int8":
        krow_f = krow_f / KV_INT8_SCALE
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.1)


@tpu_only
@pytest.mark.parametrize("cl", [0, 100, 900])
def test_fused_v4_matches_xla(cl):
    """v4 (balanced streams, whole-batch MXU attention) vs the XLA step."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v4,
                                             pack_fused_oar_v4,
                                             KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar_v4(pq["oar"])
    B, S = 2, 1104
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    h_f, kk_f, _ = fused_decode_step_v4(packed, x, kv, vv, jnp.int32(cl),
                                        n_head=cfg.n_head)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.08
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl]
    krow_f = np.asarray(kk_f.astype(jnp.float32))[:, :, cl] / KV_INT8_SCALE
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.1)


@tpu_only
@pytest.mark.parametrize("cl,flat", [(0, True), (100, True), (900, True),
                                     (100, False)])
def test_fused_v5_matches_xla(cl, flat):
    """v5 (static DMA pipeline, v3 compute) vs the XLA step, in both the
    flat [L, B, S, H*Dh] cache layout (the serving default: a 5-D cache is
    lane-padded by XLA and costs a physical relayout copy per step) and
    the 5-D layout."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v5,
                                             pack_fused_oar,
                                             KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar(pq["oar"])
    B, S = 2, 1104
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    if flat:
        kv = kv.reshape(4, B, S, cfg.n_head * cfg.head_dim)
        vv = vv.reshape(4, B, S, cfg.n_head * cfg.head_dim)
    h_f, kk_f, _ = fused_decode_step_v5(packed, x, kv, vv, jnp.int32(cl),
                                        n_head=cfg.n_head)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.08
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl]
    krow_f = np.asarray(kk_f.astype(jnp.float32))[:, :, cl] / KV_INT8_SCALE
    if flat:
        krow_f = krow_f.reshape(krow_ref.shape)
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.1)


@tpu_only
@pytest.mark.parametrize("cl", [0, 100, 101, 907])
def test_fused_v6_matches_xla(cl):
    """v6 (in-kernel aliased cache append) vs the XLA step on the flat
    cache: hidden output parity plus the appended row landing at `cl`
    with every other cache row preserved."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v6,
                                             pack_fused_oar,
                                             KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar(pq["oar"])
    B, S = 2, 1104
    HD = cfg.n_head * cfg.head_dim
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8).reshape(4, B, S, HD)
    vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8).reshape(4, B, S, HD)
    kv_before = np.asarray(kv)
    h_f, kk_f, vv_f = fused_decode_step_v6(packed, x, kv, vv,
                                           jnp.int32(cl),
                                           n_head=cfg.n_head)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.08
    kk_f = np.asarray(kk_f)
    # appended row parity
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl
                                                      ].reshape(4, B, HD)
    np.testing.assert_allclose(krow_ref,
                               kk_f[:, :, cl].astype(np.float32)
                               / KV_INT8_SCALE, atol=0.1)
    # every other row untouched
    mask = np.ones(S, bool)
    mask[cl] = False
    np.testing.assert_array_equal(kk_f[:, :, mask], kv_before[:, :, mask])


@tpu_only
@pytest.mark.parametrize("cl,bb", [(100, 0), (900, 0), (100, 1), (900, 1)])
def test_fused_w4_matches_xla(cl, bb):
    """W4A8 kernel vs the UN-quantized bf16 XLA step: int4 group
    quantization adds real error — assert it stays within the documented
    serving envelope (<15% rel on the hidden state at 4 layers).  bb=1
    exercises the batch-split grid (2 groups of 1 scene at B=2)."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_w4,
                                             pack_fused_oar_w4,
                                             KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    packed = pack_fused_oar_w4(params["oar"])
    B, S = 2, 1104
    HD = cfg.n_head * cfg.head_dim
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(params, x, kv_bf, vv_bf, jnp.int32(cl))
    kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8).reshape(4, B, S, HD)
    vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8).reshape(4, B, S, HD)
    h_f, kk_f, _ = fused_decode_step_w4(packed, x, kv, vv, jnp.int32(cl),
                                        n_head=cfg.n_head, batch_block=bb)
    h_f = nn.layer_norm(params["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.15, rel
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl
                                                      ].reshape(4, B, HD)
    krow_f = np.asarray(kk_f)[:, :, cl].astype(np.float32) / KV_INT8_SCALE
    # int4 weight error flows into k_new; gate placement + coarse value
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.35)


@tpu_only
@pytest.mark.parametrize("cl,B", [(0, 2), (100, 2), (900, 2), (907, 6)])
def test_fused_v7_matches_xla(cl, B):
    """v7 (block-diagonal batched attention — one MXU dot pair per
    (layer, S-block) for ALL scenes) vs the XLA step on the flat cache."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v7,
                                             pack_fused_oar,
                                             KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar(pq["oar"])
    S = 1104
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    kv = kv.reshape(4, B, S, cfg.n_head * cfg.head_dim)
    vv = vv.reshape(4, B, S, cfg.n_head * cfg.head_dim)
    h_f, kk_f, _ = fused_decode_step_v7(packed, x, kv, vv, jnp.int32(cl),
                                        n_head=cfg.n_head)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.08
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl]
    krow_f = (np.asarray(kk_f.astype(jnp.float32))[:, :, cl]
              / KV_INT8_SCALE).reshape(krow_ref.shape)
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.1)


@tpu_only
@pytest.mark.parametrize("cl,B,bb", [(100, 4, 2), (907, 4, 2), (100, 4, 1),
                                     (907, 6, 3)])
def test_fused_v5_batch_block_matches_xla(cl, B, bb):
    """v5 with the batch-split grid (batch groups on an innermost grid
    dim, shared per-(layer, S-block) weight fetches) vs the XLA step on
    the flat cache."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v5,
                                             pack_fused_oar,
                                             KV_INT8_SCALE)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar(pq["oar"])
    S = 1104
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    kv = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    vv = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * KV_INT8_SCALE),
                  -127, 127).astype(jnp.int8)
    kv = kv.reshape(4, B, S, cfg.n_head * cfg.head_dim)
    vv = vv.reshape(4, B, S, cfg.n_head * cfg.head_dim)
    h_f, kk_f, _ = fused_decode_step_v5(packed, x, kv, vv, jnp.int32(cl),
                                        n_head=cfg.n_head, batch_block=bb)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.08
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl]
    krow_f = (np.asarray(kk_f.astype(jnp.float32))[:, :, cl]
              / KV_INT8_SCALE).reshape(krow_ref.shape)
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.1)


@tpu_only
@pytest.mark.parametrize("cl,B,bb", [(100, 2, 0), (900, 2, 0), (907, 4, 2)])
def test_fused_v5i4_matches_xla(cl, B, bb):
    """int4-KV kernel (per-(row, head) absmax scales folded into the
    flash update) vs the XLA step on a bf16 cache: int4 storage adds
    real quantization error — assert the hidden state stays within the
    serving envelope at 4 layers."""
    from umgen_tpu.ops.decode_kernel import (fused_decode_step_v5i4,
                                             pack_fused_oar,
                                             quantize_kv_int4)

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=4)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 4,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = pack_fused_oar(pq["oar"])
    S = 1104
    HD = cfg.n_head * cfg.head_dim
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (4, B, S, cfg.n_head,
                                            cfg.head_dim)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    kp, ks = quantize_kv_int4(kv_bf.reshape(4, B, S, HD), cfg.n_head)
    vp, vs = quantize_kv_int4(vv_bf.reshape(4, B, S, HD), cfg.n_head)
    h_f, kk4, _, ks2, _ = fused_decode_step_v5i4(
        packed, x, kp, vp, ks, vs, jnp.int32(cl), n_head=cfg.n_head,
        batch_block=bb)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    a = np.asarray(h_ref, np.float32)
    b = np.asarray(h_f, np.float32)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.15, rel
    # appended row at cl dequantizes back to the reference K row
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl]  # [4,B,H,Dh]
    p4 = np.asarray(kk4)[:, :, cl].astype(np.int32)
    lo = (p4 << 28) >> 28
    hi = p4 >> 4
    q = np.concatenate([lo, hi], axis=-1).astype(np.float32)
    s = np.asarray(ks2)[:, :, cl]                                # [4,B,H]
    deq = (q.reshape(4, B, cfg.n_head, cfg.head_dim)
           * (s[..., None] / 7.0))
    np.testing.assert_allclose(krow_ref, deq.reshape(krow_ref.shape),
                               atol=0.2)


@pytest.fixture()
def interpret_kernels(monkeypatch):
    """Run the module's pallas_calls in interpret mode (CPU-runnable).

    jax 0.9 interprets PrefetchScalarGridSpec correctly, so the fused
    kernels' logic — including the batch-split grid's dynamic scratch
    rows — gets CI coverage without a TPU; the @tpu_only tests remain
    the authority on Mosaic lowering and performance."""
    import functools as ft
    from jax.experimental import pallas as pl
    from umgen_tpu.ops import decode_kernel as dk
    monkeypatch.setattr(dk.pl, "pallas_call",
                        ft.partial(pl.pallas_call, interpret=True))


def test_v5_and_v5i4_interpret_match_xla(interpret_kernels):
    """v5 (int8 cache) and v5i4 (int4 cache), whole-batch and batch-split
    grids, vs the XLA oar_step — interpret mode on CPU."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = dk.pack_fused_oar(pq["oar"])
    B, S = 2, 512
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, H, Dh)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)
    cl = jnp.int32(300)

    h_ref, _, _ = ro.oar_step(pq, x, kv_bf, vv_bf, cl)
    a = np.asarray(h_ref, np.float32)

    kv8 = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    vv8 = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    for bb in (0, 1):
        h_f, _, _ = dk.fused_decode_step_v5(packed, x, kv8, vv8, cl,
                                            n_head=H, batch_block=bb)
        h_f = nn.layer_norm(pq["ln_oar"], h_f)
        b = np.asarray(h_f, np.float32)
        assert np.abs(a - b).max() / np.abs(a).max() < 0.05, bb

    kp, ks = dk.quantize_kv_int4(kv_bf.reshape(2, B, S, HD), H)
    vp, vs = dk.quantize_kv_int4(vv_bf.reshape(2, B, S, HD), H)
    for bb in (0, 1):
        h_f, _, _, _, _ = dk.fused_decode_step_v5i4(
            packed, x, kp, vp, ks, vs, cl, n_head=H, batch_block=bb)
        h_f = nn.layer_norm(pq["ln_oar"], h_f)
        b = np.asarray(h_f, np.float32)
        assert np.abs(a - b).max() / np.abs(a).max() < 0.06, bb


def test_w4_interpret_matches_xla(interpret_kernels):
    """W4A8 kernel (int4 group-128 weights), whole-batch and batch-split,
    vs the un-quantized XLA step — interpret mode on CPU."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    packed = dk.pack_fused_oar_w4(params["oar"])
    B, S = 2, 512
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, H, Dh)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)
    cl = jnp.int32(300)

    h_ref, _, _ = ro.oar_step(params, x, kv_bf, vv_bf, cl)
    a = np.asarray(h_ref, np.float32)
    kv8 = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    vv8 = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    for bb in (0, 1):
        h_f, _, _ = dk.fused_decode_step_w4(packed, x, kv8, vv8, cl,
                                            n_head=H, batch_block=bb)
        h_f = nn.layer_norm(params["ln_oar"], h_f)
        b = np.asarray(h_f, np.float32)
        # int4 group weights add real error (documented envelope)
        assert np.abs(a - b).max() / np.abs(a).max() < 0.12, bb


def test_w4i4_interpret_matches_xla(interpret_kernels):
    """w4i4 (int4 weights + int4 KV — the minimum-bytes step), whole-batch
    and batch-split, vs the un-quantized XLA step — interpret mode."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    packed = dk.pack_fused_oar_w4(params["oar"])
    B, S = 2, 512
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, H, Dh)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, 1, d)), jnp.bfloat16)
    cl = jnp.int32(300)

    h_ref, _, _ = ro.oar_step(params, x, kv_bf, vv_bf, cl)
    a = np.asarray(h_ref, np.float32)
    kp, ks = dk.quantize_kv_int4(kv_bf.reshape(2, B, S, HD), H)
    vp, vs = dk.quantize_kv_int4(vv_bf.reshape(2, B, S, HD), H)
    for bb in (0, 1):
        h_f, _, _, _, _ = dk.fused_decode_step_w4i4(
            packed, x, kp, vp, ks, vs, cl, n_head=H, batch_block=bb)
        h_f = nn.layer_norm(params["ln_oar"], h_f)
        b = np.asarray(h_f, np.float32)
        # int4 weights + int4 KV stack both quantization errors
        assert np.abs(a - b).max() / np.abs(a).max() < 0.15, bb


@pytest.mark.parametrize("Q,cl", [(8, 300), (8, 0), (4, 117)])
def test_v5mq_interpret_matches_xla(interpret_kernels, Q, cl):
    """v5mq multi-query verify kernel vs the XLA multi-row oar_step —
    interpret mode on CPU.  Covers the lane-packed Q*H = 128 case (K=8
    speculative chunks), a non-full lane pack (Q=4), and an empty prefix."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = dk.pack_fused_oar(pq["oar"])
    B, S = 2, 512
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, H, Dh)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, Q, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    a = np.asarray(h_ref, np.float32)

    kv8 = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    vv8 = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    h_f, kk_f, _ = dk.fused_decode_step_v5mq(packed, x, kv8, vv8,
                                             jnp.int32(cl), n_head=H)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.06

    # written K rows match over the whole chunk [cl, cl+Q)
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl:cl + Q]
    krow_f = (np.asarray(kk_f.astype(jnp.float32))[:, :, cl:cl + Q]
              / dk.KV_INT8_SCALE).reshape(krow_ref.shape)
    np.testing.assert_allclose(krow_ref, krow_f, atol=0.1)


@pytest.mark.parametrize("Q,cl", [(8, 300), (4, 0)])
def test_v5mqi4_interpret_matches_xla(interpret_kernels, Q, cl):
    """v5mqi4 (multi-query on the int4 packed cache) vs the XLA multi-row
    oar_step — interpret mode on CPU."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    pq = quantize_params_int8(params)
    packed = dk.pack_fused_oar(pq["oar"])
    B, S = 2, 512
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, H, Dh)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, Q, d)), jnp.bfloat16)

    h_ref, kk_ref, _ = ro.oar_step(pq, x, kv_bf, vv_bf, jnp.int32(cl))
    a = np.asarray(h_ref, np.float32)

    kp, ks = dk.quantize_kv_int4(kv_bf.reshape(2, B, S, HD), H)
    vp, vs = dk.quantize_kv_int4(vv_bf.reshape(2, B, S, HD), H)
    h_f, kpo, _, kso, _ = dk.fused_decode_step_v5mqi4(
        packed, x, kp, vp, ks, vs, jnp.int32(cl), n_head=H)
    h_f = nn.layer_norm(pq["ln_oar"], h_f)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.07

    # written rows dequantize back to the reference chunk K rows
    krow_ref = np.asarray(kk_ref.astype(jnp.float32))[:, :, cl:cl + Q]
    p = np.asarray(kpo)[:, :, cl:cl + Q].astype(np.int8)
    lo = ((p & 0xF) ^ 8).astype(np.int8) - 8
    hi = (p >> 4).astype(np.int8)
    qrow = np.concatenate([lo, hi], axis=-1).astype(np.float32)
    s = np.asarray(kso)[:, :, cl:cl + Q]                  # [L,B,Q,H]
    deq = (qrow.reshape(2, B, Q, H, Dh)
           * (s[..., None] / 7.0)).reshape(krow_ref.shape)
    np.testing.assert_allclose(krow_ref, deq, atol=0.2)


def _mk_quantized_rollout(oar_cache_dtype, **cfg_kw):
    from umgen_tpu.runtime.quantize import pack_fused, quantize_params_int8

    cfg = ModelConfig(oar_cache_dtype=oar_cache_dtype, n_oar_layer=2,
                      fused_oar_kernel=True, **cfg_kw)
    ro = Rollout(UMGen(cfg))
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    return ro, params, pack_fused(quantize_params_int8(params)), cfg


def test_oar_step_dispatches_multiquery_kernels(interpret_kernels,
                                                monkeypatch):
    """rollout.oar_step (int8 flat) and _oar_step_int4 (PackedKV) must
    route chunk-sized Q>1 pushes to the fused multi-query kernels — a
    broken gate would silently fall back to the slow XLA body (the
    headline of the v5mq/v5mqi4 change)."""
    from umgen_tpu.models.rollout import PackedKV
    from umgen_tpu.ops import decode_kernel as dk

    B, S, Q = 2, 512, 8
    H = ModelConfig().n_head
    Dh = ModelConfig().head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv8 = jnp.zeros((2, B, S, HD), jnp.int8)
    x = jnp.asarray(rng.normal(0, 1, (B, Q, 768)), jnp.bfloat16)
    cl = jnp.int32(300)

    hits = []
    real_mq, real_mqi4 = (dk.fused_decode_step_v5mq,
                          dk.fused_decode_step_v5mqi4)
    monkeypatch.setattr(dk, "fused_decode_step_v5mq",
                        lambda *a, **k: (hits.append("mq"),
                                         real_mq(*a, **k))[1])
    monkeypatch.setattr(dk, "fused_decode_step_v5mqi4",
                        lambda *a, **k: (hits.append("mqi4"),
                                         real_mqi4(*a, **k))[1])

    ro8, params8, pq8, _ = _mk_quantized_rollout("int8")
    h, _, _ = ro8.oar_step(pq8, x, kv8, kv8, cl)
    assert hits == ["mq"] and h.shape == (B, Q, 768)

    ro4, params4, pq4, _ = _mk_quantized_rollout("int4")
    kvp = PackedKV(jnp.zeros((2, B, S, HD // 2), jnp.int8),
                   jnp.ones((2, B, S, H), jnp.float32))
    h, kk, _ = ro4.oar_step(pq4, x, kvp, kvp, cl)
    assert hits == ["mq", "mqi4"] and h.shape == (B, Q, 768)
    assert kk.packed.shape == (2, B, S, HD // 2)

    # with the batch-split knob the mq kernels still engage (they grew
    # a batch-split grid in round 3 — what lets speculative decoding
    # compose with the B=8 bb=4 serving default)
    hits.clear()
    ro_bb, _, pq_bb, _ = _mk_quantized_rollout("int8", oar_batch_block=2)
    ro_bb.oar_step(pq_bb, x, kv8, kv8, cl)
    assert hits == ["mq"]


def test_rollout_speculative_guards():
    """Construction guards for speculative decoding combinations."""
    import pytest as _pytest

    ModelConfig  # keep flake quiet
    with _pytest.raises(ValueError, match="fused_oar_kernel"):
        Rollout(UMGen(ModelConfig(speculative_k=8, oar_cache_dtype="int4",
                                  fused_oar_kernel=False)))
    with _pytest.raises(ValueError, match="128"):
        Rollout(UMGen(ModelConfig(speculative_k=16, oar_cache_dtype="int4",
                                  fused_oar_kernel=True)))
    with _pytest.raises(ValueError, match="oar_batch_block"):
        # batch-split speculation needs the fused batch-split mq kernels
        Rollout(UMGen(ModelConfig(speculative_k=8, fused_oar_kernel=False,
                                  oar_batch_block=2)))
    # allowed: int4 + speculative with fused kernels on
    Rollout(UMGen(ModelConfig(speculative_k=8, oar_cache_dtype="int4",
                              fused_oar_kernel=True)))
    # allowed since round 3: speculative + batch-split with fused kernels
    Rollout(UMGen(ModelConfig(speculative_k=8, fused_oar_kernel=True,
                              oar_batch_block=2)))


@pytest.mark.parametrize("Q,cl", [(8, 150), (4, 0)])
def test_w4mq_interpret_matches_xla(interpret_kernels, Q, cl):
    """w4mq / w4mqi4 (W4A8 weights, multi-query) vs the un-quantized XLA
    multi-row step — interpret mode on CPU (small S: interpret executes
    on the host and the w4 nibble unpack is the slowest interpret op)."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    model = UMGen(cfg)
    ro = Rollout(model)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16),
              "ln_oar": nn.init_layernorm(d, jnp.bfloat16)}
    packed = dk.pack_fused_oar_w4(params["oar"])
    B, S = 2, 256
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(0)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, H, Dh)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, Q, d)), jnp.bfloat16)

    h_ref, _, _ = ro.oar_step(params, x, kv_bf, vv_bf, jnp.int32(cl))
    a = np.asarray(h_ref, np.float32)

    kv8 = jnp.clip(jnp.round(kv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    vv8 = jnp.clip(jnp.round(vv_bf.astype(jnp.float32) * dk.KV_INT8_SCALE),
                   -127, 127).astype(jnp.int8).reshape(2, B, S, HD)
    h_f, _, _ = dk.fused_decode_step_w4mq(packed, x, kv8, vv8,
                                          jnp.int32(cl), n_head=H)
    h_f = nn.layer_norm(params["ln_oar"], h_f)
    b = np.asarray(h_f, np.float32)
    # int4 group weights add real error (documented envelope)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.12

    kp, ks = dk.quantize_kv_int4(kv_bf.reshape(2, B, S, HD), H)
    vp, vs = dk.quantize_kv_int4(vv_bf.reshape(2, B, S, HD), H)
    h_f, _, _, _, _ = dk.fused_decode_step_w4mqi4(
        packed, x, kp, vp, ks, vs, jnp.int32(cl), n_head=H)
    h_f = nn.layer_norm(params["ln_oar"], h_f)
    b = np.asarray(h_f, np.float32)
    assert np.abs(a - b).max() / np.abs(a).max() < 0.13


@pytest.mark.parametrize("kernel", ["v5mq", "w4mq", "v5mqi4", "w4mqi4"])
def test_mq_batch_block_matches_whole_batch(interpret_kernels, kernel):
    """The batch-split grid of the multi-query kernels must be bit-exact
    vs their whole-batch path (which is itself parity-tested vs XLA) —
    this is what lets speculative decoding compose with the B=8 bb=4
    serving default."""
    from umgen_tpu.ops import decode_kernel as dk

    cfg = ModelConfig(oar_cache_dtype="bfloat16", n_oar_layer=2)
    d = cfg.n_embd
    params = {"oar": nn.init_stack(jax.random.PRNGKey(0), 2,
                                   nn.init_block_oar, d, cfg.bias,
                                   jnp.bfloat16)}
    w4 = kernel.startswith("w4")
    int4 = kernel.endswith("i4")
    packed = (dk.pack_fused_oar_w4(params["oar"]) if w4
              else dk.pack_fused_oar(quantize_params_int8(params)["oar"]))
    # interpret mode executes per-element on the host — keep shapes small
    # (the batch-split grid logic is shape-independent; bb=2 over B=4 is
    # the serving pattern)
    B, S, Q, cl = 4, 256, 8, 150
    H, Dh = cfg.n_head, cfg.head_dim
    HD = H * Dh
    rng = np.random.default_rng(1)
    kv_bf = jnp.asarray(rng.normal(0, 0.5, (2, B, S, HD)), jnp.bfloat16)
    vv_bf = jnp.asarray(rng.normal(0, 0.5, kv_bf.shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (B, Q, d)), jnp.bfloat16)
    fn = getattr(dk, f"fused_decode_step_{kernel}")
    if int4:
        kp, ks = dk.quantize_kv_int4(kv_bf, H)
        vp, vs = dk.quantize_kv_int4(vv_bf, H)
        whole = fn(packed, x, kp, vp, ks, vs, jnp.int32(cl), n_head=H)
        split = fn(packed, x, kp, vp, ks, vs, jnp.int32(cl), n_head=H,
                   batch_block=2)
    else:
        kv8 = jnp.clip(jnp.round(kv_bf.astype(jnp.float32)
                                 * dk.KV_INT8_SCALE),
                       -127, 127).astype(jnp.int8)
        vv8 = jnp.clip(jnp.round(vv_bf.astype(jnp.float32)
                                 * dk.KV_INT8_SCALE),
                       -127, 127).astype(jnp.int8)
        whole = fn(packed, x, kv8, vv8, jnp.int32(cl), n_head=H)
        split = fn(packed, x, kv8, vv8, jnp.int32(cl), n_head=H,
                   batch_block=2)
    for w, s in zip(whole, split):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(s))
